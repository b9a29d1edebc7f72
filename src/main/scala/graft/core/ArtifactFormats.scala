package graft.core

/** Format numbers for every persisted artifact whose on-disk layout is
  * OWNED by an operator rather than described by its schema alone
  * (VERDICT r19 item 3 — uniform stamping for the r18 line-index failure
  * class). Writers pass the family's constant to
  * `SnapshotStore.write(formatVersion = ...)`; readers load through
  * `SnapshotStore.readArtifact(name, ...)`, which rejects a missing or
  * different stamp loudly on every chain link.
  *
  * BUMP the constant whenever the artifact's layout contract changes in
  * a way a schema comparison would not catch — column semantics
  * (hex-string vs binary hash, quantization scale, fixed-point shift,
  * packing layout), implied ordering, or sentinel-row conventions. The
  * two incidents this registry generalizes: the r18 line index
  * (hex-string → BINARY(16) `h`, silent zero-match) and the BPE store's
  * ad-hoc −2 marker row (byte-fallback vocabularies persisted under the
  * same name as non-fallback ones).
  */
object ArtifactFormats {
  /** [[graft.ops.Dedup.lineIndex]]: one BINARY(16) md5 per distinct
    * non-blank line. (The hex-string layout predating r18 would be 1;
    * such artifacts are unstamped and rejected by the stamp check — the
    * type-detecting probe in incrementalLineDedup remains the in-plan
    * defense for DataFrames passed directly.)
    */
  val LineIndex = 2
  /** Minhash LSH index rows: (id, sig array, band keys). */
  val MinhashIndex = 1
  /** Semantic-dedup k-means index: centroid rows (cluster, mu array,
    * count) and quantized member assignments (id, cluster, q array).
    */
  val SemanticIndex = 1
  /** IVF index: coarse centroids + per-list member rows. */
  val IvfIndex = 1
  /** PQ stores: codebooks (m, k, centroid array) and packed code rows;
    * also the int8-quantized exact index (`q_index`).
    */
  val PqStore = 1
  /** Naive-Bayes token counts + class priors (integer log-fp space). */
  val NbModel = 1
  /** BM25 postings / dictionary / corpus-stats triple. */
  val Bm25Index = 1
  /** Tokenizer models: BPE merges, unigram pieces, WordPiece vocab —
    * including their byte-fallback variants (the −2 marker-row
    * convention is part of this format).
    */
  val TokenizerModel = 1
  /** Graph edge snapshots: raw distinct co-occurrence edges, folded
    * weighted edges, PageRank normalizedEdges (src, dst, w, sw), and
    * dense-id-compacted variants (id domain is part of the contract).
    */
  val GraphEdges = 1
  /** PageRank rank vectors (v, rank_fp) — fpShift is the implied scale. */
  val RankVector = 1
  /** Random-walk artifacts: CSR-ish neighbor index and walk corpus. */
  val WalkIndex = 1
  /** Streaming heavy-hitter token-count sketch chains (token, est). */
  val TokenSketch = 1
}
