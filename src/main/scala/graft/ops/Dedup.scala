package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{SimilarityFunctions => S, TextFunctions => T}

/** Deduplication operators for training-data pipelines.
  *
  * Four families, trading completeness vs cost:
  *  - exact: hash-groupBy — one shuffle on the content hash.
  *  - ngramJaccard: *complete* near-dup pairs via a shingle inverted index
  *    (posting-list self-join) — every pair sharing ≥1 shingle is scored,
  *    so recall is exactly 1.0; cost bounded by shingle co-occurrence.
  *  - minhashLsh: the at-scale path — constant-size signatures, banded LSH
  *    bucket join; recall < 1 tunable via (bands × rows).
  *  - simhash: 64-bit sketch + hamming ≤ k candidate pairs.
  *  - embeddingCosine: near-dup by embedding similarity.
  *
  * All return canonical pairs (id_a < id_b), one row per duplicate pair.
  */
object Dedup {

  /** Exact dedup: one representative (min id) per identical content.
    * Returns (id, content-hash, dup_count). Scale: single hash shuffle on
    * the 60-bit fingerprint, map-side combined.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(T.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
      .select(col(idCol), col("fp"), col("dup_count"))

  /** Complete word-n-gram Jaccard pairs with similarity ≥ threshold.
    *
    * Candidate generation: explode distinct shingles → self-join the
    * inverted index → distinct candidate pairs → verify Jaccard on the
    * full shingle sets. Any pair with J ≥ t > 0 shares ≥ 1 shingle, so no
    * pair is missed. At 100 TB the explode is the dominant shuffle; hot
    * shingles (stopword n-grams) should be frequency-capped — the `maxDf`
    * parameter drops shingles occurring in more than that many docs
    * (a shingle shared by >maxDf docs generates O(maxDf²) candidates while
    * rarely being the *only* witness for a true near-dup pair — for exact
    * completeness keep it at Int.MaxValue, the default).
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.8,
                   maxDf: Int = Int.MaxValue): DataFrame = {
    val withShingles = df.select(col(idCol).as("id"),
      S.wordShingles(col(textCol), n).as("sh"))
    val posting = withShingles
      .select(col("id"), explode(col("sh")).as("shingle"))
    val capped =
      if (maxDf == Int.MaxValue) posting
      else {
        val hot = posting.groupBy("shingle").count()
          .filter(col("count") > maxDf).select("shingle")
        posting.join(hot, Seq("shingle"), "left_anti")
      }
    val cands = capped.as("x").join(capped.as("y"), Seq("shingle"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val a = withShingles.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = withShingles.select(col("id").as("id_b"), col("sh").as("sh_b"))
    cands.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        S.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash + banded-LSH near-dup pairs — the constant-memory at-scale
    * variant: signatures are k longs per doc regardless of doc length;
    * the band shuffle carries ONLY (id, band index, signature slice) —
    * never the shingle sets (round 1 shipped 64 copies of every doc's
    * shingles through this shuffle). Verification joins the distinct
    * candidate id pairs back to the shingle table and re-checks true
    * Jaccard, so precision is exact; recall is the standard 1-(1-t^r)^b
    * curve.
    *
    * Candidates are pairs agreeing on ≥1 band's raw signature slice
    * (array-equality join key — no hash-collision caveat in the oracle
    * comparison).
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 n: Int = 3, k: Int = 16, bands: Int = 8,
                 threshold: Double = 0.8): DataFrame = {
    require(k % bands == 0, s"k=$k must be a multiple of bands=$bands")
    val rows = k / bands
    val withSh = df.select(col(idCol).as("id"),
      S.wordShingles(col(textCol), n).as("sh"))
    val withSig = withSh.select(col("id"),
      S.minhashSignature(col("sh"), k).as("sig"))
    val bandRows = withSig.select(col("id"), posexplode(
        array((0 until bands).map(b =>
          slice(col("sig"), b * rows + 1, rows)): _*)))
      .toDF("id", "band", "bslice")
    val cands = bandRows.as("x").join(bandRows.as("y"),
        col("x.band") === col("y.band") && col("x.bslice") === col("y.bslice") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val a = withSh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = withSh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    cands.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        S.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming over the
    * 40-bit sketch.
    *
    * Candidate generation uses the Manku block trick: split the hash into
    * (maxHamming+1) blocks — any pair within the distance agrees on ≥1
    * whole block (pigeonhole), so joining per-block is complete w.r.t. the
    * sketch.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              maxHamming: Int = 3): DataFrame = {
    val bits = 40
    val blocks = maxHamming + 1
    val width = bits / blocks
    val withH = df.select(col(idCol).as("id"),
      S.simhash40(T.tokens(T.normalized(col(textCol)))).as("h"))
    val keyed = withH.select(col("id"), col("h"),
      explode(array((0 until blocks).map { b =>
        struct(lit(b).as("blk"),
          shiftright(col("h"), b * width).bitwiseAND((1L << width) - 1).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("h"), col("bk.blk").as("blk"), col("bk.key").as("key"))
    keyed.as("x").join(keyed.as("y"), Seq("blk", "key"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        S.hamming64(col("x.h"), col("y.h")).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup: pairs with cosine ≥ threshold. Brute-force
    * O(n²/2) — correct baseline; LshAnn provides the bucketed scale path.
    */
  def embeddingCosine(df: DataFrame, idCol: String, vecCol: String,
                      threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", S.l2Norm(col("v")))
    v.as("x").join(v.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        (S.dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
