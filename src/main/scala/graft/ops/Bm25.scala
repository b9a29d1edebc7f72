package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Cols.{q => Q}
import graft.functions.{SimilarityFunctions => S, TextFunctions => T}
import graft.ops.ModelFilter.log2fp

/** BM25 full-text retrieval over an inverted index — the lexical-search
  * leg of a retrieval stack, beside the embedding ANN family
  * (SimilaritySearch): sparse keyword ranking for dedup-by-query,
  * decontamination probes, and RAG-corpus retrieval where exact term
  * match matters.
  *
  * Scoring is Lucene-shaped BM25 (Robertson & Zaragoza 2009; Lucene's
  * BM25Similarity with k1 = 1.2, b = 0.75):
  *
  *   score(q, d) = Σ_{t ∈ distinct(q)} idf(t) · tf·(k1+1) /
  *                   (tf + k1·(1 − b + b·dl/avgdl))
  *   idf(t)     = log(1 + (N − df + 0.5)/(df + 0.5))   (always ≥ 0)
  *
  * …made INTEGER-EXACT so the DuckDB oracle hash-gates it (the same
  * discipline as ModelFilter — floating `ln` and float division replay
  * differently across engines):
  *
  *  - idf_fp = log2fp(2N + 2) − log2fp(2·df + 1), since
  *    1 + (N−df+0.5)/(df+0.5) = (2N+2)/(2·df+1) exactly in integers;
  *  - avgdl is carried as A = (64·L) div N (1/64-token units, L = corpus
  *    token count) so the tf normalization clears ALL denominators:
  *    with k1 = 6/5, b = 3/4,
  *      tfn_fp = (22528·tf·A) div (10·tf·A + 3·A + 576·dl)
  *    (22528 = 22·2^10; numerator and denominator are the rational
  *    tf-norm scaled by 10·A·2^10 — every factor integer, division is
  *    one positive-operand `div`, identical in Spark and DuckDB);
  *  - per-term contribution = (idf_fp · tfn_fp) div 1024; the per-doc
  *    score is their sum. All operands positive, so floor-vs-truncate
  *    division semantics agree across engines.
  *
  * Magnitude bound (documented, like expr/VectorOps): the widest product
  * is 22528·tf·A ≤ 2^14.5·dl_max·64·avgdl — safe in a Long for
  * dl_max·avgdl < 2^43 (e.g. million-token docs in a million-token-avg
  * corpus); document length, not corpus size, is the bound, which is why
  * avgdl rides as the bounded A rather than the unbounded (L, N) pair.
  *
  * 100 TB shape: the index build is the one corpus-sized pass (tokenize →
  * explode → (h, id) count), paid once and persisted — postings bucketed
  * BY TERM HASH (hashlabel = h), the classic inverted-index layout, so a
  * query's candidates live in known buckets. Scoring never shuffles the
  * corpus: query terms broadcast against the postings scan, the per-term
  * df/idf table is ≤ |query terms| rows (broadcast), corpus stats are one
  * row, and the final top-k is the bounded-heap TopKPerGroup — no global
  * sort, no window skew. Incremental indexing appends a batch's postings
  * as a chained snapshot; df and stats re-aggregate by summation
  * (count-sketches merge by +), so history text is never re-read.
  */
object Bm25 {

  /** Build the inverted index in one corpus pass.
    *
    * Returns (postings, dict, stats):
    *  - postings: (h, id, dl, tf) — one row per (doc, distinct term);
    *  - dict: (h, df) — document frequency per term (the dictionary);
    *  - stats: one row (n_docs, total_len).
    *
    * dict/stats derive from postings, so incremental merges are pure
    * summation: union chained dicts and `groupBy(h).sum(df)`, union stats
    * and sum — [[scoreIndexed]] does exactly that, making a chain of
    * per-batch indexes scoreable with no history re-read.
    */
  def index(df: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val toks = df.select(Q(idCol).as("id"),
        T.tokens(T.normalized(Q(textCol))).as("ts"))
      .select(col("id"), size(col("ts")).cast("long").as("dl"),
        S.positionedShingleHashes(col("ts"), 1).as("hs"))
    val postings = toks
      .select(col("id"), col("dl"), explode(col("hs")).as("h"))
      .groupBy("h", "id", "dl").agg(count(lit(1)).as("tf"))
    val dict = postings.groupBy("h").agg(count(lit(1)).as("df"))
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(col("dl")), lit(0L)).as("total_len"))
    (postings, dict, stats)
  }

  /** Tokenize a literal query set with the SAME normalization/hash chain
    * as the index (so oracle replay sees identical 60-bit term ids).
    * Returns (qid, h) with distinct terms per query — BM25 over distinct
    * query terms, the usual bag-of-words query model.
    */
  private def queryTerms(s: SparkSession, queries: Seq[(String, String)])
      : DataFrame = {
    import s.implicits._
    queries.toDF("qid", "qtext")
      .select(col("qid"), T.tokens(T.normalized(col("qtext"))).as("ts"))
      .select(col("qid"), explode(
        S.positionedShingleHashes(col("ts"), 1)).as("h"))
      .distinct()
  }

  /** Score a literal query set against an index (possibly a UNION of
    * chained per-batch indexes — dict rows re-aggregate by `sum(df)`,
    * stats rows by summation, postings concatenate). Top-k per query via
    * the bounded-heap [[TopKPerGroup]]; ties break (score_fp DESC,
    * id DESC) — the heap's struct order.
    *
    * Returns (qid, rank, id, score_fp).
    */
  def scoreIndexed(postings: DataFrame, dict: DataFrame, stats: DataFrame,
                   queries: Seq[(String, String)], k: Int): DataFrame =
    TopKPerGroup(scoreAll(postings, dict, stats, queries),
      Seq("qid"), "score_fp", k, Seq("id"))

  /** [[scoreIndexed]] WITHOUT the final top-k: every (qid, id, score_fp)
    * with at least one matching term. Exposed so consumers that filter
    * candidates (e.g. hybrid more-like-this retrieval dropping the query
    * document itself) can do so BEFORE ranking — filtering a top-k
    * afterwards would leave rank gaps and could lose legitimate
    * candidates pushed out by the excluded row.
    */
  def scoreAll(postings: DataFrame, dict: DataFrame, stats: DataFrame,
               queries: Seq[(String, String)]): DataFrame = {
    require(queries.nonEmpty, "empty query set")
    val s = postings.sparkSession
    val qt = queryTerms(s, queries)
    // merged corpus stats + integer avgdl (1/64 units); one row.
    val st = stats.agg(sum(col("n_docs")).as("nd"),
        sum(col("total_len")).as("tl"))
      .select(col("nd"), expr("(64 * tl) div nd").as("afp"))
    // dict restricted to query terms BEFORE the merge-aggregate: the
    // broadcast-join filter runs at the dict scan, so the sum(df) groupBy
    // touches |query terms| rows, not the vocabulary.
    val dfq = dict.join(broadcast(qt.select("h").distinct()), "h")
      .groupBy("h").agg(sum(col("df")).as("df"))
    // candidate postings: corpus never shuffles — broadcast term filter at
    // the postings scan, then all remaining joins are broadcasts too.
    val cand = postings.join(broadcast(qt), "h")
      .join(broadcast(dfq), "h")
      .crossJoin(broadcast(st))
    val idf = log2fp(lit(2) * col("nd") + lit(2)) -
      log2fp(lit(2) * col("df") + lit(1))
    // Overflow fail-fast (the documented magnitude bound, enforced): the
    // widest product 22528·tf·afp stays under 2^63 for dl ≤ 2^20 (tf ≤ dl
    // and afp = 64·avgdl ≤ 64·max dl follow). DuckDB's BIGINT arithmetic
    // errors loudly on wrap; without this guard Spark would wrap silently
    // and diverge from the replay with no signal — the same asymmetry the
    // curation expressions close with addExact.
    val tfn = when(col("dl") > lit(1L << 20),
        raise_error(concat(lit("bm25: document length "),
          col("dl").cast("string"),
          lit(" exceeds 2^20 tokens — scoring would overflow Long"))))
      .otherwise(
        expr("(22528 * tf * afp) div (10 * tf * afp + 3 * afp + 576 * dl)"))
    val contrib = cand.withColumn("__idf", idf)
      .withColumn("__tfn", tfn)
      .withColumn("c", expr("(__idf * __tfn) div 1024"))
    contrib.groupBy("qid", "id")
      .agg(sum(col("c")).as("score_fp"))
  }

  /** Index + score in one plan — the batch baseline the persisted and
    * incremental variants must match bit-for-bit.
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           queries: Seq[(String, String)], k: Int): DataFrame = {
    val (postings, dict, stats) = index(df, idCol, textCol)
    scoreIndexed(postings, dict, stats, queries, k)
  }
}
