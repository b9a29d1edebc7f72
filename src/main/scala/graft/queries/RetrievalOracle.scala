package graft.queries

/** Generated DuckDB oracle SQL for the BM25 retrieval family
  * (ops/Bm25.scala). Replays the identical integer algebra: same 60-bit
  * md5 term hashes, same [[ModelOracle.log2fp]] idf, same cleared-denominator
  * tf normalization with positive-operand integer division (`//` here,
  * `div` in Spark — identical on positives), same (score_fp DESC, id DESC)
  * tie order as the bounded-heap top-k.
  */
object RetrievalOracle {

  private def h(x: String): String =
    s"('0x'||substr(md5($x),1,15))::BIGINT"

  private def norm(x: String): String =
    raw"""[t for t in string_split(lower(trim(regexp_replace($x,'\s+',' '))),' ') if t <> '']"""

  /** BM25 top-k over `documents` for a literal query set. */
  def bm25(queries: Seq[(String, String)], k: Int): String = {
    val values = queries
      .map { case (qid, qt) => s"('$qid', '$qt')" }.mkString(", ")
    raw"""WITH n AS (SELECT doc_id, ${norm("text")} ts FROM documents),
         d AS (SELECT doc_id, len(ts)::BIGINT dl FROM n),
         post AS (SELECT doc_id, h, count(*)::BIGINT tf FROM (
             SELECT doc_id, ${h("t")} h FROM n, LATERAL unnest(ts) AS u(t))
           GROUP BY 1, 2),
         dict AS (SELECT h, count(*)::BIGINT df FROM post GROUP BY 1),
         st AS (SELECT count(*)::BIGINT nd, coalesce(sum(dl), 0)::BIGINT tl
           FROM d),
         afp AS (SELECT nd, (64 * tl) // nd a FROM st),
         q AS (SELECT * FROM (VALUES $values) v(qid, qt)),
         qt AS (SELECT DISTINCT qid, ${h("t")} h
           FROM (SELECT qid, ${norm("qt")} ts FROM q), LATERAL unnest(ts) AS u(t)),
         sc AS (SELECT qt.qid, p.doc_id AS id,
             sum(((${ModelOracle.log2fp("(2*nd + 2)")} -
                   ${ModelOracle.log2fp("(2*df + 1)")}) *
                  ((22528 * p.tf * a) // (10 * p.tf * a + 3 * a + 576 * d.dl)))
                 // 1024)::BIGINT score_fp
           FROM qt JOIN post p USING (h) JOIN dict USING (h)
             JOIN d ON p.doc_id = d.doc_id CROSS JOIN afp
           GROUP BY 1, 2)
         SELECT qid, "rank", id, score_fp FROM (
           SELECT *, row_number() OVER (PARTITION BY qid
               ORDER BY score_fp DESC, id DESC) "rank"
           FROM sc) z
         WHERE "rank" <= $k"""
  }
}
