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

  /** The corpus-side CTE prefix shared by every BM25-family oracle:
    * tokenized docs, lengths, postings, dict, stats, integer avgdl.
    */
  private def corpus: String =
    raw"""n AS (SELECT doc_id, ${norm("text")} ts FROM documents),
         d AS (SELECT doc_id, len(ts)::BIGINT dl FROM n),
         post AS (SELECT doc_id, h, count(*)::BIGINT tf FROM (
             SELECT doc_id, ${h("t")} h FROM n, LATERAL unnest(ts) AS u(t))
           GROUP BY 1, 2),
         dict AS (SELECT h, count(*)::BIGINT df FROM post GROUP BY 1),
         st AS (SELECT count(*)::BIGINT nd, coalesce(sum(dl), 0)::BIGINT tl
           FROM d),
         afp AS (SELECT nd, (64 * tl) // nd a FROM st)"""

  /** The per-(query-term, doc) score sum — CTE `sc` body given a `qt`
    * (qid, h) CTE; `extra` appends to the WHERE (e.g. self-exclusion).
    */
  private def scored(extra: String = ""): String =
    raw"""SELECT qt.qid, p.doc_id AS id,
             sum(((${ModelOracle.log2fp("(2*nd + 2)")} -
                   ${ModelOracle.log2fp("(2*df + 1)")}) *
                  ((22528 * p.tf * a) // (10 * p.tf * a + 3 * a + 576 * d.dl)))
                 // 1024)::BIGINT score_fp
           FROM qt JOIN post p USING (h) JOIN dict USING (h)
             JOIN d ON p.doc_id = d.doc_id CROSS JOIN afp
           ${if (extra.isEmpty) "" else s"WHERE $extra"}
           GROUP BY 1, 2"""

  /** BM25 top-k over `documents` for a literal query set. */
  def bm25(queries: Seq[(String, String)], k: Int): String = {
    val values = queries
      .map { case (qid, qt) => s"('$qid', '$qt')" }.mkString(", ")
    raw"""WITH $corpus,
         q AS (SELECT * FROM (VALUES $values) v(qid, qt)),
         qt AS (SELECT DISTINCT qid, ${h("t")} h
           FROM (SELECT qid, ${norm("qt")} ts FROM q), LATERAL unnest(ts) AS u(t)),
         sc AS (${scored()})
         SELECT qid, "rank", id, score_fp FROM (
           SELECT *, row_number() OVER (PARTITION BY qid
               ORDER BY score_fp DESC, id DESC) "rank"
           FROM sc) z
         WHERE "rank" <= $k"""
  }

  /** The exact quantized-L2 brute-force CTEs shared by the semantic legs:
    * `fpts` (floor-quantized vector elements, the expr.QuantizeLong
    * domain) and `exd` (qid, nid, dd) for queries vec_id < nq, self
    * excluded.
    */
  private def quantBrute(nq: Int, quantShift: Int): String = {
    val scale = 1L << quantShift
    raw"""fpts AS (SELECT vec_id, generate_subscripts(qv, 1) pos, unnest(qv) x
         |  FROM (SELECT vec_id,
         |    list_transform(embedding,
         |      e -> CAST(floor(CAST(e AS DOUBLE)*$scale) AS BIGINT)) qv
         |    FROM embeddings)),
         |exd AS (SELECT b.vec_id qid, a.vec_id nid,
         |    sum((a.x - b.x)*(a.x - b.x))::BIGINT dd
         |  FROM fpts a JOIN fpts b ON a.pos = b.pos
         |  WHERE b.vec_id < $nq AND a.vec_id != b.vec_id GROUP BY 1, 2)""".stripMargin
  }

  /** Retrieval-quality evaluation against the embeddings.label ground
    * truth: for each query, MRR (2^20 // first-relevant rank), binary-gain
    * DCG with the fixed-point log2 discount (2^40 // log2fp(rank+1), so
    * contributions land back on the 2^20 scale), the ideal DCG from the
    * per-label relevant count, and nDCG in basis points — all integer
    * floor arithmetic, so even the evaluation METRICS hash-gate. The
    * ranking under evaluation is the exact quantized-L2 top-k (the
    * deterministic semantic leg).
    */
  def labelEval(nq: Int, k: Int, quantShift: Int = 6): String =
    raw"""WITH ${quantBrute(nq, quantShift)},
         rb AS (SELECT qid, nid id, r FROM (
           SELECT qid, nid, row_number() OVER (PARTITION BY qid
             ORDER BY dd, nid) r FROM exd) WHERE r <= $k)
         ${labelMetricsSql("rb", k)}"""

  /** The metric CTEs + final SELECT shared by every label-eval oracle:
    * `rankRel` must expose (qid, id, r) already bounded to the top k.
    */
  private def labelMetricsSql(rankRel: String, k: Int): String = {
    val fp = 1L << 20
    val fp2 = 1L << 40
    raw""",lab AS (SELECT vec_id, label FROM embeddings),
         rl AS (SELECT t.qid, t.r,
             CASE WHEN ln.label = lq.label THEN 1 ELSE 0 END rel
           FROM $rankRel t JOIN lab ln ON ln.vec_id = t.id
             JOIN lab lq ON lq.vec_id = t.qid),
         agg AS (SELECT qid,
             coalesce($fp // min(CASE WHEN rel = 1 THEN r END), 0)::BIGINT mrr_fp,
             coalesce(sum(CASE WHEN rel = 1
               THEN $fp2 // ${ModelOracle.log2fp("(r + 1)")} END), 0)::BIGINT dcg_fp
           FROM rl GROUP BY 1),
         cnt AS (SELECT lq.vec_id qid, count(*)::BIGINT c
           FROM lab lq JOIN lab ln
             ON ln.label = lq.label AND ln.vec_id != lq.vec_id
           WHERE lq.vec_id IN (SELECT DISTINCT qid FROM $rankRel)
           GROUP BY 1),
         ideal AS (SELECT qid,
             sum($fp2 // ${ModelOracle.log2fp("(i + 1)")})::BIGINT idcg_fp
           FROM (SELECT qid, unnest(range(1, least(c, $k) + 1)) i FROM cnt)
           GROUP BY qid)
         SELECT a.qid, a.mrr_fp, a.dcg_fp, i.idcg_fp,
           ((10000 * a.dcg_fp) // i.idcg_fp)::BIGINT ndcg_bp
         FROM agg a JOIN ideal i USING (qid)"""
  }

  /** Hybrid more-like-this retrieval: BM25 lexical ranking (query = each
    * of the first `nq` documents' own text, self excluded BEFORE ranking)
    * fused with the exact quantized-L2 semantic ranking over `embeddings`
    * (doc_id ≡ vec_id fixture convention) by integer reciprocal-rank
    * fusion: contribution 2^fpShift // (k0 + rank) per leg, fused order
    * (rrf_fp DESC, id DESC) — ops/Rrf.scala's exact algebra.
    */
  def hybridRrf(nq: Int, k: Int, k0: Int = 60, fpShift: Int = 20,
                quantShift: Int = 6): String =
    raw"""${hybridCore(nq, k, k0, fpShift, quantShift)}
         SELECT qid, r AS "rank", id, rrf_fp FROM hr WHERE r <= $k"""

  /** The hybrid chain through CTE `hr` (qid, id, rrf_fp, r — the fused
    * ranking, unbounded); [[hybridRrf]]/[[hybridEval]] append their own
    * final SELECT.
    */
  private def hybridCore(nq: Int, k: Int, k0: Int, fpShift: Int,
                         quantShift: Int): String = {
    val fp = 1L << fpShift
    raw"""WITH $corpus,
         q AS (SELECT doc_id AS qid, ts FROM n WHERE doc_id < $nq),
         qt AS (SELECT DISTINCT qid, ${h("t")} h
           FROM q, LATERAL unnest(ts) AS u(t)),
         sc AS (${scored("p.doc_id != qt.qid")}),
         lexr AS (SELECT qid, id, row_number() OVER (PARTITION BY qid
             ORDER BY score_fp DESC, id DESC) r FROM sc),
         ${quantBrute(nq, quantShift)},
         semr AS (SELECT qid, nid AS id, row_number() OVER (PARTITION BY qid
             ORDER BY dd, nid) r FROM exd),
         allr AS (SELECT qid, id, $fp // ($k0 + r) c FROM lexr WHERE r <= $k
           UNION ALL
           SELECT qid, id, $fp // ($k0 + r) c FROM semr WHERE r <= $k),
         f AS (SELECT qid, id, sum(c)::BIGINT rrf_fp FROM allr GROUP BY 1, 2),
         hr AS (SELECT qid, id, rrf_fp, row_number() OVER (PARTITION BY qid
             ORDER BY rrf_fp DESC, id DESC) r
           FROM f)"""
  }

  /** [[labelEval]]'s metrics over the fused hybrid ranking. */
  def hybridEval(nq: Int, k: Int, k0: Int = 60, fpShift: Int = 20,
                 quantShift: Int = 6): String =
    raw"""${hybridCore(nq, k, k0, fpShift, quantShift)},
         rb AS (SELECT qid, id, r FROM hr WHERE r <= $k)
         ${labelMetricsSql("rb", k)}"""
}
