package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Cols.{q => Q}

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) — the
  * standard hybrid-retrieval combiner: given N independent rankings of the
  * same query set (e.g. the BM25 lexical leg and the embedding ANN leg),
  * each (qid, id) pair scores Σ_lists 1/(k0 + rank), so documents ranked
  * highly by ANY list rise without any score calibration between lists —
  * rank is the only signal, which is exactly what makes fusing a
  * fixed-point BM25 score with an integer-L2 distance sound.
  *
  * Made INTEGER-EXACT the repo's usual way: the contribution is
  * 2^fpShift div (k0 + rank) — positive-operand floor division, identical
  * in Spark (`div`) and DuckDB (`//`) — summed as Longs, so the fused
  * ranking hash-gates under the DuckDB oracle like every other retrieval
  * query. Ties break (rrf_fp DESC, id DESC), the bounded-heap struct
  * order, mirrored by the oracle's ORDER BY.
  *
  * 100 TB shape: inputs are already top-k rankings — |queries|·k rows per
  * list, never corpus-sized — so the union + groupBy(qid, id) shuffle
  * carries O(N·|queries|·k) tiny rows and the final per-query top-k is the
  * bounded-heap [[TopKPerGroup]]. The expensive work lives in the legs
  * (inverted-index scan, ANN probe), each with its own documented scale
  * shape; fusion itself is asymptotically free.
  */
object Rrf {

  /** Fuse rankings, each carrying (qidCol, idCol, rankCol) with rank
    * 1-based and dense per qid. Returns (qid, rank, id, rrf_fp).
    */
  def fuse(rankings: Seq[DataFrame], qidCol: String, idCol: String,
           rankCol: String, k: Int, k0: Int = 60,
           fpShift: Int = 20): DataFrame = {
    require(rankings.nonEmpty, "empty ranking list")
    require(k0 >= 0 && fpShift > 0 && fpShift <= 40,
      s"bad rrf params k0=$k0 fpShift=$fpShift")
    val fp = 1L << fpShift
    // explicit `div` (not `/`): positive-operand floor division, the form
    // DuckDB's `//` replays bit-for-bit.
    val tagged = rankings.map { r =>
      r.select(Q(qidCol).as("qid"), Q(idCol).as("id"),
        expr(s"${fp}L div (${k0}L + CAST(`$rankCol` AS BIGINT))").as("c"))
    }
    val fused = tagged.reduce(_ unionByName _)
      .groupBy("qid", "id")
      .agg(sum(col("c")).as("rrf_fp"))
    val top = TopKPerGroup(fused, Seq("qid"), "rrf_fp", k, Seq("id"))
    top.select(col("qid"), col("rank"), col("id"), col("rrf_fp"))
  }
}
