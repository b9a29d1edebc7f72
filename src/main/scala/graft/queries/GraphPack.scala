package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.PageRank

/** Graph-authority queries over the co-purchase item graph (consecutive
  * lineitems of an order link part → next part): the curation-pipeline
  * shape where link structure is a quality prior. Both queries replay
  * bit-for-bit under [[GraphOracle]]'s unrolled power-iteration chain.
  */
object GraphPack {

  /** (src, dst) part co-occurrence edges: distinct parts sharing an order
    * link both ways. Set semantics throughout — the synthetic lineitem
    * duplicates l_linenumber within orders, so a sequence-based rule
    * (lead over linenumber) would be row-order non-deterministic. The
    * per-order self-join is bounded by basket size (the SemDeDup
    * within-group shape, with tiny groups).
    */
  private def coPurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val op = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
      .distinct()
    op.join(op.select(col("k"), col("p").as("p2")), "k")
      .where(col("p") =!= col("p2"))
      .select(col("p").as("src"), col("p2").as("dst"))
  }

  /** Plain PageRank, 5 iterations: every part's authority score. */
  def pagerankQ(s: SparkSession, dir: String): DataFrame =
    PageRank.ranks(coPurchaseEdges(s, dir), "src", "dst", iters = 5)

  /** Personalized PageRank from a deterministic seed set (part ids
    * ≡ 0 mod 53): authority flowing outward from trusted seeds — the
    * seed-propagation quality-prior shape.
    */
  def pprQ(s: SparkSession, dir: String): DataFrame = {
    val seeds = Tables.lineitem(s, dir)
      .select(col("l_partkey").as("v"))
      .where(col("l_partkey") % 53 === 0).distinct()
    PageRank.ranks(coPurchaseEdges(s, dir), "src", "dst", iters = 5,
      seeds = Some(seeds))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gr_pagerank" -> (pagerankQ _),
    "gr_ppr" -> (pprQ _),
  )

  def oracle: Map[String, String] = Map(
    "gr_pagerank" -> GraphOracle.pageRank(GraphOracle.CoPurchaseEdges,
      iters = 5),
    "gr_ppr" -> GraphOracle.pageRank(GraphOracle.CoPurchaseEdges,
      iters = 5, seedPred = Some("v % 53 = 0")),
  )
}
