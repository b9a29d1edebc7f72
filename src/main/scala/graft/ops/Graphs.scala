package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Cols.{q => Q}

/** Graph profiling — the one-row report card the graph family's operators
  * are sized against (cf. SemDeDup's cluster report, TrainingPipeline's
  * corpus report): node/edge counts, degree extremes, dangling-node count
  * (PageRank's leak set), and reciprocal-edge count (how symmetric the
  * graph is — a co-occurrence projection reports 100%, a citation graph
  * near 0%). Exact integers only, so it hash-gates.
  *
  * 100 TB shape: two grouped degree aggregations, one anti-join for
  * dangling, one self-join on the (dst, src) key for reciprocity — all
  * map-side combinable or key-partitioned; the final assembly crossJoins
  * six single-row aggregates (the accepted 1-row pattern).
  */
object Graphs {

  /** One row: n_nodes, n_edges, n_dangling, max_out_deg, max_in_deg,
    * n_reciprocal — over the DISTINCT directed edge set.
    */
  def report(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(Q(srcCol).cast("long").as("src"),
        Q(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct().persist() // lifetime caller-owned, the KMeans convention
    val outD = e.groupBy("src").agg(count(lit(1)).as("od"))
    val nodes = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct()
    val nNodes = nodes.agg(count(lit(1)).as("n_nodes"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    val nDangling = nodes
      .join(outD, nodes("v") === outD("src"), "left_anti")
      .agg(count(lit(1)).as("n_dangling"))
    val maxOut = outD.agg(max(col("od")).as("max_out_deg"))
    val maxIn = e.groupBy("dst").agg(count(lit(1)).as("id"))
      .agg(max(col("id")).as("max_in_deg"))
    val rev = e.select(col("dst").as("rsrc"), col("src").as("rdst"))
    val nRecip = e.join(rev,
        col("src") === col("rsrc") && col("dst") === col("rdst"))
      .agg(count(lit(1)).as("n_reciprocal"))
    nNodes.crossJoin(nEdges).crossJoin(nDangling)
      .crossJoin(maxOut).crossJoin(maxIn).crossJoin(nRecip)
  }
}
