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

  /** Triangle census of the UNDIRECTED graph underlying the edge set:
    * one row (n_triangles, n_wedges, global_cc_bp) where n_wedges is the
    * open-or-closed path-of-length-2 count Σ d(d−1)/2 and global_cc_bp
    * the global clustering coefficient 3·triangles/wedges in basis
    * points — exact integers (d(d−1) is even, so the /2 is exact; the
    * final ratio is one floor division).
    *
    * Triangles are counted by the compact-forward algorithm: orient each
    * undirected edge from the LOWER (degree, id) endpoint to the higher —
    * a total order, so every triangle is counted exactly once by the
    * e(a,b)⋈e(b,c)⋈e(a,c) join — and the degree ordering bounds every
    * adjacency list by O(√m) on skewed graphs (the hub node, which would
    * otherwise anchor deg² wedge candidates, becomes a join TARGET
    * instead of a source). The COUNT is orientation-invariant, so the
    * DuckDB oracle replays with the simpler id-ordered orientation and
    * still hash-matches.
    */
  def triangleStats(edges: DataFrame, srcCol: String,
                    dstCol: String): DataFrame = {
    val e = edges.select(Q(srcCol).cast("long").as("src"),
        Q(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
    // undirected support: one row per unordered pair
    val und = e.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct().persist() // lifetime caller-owned
    val deg = und.select(col("a").as("v"))
      .unionAll(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val wedges = deg.agg(sum(expr("(d * (d - 1)) div 2")).as("n_wedges"))
    // (degree, id)-ordered orientation
    val ranked = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("lo"), col("b").as("hi")))
          .otherwise(struct(col("b").as("lo"), col("a").as("hi")))
          .as("o"))
      .select(col("o.lo").as("x"), col("o.hi").as("y")).persist()
    val e1 = ranked
    val e2 = ranked.select(col("x").as("y0"), col("y").as("z"))
    val e3 = ranked.select(col("x").as("x1"), col("y").as("z1"))
    val tri = e1.join(e2, col("y") === col("y0"))
      .join(e3, col("x") === col("x1") && col("z") === col("z1"))
      .agg(count(lit(1)).as("n_triangles"))
    tri.crossJoin(wedges)
      .select(col("n_triangles"), col("n_wedges"),
        when(col("n_wedges") > 0,
          expr("(30000 * n_triangles) div n_wedges")).otherwise(0L)
          .as("global_cc_bp"))
  }
}
