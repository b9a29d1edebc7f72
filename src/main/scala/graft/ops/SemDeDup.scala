package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftBridge
import org.apache.spark.storage.StorageLevel

/** Cluster-aware corpus curation over the [[KMeans]] assignment —
  * SemDeDup-style semantic dedup and cluster-balanced sampling (Abbas et
  * al. 2023, arXiv:2303.09540: k-means over embeddings, then per-cluster
  * policies; reference capability family:
  * accelerator's dsutil dataset pipelines, re-expressed for embeddings).
  *
  * Both operators are integer-exact end to end: clustering is
  * [[KMeans.fixedPoint]], the pair metric is squared Euclidean distance of
  * the QUANTIZED vectors (all Long — for unit-norm embeddings this is the
  * monotone twin of cosine similarity: |a-b|^2 = 2 - 2cos for unit
  * vectors, so a cosine threshold has an exact tauSq counterpart), and the
  * keep-priority is the deterministic (dist-to-centroid DESC, id ASC)
  * order. Every decision therefore replays bit-identically in the
  * generated DuckDB oracle.
  *
  * Scale shape: the within-cluster pairwise compare is SemDeDup's design
  * point — O(sum c_i^2) pairs, bounded by choosing k so clusters stay
  * ~1e4-1e5 rows at corpus scale (the paper runs k ~ 100k over 5B docs).
  * The self-join shuffles (id, dist, q) keyed by cluster — q is dim longs,
  * the float embeddings never enter the shuffle — and the pair distance is
  * one codegen'd loop ([[graft.expr.SqDistLong]]) with the
  * earlier-in-priority predicate applied BEFORE the distance evaluates,
  * halving the evaluated pair count.
  */
object SemDeDup {

  private def sq(c: Column, d: Column): Column =
    GraftBridge.column(graft.expr.SqDistLong(
      GraftBridge.expression(c), GraftBridge.expression(d)))

  /** Semantic dedup: drop a row when a same-cluster row with higher keep
    * priority sits within `tauSq` (squared quantized distance). Keep
    * priority is (dist-to-centroid DESC, id ASC) — SemDeDup keeps the
    * LEAST prototypical member of a duplicate neighborhood (lowest
    * centroid similarity), ties to the lowest id. The rule is
    * existence-based, not chained: x drops when ANY higher-priority
    * neighbor is within tauSq, whether or not that neighbor itself
    * survives — deterministic, order-free, and exactly one relational
    * EXISTS (no sequential sweep to replay).
    *
    * Returns (idCol, cluster, kept) for every input row.
    */
  def semantic(df: DataFrame, idCol: String, vecCol: String, k: Int,
               iters: Int, tauSq: Long, quantShift: Int = 6,
               fpShift: Int = 10): DataFrame = {
    require(tauSq >= 0, s"tauSq must be >= 0, got $tauSq")
    val a = KMeans.assigned(df, idCol, vecCol, k, iters, quantShift, fpShift)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val x = a.select(col(idCol).as("xid"), col("cluster"),
      col("dist").as("xd"), col("q").as("xq"))
    val y = a.select(col(idCol).as("yid"), col("cluster").as("ycluster"),
      col("dist").as("yd"), col("q").as("yq"))
    // priority predicate first: the codegen'd distance only runs for the
    // ordered half of each candidate pair
    val dropped = x.join(y,
        col("cluster") === col("ycluster") &&
          (col("yd") > col("xd") ||
            (col("yd") === col("xd") && col("yid") < col("xid"))) &&
          sq(col("xq"), col("yq")) <= lit(tauSq),
        "left_semi")
      .select(col("xid"))
    a.join(dropped.withColumn("__dropped", lit(true)),
        col(idCol) === col("xid"), "left_outer")
      .select(col(idCol), col("cluster"),
        coalesce(col("__dropped"), lit(false)).unary_!.as("kept"))
  }

  /** Cluster-balanced sample: the `n` rows of each cluster with the
    * smallest (md5(id-as-string), id) — the same deterministic
    * pseudo-random draw as the [[TrainingPipeline]] sampling family and
    * the [[KMeans]] init, so both engines draw identically. Per-cluster
    * top-n is a bounded window (rank <= n after a per-cluster sort of
    * cluster-sized groups); at corpus scale the clusters are the
    * partitions, so no global sort exists.
    *
    * Returns (idCol, cluster) for the sampled rows.
    */
  def clusterSample(df: DataFrame, idCol: String, vecCol: String, k: Int,
                    iters: Int, n: Int, quantShift: Int = 6,
                    fpShift: Int = 10): DataFrame = {
    require(n >= 1, s"need n >= 1, got $n")
    val a = KMeans.fixedPoint(df, idCol, vecCol, k, iters, quantShift, fpShift)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    a.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .select(col(idCol), col("cluster"))
  }

  /** Prototypicality pruning (SSL-prototype metric of Sorscher et al.
    * 2022, arXiv:2206.14486: data beats scaling laws when you keep the
    * HARD examples): per cluster, keep the ceil(keepFrac * cluster_size)
    * rows farthest from their centroid (dist DESC, ties to the lower id).
    * Integer rank arithmetic — rank and the ceil'd cutoff are exact in
    * both engines, so the kept set replays bit-identically.
    *
    * Returns (idCol, cluster, dist) for the kept rows only.
    */
  def prototypePrune(df: DataFrame, idCol: String, vecCol: String, k: Int,
                     iters: Int, keepNum: Int, keepDen: Int,
                     quantShift: Int = 6, fpShift: Int = 10): DataFrame = {
    require(keepNum >= 0 && keepDen > 0 && keepNum <= keepDen,
      s"keep fraction must be 0 <= $keepNum/$keepDen <= 1")
    val a = KMeans.fixedPoint(df, idCol, vecCol, k, iters, quantShift, fpShift)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cluster"))
    val ord = w.orderBy(col("dist").desc, col(idCol))
    // ceil(n * num / den) in integers: (n*num + den - 1) div den
    a.withColumn("__rk", row_number().over(ord))
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__rk") <= expr(s"(__n * $keepNum + ${keepDen - 1}) div $keepDen"))
      .select(col(idCol), col("cluster"), col("dist"))
  }

  /** DuckDB replay of [[prototypePrune]]: shared chain + the same integer
    * rank/cutoff window.
    */
  def prototypePruneOracleSql(table: String, idCol: String, vecCol: String,
                              k: Int, iters: Int, keepNum: Int, keepDen: Int,
                              quantShift: Int = 6, fpShift: Int = 10): String =
    KMeans.oracleChain(table, idCol, vecCol, k, iters, quantShift, fpShift) +
      s"""
         |SELECT $idCol, c AS cluster, dist FROM afin
         |QUALIFY row_number() OVER (PARTITION BY c ORDER BY dist DESC, $idCol)
         |  <= (count(*) OVER (PARTITION BY c) * $keepNum + $keepDen - 1) // $keepDen""".stripMargin

  /** DuckDB replay of [[semantic]]: the shared [[KMeans.oracleChain]]
    * (ending in `afin` + `pts`), then pair distances over the ordered half
    * of each within-cluster pair and the EXISTS drop rule.
    */
  def semanticOracleSql(table: String, idCol: String, vecCol: String,
                        k: Int, iters: Int, tauSq: Long,
                        quantShift: Int = 6, fpShift: Int = 10): String =
    KMeans.oracleChain(table, idCol, vecCol, k, iters, quantShift, fpShift) +
      s""",
         |pairdist AS (
         |  SELECT ax.$idCol AS xid,
         |    sum((px.qv - py.qv)*(px.qv - py.qv)) AS d2
         |  FROM afin ax
         |  JOIN afin ay ON ax.c = ay.c
         |    AND (ay.dist > ax.dist OR (ay.dist = ax.dist AND ay.$idCol < ax.$idCol))
         |  JOIN pts px ON px.$idCol = ax.$idCol
         |  JOIN pts py ON py.$idCol = ay.$idCol AND py.pos = px.pos
         |  GROUP BY ax.$idCol, ay.$idCol),
         |dropped AS (SELECT DISTINCT xid FROM pairdist WHERE d2 <= $tauSq)
         |SELECT a.$idCol, a.c AS cluster, (d.xid IS NULL) AS kept
         |FROM afin a LEFT JOIN dropped d ON a.$idCol = d.xid""".stripMargin

  /** DuckDB replay of [[clusterSample]]: the shared chain, then the
    * per-cluster (md5, id) top-n window.
    */
  def clusterSampleOracleSql(table: String, idCol: String, vecCol: String,
                             k: Int, iters: Int, n: Int,
                             quantShift: Int = 6, fpShift: Int = 10): String =
    KMeans.oracleChain(table, idCol, vecCol, k, iters, quantShift, fpShift) +
      s"""
         |SELECT $idCol, c AS cluster FROM afin
         |QUALIFY row_number() OVER (PARTITION BY c
         |  ORDER BY md5(CAST($idCol AS VARCHAR)), $idCol) <= $n""".stripMargin
}
