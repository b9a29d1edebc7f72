package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join: points against [lo, hi] intervals.
  *
  * Spark plans a plain `p.join(i, v between lo and hi)` as a broadcast
  * nested loop (or cartesian) — O(|points|·|intervals|) compares. Interval
  * binning turns it into ONE equi-join shuffle: every interval registers
  * in each bin it covers, every point probes its own bin, and the exact
  * predicate filters bin-local candidates. A (point, interval) match is
  * found in exactly one bin — the point's — so there is no dedup pass.
  *
  * `binWidth` tunes replication vs selectivity: intervals replicate
  * ⌈width/binWidth⌉+1 times; points never replicate. Pick it near the
  * typical interval width.
  */
object RangeJoin {
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val pb = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val ib = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
                       floor(col(hiCol) / binWidth).cast("long"))))
    pb.join(ib, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
