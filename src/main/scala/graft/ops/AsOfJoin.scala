package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single right row with equal keys and
  * the greatest rightTime ≤ leftTime (or < with `strict`) — the
  * time-series "latest state as of" primitive Spark lacks natively.
  *
  * Implemented as the union-window formulation, NOT a range join: tag and
  * union both sides, sort within each key by (time, tag) and carry the
  * last-seen right payload forward with `last(ignoreNulls)`. ONE shuffle
  * on the keys, linear work — a naive `left.join(right, key && rt <= lt)`
  * + argmax explodes with O(|left|·|right|) per key at 100 TB; this never
  * materializes a candidate pair.
  *
  * Tag ordering encodes the bound: non-strict sorts right rows before
  * left rows at equal times (a right row AT leftTime matches); strict
  * sorts them after (it doesn't). Right rows must be unique per
  * (keys, rightTime) — pre-aggregate ties upstream, which also makes the
  * result deterministic.
  */
object AsOfJoin {
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
            leftTime: String, rightTime: String,
            rightCols: Seq[String], strict: Boolean = false,
            prefix: String = "asof_"): DataFrame = {
    val (ltag, rtag) = if (strict) (0, 1) else (1, 0)
    val rPrep = right.select(
        (keys.map(col) :+ col(rightTime).as("__t")) ++
        rightCols.map(c => col(c).as(s"__r_$c")): _*)
      .withColumn("__tag", lit(rtag))
    val lPrep = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(ltag))
    val u = lPrep.unionByName(rPrep, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withAsof = rightCols.foldLeft(u) { (df, c) =>
      df.withColumn(prefix + c, last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    withAsof.filter(col("__tag") === ltag)
      .drop("__t" +: "__tag" +: rightCols.map(c => s"__r_$c"): _*)
  }
}
