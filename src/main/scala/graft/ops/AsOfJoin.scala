package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Cols.{q => Q}

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
    require(rightCols.nonEmpty, "as-of join needs at least one right column")
    val (ltag, rtag) = if (strict) (0, 1) else (1, 0)
    // ALL right payload columns travel in ONE struct: the struct is
    // non-null exactly for right rows (left rows get null via
    // allowMissingColumns), so a single last(ignoreNulls) carries the whole
    // matched row forward. Per-column last(ignoreNulls) would skip a NULL
    // field in the matched row (taking an older row's value) and could mix
    // values from different right rows — true as-of returns the matched
    // row verbatim, NULLs included.
    // a NULL rightTime satisfies no inequality — drop such rows, or they
    // sort first (asc = nulls first) and their payload would "match" every
    // left row that precedes the first real right row
    val rPrep = right.filter(col(rightTime).isNotNull).select(
        (keys.map(Q) :+ Q(rightTime).as("__t")) :+
        struct(rightCols.map(Q): _*).as("__rpay"): _*)
      .withColumn("__tag", lit(rtag))
    val lPrep = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(ltag))
    val u = lPrep.unionByName(rPrep, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(Q): _*)
      .orderBy(col("__t").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withAsof = u.withColumn("__pay", last(col("__rpay"), ignoreNulls = true).over(w))
    withAsof.filter(col("__tag") === ltag)
      .select(left.columns.map(Q).toSeq ++
        rightCols.map(c => col(s"__pay.$c").as(prefix + c)): _*)
  }
}
