package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampType, TimestampNTZType, DateType}

/** dataset_sort (reference standard_methods/a_dataset_sort.py:50-222).
  *
  * Semantics carried over:
  *  - stable sort by 1+ columns asc/desc; stability is achieved by a
  *    trailing tiebreak on a row-identity column when provided (the
  *    reference sorts a row-index array; Spark's sort is not stable, so the
  *    explicit tiebreak makes determinism a *property of the plan*)
  *  - None sorts smallest, except datetime-family where None sorts largest
  *    (a_dataset_sort.py:60-80); NaN sorts largest (Spark native: NaN >
  *    +Inf, same as the reference's filter_unsortable placement)
  *  - default sorts **within slices** → `sortWithinPartitions` (no shuffle,
  *    exactly the reference's per-slice sort)
  *  - `sort_across_slices` → global `orderBy` (Spark range-partitions via
  *    sampling — the distributed equivalent of the reference's single-node
  *    merge, and unlike the reference it spills instead of OOMing)
  *  - `trigger_column` (keep equal values in one slice) →
  *    `repartitionByRange` on the trigger column before the sort.
  */
object DatasetSort {
  final case class SortCol(name: String, asc: Boolean = true)

  private def orderExpr(df: DataFrame, sc: SortCol): Column = {
    val dt = df.schema(sc.name).dataType
    val nullsLargest = dt match {
      case TimestampType | TimestampNTZType | DateType => true
      case _ => false
    }
    // Q, not col(): sort columns are USER names — dots/backticks must be
    // taken literally (HostileSchemaPropertySpec found the raw version)
    val c = graft.core.Cols.q(sc.name)
    (sc.asc, nullsLargest) match {
      case (true, false)  => c.asc_nulls_first
      case (true, true)   => c.asc_nulls_last
      case (false, false) => c.desc_nulls_last
      case (false, true)  => c.desc_nulls_first
    }
  }

  def apply(
      df: DataFrame,
      by: Seq[SortCol],
      acrossSlices: Boolean = false,
      stableTiebreak: Option[String] = None,
      triggerColumn: Option[String] = None): DataFrame = {
    val order = by.map(orderExpr(df, _)) ++
      stableTiebreak.map(c => graft.core.Cols.q(c).asc).toSeq
    triggerColumn match {
      case Some(t) =>
        // trigger semantics (a_dataset_sort.py:132-184): globally sorted,
        // but rows with EQUAL trigger values never straddle a slice
        // boundary. repartitionByRange puts each trigger value in exactly
        // one partition (range partitioner boundaries are between distinct
        // values); the within-partition sort then orders rows without
        // re-shuffling — a global orderBy here would range-partition by the
        // sort columns and throw the trigger partitioning away.
        require(by.nonEmpty && by.head.name == t,
          s"trigger_column '$t' must be the leading sort column")
        df.repartitionByRange(orderExpr(df, by.head))
          .sortWithinPartitions(order: _*)
      case None =>
        if (acrossSlices) df.orderBy(order: _*)
        else df.sortWithinPartitions(order: _*)
    }
  }
}
