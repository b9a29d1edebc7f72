package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Cols.{q => Q}

/** dataset_checksum (reference standard_methods/a_dataset_checksum.py:47-127):
  * an order- and slicing-independent fingerprint of a dataset, used as the
  * e2e equality primitive.
  *
  * The reference md5s each row's canonical byte encoding, sorts digests per
  * slice, then md5s the concatenation. Sorting all digests doesn't
  * distribute (it is exactly the reference's "64 B RAM per line" ceiling,
  * a_dataset_checksum.py:35-36) — so we keep the per-row md5 but combine
  * with a commutative reduction instead: the SUM of the digest interpreted
  * as two 60-bit integers (exact DECIMAL(38,0) sums — no overflow until
  * ~10^20 rows). Sum is order/slicing independent, collision-resistant
  * enough for equality testing, map-side combinable, and constant-memory.
  *
  * `sort=false` (order-sensitive mode) folds an explicit order column into
  * each row's digest instead — same commutative combine, but any reorder
  * changes the sum.
  */
object DatasetChecksum {

  /** Canonical per-row digest: md5 over the JSON encoding of the selected
    * columns in sorted-name order (JSON gives unambiguous typed encoding +
    * null marking; reference canonicalizes json with sorted keys,
    * a_dataset_checksum.py:60-75).
    */
  private def rowDigest(df: DataFrame, columns: Seq[String], orderCol: Option[String]): Column = {
    val cols = (if (columns.nonEmpty) columns else df.columns.toSeq).sorted
    val payload = struct(cols.map(Q) ++ orderCol.map(Q).toSeq: _*)
    md5(to_json(payload))
  }

  /** One-row DataFrame: (sum_hi, sum_lo, lines). Equal datasets (as
    * multisets of rows) ⇒ equal checksums regardless of partitioning or
    * row order.
    */
  def apply(df: DataFrame, columns: Seq[String] = Nil, sort: Boolean = true,
            orderCol: Option[String] = None): DataFrame = {
    require(sort || orderCol.isDefined,
      "order-sensitive checksum needs an explicit order column")
    val digest = rowDigest(df, columns, if (sort) None else orderCol)
    val hi = conv(substring(digest, 1, 15), 16, 10).cast("decimal(38,0)")
    val lo = conv(substring(digest, 17, 15), 16, 10).cast("decimal(38,0)")
    df.select(hi.as("hi"), lo.as("lo"))
      .agg(sum(col("hi")).as("sum_hi"), sum(col("lo")).as("sum_lo"),
           count(lit(1)).as("lines"))
  }

  /** Scalar convenience for tests: (hi, lo, lines). */
  def value(df: DataFrame, columns: Seq[String] = Nil, sort: Boolean = true,
            orderCol: Option[String] = None): (BigDecimal, BigDecimal, Long) = {
    val r = apply(df, columns, sort, orderCol).collect()(0)
    (BigDecimal(r.getDecimal(0)), BigDecimal(r.getDecimal(1)), r.getLong(2))
  }

  /** dataset_checksum_chain (reference a_dataset_checksum_chain.py:36-51):
    * per-snapshot checksum combined over a chain — sums add.
    */
  def chain(dfs: Seq[DataFrame], columns: Seq[String] = Nil): (BigDecimal, BigDecimal, Long) =
    dfs.map(value(_, columns)).reduce { (a, b) =>
      (a._1 + b._1, a._2 + b._2, a._3 + b._3)
    }
}
