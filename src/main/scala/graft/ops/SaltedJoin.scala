package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salted equi-join: when one join key dominates (a hot customer, a
  * null-ish default id, one viral document), a plain shuffle join funnels
  * that key's every row through ONE reducer — the canonical 100 TB
  * stall. Salting splits the hot key across `salt` buckets: the skewed
  * side gets a per-row bucket (deterministic hash of the whole row, so
  * any one key's rows spread across buckets), the other side is
  * replicated to ALL buckets (explode over 0..salt-1), and the join key
  * becomes (keys, bucket). Same result set as the unsalted join, by
  * construction: every (skewed-row, other-row) key match still meets in
  * exactly one bucket.
  *
  * When to use: Spark's AQE skew-join splitting (on by default) already
  * rescues sort-merge joins at runtime — reach for explicit salting when
  * AQE cannot see or split the skew: broadcast-ineligible hash joins
  * feeding further same-key stages, skew inside a single huge task, or a
  * deterministic layout requirement. Cost: the replicated side scans
  * `salt`× — size it as (hot-key rows / healthy-partition rows), usually
  * 4-32, and keep the REPLICATED side the smaller input.
  */
object SaltedJoin {

  /** Per-row salt bucket: hash of the whole row MIXED with the row's
    * position id. The position term is what spreads a hot key whose rows
    * are byte-identical duplicates (dedup'd corpora still carry them) —
    * row-content hashing alone would send every copy to one bucket and
    * re-create the hot partition. Join correctness does not depend on
    * WHICH bucket a row gets (the other side meets it in all of them), so
    * the partition-layout dependence of monotonically_increasing_id is
    * harmless.
    */
  private[graft] def bucket(df: DataFrame, salt: Int): Column =
    pmod(hash(struct(df.columns.toIndexedSeq.map(col): _*), monotonically_increasing_id()),
      lit(salt))

  def apply(skewed: DataFrame, other: DataFrame, keys: Seq[String],
            salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    require(keys.nonEmpty, "need at least one join key")
    val bucketed = skewed.withColumn("__salt", bucket(skewed, salt))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bucketed.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
