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
  *
  * Join-type contract: the construction preserves the SKEWED (left) side
  * only. inner/left/left_semi/left_anti are result-equivalent to the
  * unsalted join; right/full/right_semi/right_anti would emit each
  * unmatched `other` row once per salt replica (it was exploded ×salt),
  * so they are rejected — to preserve the small side, swap the arguments
  * (the replicated side should be the smaller input anyway) and use a
  * left-preserving type.
  */
object SaltedJoin {

  /** Left-preserving types for which salting is result-equivalent to the
    * unsalted join (Spark's accepted spellings).
    */
  private val safeJoinTypes: Set[String] = Set(
    "inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti")

  /** Canonical spellings for the error message (each accepted modulo
    * case and underscores, e.g. "left_semi" normalizes to "leftsemi").
    */
  private val safeJoinTypeNames = "inner, left_outer, left_semi, left_anti"

  /** Per-row salt bucket: a DETERMINISTIC hash of the whole row, plus the
    * caller's `spreadCol` when given. Determinism matters at cluster
    * scale: a nondeterministic term (monotonically_increasing_id, rand)
    * in a shuffle key re-assigns rows when a map task is recomputed after
    * a fetch failure — the SPARK-23207 class of bug, where reducers that
    * already fetched the old assignment lose or duplicate rows. Content
    * hashing recomputes identically on retry.
    *
    * The trade: rows that are BYTE-IDENTICAL duplicates of each other
    * hash to one bucket. Hot keys almost always carry distinct payload
    * columns (line numbers, timestamps, doc ids) and spread fine; for a
    * corpus that genuinely repeats visible rows, first attach a unique-id
    * column (e.g. a source row number carried from import) and name it as
    * `spreadCol` — the bucket then hashes ONLY that id, which is both
    * cheaper than hashing a wide row and uniformly spreading, while
    * staying replay-stable because the id is real data, not a
    * position-derived expression.
    */
  private[graft] def bucket(df: DataFrame, salt: Int,
                            spreadCol: Option[String] = None): Column = {
    val terms = spreadCol.map(c => IndexedSeq(col(c)))
      .getOrElse(df.columns.toIndexedSeq.map(col))
    pmod(hash(struct(terms: _*)), lit(salt))
  }

  def apply(skewed: DataFrame, other: DataFrame, keys: Seq[String],
            salt: Int, joinType: String = "inner",
            spreadCol: Option[String] = None): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    require(keys.nonEmpty, "need at least one join key")
    val jt = joinType.toLowerCase.replace("_", "")
    require(safeJoinTypes.contains(jt),
      s"SaltedJoin supports left-preserving join types only " +
        s"($safeJoinTypeNames); got '$joinType'. " +
        "For right-preservation swap the arguments: the replicated side " +
        "should be the smaller input.")
    spreadCol.foreach { c =>
      require(skewed.columns.contains(c),
        s"spreadCol '$c' is not a column of the skewed side " +
          s"(has ${skewed.columns.mkString(", ")})")
    }
    // salt = 1 degenerates to the plain join (every row lands in bucket
    // 0); skip the machinery so a measured no-skew verdict costs nothing:
    // no row-hash projection, no explode, no extra join key (r21 —
    // measuredSalt returns 1 on uniform keys).
    if (salt == 1) skewed.join(other, keys, joinType)
    else {
      val bucketed = skewed.withColumn("__salt", bucket(skewed, salt, spreadCol))
      val replicated = other.withColumn("__salt",
        explode(sequence(lit(0), lit(salt - 1))))
      bucketed.join(replicated, keys :+ "__salt", joinType).drop("__salt")
    }
  }

  /** Size the salt from MEASURED key skew instead of a constant — the
    * Scaladoc's own sizing rule ("hot-key rows / healthy-partition
    * rows", guide §2.5) computed from the data: one narrow
    * (keys-only, optionally sampled) pass over the skewed side gives the
    * hottest key's row share; a healthy partition holds total/P rows, so
    *
    *   salt = ceil(maxKeyRows / (total / P)) = ceil(maxShare · P)
    *
    * clamped to [1, maxSalt]. Uniform keys → 1 (and [[apply]]'s salt = 1
    * path is then the plain join — AQE's runtime skew splitting remains
    * the safety net for residual skew a static decision can't see);
    * one key owning the table → P (one bucket per reducer), never more
    * than maxSalt (the replication factor is a real cost on the other
    * side — §2.5's "usually 4-32").
    *
    * The measurement costs one pass over the key columns only (column
    * pruning keeps the scan narrow; `sampleFraction` < 1 cuts it
    * further — salt affects PERFORMANCE only, never results, so a
    * sampling estimate is always safe). The driver sees one aggregated
    * row. Deterministic for a fixed input/seed; and because every salt
    * value yields the same join result, retry/replay concerns do not
    * apply to the sizing at all.
    */
  def measuredSalt(skewed: DataFrame, keys: Seq[String],
                   maxSalt: Int = 32,
                   sampleFraction: Double = 1.0): Int = {
    require(keys.nonEmpty, "need at least one join key")
    require(maxSalt >= 1, s"maxSalt must be >= 1, got $maxSalt")
    require(sampleFraction > 0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    val ks = skewed.select(keys.map(col): _*)
    val sampled =
      if (sampleFraction < 1.0) ks.sample(withReplacement = false,
        sampleFraction, seed = 9261L)
      else ks
    val row = sampled.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx"), sum(col("n")).as("tot"))
      .head()
    if (row.isNullAt(0) || row.getLong(1) == 0L) 1
    else {
      val p = skewed.sparkSession.sessionState.conf.numShufflePartitions
      val mx = row.getLong(0)
      val tot = row.getLong(1)
      // ceil(mx · P / tot) without floats
      val s = ((mx * p + tot - 1) / tot).toInt
      math.max(1, math.min(maxSalt, s))
    }
  }
}
