package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Relational
import TestSpark.{spark, sfDir}

/** Plan-shape assertions over the relational pack: the scale claims in the
  * Scaladoc (pushdown, broadcast) verified against the actual physical
  * plan at sf0.001.
  */
class RelationalSpec extends AnyFunSuite {

  private def planOf(q: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): String =
    q(spark, sfDir).queryExecution.executedPlan.toString

  test("q1: shipdate filter pushed to the parquet scan") {
    val plan = planOf(Relational.pricingSummary)
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushdown in:\n$plan")
  }

  test("q1: aggregation is partial (map-side combine before the shuffle)") {
    val plan = planOf(Relational.pricingSummary)
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"expected partial aggregation in:\n$plan")
  }

  test("q3: dimension join is broadcast, not shuffled") {
    val plan = planOf(Relational.shippingPriority)
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("q6: selective filters reach the scan and prune columns") {
    val df = Relational.forecastRevenue(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("l_discount"),
      s"discount filter not pushed:\n$plan")
    val read = "ReadSchema: [^\n]*".r.findFirstIn(plan).getOrElse("")
    assert(!read.contains("l_orderkey"),
      s"q6 must not read unused columns: $read")
  }

  test("entry flagship returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("topOrdersPerCustomer: heap reduce, not a window funnel") {
    val plan = Relational.topOrdersPerCustomer(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"per-group top-K must reduce via per-partition heaps:\n$plan")
    assert(plan.contains("ObjectHashAggregate") && plan.contains("collect_top_k"),
      s"per-group top-K must be the bounded-heap aggregate:\n$plan")
    assert(plan.contains("partial_collect_top_k"),
      s"heap aggregation must have a map-side partial stage:\n$plan")
    val rows = Relational.topOrdersPerCustomer(spark, sfDir).collect()
    val perKey = rows.groupBy(_.getLong(0)).values
    assert(perKey.forall(_.length <= 2), "at most k rows per customer")
    assert(rows.exists(_.getLong(1) == 2L), "second ranks exist")
  }

  test("TopKPerGroup equals the window formulation on skewed random data") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    val rnd = new scala.util.Random(1234)
    // heavy skew: group 0 holds ~80% of rows (the shape that kills a
    // window plan and used to bloat the collect_list buffer)
    val data = (1 to 5000).map { i =>
      val g = if (rnd.nextInt(5) > 0) 0L else rnd.nextInt(40).toLong
      (g, rnd.nextInt(1000).toDouble, i.toLong)
    }
    val df = data.toDF("g", "score", "id").repartition(8)
    val got = graft.ops.TopKPerGroup(df, Seq("g"), "score", 3, Seq("id"))
      .select("g", "rank", "score", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val w = Window.partitionBy(col("g"))
      .orderBy(col("score").desc, col("id").desc)
    val want = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("g", "rank", "score", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == want, "bounded-heap top-K must equal the rank-window result")
    // ascending variant agrees with the ascending window too
    val gotAsc = graft.ops.TopKPerGroup(df, Seq("g"), "score", 3, Seq("id"),
      ascending = true)
      .select("g", "rank", "score", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val wAsc = Window.partitionBy(col("g"))
      .orderBy(col("score").asc, col("id").asc)
    val wantAsc = df.withColumn("rank", row_number().over(wAsc).cast("long"))
      .filter(col("rank") <= 3)
      .select("g", "rank", "score", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(gotAsc == wantAsc)
  }

  test("TopKPerGroup buffer stays O(k) on a mega-group") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK
    import org.apache.spark.sql.types.LongType
    // feed 100k rows of one group straight into the aggregate buffer —
    // the collect_list formulation this replaced would hold all 100k
    val agg = new CollectTopK(BoundReference(0, LongType, nullable = false),
      5, false)
    val buf = agg.createAggregationBuffer()
    var i = 0L
    var updated = buf
    while (i < 100000L) { updated = agg.update(updated, InternalRow(i)); i += 1 }
    assert(updated.size == 5, s"buffer must be bounded at k, was ${updated.size}")
    assert(agg.eval(updated) != null)
    // and the retained set is the TOP 5 under the ordering (reverse=false)
    val kept = updated.iterator.map(_.asInstanceOf[Long]).toSet
    assert(kept == Set(99995L, 99996L, 99997L, 99998L, 99999L),
      s"reverse=false must keep the largest k, kept $kept")
  }

  test("saltedJoin: bucket in the join key, replication by explode, same rows") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // hot key 1 appears 900× with distinct payloads (rid) — the realistic
    // skew shape; byte-identical rows need an explicit spreadCol (below)
    val skewed = ((1 to 900).map(i => (1L, s"hot$i")) ++
      (1 to 100).map(i => (i.toLong + 1, s"cold$i"))).toDF("k", "tag")
      .repartition(6)
    val dim = (1 to 101).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    val joined = graft.ops.SaltedJoin(skewed, dim, Seq("k"), salt = 8)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"join must key on the salt bucket:\n$plan")
    assert(plan.contains("Generate") || plan.contains("explode"),
      s"the replicated side must explode over buckets:\n$plan")
    val got = joined.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    val want = skewed.join(dim, "k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(got == want, "salting must be invisible in the result set")
    // the hot key really spreads across buckets via the content hash
    import org.apache.spark.sql.functions.countDistinct
    val buckets = skewed.filter(col("k") === 1L)
      .select(graft.ops.SaltedJoin.bucket(skewed, 8).as("b"))
      .agg(countDistinct(col("b"))).collect()(0).getLong(0)
    assert(buckets > 1, s"hot key must spread across buckets, used $buckets")
  }

  test("saltedJoin: deterministic bucket, spreadCol, and joinType guard") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, countDistinct}
    // byte-identical duplicate rows + a unique id column: spreadCol
    // spreads them where the content hash cannot
    val dup = (1 to 400).map(i => (1L, "same", i.toLong)).toDF("k", "tag", "rid")
      .repartition(4)
    val contentBuckets = dup
      .select(graft.ops.SaltedJoin.bucket(dup.drop("rid"), 8).as("b"))
      .agg(countDistinct(col("b"))).collect()(0).getLong(0)
    assert(contentBuckets == 1L,
      "identical rows co-bucket under the content hash (the documented trade)")
    val spreadBuckets = dup
      .select(graft.ops.SaltedJoin.bucket(dup, 8, Some("rid")).as("b"))
      .agg(countDistinct(col("b"))).collect()(0).getLong(0)
    assert(spreadBuckets > 1L, s"spreadCol must spread, used $spreadBuckets")
    // replay-stability: the assignment is a pure function of row content,
    // so recomputing it (fresh plan, different partitioning) agrees row-for-row
    val a = dup.select(col("rid"), graft.ops.SaltedJoin.bucket(dup, 8, Some("rid")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = dup.repartition(9)
      .select(col("rid"), graft.ops.SaltedJoin.bucket(dup, 8, Some("rid")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b, "bucket assignment must be stable across recomputation")
    // spreadCol joins stay result-equivalent to the unsalted join
    val dim = Seq((1L, "d1")).toDF("k", "name")
    val saltedRows = graft.ops.SaltedJoin(dup, dim, Seq("k"), salt = 8,
      spreadCol = Some("rid")).count()
    assert(saltedRows == dup.join(dim, "k").count())
    // right/full joins would duplicate unmatched replicated rows — rejected
    for (bad <- Seq("right", "right_outer", "full", "full_outer", "cross")) {
      val e = intercept[IllegalArgumentException] {
        graft.ops.SaltedJoin(dup, dim, Seq("k"), salt = 8, joinType = bad)
      }
      assert(e.getMessage.contains("left-preserving"), s"$bad must be rejected")
    }
    // left-preserving types pass the guard and match their unsalted twin
    for (ok <- Seq("left", "left_semi", "left_anti")) {
      val got = graft.ops.SaltedJoin(dup, dim, Seq("k"), salt = 8, joinType = ok).count()
      assert(got == dup.join(dim, Seq("k"), ok).count(), s"$ok must match unsalted")
    }
    // unknown spreadCol fails fast
    val miss = intercept[IllegalArgumentException] {
      graft.ops.SaltedJoin(dup, dim, Seq("k"), salt = 8, spreadCol = Some("nope"))
    }
    assert(miss.getMessage.contains("spreadCol"))
  }

  test("saltedJoin: measuredSalt sizes to the skew; salt = 1 is the plain join") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val p = spark.sessionState.conf.numShufflePartitions
    // uniform keys: every key ~same count → maxShare·P rounds to 1
    val uniform = (1 to 2000).map(i => (i.toLong % 500, s"v$i")).toDF("k", "tag")
    assert(graft.ops.SaltedJoin.measuredSalt(uniform, Seq("k")) == 1)
    // one key owns ~90% of rows → salt ≈ 0.9·P, clamped to maxSalt
    val skewed = ((1 to 1800).map(i => (1L, s"hot$i")) ++
      (1 to 200).map(i => (i.toLong + 1, s"cold$i"))).toDF("k", "tag")
    val m = graft.ops.SaltedJoin.measuredSalt(skewed, Seq("k"))
    val expect = math.max(1, math.min(32, ((1800L * p + 1999L) / 2000L).toInt))
    assert(m == expect, s"salt must follow ceil(maxShare·P): got $m want $expect")
    assert(graft.ops.SaltedJoin.measuredSalt(skewed, Seq("k"), maxSalt = 4) ==
      math.min(4, expect))
    // the salt = 1 fast path IS the plain join: same rows, no salt plumbing
    val dim = (1 to 500).map(i => (i.toLong % 500, s"d$i")).toDF("k", "name")
      .dropDuplicates("k")
    val fast = graft.ops.SaltedJoin(uniform, dim, Seq("k"), salt = 1)
    assert(!fast.queryExecution.executedPlan.toString.contains("__salt"),
      "salt = 1 must skip the bucket/explode machinery")
    val got = fast.collect().map(_.toSeq).sortBy(_.toString).toSeq
    val want = uniform.join(dim, "k").collect()
      .map(_.toSeq).sortBy(_.toString).toSeq
    assert(got == want)
    // empty input: no rows to measure → 1, not a crash
    assert(graft.ops.SaltedJoin.measuredSalt(
      uniform.filter(col("k") < 0), Seq("k")) == 1)
  }

  test("cube: gid distinguishes super-aggregate NULLs; counts reconcile") {
    val rows = Relational.cubeVolume(spark, sfDir).collect()
    val grand = rows.filter(_.getLong(2) == 3L)
    assert(grand.length == 1 && grand.head.isNullAt(0) && grand.head.isNullAt(1))
    val detail = rows.filter(_.getLong(2) == 0L).map(_.getLong(4)).sum
    assert(grand.head.getLong(4) == detail,
      "grand total row count must equal the sum of detail rows")
    // each one-dim margin partitions the same universe
    assert(rows.filter(_.getLong(2) == 1L).map(_.getLong(4)).sum == detail)
    assert(rows.filter(_.getLong(2) == 2L).map(_.getLong(4)).sum == detail)
  }

  test("momentStats: matches the closed form on a tiny exact input") {
    val s = spark
    import s.implicits._
    // quantities 1..4 (mean 2.5, var_samp 5/3), price = 10*q (corr exactly 1)
    val li = Seq((1.0, 10.0, "A"), (2.0, 20.0, "A"), (3.0, 30.0, "A"), (4.0, 40.0, "A"))
      .toDF("l_quantity", "l_extendedprice", "l_returnflag")
    val stats = Relational.momentStatsOn(li).collect().head
    assert(stats.getLong(1) == 4L)
    assert(stats.getDouble(2) == 2.5)
    assert(math.abs(stats.getDouble(3) - 5.0 / 3.0) < 1e-12)
    assert(stats.getDouble(6) == 1.0, "perfectly linear price => corr 1")
    // degenerate groups: single row -> null moments; constant values ->
    // zero variance and null corr (guarded, not NaN/Infinity)
    val deg = Seq((7.0, 1.0, "S"), (3.0, 5.0, "C"), (3.0, 6.0, "C"))
      .toDF("l_quantity", "l_extendedprice", "l_returnflag")
    val byFlag = Relational.momentStatsOn(deg).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(byFlag("S").isNullAt(3) && byFlag("S").isNullAt(4) && byFlag("S").isNullAt(6),
      "n=1 group has no sample moments")
    assert(byFlag("C").getDouble(3) == 0.0 && byFlag("C").isNullAt(6),
      "constant quantity: zero variance, undefined correlation")
  }

  test("argmaxJoin: one agg per level, no rank window, nation broadcast") {
    val plan = planOf(Relational.argmaxJoin)
    assert(!plan.contains("Window"),
      s"argmax must be a struct-max aggregate, not a rank window:\n$plan")
    assert(plan.contains("partial_max"),
      s"struct-max must partial-aggregate map-side:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"nation must broadcast:\n$plan")
    val rows = Relational.argmaxJoin(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).distinct.length == rows.length,
      "exactly one row per nation")
    assert(rows.forall(_.getDouble(3) > 0))
  }

  test("approxPercentiles: single sketch pass, values within GK rank bound") {
    val plan = planOf(Relational.approxPercentiles)
    assert(plan.contains("partial_approx_percentile") ||
           plan.contains("partial_percentile_approx"),
      s"sketch must partial-aggregate map-side:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("collect_list"),
      s"approx percentile must not buffer group values:\n$plan")
    // one exchange total: partial sketch -> final merge, nothing else
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"expected exactly one shuffle in:\n$plan")
    val approx = Relational.approxPercentiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getLong(1))).toMap
    val exact = Relational.quantityPercentiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    // accuracy 10000 => rank error <= n/10000; quantities are integers
    // 1..50, so at sf0.001 (n per group ~1.5k < accuracy) GK is the exact
    // order statistic — within 1 of the interpolated exact median.
    approx.foreach { case (flag, (med, _)) =>
      assert(math.abs(med - exact(flag)) <= 1.0,
        s"flag $flag: approx median $med vs exact ${exact(flag)}")
    }
  }

  test("approxPercentilesChecked: gated guarantee rows all clean") {
    val rows = Relational.approxPercentilesChecked(spark, sfDir).collect()
    assert(rows.length == 9, "3 flags x 3 percentiles")
    rows.foreach { r =>
      assert(r.getBoolean(3), s"rank bound violated: $r")
      assert(r.getLong(2) > 0)
    }
  }

  test("approxDistinctChecked: gated guarantee rows all clean") {
    val rows = Relational.approxDistinctChecked(spark, sfDir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getBoolean(5) && r.getBoolean(6), s"bp bound violated: $r")
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
    }
  }

  test("approxDistinct: HLL single pass (no Expand), estimates within rsd") {
    val plan = planOf(Relational.approxDistinct)
    assert(!plan.contains("Expand"),
      s"HLL must not plan the distinct-agg Expand:\n$plan")
    assert(plan.contains("partial_approx_count_distinct"),
      s"HLL must partial-aggregate map-side:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"expected exactly one shuffle in:\n$plan")
    // the exact formulation DOES pay the Expand — the contrast is the point
    val exactPlan = planOf(Relational.aggDistinct)
    assert(exactPlan.contains("Expand"),
      s"exact countDistinct should Expand (else this spec tests nothing):\n$exactPlan")
    val approx = Relational.approxDistinct(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Relational.aggDistinct(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    approx.foreach { case (flag, (o, p)) =>
      val (eo, ep) = exact(flag)
      // rsd 1%; allow 5% headroom — estimate quality, not luck
      assert(math.abs(o - eo).toDouble / eo < 0.05, s"$flag orders: $o vs $eo")
      assert(math.abs(p - ep).toDouble / ep < 0.05, s"$flag parts: $p vs $ep")
    }
  }
}
