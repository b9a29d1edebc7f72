package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.SemDeDup
import TestSpark.spark

/** SemDeDup semantics against a driver-side model: the EXISTS drop rule is
  * priority-based, NOT survival-based — a row is dropped by any
  * higher-priority neighbor within tauSq even if that neighbor itself
  * drops. Priority = (dist-to-centroid DESC, id ASC).
  */
class SemDeDupSpec extends AnyFunSuite {
  import KMeansModel.{model, quantize, md5hex}

  /** Plain-collections replication of SemDeDup.semantic. */
  private def semModel(rows: Seq[(Long, Seq[Double])], k: Int, iters: Int,
                       tauSq: Long): Map[Long, (Long, Boolean)] = {
    val a = model(rows, k, iters) // id -> (cluster, dist)
    val q = rows.map { case (id, v) => id -> quantize(v, 6) }.toMap
    def d2(x: Long, y: Long): Long =
      q(x).zip(q(y)).map { case (p, r) => val d = p - r; d * d }.sum
    rows.map { case (xid, _) =>
      val (xc, xd) = a(xid)
      val dropped = rows.exists { case (yid, _) =>
        yid != xid && a(yid)._1 == xc && {
          val yd = a(yid)._2
          (yd > xd || (yd == xd && yid < xid)) && d2(xid, yid) <= tauSq
        }
      }
      xid -> (xc, !dropped)
    }.toMap
  }

  private def run(rows: Seq[(Long, Seq[Double])], k: Int, iters: Int,
                  tauSq: Long): Map[Long, (Long, Boolean)] = {
    val s = spark
    import s.implicits._
    val df = rows.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    SemDeDup.semantic(df, "id", "vec", k, iters, tauSq)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
  }

  private def blobs(n: Int, dim: Int, c: Int): Seq[(Long, Seq[Double])] =
    (0L until n).map { id =>
      val rnd = new scala.util.Random(id * 7919 + 13)
      val center = (id % c).toInt
      id -> Seq.tabulate(dim)(i =>
        (if (i % c == center) 0.4 else -0.1) + rnd.nextDouble() * 0.1)
    }

  test("semanticHierarchical matches the drop rule over the two-level assignment") {
    val s = spark
    import s.implicits._
    val rows = blobs(80, 12, 3)
    val (k1, i1, k2, i2, tau) = (3, 2, 2, 1, 2000L)
    val df = rows.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    val got = SemDeDup.semanticHierarchical(df, "id", "vec", k1, i1, k2, i2, tau)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // model: same EXISTS rule as semModel, over the two-level leaves
    val a = KMeansModel.twoLevel(rows, k1, i1, k2, i2)
    val q = rows.map { case (id, v) => id -> quantize(v, 6) }.toMap
    def d2(x: Long, y: Long): Long =
      q(x).zip(q(y)).map { case (p, r) => val d = p - r; d * d }.sum
    val want = rows.map { case (xid, _) =>
      val (xc, xd) = a(xid)
      val dropped = rows.exists { case (yid, _) =>
        yid != xid && a(yid)._1 == xc && {
          val yd = a(yid)._2
          (yd > xd || (yd == xd && yid < xid)) && d2(xid, yid) <= tau
        }
      }
      xid -> (xc, !dropped)
    }.toMap
    assert(got == want)
    // the sub-split gate: same data, same bound — flat k=3 trips it, the
    // hierarchical split passes because every leaf is a fraction of its
    // parent (the constructive fix the operator exists for)
    val bound = rows.size / 3 - 5L
    intercept[IllegalArgumentException] {
      SemDeDup.semantic(df, "id", "vec", k = 3, iters = 2, tauSq = tau,
        maxClusterSize = bound)
    }
    assert(SemDeDup.semanticHierarchical(df, "id", "vec", k1 = 3, iters1 = 2,
      k2 = 3, iters2 = 2, tauSq = tau, maxClusterSize = bound).count() == rows.size)
  }

  test("curate: end-to-end composition matches the staged model") {
    val s = spark
    import s.implicits._
    val rows = blobs(90, 12, 3)
    val (k, iters, tau, keepNum, keepDen, n) = (4, 2, 2000L, 1, 2, 3)
    val df = rows.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    val got = SemDeDup.curate(df, "id", "vec", k, iters, tau,
        keepNum, keepDen, n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // staged model: semantic survivors -> prune window -> sample window
    val a = model(rows, k, iters)
    val sem = semModel(rows, k, iters, tau)
    val surv = rows.map(_._1).filter(id => sem(id)._2)
    val pruned = surv.groupBy(id => a(id)._1).toSeq.flatMap { case (_, ids) =>
      val ordered = ids.sortBy(id => (-a(id)._2, id))
      ordered.take(((ordered.size * keepNum + keepDen - 1) / keepDen).toInt)
    }
    val want = pruned.groupBy(id => a(id)._1).toSeq.flatMap { case (_, ids) =>
      ids.sortBy(id => (md5hex(id.toString), id)).take(n)
    }.map(id => (id, a(id)._1, a(id)._2)).toSet
    assert(got == want)
  }

  test("curate: embeddings cross an exchange at most once (the pair join)") {
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}
    val s = spark
    val emb = s.read.parquet(TestSpark.sfDir + "/embeddings.parquet")
    val prev = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SemDeDup.curate(emb, "vec_id", "embedding",
          k = 4, iters = 1, tauSq = 6500L, keepNum = 3, keepDen = 4, n = 5)
        .queryExecution.executedPlan
      val exchanges = plan.collect { case e: Exchange => e }
      assert(exchanges.nonEmpty)
      // the raw float embeddings never shuffle — quantization is scan-side
      for (e <- exchanges; f <- e.child.schema.fields)
        assert(f.dataType != ArrayType(FloatType, containsNull = true) &&
          f.dataType != ArrayType(FloatType, containsNull = false),
          s"float embedding column '${f.name}' would be shuffled")
      // the quantized vectors cross only the cluster-keyed pair join
      // (its two sides); the prune/sample windows carry ids+dist only
      val vectorExchanges = exchanges.count(_.child.schema.fields.exists(f =>
        f.dataType == ArrayType(LongType, containsNull = true) ||
          f.dataType == ArrayType(LongType, containsNull = false)))
      assert(vectorExchanges <= 2,
        s"quantized vectors cross $vectorExchanges exchanges:\n$plan")
    } finally s.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("cluster-size gate fails fast on an oversized cluster") {
    val s = spark
    import s.implicits._
    val rows = blobs(40, 12, 3)
    val df = rows.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    // k=1 forces one 40-row mega-cluster; a bound of 10 must trip the gate
    val ex = intercept[IllegalArgumentException] {
      SemDeDup.semantic(df, "id", "vec", k = 1, iters = 1, tauSq = 100L,
        maxClusterSize = 10L)
    }
    assert(ex.getMessage.contains("maxClusterSize=10"))
    assert(ex.getMessage.contains("O(c^2)"))
    // the same degenerate fit passes when the bound admits it
    assert(SemDeDup.semantic(df, "id", "vec", k = 1, iters = 1, tauSq = 100L,
      maxClusterSize = 40L).count() == 40)
    // incremental gates the batch side identically
    val mus = graft.ops.KMeans.fit(df, "id", "vec", k = 1, iters = 1)
    val exInc = intercept[IllegalArgumentException] {
      SemDeDup.incremental(df, df.limit(0).select(col("id"),
          org.apache.spark.sql.functions.lit(0L).as("cluster"),
          org.apache.spark.sql.functions.array().cast("array<long>").as("q")),
        mus, "id", "vec", tauSq = 100L, maxClusterSize = 10L)
    }
    assert(exInc.getMessage.contains("batch"))
  }

  test("matches the model across thresholds") {
    val rows = blobs(80, 12, 3)
    for (tau <- Seq(0L, 200L, 2000L, Long.MaxValue / 4))
      assert(run(rows, k = 4, iters = 2, tau) == semModel(rows, k = 4, iters = 2, tau))
  }

  test("drop-by-dropped: the EXISTS rule uses priority, not survival") {
    // md5("1") < md5("2") < md5("0") < md5("3"), so with k=1, iters=0 the
    // centroid is id 1's vector. Values 0/2/4 on a line, tau = one step:
    // priority (far-from-centroid first) is id3 > id2 > id1; id2 drops via
    // id3, id1 drops via id2 EVEN THOUGH id2 itself dropped. kept = {id3}.
    assert(md5hex("1") < md5hex("2") && md5hex("2") < md5hex("0"))
    val rows = Seq(1L -> Seq(0.0), 2L -> Seq(2.0), 3L -> Seq(4.0))
    val tau = 128L * 128L // (2 * 2^6)^2 — exactly one step
    val got = run(rows, k = 1, iters = 0, tau)
    assert(got == semModel(rows, k = 1, iters = 0, tau))
    assert(got.view.mapValues(_._2).toMap == Map(1L -> false, 2L -> false, 3L -> true))
  }

  test("tauSq huge keeps exactly the top-priority row per cluster") {
    val rows = blobs(60, 8, 2)
    val got = run(rows, k = 3, iters = 2, Long.MaxValue / 4)
    val byCluster = got.groupBy(_._2._1)
    assert(byCluster.values.forall(_.count(_._2._2) == 1))
    assert(got == semModel(rows, k = 3, iters = 2, Long.MaxValue / 4))
  }

  test("tauSq=0 drops only exact quantized duplicates, higher id loses ties") {
    val rows = blobs(30, 6, 2) ++ Seq(100L -> Seq.fill(6)(0.2), 101L -> Seq.fill(6)(0.2))
    val got = run(rows, k = 2, iters = 1, 0L)
    assert(got == semModel(rows, k = 2, iters = 1, 0L))
    assert(got(100L)._2 && !got(101L)._2) // equal dist: lower id has priority
  }

  test("the pair join is an equi-join on cluster, never a cartesian") {
    val rows = blobs(40, 8, 2)
    val s = spark
    import s.implicits._
    val df = rows.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    val plan = SemDeDup.semantic(df, "id", "vec", k = 3, iters = 1, tauSq = 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "within-cluster pairing must hash on the cluster key")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "the priority+distance predicates must ride an equi-join, not a nested loop")
  }

  test("prototypePrune keeps the ceil-fraction farthest rows per cluster") {
    val rows = blobs(50, 8, 2)
    val s = spark
    import s.implicits._
    val df = rows.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    val got = SemDeDup.prototypePrune(df, "id", "vec", k = 3, iters = 2,
        keepNum = 3, keepDen = 10)
      .collect().map(r => r.getLong(0)).toSet
    val a = model(rows, k = 3, iters = 2)
    val expect = a.groupBy(_._2._1).flatMap { case (_, members) =>
      val keep = (members.size * 3 + 9) / 10
      members.toSeq.sortBy { case (id, (_, d)) => (-d, id) }.take(keep).map(_._1)
    }.toSet
    assert(got == expect)
    // the cutoff is ceil: a 1-row cluster with any nonzero fraction keeps its row
    val one = Seq(0L -> Seq.fill(4)(0.1))
    val df1 = one.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    assert(SemDeDup.prototypePrune(df1, "id", "vec", 1, 0, 1, 10).count() == 1L)
  }

  /** Plain-collections replication of SemDeDup.incremental. */
  private def incModel(hist: Seq[(Long, Seq[Double])],
                       batch: Seq[(Long, Seq[Double])], k: Int, iters: Int,
                       tauSq: Long): Map[Long, (Long, Boolean)] = {
    val mus = KMeansModel.fit(hist, k, iters)
    val ah = KMeansModel.assignTo(hist, mus)
    val ab = KMeansModel.assignTo(batch, mus)
    val qAll = (hist ++ batch).map { case (id, v) => id -> quantize(v, 6) }.toMap
    def d2(x: Long, y: Long): Long =
      qAll(x).zip(qAll(y)).map { case (p, r) => val d = p - r; d * d }.sum
    batch.map { case (xid, _) =>
      val (xc, xd) = ab(xid)
      val hDrop = hist.exists { case (hid, _) =>
        ah(hid)._1 == xc && d2(xid, hid) <= tauSq
      }
      val bDrop = batch.exists { case (yid, _) =>
        yid != xid && ab(yid)._1 == xc && {
          val yd = ab(yid)._2
          (yd > xd || (yd == xd && yid < xid)) && d2(xid, yid) <= tauSq
        }
      }
      xid -> (xc, !(hDrop || bDrop))
    }.toMap
  }

  private def runInc(hist: Seq[(Long, Seq[Double])],
                     batch: Seq[(Long, Seq[Double])], k: Int, iters: Int,
                     tauSq: Long): Map[Long, (Long, Boolean)] = {
    val s = spark
    import s.implicits._
    def df(rows: Seq[(Long, Seq[Double])]) = rows.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    val mus = graft.ops.KMeans.fit(df(hist), "id", "vec", k, iters)
    val h = graft.ops.KMeans.assignTo(df(hist), "id", "vec", mus)
    SemDeDup.incremental(df(batch), h, mus, "id", "vec", tauSq)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
  }

  test("incremental matches the model; centroids frozen to the history fit") {
    val all = blobs(90, 10, 3)
    val (hist, batch) = all.partition { case (id, _) => id % 5 != 0 }
    for (tau <- Seq(0L, 500L, 5000L))
      assert(runInc(hist, batch, k = 4, iters = 2, tau) ==
        incModel(hist, batch, k = 4, iters = 2, tau))
  }

  test("incremental: history always wins, even over the top-priority batch row") {
    // batch row 100 duplicates history row 1 exactly -> dropped by history
    // at tau=0 regardless of its within-batch priority; batch row 101 is
    // far from everything -> kept.
    val hist = (1L to 8L).map(id => id -> Seq.fill(4)(0.01 * id))
    val batch = Seq(100L -> Seq.fill(4)(0.01), 101L -> Seq.fill(4)(0.9))
    val got = runInc(hist, batch, k = 2, iters = 2, tauSq = 0L)
    assert(got == incModel(hist, batch, k = 2, iters = 2, tauSq = 0L))
    assert(!got(100L)._2 && got(101L)._2)
  }

  test("clusterReport aggregates the model assignment exactly") {
    val rows = blobs(60, 8, 3)
    val s = spark
    import s.implicits._
    val df = rows.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    val got = SemDeDup.clusterReport(df, "id", "vec", k = 4, iters = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val a = model(rows, k = 4, iters = 2)
    val expect = a.groupBy(_._2._1).map { case (c, members) =>
      val ds = members.values.map(_._2)
      c -> (members.size.toLong, ds.sum, ds.max, members.keys.min)
    }
    assert(got == expect)
  }

  test("clusterSample draws n per cluster in (md5, id) order") {
    val rows = blobs(50, 8, 2)
    val s = spark
    import s.implicits._
    val df = rows.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    val got = SemDeDup.clusterSample(df, "id", "vec", k = 3, iters = 2, n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = model(rows, k = 3, iters = 2)
    val expect = a.groupBy(_._2._1).flatMap { case (c, members) =>
      members.keys.toSeq.sortBy(id => (md5hex(id.toString), id)).take(4)
        .map(_ -> c)
    }
    assert(got == expect)
    assert(got.groupBy(_._2).values.forall(_.size <= 4))
  }
}
