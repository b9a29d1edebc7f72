package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.KMeans
import TestSpark.spark

/** Driver-side models of the cluster-curation family — plain-collections
  * replications shared by KMeansSpec and SemDeDupSpec (the DuckDB oracle
  * is the third replication in the correctness gate).
  */
private[graft] object KMeansModel {

  def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def quantize(v: Seq[Double], quantShift: Int): Seq[Long] = {
    val scale = 1L << quantShift
    // through Float first: the table column is float32, like embeddings
    v.map(x => math.floor(x.toFloat.toDouble * scale).toLong)
  }

  private def argmin(qv: Seq[Long], mus: Array[Array[Long]],
                     fp: Long): (Long, Long) =
    mus.zipWithIndex.map { case (mu, j) =>
      (qv.zip(mu).map { case (a, b) => val d = a * fp - b; d * d }.sum, j.toLong)
    }.min

  /** Driver-side model of KMeans.fit — the final fixed-point centroid
    * matrix after the exact Lloyd iterations.
    */
  def fit(rows: Seq[(Long, Seq[Double])], k: Int, iters: Int,
          quantShift: Int = 6, fpShift: Int = 10): Array[Array[Long]] = {
    val fp = 1L << fpShift
    val q = rows.map { case (id, v) => id -> quantize(v, quantShift) }
    val seeds = q.sortBy { case (id, _) => (md5hex(id.toString), id) }.take(k).map(_._2)
    var mus = seeds.map(_.map(_ * fp).toArray).toArray
    def roundDiv(s: Long, cnt: Long): Long =
      if (s >= 0) (2 * fp * s + cnt) / (2 * cnt)
      else -((2 * fp * (-s) + cnt) / (2 * cnt))
    for (_ <- 0 until iters) {
      val byC = q.groupBy { case (_, qv) => argmin(qv, mus, fp)._2 }
      mus = mus.zipWithIndex.map { case (old, j) =>
        byC.get(j.toLong) match {
          case None => old
          case Some(members) =>
            val cnt = members.size.toLong
            old.indices.map(i => roundDiv(members.map(_._2(i)).sum, cnt)).toArray
        }
      }
    }
    mus
  }

  /** Driver-side model of KMeans.assignTo against a given matrix. */
  def assignTo(rows: Seq[(Long, Seq[Double])], mus: Array[Array[Long]],
               quantShift: Int = 6, fpShift: Int = 10): Map[Long, (Long, Long)] = {
    val fp = 1L << fpShift
    rows.map { case (id, v) =>
      val (d, c) = argmin(quantize(v, quantShift), mus, fp)
      id -> (c, d)
    }.toMap
  }

  /** Driver-side model of KMeans.fixedPoint — same quantization, init,
    * rounding, and tie-break, written against plain collections.
    */
  def model(rows: Seq[(Long, Seq[Double])], k: Int, iters: Int,
            quantShift: Int = 6, fpShift: Int = 10): Map[Long, (Long, Long)] =
    assignTo(rows, fit(rows, k, iters, quantShift, fpShift),
      quantShift, fpShift)

  /** Driver-side model of KMeans.assignedTwoLevel: level-1 model, then an
    * INDEPENDENT fit+assign per parent cluster (the grouped Spark
    * iteration is exactly per-parent-independent Lloyd). Leaf id =
    * c1*k2 + c2; dist is to the leaf centroid.
    */
  def twoLevel(rows: Seq[(Long, Seq[Double])], k1: Int, iters1: Int,
               k2: Int, iters2: Int, quantShift: Int = 6,
               fpShift: Int = 10): Map[Long, (Long, Long)] = {
    val a1 = model(rows, k1, iters1, quantShift, fpShift)
    rows.groupBy(r => a1(r._1)._1).flatMap { case (c1, members) =>
      val musSub = fit(members.toSeq, k2, iters2, quantShift, fpShift)
      assignTo(members.toSeq, musSub, quantShift, fpShift)
        .map { case (id, (c2, d)) => id -> (c1 * k2 + c2, d) }
    }
  }
}

/** Integer-exact k-means: Spark's result must equal [[KMeansModel]]. */
class KMeansSpec extends AnyFunSuite {
  import KMeansModel.model

  private def run(rows: Seq[(Long, Seq[Double])], k: Int, iters: Int): Map[Long, (Long, Long)] = {
    val s = spark
    import s.implicits._
    val df = rows.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    KMeans.fixedPoint(df, "id", "vec", k, iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  // deterministic pseudo-random vectors around c cluster centers
  private def blobs(n: Int, dim: Int, c: Int): Seq[(Long, Seq[Double])] =
    (0L until n).map { id =>
      val rnd = new scala.util.Random(id * 7919 + 13)
      val center = (id % c).toInt
      id -> Seq.tabulate(dim)(i =>
        (if (i % c == center) 0.4 else -0.1) + rnd.nextDouble() * 0.1)
    }

  test("matches the driver-side model on clustered data") {
    val rows = blobs(120, 16, 3)
    assert(run(rows, k = 5, iters = 3) == model(rows, k = 5, iters = 3))
  }

  test("matches the model when k exceeds the natural cluster count and iters=0") {
    val rows = blobs(40, 8, 2)
    // iters=0 gates the init draw alone (assignment against raw seeds)
    assert(run(rows, k = 7, iters = 0) == model(rows, k = 7, iters = 0))
  }

  test("duplicate points tie-break to the lowest cluster id") {
    // two identical seed candidates -> both centroids identical -> every
    // point equidistant from both; everything must land in the LOWER id
    val rows = (0L until 6L).map(id => id -> Seq.fill(4)(0.25))
    val got = run(rows, k = 2, iters = 2)
    assert(got.values.map(_._1).toSet == Set(0L))
    assert(got == model(rows, k = 2, iters = 2))
  }

  test("empty clusters carry their centroid; points stay assigned across iterations") {
    // one far outlier seeds a cluster that goes empty once the mass pulls
    // the other centroid closer; result must still match the model exactly
    val rows = (0L until 30L).map { id =>
      if (id == 17L) id -> Seq(10.0, 10.0, 10.0, 10.0)
      else id -> Seq.fill(4)(0.01 * id)
    }
    val (g, m) = (run(rows, k = 4, iters = 4), model(rows, k = 4, iters = 4))
    assert(g == m)
    assert(g.values.map(_._1).toSet.size >= 2) // outlier keeps its own cluster
  }

  test("two-level assignment matches the per-parent-independent model") {
    val s = spark
    import s.implicits._
    val rows = blobs(90, 12, 3)
    val df = rows.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    for ((k1, i1, k2, i2) <- Seq((3, 2, 2, 2), (4, 1, 3, 0), (2, 0, 5, 1))) {
      val got = KMeans.fixedPointTwoLevel(df, "id", "vec", k1, i1, k2, i2)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == KMeansModel.twoLevel(rows, k1, i1, k2, i2),
        s"k1=$k1 iters1=$i1 k2=$k2 iters2=$i2")
    }
    // sub-splitting really divides: leaf clusters are strictly more
    // numerous than parents on this multi-blob data
    val leaves = KMeansModel.twoLevel(rows, 3, 2, 2, 2).values.map(_._1).toSet
    assert(leaves.size > 3)
  }

  test("two-level handles parents smaller than k2 (ragged sub-matrices)") {
    val s = spark
    import s.implicits._
    // 5 points, k1=2 parents, k2=4 > any parent's size
    val rows = (0L until 5L).map(id => id -> Seq.fill(4)(id.toDouble))
    val df = rows.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    val got = KMeans.fixedPointTwoLevel(df, "id", "vec",
        k1 = 2, iters1 = 1, k2 = 4, iters2 = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == KMeansModel.twoLevel(rows, 2, 1, 4, 1))
  }

  test("clusters recover the planted structure on well-separated blobs") {
    val rows = blobs(90, 12, 3)
    val got = run(rows, k = 3, iters = 5)
    // every planted group (id % 3) maps to exactly one k-means cluster
    val planted = rows.map { case (id, _) => id -> id % 3 }.toMap
    val mapping = got.groupBy { case (id, _) => planted(id) }
      .view.mapValues(_.values.map(_._1).toSet).toMap
    assert(mapping.values.forall(_.size == 1))
    assert(mapping.values.flatten.toSet.size == 3)
  }
}
