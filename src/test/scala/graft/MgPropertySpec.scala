package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import graft.expr.MisraGriesAgg

/** Property tests for the Misra–Gries summary's aggregate algebra, driven
  * directly against update/merge/serialize (no Spark jobs): for ANY
  * stream, ANY partitioning of it, and ANY merge order, the summary keeps
  * the frequent-items guarantees. This is exactly the freedom Spark has
  * at scale — partition boundaries and partial-merge order are arbitrary.
  */
class MgPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], i: Int): A =
    g.pureApply(Gen.Parameters.default, Seed(1337L + i))

  // skewed token stream: a few heavy tokens over a long tail
  private val token: Gen[String] = Gen.frequency(
    (40, Gen.const("t0")), (20, Gen.const("t1")), (10, Gen.const("t2")),
    (30, Gen.choose(3, 60).map(i => s"t$i")))

  test("MG guarantees under random streams, partitionings, merge orders (300 cases)") {
    (0 until 300).foreach { i =>
      val n = sample(Gen.choose(50, 600), i * 7)
      val stream = sample(Gen.listOfN(n, token), i * 7 + 1)
      val k = sample(Gen.choose(2, 12), i * 7 + 2)
      val nParts = sample(Gen.choose(1, 8), i * 7 + 3)
      val agg = MisraGriesAgg(BoundReference(0, StringType, nullable = true), k)
      // random contiguous partitioning
      val cuts = sample(Gen.listOfN(nParts - 1, Gen.choose(0, n)), i * 7 + 4)
        .sorted
      val parts = (0 +: cuts :+ n).sliding(2).map {
        case Seq(a, b) => stream.slice(a, b)
      }.toVector
      val partials = parts.map { p =>
        val buf = p.foldLeft(agg.createAggregationBuffer()) { (b, t) =>
          agg.update(b, InternalRow(UTF8String.fromString(t)))
        }
        // shuffle boundary: every partial crosses serialization
        agg.deserialize(agg.serialize(buf))
      }
      // merge in a shuffled order
      val shuffled = new scala.util.Random(i).shuffle(partials)
      val merged = shuffled.reduceLeft(agg.merge)
      val got = merged.map { case (t, c) => t.toString -> c }.toMap
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val eps = n.toLong / (k + 1)
      assert(got.size <= k, s"case $i: ${got.size} entries exceed k=$k")
      exact.foreach { case (t, truth) =>
        if (truth > eps)
          assert(got.contains(t),
            s"case $i: frequent $t (n=$truth > eps=$eps, k=$k) missing")
      }
      got.foreach { case (t, est) =>
        val truth = exact(t)
        assert(est <= truth, s"case $i: $t est $est > true $truth")
        assert(truth - est <= eps,
          s"case $i: $t est $est under true $truth by more than $eps")
      }
    }
  }
}
