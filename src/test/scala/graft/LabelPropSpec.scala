package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.LabelProp
import TestSpark.spark

/** Clamped majority-vote label propagation. The driver's oracle
  * (gr_knn_labelprop) pins the full k-NN composition Spark↔DuckDB; this
  * spec is the third replication on a hand graph plus the clamping and
  * tie-determinism laws.
  */
class LabelPropSpec extends AnyFunSuite {
  import spark.implicits._

  /** Plain-Scala replication of the exact iteration. */
  private def ref(nodes: Seq[(Long, Option[Int])], edges: Seq[(Long, Long)],
                  iters: Int): Map[Long, Option[Int]] = {
    val e = edges.distinct
    val seed = nodes.toMap
    var lbl = seed
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2)
      lbl = nodes.map { case (v, sl) =>
        v -> (sl match {
          case Some(_) => sl
          case None =>
            val votes = in.getOrElse(v, Nil)
              .flatMap { case (u, _) => lbl(u) }
              .groupBy(identity).view.mapValues(_.size).toSeq
            if (votes.isEmpty) lbl(v)
            else Some(votes.minBy { case (l, c) => (-c, l) }._1)
        })
      }.toMap
    }
    lbl
  }

  // two seed islands (label 1 at node 1, label 2 at node 6), a contested
  // node (4: one vote each — tie must go to the SMALLER label), and an
  // unreachable node (9 → 10 with no labeled ancestor)
  private val nodes: Seq[(Long, Option[Int])] = Seq(
    1L -> Some(1), 2L -> None, 3L -> None, 4L -> None, 5L -> None,
    6L -> Some(2), 7L -> None, 9L -> None, 10L -> None)
  private val edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L), (7L, 4L), (6L, 5L), (9L, 10L),
    (1L, 2L)) // duplicate edge must collapse

  private def run(iters: Int): Map[Long, Option[Int]] = {
    val ndf = nodes.map { case (v, s) => (v, s.map(Integer.valueOf).orNull) }
      .toDF("v", "seed_lbl")
    LabelProp.propagate(ndf, edges.toDF("src", "dst"), iters)
      .as[(Long, Option[Int])].collect().toMap
  }

  test("propagation replays the plain-collections model") {
    for (it <- Seq(1, 3)) assert(run(it) == ref(nodes, edges, it), s"iters=$it")
  }

  test("laws: seeds clamp, ties break to the smaller label, unreached stay null") {
    val r = run(3)
    assert(r(1L).contains(1) && r(6L).contains(2))
    // node 4 hears label 1 (via 3) and label 2 (via 7) with one vote each
    assert(r(4L).contains(1))
    assert(r(10L).isEmpty && r(9L).isEmpty)
  }

  test("contract: iteration count validated") {
    intercept[IllegalArgumentException] {
      LabelProp.propagate(Seq((1L, 1)).toDF("v", "seed_lbl"),
        Seq((1L, 1L)).toDF("src", "dst"), 0)
    }
  }
}
