package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Rrf
import TestSpark.spark

/** Reciprocal-rank fusion. The driver's oracle (rt_hybrid_rrf) pins the
  * full hybrid pipeline Spark↔DuckDB; this spec pins the fusion operator
  * alone against a plain-collections replication and its contract checks.
  */
class RrfSpec extends AnyFunSuite {
  import spark.implicits._

  private val fp = 1L << 20
  private val k0 = 60L

  test("fuse replays the plain-collections RRF algebra") {
    val l1 = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 10L, 2L))
    val l2 = Seq((1L, 11L, 1L), (1L, 13L, 2L), (2L, 10L, 1L))
    val out = Rrf.fuse(
        Seq(l1.toDF("qid", "id", "rank"), l2.toDF("qid", "id", "rank")),
        "qid", "id", "rank", k = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq

    val ref = (l1 ++ l2).groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(t => fp / (k0 + t._3)).sum).toSeq
      .map { case ((qid, id), s) => (qid, id, s) }
      .groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
        rows.sortBy(r => (-r._3, -r._2)).take(3).zipWithIndex
          .map { case ((_, id, s), i) => (qid, (i + 1).toLong, id, s) }
      }
    assert(out.sortBy(r => (r._1, r._2)) == ref.sortBy(r => (r._1, r._2)))
  }

  test("a doc ranked by both legs beats the same single-leg rank") {
    // id 5 at rank 2 in BOTH lists must outrank id 6 at rank 2 in one.
    val l1 = Seq((1L, 4L, 1L), (1L, 5L, 2L), (1L, 6L, 3L))
    val l2 = Seq((1L, 7L, 1L), (1L, 5L, 2L), (1L, 6L, 3L))
    val out = Rrf.fuse(
        Seq(l1.toDF("qid", "id", "rank"), l2.toDF("qid", "id", "rank")),
        "qid", "id", "rank", k = 4)
      .as[(Long, Long, Long, Long)].collect()
    val rankOf = out.map(r => r._3 -> r._2).toMap
    assert(rankOf(5L) < rankOf(6L))
  }

  test("contract: empty list and bad params rejected") {
    intercept[IllegalArgumentException] {
      Rrf.fuse(Nil, "qid", "id", "rank", k = 3)
    }
    intercept[IllegalArgumentException] {
      Rrf.fuse(Seq(Seq((1L, 1L, 1L)).toDF("qid", "id", "rank")),
        "qid", "id", "rank", k = 3, fpShift = 0)
    }
  }
}
