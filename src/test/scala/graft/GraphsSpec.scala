package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Graphs
import TestSpark.spark

/** Graph profiling: triangle census replication on hand graphs. */
class GraphsSpec extends AnyFunSuite {
  import spark.implicits._

  private def stats(edges: Seq[(Long, Long)]): (Long, Long, Long) =
    Graphs.triangleStats(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long, Long)].collect().head

  test("triangle census replays the closed-form counts") {
    // K4: 4 triangles, every vertex degree 3 -> wedges 4*3 = 12, cc = 1
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a != b) yield (a, b)
    assert(stats(k4) == (4L, 12L, 10000L))
    // a 4-path: 0 triangles, 2 wedges, cc 0
    assert(stats(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == (0L, 2L, 0L))
    // triangle + pendant: 1 triangle, wedges = 1+1+3 = 5, cc = 3/5
    val tp = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    assert(stats(tp) == (1L, 5L, 6000L))
  }

  test("direction, duplicates and self-loops do not perturb the census") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val noisy = base ++ base.map(_.swap) ++ Seq((1L, 2L), (2L, 2L))
    assert(stats(noisy) == stats(base))
  }
}
