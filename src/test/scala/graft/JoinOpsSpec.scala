package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{AsOfJoin, RangeJoin}
import TestSpark.spark

/** As-of and range join operator semantics. */
class JoinOpsSpec extends AnyFunSuite {

  test("asof: latest right row at-or-before, strict excludes equal times") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10L, "l10"), (1L, 20L, "l20"), (2L, 5L, "l5"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (2L, 9L, "r9"))
      .toDF("k", "rt", "rv")
    def run(strict: Boolean) =
      AsOfJoin(left, right, Seq("k"), "t", "rt", Seq("rv"), strict = strict)
        .collect().map(r => (r.getAs[String]("lv"), r.getAs[String]("asof_rv")))
        .toMap
    val nonStrict = run(strict = false)
    assert(nonStrict == Map("l10" -> "r10", "l20" -> "r15", "l5" -> null))
    val strictM = run(strict = true)
    assert(strictM("l10") == null, "strict: equal time must not match")
    assert(strictM("l20") == "r15")
  }

  test("range join: exact matches, intervals spanning many bins, no dupes") {
    val s = spark
    import s.implicits._
    val points = Seq((1L, 5.0), (2L, 25.0), (3L, -7.0)).toDF("pid", "v")
    val ivals = Seq((10L, 0.0, 30.0), (20L, 4.0, 6.0), (30L, -100.0, -1.0))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivals, "v", "lo", "hi", binWidth = 2.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 20L), (2L, 10L), (3L, 30L)))
    // no duplicate matches even though interval 10 covers 16 bins
    val n = RangeJoin.pointInInterval(points, ivals, "v", "lo", "hi", binWidth = 2.0).count()
    assert(n == 4)
  }
}
