package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expr.Log2Fp
import graft.functions.{TextFunctions => T}
import TestSpark.spark

/** Integer-exact entropy quality signal (expr/EntropyFp): hand-computed
  * values, the uniform/constant laws, code-point (not UTF-16-unit)
  * counting, and null/empty corners. The driver's tx_entropy oracle gates
  * the corpus-wide replay.
  */
class EntropySpec extends AnyFunSuite {
  import spark.implicits._

  private def charEnt(s: String): (Long, Long) = {
    val r = Seq(Tuple1(s)).toDF("t")
      .select(T.charEntropyFp(col("t")).as("e"))
      .select(col("e.n"), col("e.ent_fp")).as[(Long, Long)].collect().head
    r
  }

  test("hand example: skewed and uniform distributions") {
    val l3 = Log2Fp.compute(3)
    // "aab": a:2 b:1 -> 2*(log2fp 3 - log2fp 2) + 1*(log2fp 3 - 0)
    assert(charEnt("aab") ==
      ((3L, 2 * (l3 - Log2Fp.compute(2)) + l3)))
    // uniform 4 symbols: 4 * log2fp(4) = 4 * 2 * 2^20
    assert(charEnt("abcd") == ((4L, 4L * 2 * (1L << 20))))
    // constant string: zero entropy regardless of length
    assert(charEnt("zzzzzz") == ((6L, 0L)))
    assert(charEnt("") == ((0L, 0L)))
  }

  test("code points, not UTF-16 units: astral symbols count once") {
    val emoji = new String(Character.toChars(0x1F600))
    assert(emoji.length == 2) // surrogate pair in UTF-16
    assert(charEnt(emoji) == ((1L, 0L)))
    assert(charEnt(emoji + "a") == ((2L, 2L * (1L << 20))))
  }

  test("token entropy over the normalized multiset; null text -> null") {
    val df = Seq((1L, "Go  go GO stop"), (2L, null: String))
      .toDF("id", "t")
      .select(col("id"), T.tokenEntropyFp(col("t")).as("e"))
      .select(col("id"), col("e.n"), col("e.ent_fp"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
      .toMap
    // normalized: [go, go, go, stop] -> go:3 stop:1
    val l4 = Log2Fp.compute(4)
    assert(df(1L) == Some((4L, 3 * (l4 - Log2Fp.compute(3)) + l4)))
    assert(df(2L).isEmpty)
  }

  test("plain-Scala third replication over hostile random strings") {
    val rnd = new scala.util.Random(41)
    val strs = (1 to 60).map { _ =>
      (1 to rnd.nextInt(40)).map(_ =>
        "aAb 中́\t€z"(rnd.nextInt(9))).mkString
    }
    strs.foreach { s =>
      val cps = s.codePoints().toArray.toSeq
      val n = cps.length.toLong
      val expect =
        if (n == 0) (0L, 0L)
        else {
          val ln = Log2Fp.compute(n)
          (n, cps.groupBy(identity).values
            .map(g => g.size * (ln - Log2Fp.compute(g.size))).sum)
        }
      assert(charEnt(s) == expect, s"for ${s.take(20)}…")
    }
  }
}
