package graft

import java.math.BigInteger

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.expr.BigNumHelper
import graft.functions.{BigNumFunctions => B}
import TestSpark.spark

/** number:bignum beyond what the DuckDB oracle can express (DECIMAL/HUGEINT
  * stop at 38 digits; the reference holds ±2^1007 ≈ 304 digits): canonical
  * parse, lexicographic-equals-numeric sort key, and exact 300-digit sums,
  * all checked against java.math.BigInteger on seeded random data.
  */
class BigNumSpec extends AnyFunSuite {

  private def canon(s: String): String = {
    val r = BigNumHelper.canon(UTF8String.fromString(s))
    if (r == null) null else r.toString
  }

  test("canon: decorations strip, bad values null, reference bound enforced") {
    assert(canon("0") == "0")
    assert(canon("-0") == "0")
    assert(canon("+0") == "0")
    assert(canon(" 000 ") == "0")
    assert(canon("+00123") == "123")
    assert(canon("-00123") == "-123")
    assert(canon("12.5") == null)
    assert(canon("1e10") == null)
    assert(canon("--1") == null)
    assert(canon("") == null)
    assert(canon("abc") == null)
    assert(canon("12 34") == null)
    // the reference's exact bound: ±(2^1007 - 1) in, ±2^1007 out
    val limit = BigInteger.ONE.shiftLeft(1007).subtract(BigInteger.ONE)
    assert(canon(limit.toString) == limit.toString)
    assert(canon(limit.negate.toString) == limit.negate.toString)
    assert(canon(limit.add(BigInteger.ONE).toString) == null)
    assert(canon(limit.add(BigInteger.ONE).negate.toString) == null)
    // 304-digit values below the bound still pass (same digit count as it)
    val ok304 = BigInteger.TEN.pow(303) // 1 followed by 303 zeros: 304 digits
    assert(canon(ok304.toString) == ok304.toString)
  }

  test("sortKey: lexicographic order == numeric order on random bignums") {
    val rnd = new scala.util.Random(4711)
    def randBig(): BigInteger = {
      val bits = 1 + rnd.nextInt(1000) // up to ~301 digits, both signs
      val v = new BigInteger(bits, rnd.self)
      if (rnd.nextBoolean()) v.negate else v
    }
    val vals = (Seq("0", "1", "-1", "10", "-10") ++
      (1 to 400).map(_ => randBig().toString)).distinct
    val s = spark
    import s.implicits._
    val df = vals.toDF("c").select(col("c"), B.sortKey(col("c")).as("key"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    // keys sort (as plain strings) exactly like the numbers they encode
    val byKey = rows.sortBy(_._2).map(_._1).toSeq
    val byNum = rows.map(_._1).sortBy(new BigInteger(_)).toSeq
    assert(byKey == byNum, "string order of sortKey must equal numeric order")
  }

  test("bignum sum: exact 300-digit arithmetic, SQL null semantics") {
    val rnd = new scala.util.Random(99)
    val data = (1 to 200).map { i =>
      val v = new BigInteger(900 + rnd.nextInt(100), rnd.self) // ~271-301 digits
      val signed = if (i % 3 == 0) v.negate else v
      (i % 4, signed.toString)
    }
    val s = spark
    import s.implicits._
    val df = data.toDF("g", "c")
    val got = df.groupBy(col("g")).agg(B.sum(col("c")).as("s"))
      .collect().map(r => r.getInt(0) -> new BigInteger(r.getString(1))).toMap
    val want = data.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(v => new BigInteger(v._2)).reduce(_.add(_))
    }
    assert(got == want, "distributed bignum sum must equal BigInteger fold")
    // far beyond DECIMAL(38): the sums really are ~300 digits
    assert(want.values.exists(_.abs.toString.length > 250))
    // nulls ignored; all-null group -> null (SQL SUM)
    val withNull = Seq((0, "5"), (0, null), (1, null))
      .toDF("g", "c")
    val nr = withNull.groupBy(col("g")).agg(B.sum(col("c")).as("s"))
      .collect().map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    assert(nr(0).contains("5") && nr(1).isEmpty)
  }

  test("bignum sum aggregates map-side (partial before the exchange)") {
    val s = spark
    import s.implicits._
    val df = (1 to 1000).map(i => (i % 7, i.toString)).toDF("g", "c")
    val plan = df.groupBy(col("g")).agg(B.sum(col("c")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_bignum_sum"),
      s"bignum sum must partial-aggregate before the shuffle:\n$plan")
  }
}
