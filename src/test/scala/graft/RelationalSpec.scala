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
}
