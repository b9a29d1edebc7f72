package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided test tables (TESTDATA.md). */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet stores ts as parquet TIMESTAMP(NANOS), which Spark's
    * reader rejects unless `spark.sql.legacy.parquet.nanosAsLong=true` is
    * set in the session (Verify/Bench/TestSpark/Shell builders set it —
    * reading a table must not mutate session conf as a side effect); the
    * ns long is truncated to µs here (exactly what DuckDB's ts::TIMESTAMP
    * does).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // integer division (`div`), NOT `/`: double division rounds nanosecond
    // longs (>2^53) before truncation — off-by-1µs vs exact ns→µs truncation
    eventsRaw(s, d)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** events with `ts` left as the raw TIMESTAMP(NANOS) long — for queries
    * that pin the ns→µs truncation semantics explicitly.
    */
  def eventsRaw(s: SparkSession, d: String): DataFrame = apply(s, d, "events")

  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
