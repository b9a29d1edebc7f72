package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided test tables (TESTDATA.md). */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet has shipped with two on-disk encodings of `ts`:
    * parquet TIMESTAMP(NANOS) — which Spark reads as a nanosecond LONG
    * under `spark.sql.legacy.parquet.nanosAsLong=true` (set by the
    * Verify/Bench/TestSpark/Shell builders; reading a table must not
    * mutate session conf as a side effect) — and plain timestamp[us],
    * which Spark reads as TIMESTAMP_NTZ. Both normalize here to a µs
    * session-TZ TIMESTAMP (sessions run UTC, so the NTZ cast is exactly
    * DuckDB's naive read; the ns long is truncated exactly like DuckDB's
    * ts::TIMESTAMP).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      // integer division (`div`), NOT `/`: double division rounds
      // nanosecond longs (>2^53) before truncation — off-by-1µs vs exact
      // ns→µs truncation
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** events with `ts` as the raw nanosecond epoch long — for queries that
    * pin the ns→µs truncation semantics explicitly. When the data is
    * already µs-precision, the ns value is reconstructed (µs × 1000) so
    * the invariant those queries assert stays well-defined.
    */
  def eventsRaw(s: SparkSession, d: String): DataFrame = {
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df
      case _ => df.withColumn("ts",
        unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    }
  }

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
