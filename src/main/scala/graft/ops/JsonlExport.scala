package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Cols.{q => Q}

/** JSONL (one JSON object per line) export/import — the de-facto delivery
  * format of LLM training corpora (and of every eval-set exchange). The
  * reference stops at CSV (csvexport); a corpus pipeline needs JSONL.
  *
  * Spark-native: `to_json(struct(...))` renders rows scan-side (codegen'd,
  * no UDF), `spark.write.text` shards the lines — a distributed write of
  * `slices` files, gzip optional via the standard codec option. Import is
  * `spark.read.schema(...).json`, schema REQUIRED: inference is a
  * whole-extra-scan at 100 TB and silently wrong on empty shards.
  *
  * Determinism note: field order in each JSON object is the column order
  * given (to_json follows the struct), so byte-level diffs are stable
  * across runs; row ORDER across shards is partition order, as in every
  * distributed export (the reference's sliced csvexport has the same
  * contract — order within a slice, not across).
  */
object JsonlExport {

  /** Write `df` as JSONL under `path` (one part file per partition;
    * `slices` > 0 repartitions first; gzip per-shard when `gzip`).
    */
  def apply(df: DataFrame, path: String, slices: Int = 0,
            gzip: Boolean = false): Unit = {
    val sliced = if (slices > 0) df.repartition(slices) else df
    val lines = sliced.select(
      to_json(struct(df.columns.toIndexedSeq.map(Q): _*)).as("value"))
    val w = lines.write.mode("overwrite")
    (if (gzip) w.option("compression", "gzip") else w).text(path)
  }

  /** Read JSONL written by [[apply]] (or anyone else) with an explicit
    * schema. `columns` comes from a source frame or snapshot metadata —
    * never inferred.
    */
  def read(spark: SparkSession, path: String,
           schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
