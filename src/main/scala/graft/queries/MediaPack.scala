package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Multimodal

/** Multimodal-column queries: binary image/audio fixtures generated
  * per-document (valid PNG/WAV bytes), metadata extracted back by the
  * codegen'd header parsers, and content-hash dedup over the binary
  * column. Every extracted value is a pure function of doc_id, so the
  * DuckDB oracle is plain arithmetic — the PNG/WAV construction and
  * parsing must round-trip exactly for the hashes to match.
  */
object MediaPack {

  def mediaMeta(s: SparkSession, dir: String): DataFrame = {
    // fixture: the per-doc PNG/WAV blob generation (UDFs — test-data
    // construction, not an operator path) lands in a snapshot once; the
    // timed/verified work is the codegen'd header extraction below
    val (store, _) = Fixtures(s, dir, "fix_media_blobs") { st =>
      st.write(Tables.documents(s, dir).select(col("doc_id"))
        .withColumn("img", Multimodal.makePng(
          (lit(16) + col("doc_id") % 32).cast("int"),
          (lit(9) + col("doc_id") % 7).cast("int")))
        .withColumn("wav", Multimodal.makeWav(
          (lit(8000) + (col("doc_id") % 3) * 4000).cast("int"),
          (lit(100) + col("doc_id") % 50).cast("int"))),
        "mm_media", slices = 8)
      Map("blobs" -> "mm_media")
    }
    val media = store.readResolved("mm_media")
    val meta = media.select(col("doc_id"),
      Multimodal.mediaType(col("img")).as("img_type"),
      Multimodal.pngWidth(col("img")).as("img_w"),
      Multimodal.pngHeight(col("img")).as("img_h"),
      Multimodal.wavSampleRate(col("wav")).as("wav_rate"),
      Multimodal.wavDurationMs(col("wav")).as("wav_ms"),
      Multimodal.contentFingerprint(col("img")).as("img_fp"))
    val dups = meta.groupBy("img_fp").agg(count(lit(1)).as("img_dups"))
    meta.join(dups, "img_fp")
      .select(col("doc_id"), col("img_type"), col("img_w"), col("img_h"),
        col("wav_rate"), col("wav_ms"), col("img_dups"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_media_meta" -> mediaMeta _,
  )

  val oracle: Map[String, String] = Map(
    "mm_media_meta" ->
      """SELECT doc_id,
         'image/png' AS img_type,
         16 + doc_id % 32 AS img_w,
         9 + doc_id % 7 AS img_h,
         8000 + (doc_id % 3) * 4000 AS wav_rate,
         ((100 + doc_id % 50) * 2 * 1000) // ((8000 + (doc_id % 3) * 4000) * 2) AS wav_ms,
         count(*) OVER (PARTITION BY doc_id % 32, doc_id % 7) AS img_dups
         FROM documents""",
  )
}
