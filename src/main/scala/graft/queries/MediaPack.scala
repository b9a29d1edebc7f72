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

  /** Shared blob fixture: per-doc PNG/WAV generation (UDFs — test-data
    * construction, not an operator path) lands in a snapshot once via the
    * job cache; every media query reads the same snapshot. Pixel (x,y) =
    * (x*31+y*17)%256, sample i = (i%256)*128-16384 — pure functions of
    * doc_id, so oracles are plain arithmetic.
    */
  private def mediaBlobs(s: SparkSession, dir: String) = {
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
    store.readResolved("mm_media")
  }

  def mediaMeta(s: SparkSession, dir: String): DataFrame = {
    // the timed/verified work is the codegen'd header extraction below
    val media = mediaBlobs(s, dir)
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

  /** REAL decode round-trip: PNG pixels via inflate+unfilter (PngStats),
    * nearest-neighbor resize re-encoded and decoded AGAIN (two decodes +
    * one encode round-trip), WAV PCM stats via the RIFF walk, and
    * every-4th-frame audio decimation re-encoded and re-analyzed. Every
    * output is integer channel/sample arithmetic the DuckDB oracle
    * reproduces from the fixture formulas — so a hash match proves the
    * decoder, the filters, the resampler and the re-encoder are all
    * byte-exact. All work is codegen'd per-value scan-side map; no
    * shuffle, no UDF.
    */
  def codecRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val media = mediaBlobs(s, dir)
    val img = Multimodal.decodeImage(col("img"))
    val rs = Multimodal.decodeImage(Multimodal.imageResize(col("img"), 8, 8))
    val pcm = Multimodal.audioFeatures(col("wav"))
    val fs = Multimodal.audioFeatures(Multimodal.audioFrameSample(col("wav"), 4))
    media.select(col("doc_id"),
      img.getField("width").cast("long").as("img_w"),
      img.getField("height").cast("long").as("img_h"),
      img.getField("px_sum").as("px_sum"),
      img.getField("px_min").cast("long").as("px_min"),
      img.getField("px_max").cast("long").as("px_max"),
      rs.getField("px_sum").as("rs_sum"),
      pcm.getField("n_samples").as("wav_n"),
      pcm.getField("pcm_sum").as("pcm_sum"),
      pcm.getField("pcm_sqsum").as("pcm_sqsum"),
      pcm.getField("pcm_peak").cast("long").as("pcm_peak"),
      fs.getField("pcm_sum").as("fs_sum"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_media_meta" -> mediaMeta _,
    "mm_codec_roundtrip" -> codecRoundtrip _,
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
    // replicates the fixture formulas: pixel (x,y) = (x*31+y*17)%256 on a
    // (16+id%32) x (9+id%7) raster; sample i = (i%256)*128-16384 over
    // 100+id%50 samples. rs_sum replays the integer-floor nearest-neighbor
    // index map; fs_sum replays the step-4 decimation.
    // (DuckDB's range() can't take correlated lateral parameters, so each
    // per-doc grid is a maximal fixed range cross-join filtered by the
    // per-doc bound in the join condition.)
    "mm_codec_roundtrip" ->
      """WITH img AS (
           SELECT d.doc_id,
                  sum((x.x*31 + y.y*17) % 256) AS s,
                  min((x.x*31 + y.y*17) % 256) AS mn,
                  max((x.x*31 + y.y*17) % 256) AS mx
           FROM documents d
           JOIN range(0, 47) x(x) ON x.x < 16 + d.doc_id % 32
           JOIN range(0, 15) y(y) ON y.y < 9 + d.doc_id % 7
           GROUP BY d.doc_id
         ), rs AS (
           SELECT d.doc_id,
                  sum(((xx.x * (16 + d.doc_id % 32)) // 8 * 31
                     + (yy.y * (9 + d.doc_id % 7)) // 8 * 17) % 256) AS s
           FROM documents d, range(0, 8) xx(x), range(0, 8) yy(y)
           GROUP BY d.doc_id
         ), pcm AS (
           SELECT d.doc_id,
                  sum((i.i % 256) * 128 - 16384) AS s,
                  sum(((i.i % 256) * 128 - 16384)
                    * ((i.i % 256) * 128 - 16384)) AS q,
                  max(abs((i.i % 256) * 128 - 16384)) AS pk,
                  sum(CASE WHEN i.i % 4 = 0
                      THEN (i.i % 256) * 128 - 16384 ELSE 0 END) AS fss
           FROM documents d
           JOIN range(0, 149) i(i) ON i.i < 100 + d.doc_id % 50
           GROUP BY d.doc_id
         )
         SELECT d.doc_id,
         CAST(16 + d.doc_id % 32 AS BIGINT) AS img_w,
         CAST(9 + d.doc_id % 7 AS BIGINT) AS img_h,
         CAST(img.s AS BIGINT) AS px_sum,
         CAST(img.mn AS BIGINT) AS px_min,
         CAST(img.mx AS BIGINT) AS px_max,
         CAST(rs.s AS BIGINT) AS rs_sum,
         CAST(100 + d.doc_id % 50 AS BIGINT) AS wav_n,
         CAST(pcm.s AS BIGINT) AS pcm_sum,
         CAST(pcm.q AS BIGINT) AS pcm_sqsum,
         CAST(pcm.pk AS BIGINT) AS pcm_peak,
         CAST(pcm.fss AS BIGINT) AS fs_sum
         FROM documents d
         JOIN img ON img.doc_id = d.doc_id
         JOIN rs ON rs.doc_id = d.doc_id
         JOIN pcm ON pcm.doc_id = d.doc_id""",
  )
}
