package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal columns: images/audio as opaque `binary` columns with typed
  * metadata extracted by header parsing.
  *
  * Design for 100 TB: media bytes travel as ordinary Parquet binary
  * columns (Parquet stores them page-compressed; projection pruning means
  * a metadata-only query never reads the blobs once metadata is
  * materialized to its own columns). Header parsing is pure Column
  * arithmetic over `substring`/`hex`/`conv` — codegen'd, no UDF in the
  * extract path. Pixel/sample DECODE is REAL for the formats the JVM can
  * handle without codec libraries — PNG (gray/RGB 8-bit: inflate + filter
  * reconstruction) and PCM-16 WAV — via the codegen'd expressions in
  * graft.expr.MediaCodecHelper ([[decodeImage]], [[imageResize]],
  * [[audioFeatures]], [[audioFrameSample]]). JPEG gets HEADER metadata
  * (width/height/components via the [[jpegMeta]] marker walk — no codec
  * needed) plus content-hash dedup; `decodeImageStub` remains the seam
  * for pixel decode of formats that genuinely need an external codec
  * (JPEG rasters/video), where a decode UDF (or mapInPandas in pyspark
  * pipelines) would plug in.
  *
  * Fixture generators (valid minimal PNG / WAV bytes, CRCs and all) are
  * Scala UDFs — they exist to create test data, not to process it.
  */
object Multimodal {

  // ---- fixture generation (driver/UDF side) ----

  /** Minimal valid grayscale PNG (signature, IHDR, IDAT with a real
    * deflate stream and CRCs, IEND). Deterministic bytes for a given
    * (width, height): pixel (x,y) = (x*31 + y*17) & 0xFF.
    */
  def pngBytes(width: Int, height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be(i: Int): Array[Byte] =
      Array(((i >> 24) & 0xff).toByte, ((i >> 16) & 0xff).toByte,
            ((i >> 8) & 0xff).toByte, (i & 0xff).toByte)
    def chunk(tag: String, data: Array[Byte]): Unit = {
      out.write(be(data.length))
      val tagged = tag.getBytes("US-ASCII") ++ data
      out.write(tagged)
      val crc = new java.util.zip.CRC32()
      crc.update(tagged)
      out.write(be(crc.getValue.toInt))
    }
    out.write(Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte))
    // IHDR: w, h, bit depth 8, color type 0 (gray), compression/filter/interlace 0
    chunk("IHDR", be(width) ++ be(height) ++ Array[Byte](8, 0, 0, 0, 0))
    val raw = new Array[Byte](height * (width + 1)) // filter byte 0 per row
    for (y <- 0 until height; x <- 0 until width)
      raw(y * (width + 1) + 1 + x) = ((x * 31 + y * 17) & 0xff).toByte
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    // loop until finished — a single deflate() call truncates the IDAT
    // stream once stored-block overhead exceeds the slack on large rasters
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      zout.write(buf, 0, n)
    }
    deflater.end()
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.empty)
    out.toByteArray
  }

  /** Minimal valid PCM WAV (RIFF/fmt/data), 16-bit mono: deterministic
    * triangle-ish samples.
    */
  def wavBytes(sampleRate: Int, nSamples: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le(i: Int, n: Int): Array[Byte] =
      (0 until n).map(b => ((i >> (8 * b)) & 0xff).toByte).toArray
    val dataLen = nSamples * 2
    out.write("RIFF".getBytes("US-ASCII")); out.write(le(36 + dataLen, 4))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le(16, 4))
    out.write(le(1, 2)); out.write(le(1, 2))            // PCM, mono
    out.write(le(sampleRate, 4)); out.write(le(sampleRate * 2, 4))
    out.write(le(2, 2)); out.write(le(16, 2))           // block align, bits
    out.write("data".getBytes("US-ASCII")); out.write(le(dataLen, 4))
    for (i <- 0 until nSamples) out.write(le((i % 256) * 128 - 16384, 2))
    out.toByteArray
  }

  /** WAV with LIST(INFO) and `fact` chunks BEFORE `fmt ` — the real-world
    * layout (many encoders write INFO metadata first) that a fixed-offset
    * parser reads as garbage. Same audio content as `wavBytes`.
    */
  def wavBytesWithList(sampleRate: Int, nSamples: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le(i: Int, n: Int): Array[Byte] =
      (0 until n).map(b => ((i >> (8 * b)) & 0xff).toByte).toArray
    val dataLen = nSamples * 2
    val listData = "INFOIART".getBytes("US-ASCII") ++ le(2, 4) ++
      "g\u0000".getBytes("US-ASCII") // INFO + IART sub-chunk, 14 bytes
    val factData = le(nSamples, 4)
    val riffLen = 4 + (8 + listData.length) + (8 + factData.length) +
      (8 + 16) + (8 + dataLen)
    out.write("RIFF".getBytes("US-ASCII")); out.write(le(riffLen, 4))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("LIST".getBytes("US-ASCII")); out.write(le(listData.length, 4))
    out.write(listData)
    out.write("fact".getBytes("US-ASCII")); out.write(le(factData.length, 4))
    out.write(factData)
    out.write("fmt ".getBytes("US-ASCII")); out.write(le(16, 4))
    out.write(le(1, 2)); out.write(le(1, 2))            // PCM, mono
    out.write(le(sampleRate, 4)); out.write(le(sampleRate * 2, 4))
    out.write(le(2, 2)); out.write(le(16, 2))           // block align, bits
    out.write("data".getBytes("US-ASCII")); out.write(le(dataLen, 4))
    for (i <- 0 until nSamples) out.write(le((i % 256) * 128 - 16384, 2))
    out.toByteArray
  }

  /** Minimal valid RGB PNG (color type 2, filter 0) — written by its OWN
    * byte-level code, deliberately NOT via MediaCodecHelper.encodePng: the
    * oracle check on decoded RGB values only means something if fixture
    * generation and production decode share no code path. Channel c of
    * pixel (x,y) = (x*31 + y*17 + c*53) & 0xFF.
    */
  def rgbPngBytes(width: Int, height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be(i: Int): Array[Byte] =
      Array(((i >> 24) & 0xff).toByte, ((i >> 16) & 0xff).toByte,
            ((i >> 8) & 0xff).toByte, (i & 0xff).toByte)
    def chunk(tag: String, data: Array[Byte]): Unit = {
      out.write(be(data.length))
      val tagged = tag.getBytes("US-ASCII") ++ data
      out.write(tagged)
      val crc = new java.util.zip.CRC32()
      crc.update(tagged)
      out.write(be(crc.getValue.toInt))
    }
    out.write(Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte))
    chunk("IHDR", be(width) ++ be(height) ++ Array[Byte](8, 2, 0, 0, 0))
    val stride = width * 3
    val raw = new Array[Byte](height * (stride + 1))
    for (y <- 0 until height; x <- 0 until width; c <- 0 until 3)
      raw(y * (stride + 1) + 1 + x * 3 + c) = ((x * 31 + y * 17 + c * 53) & 0xff).toByte
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      zout.write(buf, 0, n)
    }
    deflater.end()
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.empty)
    out.toByteArray
  }

  /** Minimal structurally-valid JPEG: SOI, JFIF APP0, a COM segment whose
    * length varies with (w+h) so the SOF offset is data-dependent (a
    * fixed-offset parser reads garbage), SOF0 with the given dimensions
    * and component count, a one-component SOS with a few entropy bytes
    * (containing a bare FF! — a marker walk that keeps scanning past SOS
    * would misparse), and EOI. Own byte emission, deliberately sharing no
    * code with the production parser.
    */
  def jpegBytes(width: Int, height: Int, components: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    b(0xff, 0xd8)                                   // SOI
    b(0xff, 0xe0); be16(16)                         // APP0 JFIF
    out.write("JFIF".getBytes("US-ASCII")); b(0)
    b(1, 1, 0); be16(1); be16(1); b(0, 0)           // v1.1, no density, no thumb
    val pad = (width + height) % 7                  // data-dependent COM size
    b(0xff, 0xfe); be16(2 + 5 + pad)
    out.write("graft".getBytes("US-ASCII"))
    (0 until pad).foreach(_ => b('x'))
    b(0xff, 0xc0); be16(8 + 3 * components); b(8)   // SOF0, precision 8
    be16(height); be16(width); b(components)
    (0 until components).foreach { c =>
      b(c + 1, 0x11, if (c == 0) 0 else 1)          // id, 1x1 sampling, qtab
    }
    b(0xff, 0xda); be16(8); b(1, 1, 0, 0, 63, 0)    // SOS, 1 component
    b(0x12, 0xff, 0x00, 0x34)                       // entropy bytes incl. stuffed FF
    b(0xff, 0xd9)                                   // EOI
    out.toByteArray
  }

  val makePng = udf((w: Int, h: Int) => pngBytes(w, h))
  val makeJpeg = udf((w: Int, h: Int, c: Int) => jpegBytes(w, h, c))
  val makeRgbPng = udf((w: Int, h: Int) => rgbPngBytes(w, h))
  val makeWav = udf((rate: Int, n: Int) => wavBytes(rate, n))
  val makeWavWithList = udf((rate: Int, n: Int) => wavBytesWithList(rate, n))

  // ---- metadata extraction (codegen'd Column arithmetic, no UDFs) ----

  private def beInt(bin: Column, pos: Int): Column =
    conv(hex(substring(bin, pos, 4)), 16, 10).cast("long")
  /** Little-endian int at a dynamic (1-based) position; null pos → null. */
  private def leIntAt(bin: Column, pos: Column, len: Int): Column =
    (0 until len).map { i =>
      conv(hex(bin.substr(pos + lit(i), lit(1))), 16, 10).cast("long") * (1L << (8 * i))
    }.reduce(_ + _)

  private val PngSig = "89504E470D0A1A0A"

  def isPng(bin: Column): Column = hex(substring(bin, 1, 8)) === PngSig
  /** IHDR is always the first chunk: width at offset 17, height at 21. */
  def pngWidth(bin: Column): Column = when(isPng(bin), beInt(bin, 17))
  def pngHeight(bin: Column): Column = when(isPng(bin), beInt(bin, 21))

  def isWav(bin: Column): Column =
    hex(substring(bin, 1, 4)) === "52494646" &&   // RIFF
    hex(substring(bin, 9, 4)) === "57415645"      // WAVE

  /** 1-based data offset of a RIFF chunk — a bounded, bounds-checked chunk
    * WALK (graft.expr.RiffChunkOffset, codegen'd), not a fixed offset: real
    * WAVs put LIST/fact/bext chunks before `fmt `, and fixed offsets
    * silently return garbage on them. Null when the chunk is absent, which
    * nulls every derived field below (honest "don't know", never garbage).
    */
  private def chunkOff(bin: Column, tag: String): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expr.RiffChunkOffset(org.apache.spark.sql.GraftBridge.expression(bin), tag))

  // fmt chunk data layout: format(2), channels(2), rate(4), byteRate(4),
  // blockAlign(2), bits(2); data chunk's size field sits 4 bytes before
  // its data.
  def wavChannels(bin: Column): Column = leIntAt(bin, chunkOff(bin, "fmt ") + 2, 2)
  def wavSampleRate(bin: Column): Column = leIntAt(bin, chunkOff(bin, "fmt ") + 4, 4)
  def wavBitsPerSample(bin: Column): Column = leIntAt(bin, chunkOff(bin, "fmt ") + 14, 2)
  def wavDataBytes(bin: Column): Column = leIntAt(bin, chunkOff(bin, "data") - 4, 4)
  /** Duration in ms (integer division — `/` on Columns is double division,
    * so floor back to long; replicable as `//` in the oracle).
    */
  def wavDurationMs(bin: Column): Column = {
    val bytesPerSec = wavSampleRate(bin) * wavChannels(bin) *
      floor(wavBitsPerSample(bin) / 8).cast("long")
    floor((wavDataBytes(bin) * 1000L) / bytesPerSec).cast("long")
  }

  def isJpeg(bin: Column): Column = hex(substring(bin, 1, 2)) === "FFD8"

  /** JPEG frame-header metadata via the codegen'd SOI/SOF marker walk
    * (graft.expr.JpegMeta): struct(width, height, components), null for
    * non-JPEG/malformed blobs. Pixel decode remains behind
    * [[decodeImageStub]]'s external-codec seam — header metadata +
    * content-hash dedup need no codec.
    */
  def jpegMeta(bin: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expr.JpegMeta(org.apache.spark.sql.GraftBridge.expression(bin)))

  def jpegWidth(bin: Column): Column =
    jpegMeta(bin).getField("width").cast("long")
  def jpegHeight(bin: Column): Column =
    jpegMeta(bin).getField("height").cast("long")
  def jpegComponents(bin: Column): Column =
    jpegMeta(bin).getField("components").cast("long")

  def mediaType(bin: Column): Column =
    when(isPng(bin), "image/png").when(isWav(bin), "audio/wav")
      .when(isJpeg(bin), "image/jpeg").otherwise("unknown")

  /** 60-bit content fingerprint of the raw bytes — the binary-column exact
    * dedup key (md5 over bytes; oracle: md5 over the same bytes).
    */
  def contentFingerprint(bin: Column): Column =
    conv(substring(md5(bin), 1, 15), 16, 10).cast("long")

  /** Exact dedup over a binary column: group by the FULL md5 — at the
    * 10^9-blob design scale a 60-bit truncation has ~40% birthday-collision
    * probability (silently merging distinct blobs); the full 128 bits cost
    * the same one shuffle.
    */
  def dedupByContent(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.groupBy(md5(col(binCol)).as("content_md5"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  private def bridge(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.GraftBridge.column(e)
  private def ex(c: Column) = org.apache.spark.sql.GraftBridge.expression(c)

  /** REAL image decode (PNG gray/RGB 8-bit, any scanline filter): inflate
    * IDAT + filter reconstruction, returning
    * struct(width, height, channels, px_sum, px_min, px_max) — integer
    * channel statistics an oracle can reproduce exactly. Null for formats
    * outside the JVM-decodable envelope (route those to [[decodeImageStub]]
    * / an external codec).
    */
  def decodeImage(bin: Column): Column = bridge(graft.expr.PngStats(ex(bin)))

  /** REAL nearest-neighbor resize: decode → integer-floor index map →
    * re-encode as PNG. Null when not decodable.
    */
  def imageResize(bin: Column, w: Int, h: Int): Column =
    bridge(graft.expr.PngResizeNearest(ex(bin), w, h))

  /** REAL audio feature extraction (PCM-16 WAV via the RIFF walk):
    * struct(n_samples, sample_rate, pcm_sum, pcm_sqsum, pcm_peak); RMS =
    * sqrt(pcm_sqsum / n_samples) downstream. Null for non-PCM-16.
    */
  def audioFeatures(bin: Column): Column = bridge(graft.expr.WavPcmStats(ex(bin)))

  /** REAL frame-sampling: keep every `step`-th PCM frame, re-encoded as a
    * canonical WAV — the audio analogue of video frame thumbnailing.
    */
  def audioFrameSample(bin: Column, step: Int): Column =
    bridge(graft.expr.WavFrameSample(ex(bin), step))

  /** STUB — the decode seam for formats that need an external codec
    * library (JPEG/video — not in this container); pipelines plug a decode
    * UDF (JVM) or `mapInPandas` (Python) in here. PNG/WAV decode is REAL —
    * see [[decodeImage]]/[[audioFeatures]]. The stub returns the
    * deterministic fake "pixel summary" (width, height, null mean) so
    * downstream schema/partitioning is exercised end-to-end.
    */
  def decodeImageStub(bin: Column): Column =
    struct(pngWidth(bin).as("width"), pngHeight(bin).as("height"),
      lit(null).cast("double").as("mean_intensity")) // real decode: see decodeImage

  /** Batched per-partition binary processing — the Scala equivalent of
    * the `mapInPandas` shape used for decode/resize/frame-sample in
    * Python pipelines: rows stream through in bounded batches (a codec
    * library amortizes setup per batch, memory stays O(batchSize·blob)),
    * partitioning is preserved, and the transform sees (id, bytes) pairs.
    * `fn` is the pluggable codec step; tests drive it with a stub.
    */
  def mapBinaryBatches(df: DataFrame, idCol: String, binCol: String,
                       batchSize: Int)
                      (fn: Seq[(Long, Array[Byte])] => Seq[(Long, Array[Byte])]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField(binCol, BinaryType, nullable = true)))
    val rdd = df.select(col(idCol).cast("long"), col(binCol)).rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          fn(batch.map(r => (r.getLong(0), r.getAs[Array[Byte]](1))))
            .map { case (id, bytes) => Row(id, bytes) }
        }
      }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
