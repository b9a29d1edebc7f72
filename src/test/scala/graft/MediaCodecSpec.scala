package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expr.MediaCodecHelper
import graft.ops.Multimodal
import TestSpark.spark

/** Real PNG/WAV codec: inflate + filter reconstruction, resize round-trip,
  * PCM stats and frame decimation — including the filter types and layouts
  * the fixture generator never emits.
  */
class MediaCodecSpec extends AnyFunSuite {

  private def formulaPix(w: Int, h: Int): Array[Byte] = {
    val a = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w) a(y * w + x) = ((x * 31 + y * 17) & 0xff).toByte
    a
  }

  test("decodePng recovers the exact raster from the fixture generator") {
    for ((w, h) <- Seq((16, 9), (47, 15), (1, 1), (300, 2))) {
      val r = MediaCodecHelper.decodePng(Multimodal.pngBytes(w, h))
      assert(r != null && r.width == w && r.height == h && r.bpp == 1)
      assert(r.pix.toSeq == formulaPix(w, h).toSeq, s"pixels differ at ${w}x$h")
    }
  }

  test("every scanline filter round-trips, gray and RGB") {
    // pseudo-random raster so Sub/Up/Average/Paeth all produce distinct
    // residuals (the fixture's linear formula is too regular to stress them)
    def noisy(n: Int): Array[Byte] = {
      val a = new Array[Byte](n)
      var s = 12345
      for (i <- 0 until n) { s = s * 1103515245 + 12345; a(i) = (s >> 16).toByte }
      a
    }
    for (bpp <- Seq(1, 3); filter <- 0 to 4) {
      val (w, h) = (23, 11)
      val px = noisy(w * h * bpp)
      val enc = MediaCodecHelper.encodePng(
        new MediaCodecHelper.Raster(w, h, bpp, px), filter)
      val dec = MediaCodecHelper.decodePng(enc)
      assert(dec != null, s"filter $filter bpp $bpp failed to decode")
      assert(dec.bpp == bpp && dec.pix.toSeq == px.toSeq,
        s"filter $filter bpp $bpp corrupted pixels")
    }
  }

  test("unsupported and corrupt PNGs return null, never garbage") {
    val good = Multimodal.pngBytes(8, 8)
    assert(MediaCodecHelper.decodePng(null) == null)
    assert(MediaCodecHelper.decodePng(Array[Byte](1, 2, 3)) == null)
    assert(MediaCodecHelper.decodePng(good.dropRight(20)) == null) // no IEND
    val truncatedIdat = good.clone()
    // corrupt the deflate stream body (IDAT starts after the 33-byte
    // sig+IHDR preamble; byte 50 is inside it for an 8x8)
    truncatedIdat(50) = (truncatedIdat(50) ^ 0x7f).toByte
    assert(MediaCodecHelper.decodePng(truncatedIdat) == null)
    val hugeHeader = good.clone()
    hugeHeader(16) = 0x7f // width -> ~2^31: size cap must reject, not OOM
    assert(MediaCodecHelper.decodePng(hugeHeader) == null)
    // FDICT zlib header (0x78 0x20 — valid FCHECK, preset-dictionary bit
    // set): Inflater returns 0 with needsDictionary(), which must yield
    // null, not an infinite inflate loop pinning the executor
    val fdict = good.clone()
    fdict(41) = 0x78; fdict(42) = 0x20 // first two IDAT data bytes
    assert(MediaCodecHelper.decodePng(fdict) == null)
  }

  test("nearest-neighbor resize matches the integer index map") {
    val src = Multimodal.pngBytes(40, 13)
    val out = MediaCodecHelper.decodePng(
      MediaCodecHelper.pngResizeNearest(src, 8, 8))
    assert(out != null && out.width == 8 && out.height == 8)
    for (y <- 0 until 8; x <- 0 until 8) {
      val sx = x * 40 / 8; val sy = y * 13 / 8
      assert((out.pix(y * 8 + x) & 0xff) == ((sx * 31 + sy * 17) & 0xff))
    }
  }

  test("wavPcmStats reads PCM through the chunk walk (LIST-first layout too)") {
    for (bytes <- Seq(Multimodal.wavBytes(8000, 120),
                      Multimodal.wavBytesWithList(8000, 120))) {
      val row = MediaCodecHelper.wavPcmStats(bytes)
      assert(row != null)
      val samples = (0 until 120).map(i => (i % 256) * 128 - 16384)
      assert(row.getLong(0) == 120L)
      assert(row.getInt(1) == 8000)
      assert(row.getLong(2) == samples.map(_.toLong).sum)
      assert(row.getLong(3) == samples.map(v => v.toLong * v).sum)
      assert(row.getInt(4) == samples.map(math.abs).max)
    }
  }

  test("frame-sampling keeps every Nth frame and re-encodes a valid WAV") {
    val fs = MediaCodecHelper.wavFrameSample(Multimodal.wavBytes(8000, 100), 7)
    assert(fs != null)
    val row = MediaCodecHelper.wavPcmStats(fs)
    val kept = (0 until 100 by 7).map(i => (i % 256) * 128 - 16384)
    assert(row.getLong(0) == kept.length.toLong)
    assert(row.getLong(2) == kept.map(_.toLong).sum)
    assert(row.getInt(1) == 8000) // rate preserved
    // non-PCM input routes to null
    assert(MediaCodecHelper.wavFrameSample("RIFFxxxxWAVE".getBytes, 2) == null)
  }

  test("Column API: decode/resize/features/frame-sample stay codegen'd end-to-end") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 16, 9, 8000, 100), (2L, 47, 15, 12000, 149))
      .toDF("id", "w", "h", "rate", "n")
      .withColumn("img", Multimodal.makePng(col("w"), col("h")))
      .withColumn("wav", Multimodal.makeWav(col("rate"), col("n")))
    val img = Multimodal.decodeImage(col("img"))
    val rs = Multimodal.decodeImage(Multimodal.imageResize(col("img"), 8, 8))
    val fs = Multimodal.audioFeatures(Multimodal.audioFrameSample(col("wav"), 4))
    val got = df.select(col("id"), col("w"), col("h"), col("n"),
        img.getField("width").as("dw"), img.getField("px_sum").as("ps"),
        rs.getField("width").as("rw"), rs.getField("px_sum").as("rp"),
        fs.getField("n_samples").as("fn"), fs.getField("pcm_sum").as("fsum"))
      .collect().sortBy(_.getLong(0))
    for (r <- got) {
      val (w, h, n) = (r.getInt(1), r.getInt(2), r.getInt(3))
      assert(r.getInt(4) == w)
      val expSum = (for (y <- 0 until h; x <- 0 until w)
        yield ((x * 31 + y * 17) & 0xff).toLong).sum
      assert(r.getLong(5) == expSum)
      assert(r.getInt(6) == 8)
      val expRs = (for (y <- 0 until 8; x <- 0 until 8)
        yield (((x * w / 8) * 31 + (y * h / 8) * 17) & 0xff).toLong).sum
      assert(r.getLong(7) == expRs)
      val kept = 0 until n by 4
      assert(r.getLong(8) == kept.length.toLong)
      assert(r.getLong(9) == kept.map(i => ((i % 256) * 128 - 16384).toLong).sum)
    }
  }

  // Under AQE, EnsureRequirements only inserts exchanges at execution
  // time (inside AdaptiveSparkPlanExec, opaque to collect()), so plan
  // assertions build the plan with AQE off to see the real exchanges.
  private def physicalNoAqe(build: => org.apache.spark.sql.DataFrame) = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try build.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("pl_mm_corpus: no binary column ever enters an exchange") {
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.types.BinaryType
    val plan = physicalNoAqe(
      graft.queries.MediaPack.multimodalCorpus(spark, TestSpark.sfDir))
    val exchanges = plan.collect { case e: Exchange => e }
    assert(exchanges.nonEmpty, "expected the dedup window exchange")
    for (e <- exchanges; f <- e.child.schema.fields)
      assert(f.dataType != BinaryType,
        s"blob column '${f.name}' would be shuffled — decode/hash must stay scan-side")
  }

  test("mm_codec_roundtrip: decode pipeline plans zero shuffles") {
    import org.apache.spark.sql.execution.exchange.Exchange
    val plan = physicalNoAqe(
      graft.queries.MediaPack.codecRoundtrip(spark, TestSpark.sfDir))
    val exchanges = plan.collect { case e: Exchange => e }
    assert(exchanges.isEmpty,
      s"per-row decode must be a pure scan-side map, found: $exchanges")
  }

  test("PNG with IDAT split across multiple chunks decodes (valid per spec)") {
    // re-chunk a fixture PNG: split its single IDAT into 3-byte chunks
    val whole = Multimodal.pngBytes(12, 7)
    def beInt(b: Array[Byte], o: Int) =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    val out = new java.io.ByteArrayOutputStream()
    out.write(whole, 0, 8) // signature
    var off = 8
    while (off + 8 <= whole.length) {
      val len = beInt(whole, off)
      val tag = new String(whole, off + 4, 4, "US-ASCII")
      if (tag == "IDAT") {
        val data = whole.slice(off + 8, off + 8 + len)
        for (g <- data.grouped(3)) {
          val crc = new java.util.zip.CRC32()
          val tagged = "IDAT".getBytes("US-ASCII") ++ g
          crc.update(tagged)
          out.write(Array(((g.length >> 24) & 0xff).toByte, ((g.length >> 16) & 0xff).toByte,
            ((g.length >> 8) & 0xff).toByte, (g.length & 0xff).toByte))
          out.write(tagged)
          out.write(Array((((crc.getValue >> 24) & 0xff)).toByte, ((crc.getValue >> 16) & 0xff).toByte,
            ((crc.getValue >> 8) & 0xff).toByte, (crc.getValue & 0xff).toByte))
        }
      } else out.write(whole, off, 12 + len)
      off += 12 + len
    }
    val r = MediaCodecHelper.decodePng(out.toByteArray)
    assert(r != null && r.width == 12 && r.height == 7)
    assert(r.pix.toSeq == formulaPix(12, 7).toSeq)
  }

  test("palette / 16-bit / interlaced PNGs are rejected as unsupported") {
    val good = Multimodal.pngBytes(8, 8)
    def mutated(o: Int, v: Byte) = { val b = good.clone(); b(o) = v; b }
    // IHDR data starts at byte 16: depth at +8=24, colorType at +9=25,
    // interlace at +12=28 (0-based)
    assert(MediaCodecHelper.decodePng(mutated(24, 16)) == null, "16-bit depth")
    assert(MediaCodecHelper.decodePng(mutated(25, 3)) == null, "palette")
    assert(MediaCodecHelper.decodePng(mutated(28, 1)) == null, "interlaced")
  }

  test("jpegMeta walks SOI→SOF through variable-length segments") {
    // the fixture varies the COM length with (w+h) % 7, so these hit
    // different SOF offsets; components 1 and 3 both parse
    for ((w, h, c) <- Seq((24, 12, 1), (63, 22, 3), (1, 1, 1),
        (65535, 65535, 4), (300, 2, 3))) {
      val r = MediaCodecHelper.jpegMeta(Multimodal.jpegBytes(w, h, c))
      assert(r != null, s"${w}x$h/$c")
      assert(r.getInt(0) == w && r.getInt(1) == h && r.getInt(2) == c)
    }
  }

  test("jpegMeta: malformed and non-JPEG blobs return null, never garbage") {
    val good = Multimodal.jpegBytes(24, 12, 3)
    assert(MediaCodecHelper.jpegMeta(null) == null)
    assert(MediaCodecHelper.jpegMeta(Array[Byte](0x12, 0x34)) == null)
    assert(MediaCodecHelper.jpegMeta(Multimodal.pngBytes(8, 8)) == null)
    // truncated before the SOF segment
    assert(MediaCodecHelper.jpegMeta(good.take(20)) == null, "truncated")
    // SOS before any SOF: the walk must stop, not scan entropy data
    val noSof = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte,
      0xda.toByte, 0, 8, 1, 1, 0, 0, 63, 0, 0x12, 0xff.toByte, 0x00, 0x34)
    assert(MediaCodecHelper.jpegMeta(noSof) == null, "SOS before SOF")
    // a segment length pointing past the end of the buffer
    val overflow = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte,
      0xfe.toByte, 0x7f, 0xff.toByte, 'x')
    assert(MediaCodecHelper.jpegMeta(overflow) == null, "length overflow")
    // DHT (C4) must be skipped as a plain segment, not taken as a SOF
    val dhtFirst = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(Array[Byte](0xff.toByte, 0xd8.toByte))
      o.write(Array[Byte](0xff.toByte, 0xc4.toByte, 0, 5, 1, 2, 3))
      o.write(good.drop(2)) // rest of a valid stream (APP0 COM SOF0 ...)
      o.toByteArray
    }
    val r = MediaCodecHelper.jpegMeta(dhtFirst)
    assert(r != null && r.getInt(0) == 24 && r.getInt(1) == 12 &&
      r.getInt(2) == 3)
  }

  test("jpegMeta Column API: codegen'd walk matches the fixture formulas") {
    val s = spark
    import s.implicits._
    val df = (0L until 64L).toDF("doc_id")
      .withColumn("jpg", Multimodal.makeJpeg(
        (lit(24) + col("doc_id") % 40).cast("int"),
        (lit(12) + col("doc_id") % 11).cast("int"),
        (lit(1) + (col("doc_id") % 2) * 2).cast("int")))
    val got = df.select(col("doc_id"),
        Multimodal.mediaType(col("jpg")).as("t"),
        Multimodal.jpegWidth(col("jpg")).as("w"),
        Multimodal.jpegHeight(col("jpg")).as("h"),
        Multimodal.jpegComponents(col("jpg")).as("c"))
      .as[(Long, String, Long, Long, Long)].collect()
    got.foreach { case (id, t, w, h, c) =>
      assert(t == "image/jpeg")
      assert(w == 24 + id % 40 && h == 12 + id % 11 && c == 1 + (id % 2) * 2)
    }
  }
}
