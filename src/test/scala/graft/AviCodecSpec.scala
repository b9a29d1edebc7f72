package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expr.{AviCodecHelper, MediaCodecHelper}
import graft.ops.Multimodal
import TestSpark.spark

/** MJPEG-in-AVI video decode: the bounded RIFF container walk, per-frame
  * baseline JPEG decode, frame extraction, and the composed
  * video → frame → resize → PNG transcode chain — plus the hostile-input
  * envelope (non-AVI RIFF forms, forged lengths, undecodable frames).
  */
class AviCodecSpec extends AnyFunSuite {

  private def fixture(id: Long) = Multimodal.aviMjpegBytes(id)

  test("aviMeta reads dimensions, counted frames, timing and handler") {
    for (id <- Seq(0L, 1L, 7L, 123L, 499L)) {
      val info = AviCodecHelper.parseAvi(fixture(id))
      assert(info != null, s"id $id did not parse")
      assert(info.width == 16 + (id % 17).toInt)
      assert(info.height == 9 + (id % 11).toInt)
      assert(info.usecPerFrame == 20000 + (id % 5).toInt * 20000)
      assert(info.handler == "MJPG")
      val frames = AviCodecHelper.frameBounds(fixture(id), info)
      assert(frames.length == 3 + (id % 5).toInt)
    }
  }

  test("mjpegFrame returns the encoder's exact JPEG bytes per frame") {
    val id = 42L
    val w = 16 + (id % 17).toInt; val h = 9 + (id % 11).toInt
    val bytes = fixture(id)
    for (f <- 0 until (3 + id % 5).toInt) {
      val expected = Multimodal.jpegBaselineBytes(w, h, color = false,
        sub420 = false,
        yBlock = (bx, by) => ((bx * 29 + by * 41 + id * 7 + f * 13) % 256).toInt,
        cbBlock = null, crBlock = null, acSeed = null, restartInterval = 0)
      val got = AviCodecHelper.mjpegFrame(bytes, f)
      assert(got != null && got.toSeq == expected.toSeq, s"frame $f differs")
    }
    assert(AviCodecHelper.mjpegFrame(bytes, (3 + id % 5).toInt) == null,
      "out-of-range frame index must be null")
    assert(AviCodecHelper.mjpegFrame(bytes, Int.MaxValue) == null)
  }

  test("mjpegStats agrees with independent per-frame jpegStats decodes") {
    for (id <- Seq(3L, 18L, 250L); step <- Seq(1, 2, 3)) {
      val bytes = fixture(id)
      val nf = (3 + id % 5).toInt
      val row = AviCodecHelper.mjpegStats(bytes, step)
      assert(row != null)
      // independent replication: extract each sampled frame, decode it
      // standalone, fold the statistics by hand
      var sum = 0L; var mn = 255; var mx = 0; var sampled = 0
      (0 until nf by step).foreach { f =>
        sampled += 1
        val r = MediaCodecHelper.decodeJpeg(AviCodecHelper.mjpegFrame(bytes, f))
        assert(r != null)
        r.pix.foreach { b =>
          val v = b & 0xff
          sum += v; if (v < mn) mn = v; if (v > mx) mx = v
        }
      }
      assert(row.getInt(0) == nf)
      assert(row.getInt(1) == sampled && row.getInt(2) == sampled)
      assert(row.getLong(3) == sum, s"id $id step $step sum")
      assert(row.getInt(4) == mn && row.getInt(5) == mx)
    }
  }

  test("constant DC-only frames decode to their exact block constants") {
    val id = 9L
    val w = 16 + (id % 17).toInt; val h = 9 + (id % 11).toInt
    val r = MediaCodecHelper.decodeJpeg(AviCodecHelper.mjpegFrame(fixture(id), 2))
    assert(r != null && r.width == w && r.height == h && r.bpp == 1)
    for (y <- 0 until h; x <- 0 until w) {
      val expect = ((x / 8) * 29 + (y / 8) * 41 + id * 7 + 2 * 13) % 256
      assert((r.pix(y * w + x) & 0xff) == expect, s"pixel ($x,$y)")
    }
  }

  test("non-AVI inputs are null — including the WAV RIFF form") {
    // a WAV is also RIFF: the form fourcc must be checked, not just "RIFF"
    assert(AviCodecHelper.parseAvi(Multimodal.wavBytes(8000, 64)) == null)
    assert(AviCodecHelper.parseAvi(Multimodal.pngBytes(4, 4)) == null)
    assert(AviCodecHelper.parseAvi(null) == null)
    assert(AviCodecHelper.parseAvi(Array[Byte](1, 2, 3)) == null)
    assert(AviCodecHelper.aviMeta(Multimodal.wavBytes(8000, 64)) == null)
  }

  test("forged chunk lengths and truncations are null, never garbage") {
    val good = fixture(5L)
    // truncate mid-movi
    assert(AviCodecHelper.parseAvi(good.take(good.length / 2)) == null)
    // forge the hdrl LIST size to overflow the RIFF end
    val forged = good.clone()
    forged(16) = 0xff.toByte; forged(17) = 0xff.toByte
    forged(18) = 0xff.toByte; forged(19) = 0x7f.toByte
    assert(AviCodecHelper.parseAvi(forged) == null)
    // an audio-only AVI (strh fccType != vids) has no video stream
    val audioOnly = good.clone()
    val strhType = indexOfTag(audioOnly, "vids")
    audioOnly(strhType) = 'a'; audioOnly(strhType + 1) = 'u'
    audioOnly(strhType + 2) = 'd'; audioOnly(strhType + 3) = 's'
    assert(AviCodecHelper.parseAvi(audioOnly) == null)
  }

  test("an undecodable frame counts as sampled-not-decoded") {
    val bytes = fixture(7L)
    // corrupt frame 0's JPEG SOI so its decode bails; the container walk
    // still finds it (chunk framing is intact)
    val info = AviCodecHelper.parseAvi(bytes)
    val frames = AviCodecHelper.frameBounds(bytes, info)
    val off = (frames(0) >>> 32).toInt
    val broken = bytes.clone()
    broken(off) = 0x00
    val row = AviCodecHelper.mjpegStats(broken, 1)
    assert(row != null)
    assert(row.getInt(1) == frames.length && row.getInt(2) == frames.length - 1)
    // all frames broken -> the all-zero empty convention for min/max
    val allBroken = bytes.clone()
    frames.foreach(fb => allBroken((fb >>> 32).toInt) = 0x00)
    val zrow = AviCodecHelper.mjpegStats(allBroken, 1)
    assert(zrow.getInt(2) == 0 && zrow.getLong(3) == 0L &&
      zrow.getInt(4) == 0 && zrow.getInt(5) == 0)
  }

  test("DHT-less MJPEG frames decode through the implied Annex K tables") {
    for (id <- 0L until 24L) {
      val w = 12 + (id % 13).toInt; val h = 8 + (id % 9).toInt
      def yb(bx: Int, by: Int) = ((bx * 17 + by * 23 + id * 9) % 256).toInt
      def cb(mx: Int, my: Int) = { val _ = my; ((mx * 13 + id * 7) % 256).toInt }
      def cr(mx: Int, my: Int) = { val _ = mx; ((my * 19 + id * 5) % 256).toInt }
      // frame 0 of the no-DHT fixture vs a DHT-carrying baseline encode
      // of the SAME blocks: Huffman tables only shape the bitstream, so
      // the decoded rasters must be byte-identical
      val noDht = Multimodal.jpegNoDhtBytes(w, h, yb, cb, cr)
      val withDht = Multimodal.jpegBaselineBytes(w, h, color = true,
        sub420 = true, yb, cb, cr, null, 0)
      // DHT-less without implied tables is corrupt -> honest null
      assert(MediaCodecHelper.decodeJpeg(noDht) == null, s"id $id implied off")
      val a = MediaCodecHelper.decodeJpeg(noDht, impliedStdTables = true)
      val b = MediaCodecHelper.decodeJpeg(withDht)
      assert(a != null && b != null, s"id $id decode failed")
      assert(a.width == w && a.height == h && a.bpp == 3)
      assert(java.util.Arrays.equals(a.pix, b.pix), s"id $id pixels")
    }
    // in-stream DHT overrides the implied tables: same result either way
    val own = Multimodal.grayJpegBytes(5L)
    val plain = MediaCodecHelper.decodeJpeg(own)
    val implied = MediaCodecHelper.decodeJpeg(own, impliedStdTables = true)
    assert(plain != null && implied != null)
    assert(java.util.Arrays.equals(plain.pix, implied.pix))
    // and through the container: every sampled frame decodes
    val avi = Multimodal.aviMjpegNoDhtBytes(9L)
    val row = AviCodecHelper.mjpegStats(avi, 2)
    assert(row != null)
    assert(row.getInt(1) == row.getInt(2), "sampled == decoded")
  }

  test("frames inside a LIST rec grouping are found") {
    // rewrap each 00dc chunk of a fixture into LIST(rec ) records by hand
    val id = 11L
    val w = 16 + (id % 17).toInt; val h = 9 + (id % 11).toInt
    val jpegs = (0 until 3).map { f =>
      Multimodal.jpegBaselineBytes(w, h, color = false, sub420 = false,
        yBlock = (bx, by) => ((bx * 29 + by * 41 + id * 7 + f * 13) % 256).toInt,
        cbBlock = null, crBlock = null, acSeed = null, restartInterval = 0)
    }
    val base = fixture(id)
    val info = AviCodecHelper.parseAvi(base)
    def le(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(t: String, d: Array[Byte]) = t.getBytes("US-ASCII") ++ le(d.length) ++
      d ++ (if (d.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    val movi = "movi".getBytes("US-ASCII") ++ jpegs.flatMap(j =>
      chunk("LIST", "rec ".getBytes("US-ASCII") ++ chunk("00dc", j))).toArray
    // splice: headers from the fixture up to its movi LIST, then our movi,
    // then patch the RIFF size to the new total
    val moviListStart = info.moviStart - 12
    val full = base.take(moviListStart) ++ chunk("LIST", movi)
    val sz = full.length - 8
    full(4) = (sz & 0xff).toByte; full(5) = ((sz >> 8) & 0xff).toByte
    full(6) = ((sz >> 16) & 0xff).toByte; full(7) = ((sz >> 24) & 0xff).toByte
    val info2 = AviCodecHelper.parseAvi(full)
    assert(info2 != null, "rec-grouped AVI did not parse")
    val frames = AviCodecHelper.frameBounds(full, info2)
    assert(frames != null && frames.length == 3)
    for (f <- 0 until 3)
      assert(AviCodecHelper.mjpegFrame(full, f).toSeq == jpegs(f).toSeq)
  }

  test("fuzz: random, bit-flipped and truncated blobs never throw") {
    val rnd = new scala.util.Random(20260815)
    val base = fixture(13L)
    for (i <- 0 until 600) {
      val b: Array[Byte] = (i % 3) match {
        case 0 => // pure noise
          val a = new Array[Byte](rnd.nextInt(256) + 1); rnd.nextBytes(a); a
        case 1 => // valid container with up to 8 flipped bytes (often
          // inside a length field or a frame's entropy stream)
          val a = base.clone()
          (0 to rnd.nextInt(8)).foreach(_ =>
            a(rnd.nextInt(a.length)) = rnd.nextInt(256).toByte)
          a
        case _ => base.take(rnd.nextInt(base.length + 1)) // truncation
      }
      // law: never an exception; any non-null result is internally sane
      val m = AviCodecHelper.aviMeta(b)
      if (m != null)
        assert(m.getInt(0) > 0 && m.getInt(1) > 0 && m.getInt(2) >= 0)
      val st = AviCodecHelper.mjpegStats(b, 1 + rnd.nextInt(3))
      if (st != null) {
        assert(st.getInt(2) <= st.getInt(1) && st.getInt(1) <= st.getInt(0))
        if (st.getInt(2) == 0)
          assert(st.getLong(3) == 0L && st.getInt(4) == 0 && st.getInt(5) == 0)
      }
      AviCodecHelper.mjpegFrame(b, rnd.nextInt(8))
    }
  }

  test("Column API: codegen'd video expressions match the helper") {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L, 40L).toDF("doc_id")
      .withColumn("avi", Multimodal.makeAviMjpeg(col("doc_id")))
    val rows = df.select(col("doc_id"),
        Multimodal.videoMeta(col("avi")).as("m"),
        Multimodal.videoFrameStats(col("avi"), 2).as("s"),
        Multimodal.decodeImage(Multimodal.jpegResizePng(
          Multimodal.videoFrame(col("avi"), 1), 8, 8)).as("t"))
      .selectExpr("doc_id", "m.width", "m.n_frames", "m.handler",
        "s.n_decoded", "s.px_sum", "t.px_sum AS t_sum")
      .collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 16 + (id % 17).toInt)
      assert(r.getInt(2) == 3 + (id % 5).toInt)
      assert(r.getString(3) == "MJPG")
      val expect = AviCodecHelper.mjpegStats(fixture(id), 2)
      assert(r.getInt(4) == expect.getInt(2) && r.getLong(5) == expect.getLong(3))
      // transcode sum replays the resize index map over frame 1's blocks
      val w = 16 + (id % 17).toInt; val h = 9 + (id % 11).toInt
      var s = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        s += ((x * w / 8) / 8 * 29 + (y * h / 8) / 8 * 41 + id * 7 + 13) % 256
      assert(r.getLong(6) == s, s"transcode sum for id $id")
    }
  }

  private def indexOfTag(b: Array[Byte], tag: String): Int = {
    val t = tag.getBytes("US-ASCII")
    var i = 0
    while (i + 4 <= b.length) {
      if (b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) && b(i + 3) == t(3))
        return i
      i += 1
    }
    -1
  }
}
