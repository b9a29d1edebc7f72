package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.expr.MediaCodecHelper
import graft.expr.MediaCodecHelper.Raster

/** Property tests for the PNG codec: ANY raster (arbitrary dims, gray or
  * RGB, arbitrary per-encode filter) must round-trip encode→decode to the
  * identical byte sequence, and resize must agree with the integer index
  * map on arbitrary source/target geometry.
  */
class MediaCodecPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], i: Int): A =
    g.pureApply(Gen.Parameters.default, Seed(1234L + i))

  private val geometry: Gen[(Int, Int, Int, Int)] = for {
    w <- Gen.choose(1, 80)
    h <- Gen.choose(1, 40)
    bpp <- Gen.oneOf(1, 3)
    filter <- Gen.choose(0, 4)
  } yield (w, h, bpp, filter)

  private def raster(w: Int, h: Int, bpp: Int, seed: Int): Array[Byte] = {
    val a = new Array[Byte](w * h * bpp)
    var s = seed | 1
    for (i <- a.indices) { s = s * 1103515245 + 12345; a(i) = (s >> 13).toByte }
    a
  }

  test("encode(filter)→decode is the identity for 200 arbitrary rasters") {
    for (i <- 0 until 200) {
      val (w, h, bpp, filter) = sample(geometry, i)
      val px = raster(w, h, bpp, i)
      val dec = MediaCodecHelper.decodePng(
        MediaCodecHelper.encodePng(new Raster(w, h, bpp, px), filter))
      assert(dec != null, s"case $i ${w}x$h bpp=$bpp filter=$filter did not decode")
      assert(dec.width == w && dec.height == h && dec.bpp == bpp, s"case $i header")
      assert(java.util.Arrays.equals(dec.pix, px),
        s"case $i ${w}x$h bpp=$bpp filter=$filter pixels corrupted")
    }
  }

  test("resize agrees with the integer index map for 100 arbitrary geometries") {
    val geo = for {
      sw <- Gen.choose(1, 60); sh <- Gen.choose(1, 30)
      dw <- Gen.choose(1, 24); dh <- Gen.choose(1, 24)
    } yield (sw, sh, dw, dh)
    for (i <- 0 until 100) {
      val (sw, sh, dw, dh) = sample(geo, i)
      val px = raster(sw, sh, 1, i)
      val enc = MediaCodecHelper.encodePng(new Raster(sw, sh, 1, px))
      val out = MediaCodecHelper.decodePng(
        MediaCodecHelper.pngResizeNearest(enc, dw, dh))
      assert(out != null && out.width == dw && out.height == dh, s"case $i")
      for (y <- 0 until dh; x <- 0 until dw) {
        val sx = x * sw / dw; val sy = y * sh / dh
        assert(out.pix(y * dw + x) == px(sy * sw + sx),
          s"case $i ($sw,$sh)->($dw,$dh) at ($x,$y)")
      }
    }
  }

  test("WAV frame-sampling composes: sampling twice = sampling the product step") {
    // step a then step b over the decimated stream picks frames at
    // indices that are multiples of a*b of the original — because each
    // re-encode is a canonical WAV, the composition law is exact
    val stepGen = for { a <- Gen.choose(1, 6); b <- Gen.choose(1, 6);
                        n <- Gen.choose(1, 400) } yield (a, b, n)
    for (i <- 0 until 100) {
      val (a, b, n) = sample(stepGen, i)
      val wav = graft.ops.Multimodal.wavBytes(8000, n)
      val twice = MediaCodecHelper.wavFrameSample(
        MediaCodecHelper.wavFrameSample(wav, a), b)
      val once = MediaCodecHelper.wavFrameSample(wav, a * b)
      assert(java.util.Arrays.equals(twice, once),
        s"case $i: step $a then $b != step ${a * b} over $n samples")
    }
  }

  test("jpegMeta: 500 arbitrary byte blobs never throw; valid prefixes parse") {
    // hostile-input law: the marker walk is total — null or a correct
    // struct, never an exception, never an out-of-range read
    val blobGen = for {
      n <- Gen.choose(0, 300)
      bs <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield bs.toArray
    for (i <- 0 until 500) {
      val raw = sample(blobGen, 7000 + i)
      MediaCodecHelper.jpegMeta(raw) // must not throw
      // same blob glued after a valid SOI: still total
      MediaCodecHelper.jpegMeta(Array[Byte](0xff.toByte, 0xd8.toByte) ++ raw)
      // corrupting one byte of a valid stream: total, and if it still
      // parses the dimensions must be sane (parsed from SOF bounds)
      val good = graft.ops.Multimodal.jpegBytes(16 + i % 50, 9 + i % 30,
        1 + i % 3)
      val pos = i % good.length
      val mutated = good.clone(); mutated(pos) = (mutated(pos) ^ 0x5a).toByte
      val r = MediaCodecHelper.jpegMeta(mutated)
      if (r != null) {
        assert(r.getInt(0) > 0 && r.getInt(1) > 0 && r.getInt(2) > 0)
      }
    }
  }
}
