package graft.expr

import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Real (not stubbed) pure-JVM media decode for the multimodal column
  * pipeline: PNG raster decode via `java.util.zip.Inflater` + full filter
  * reconstruction, baseline JPEG decode (Huffman + dequant + IDCT +
  * chroma upsample + YCbCr→RGB, ITU-T T.81), nearest-neighbor resize
  * with re-encode, and WAV PCM sample access via the bounded RIFF walk
  * ([[RiffWalkHelper]]).
  *
  * Scope (honest partial decoder, null on anything else — never garbage):
  *  - PNG: 8-bit depth, all five color types — 0 (grayscale), 2 (RGB),
  *    3 (palette, expanded to RGB — or RGBA when tRNS supplies per-entry
  *    alpha), 4 (gray+alpha), 6 (RGBA) — PLUS sub-byte depths 1/2/4 on
  *    types 0 and 3 (r17: the icon/fax/tiny-palette layouts, gray
  *    scaled by the exact 255/(2^d−1)); sequential OR Adam7-interlaced,
  *    any of the five scanline filters (None/Sub/Up/Average/Paeth).
  *    Color-key tRNS on types 0/2 synthesizes the alpha channel (gray →
  *    gray+alpha, RGB → RGBA; alpha 0 exactly on key matches). 16-bit
  *    depth decodes through [[png16Stats]] (full-precision statistics)
  *    and [[png16ResizeNearest]] (16-bit raster in/out); the 8-bit
  *    [[decodePng]] path returns null for it rather than fabricate a
  *    truncated raster.
  *  - JPEG: baseline/extended-sequential Huffman (SOF0/SOF1) — single
  *    interleaved scan OR multi-scan (non-interleaved, one full-band scan
  *    per component subset) — and progressive (SOF2, spectral selection +
  *    successive approximation per T.81 Annex G). 8-bit, gray or YCbCr
  *    with sampling factors 1–2 (4:4:4/4:2:2/4:2:0), restart markers,
  *    multi-table DQT/DHT; a stream with NO DHT before its first scan
  *    decodes via the T.81 Annex K implied standard tables (the OpenDML
  *    MJPEG convention — [[decodeJpegAuto]]). LOSSLESS frames (SOF3,
  *    Annex H — Huffman DPCM, 2–16 bit, predictors 1–7, point
  *    transform) decode through [[jpegLosslessStats]] at full precision
  *    (r17; like 16-bit PNG, no truncated raster is fabricated), and
  *    12-BIT extended-sequential gray (SOF1 — the DICOM shape) through
  *    [[jpeg12Stats]] with the 2^11 level shift and [0, 4095] clamp
  *    (r17). Arithmetic coding and hierarchical frames return null.
  *  - WAV: integer PCM at 8 (unsigned, reported center-zeroed), 16, 24
  *    and 32 bits, G.711 µ-law/A-law, IEEE float32 (reported on the
  *    16-bit integer lattice: floor(f·2^15), a power-of-two scale so the
  *    mapping is exact), and WAVE_FORMAT_EXTENSIBLE wrapping any of
  *    those — located through the chunk walk (LIST/fact chunks before
  *    `fmt ` are fine); float64 rides the same exact lattice (scaling a
  *    double by 2^15 only shifts the exponent). IMA/DVI ADPCM (codec
  *    0x11) decodes through the sequential block recurrence, and
  *    Microsoft ADPCM (codec 0x02) through its coefficient-pair
  *    predictor with the in-stream table (both r17); other compressed
  *    codecs return null.
  *  - GIF: [[decodeGif]] is the STRICT single-image path — first frame
  *    only, and since r15 it returns null when that frame sits at a
  *    nonzero offset or is smaller than the logical screen (envelope
  *    NARROWING vs earlier rounds: such frames previously decoded
  *    image-local, which diverges from any compositing renderer — a
  *    lower decode rate here is the honest-null policy working, not a
  *    regression). Animation, sub-rect frames, transparency and GCE
  *    disposal methods 0–3 are the [[gifAnimStats]] compositing path;
  *    [[gifMeta]] counts frames without decoding.
  *
  * Everything here is per-value scan-side work wrapped in codegen'd
  * expressions (static call per value, same pattern as [[RecodeHelper]]),
  * so decode/resize/feature-extract stay inside whole-stage codegen and
  * scale as a map over the binary column — no shuffle, no driver
  * involvement, memory bounded by one blob per row.
  *
  * Why decode can be real here with zero codec libraries: PNG's IDAT is a
  * zlib stream (java.util.zip) and the filter pass is ~40 lines of integer
  * arithmetic; baseline JPEG is canonical-Huffman bit reading plus an 8×8
  * IDCT, all bounded public-spec work; WAV PCM is length-prefixed
  * little-endian integers. The remaining `decodeImageStub` seam in
  * ops/Multimodal covers only INTER-FRAME video codecs
  * (H.264/HEVC/VP9/AV1) — the one family that genuinely needs an
  * external codec; MJPEG-in-AVI (DHT-ful and DHT-less) decodes here.
  */
object MediaCodecHelper {

  // ---------------- PNG ----------------

  /** Decoded raster: interleaved channel bytes, `bpp` bytes per pixel. */
  final class Raster(val width: Int, val height: Int, val bpp: Int,
                     val pix: Array[Byte])

  private def beInt(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  private val PngSig = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  /** Adam7 pass geometry: (x0, y0, dx, dy) per pass (PNG spec §8.2). */
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Decode a PNG within the supported envelope; null otherwise (bad
    * magic, unsupported layout, truncated/corrupt stream). Bounds-checked
    * chunk walk — adversarial lengths cannot read out of range.
    *
    * Depth 8 on all five color types; SUB-BYTE depths 1/2/4 on gray
    * (type 0) and palette (type 3) — exactly the spec's table 11.1
    * envelope (r17; the icon/fax/tiny-palette layouts). Sub-byte rows
    * unfilter at their bit-packed byte stride (the spec's byte-level
    * bpp=1 filter rule), unpack MSB-first, then gray scales to 8-bit by
    * 255/(2^d−1) — the exact factors 255/85/17 — while palette indices
    * look up unscaled.
    *
    * Palette images expand to RGB (or RGBA when a tRNS chunk supplies
    * per-entry alpha; entries beyond the tRNS array default to 255 per
    * the spec). tRNS on color types 0/2 is single-color-KEY transparency:
    * the decoder synthesizes the alpha channel a compositing renderer
    * would — gray expands to gray+alpha (bpp 2), RGB to RGBA (bpp 4),
    * alpha 0 exactly where the sample(s) equal the key, 255 elsewhere.
    * The key rides in 16-bit fields; for this 8-bit envelope a key above
    * 255 simply never matches (fully opaque output), per the numeric
    * comparison the spec defines.
    */
  def decodePng(bytes: Array[Byte]): Raster = {
    if (bytes == null || bytes.length < 33) return null
    var i = 0
    while (i < 8) { if (bytes(i) != PngSig(i)) return null; i += 1 }
    var off = 8
    var w = 0; var h = 0; var bpp = 0; var color = -1; var d = 8
    var interlaced = false
    var plte: Array[Int] = null
    var trns: Array[Byte] = null
    var keyR = -1; var keyG = -1; var keyB = -1 // color-key (types 0/2)
    var idat: java.io.ByteArrayOutputStream = null
    var idatStarted = false // PLTE/tRNS must precede all image data
    while (off + 8 <= bytes.length) {
      val len = beInt(bytes, off)
      if (len < 0 || off + 12L + len > bytes.length) return null
      val tag = new String(bytes, off + 4, 4, "US-ASCII")
      tag match {
        case "IHDR" =>
          if (len != 13) return null
          w = beInt(bytes, off + 8); h = beInt(bytes, off + 12)
          val depth = bytes(off + 16); color = bytes(off + 17)
          val interlace = bytes(off + 20)
          // depth 8 on all types; sub-byte depths 1/2/4 exactly where
          // the spec allows them (types 0 and 3 — table 11.1): the
          // icon/fax/tiny-palette layouts
          val subByte = (depth == 1 || depth == 2 || depth == 4) &&
            (color == 0 || color == 3)
          if ((depth != 8 && !subByte) || interlace < 0 || interlace > 1)
            return null
          d = depth
          interlaced = interlace == 1
          // bytes per pixel IN THE CODED STREAM (palette = 1 index byte;
          // sub-byte samples unpack to 1 byte each after unfiltering)
          bpp = color match {
            case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
            case _ => return null
          }
          // cap decoded size at 64 MiB so a forged header can't OOM an
          // executor; palette may expand 1 -> 4 bytes and color-key tRNS
          // adds an alpha byte, so cap on the worst-case output pixel size
          val outBpp = color match {
            case 0 => 2; case 2 => 4; case 3 => 4; case _ => bpp
          }
          if (w <= 0 || h <= 0 || w.toLong * h * outBpp > 64L * 1024 * 1024)
            return null
          idat = new java.io.ByteArrayOutputStream()
        case "PLTE" =>
          // spec §5.6 chunk ordering: PLTE before the first IDAT
          if (idat == null || idatStarted ||
              len % 3 != 0 || len == 0 || len > 768) return null
          val n = len / 3
          plte = new Array[Int](n)
          var p = 0
          while (p < n) {
            plte(p) = ((bytes(off + 8 + 3 * p) & 0xff) << 16) |
              ((bytes(off + 9 + 3 * p) & 0xff) << 8) |
              (bytes(off + 10 + 3 * p) & 0xff)
            p += 1
          }
        case "tRNS" =>
          // same ordering rule as PLTE: before the first IDAT
          if (idat == null || idatStarted) return null
          color match {
            case 3 =>
              if (plte == null || len > plte.length) return null
              trns = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
            case 0 => // color-key: one 16-bit gray sample
              if (len != 2) return null
              keyG = ((bytes(off + 8) & 0xff) << 8) | (bytes(off + 9) & 0xff)
            case 2 => // color-key: three 16-bit samples (R, G, B)
              if (len != 6) return null
              keyR = ((bytes(off + 8) & 0xff) << 8) | (bytes(off + 9) & 0xff)
              keyG = ((bytes(off + 10) & 0xff) << 8) | (bytes(off + 11) & 0xff)
              keyB = ((bytes(off + 12) & 0xff) << 8) | (bytes(off + 13) & 0xff)
            case _ => return null // tRNS on an alpha-bearing type: invalid
          }
        case "IDAT" =>
          if (idat == null) return null
          idatStarted = true
          idat.write(bytes, off + 8, len)
        case "IEND" =>
          if (idat == null) return null
          if (color == 3 && plte == null) return null
          val pix0 = reconstruct(idat.toByteArray, w, h, bpp, interlaced, d)
          if (pix0 == null) return null
          // sub-byte gray scales to 8-bit by the spec's 255/(2^d−1)
          // factor (255, 85, 17 — all exact); the color key compares in
          // RAW sample space, so a valid key scales with the samples and
          // an out-of-range key becomes unmatchable (256 > any byte)
          // while still synthesizing the (fully opaque) alpha channel,
          // exactly the 8-bit path's key>255 behavior. Palette indices
          // are never scaled.
          val pix =
            if (d < 8 && color == 0) {
              val scale = 255 / ((1 << d) - 1)
              if (keyG >= 0)
                keyG = if (keyG <= (1 << d) - 1) keyG * scale else 256
              val sc = new Array[Byte](pix0.length)
              var i = 0
              while (i < pix0.length) {
                sc(i) = ((pix0(i) & 0xff) * scale).toByte
                i += 1
              }
              sc
            } else pix0
          if (color == 0 && keyG >= 0) {
            // gray + synthesized color-key alpha
            val out = new Array[Byte](w * h * 2)
            var p = 0
            while (p < pix.length) {
              val g = pix(p) & 0xff
              out(p * 2) = pix(p)
              out(p * 2 + 1) = if (g == keyG) 0 else -1
              p += 1
            }
            return new Raster(w, h, 2, out)
          }
          if (color == 2 && keyG >= 0) {
            // RGB + synthesized color-key alpha (all three must match)
            val n = w * h
            val out = new Array[Byte](n * 4)
            var p = 0
            while (p < n) {
              val r = pix(p * 3) & 0xff
              val g = pix(p * 3 + 1) & 0xff
              val bl = pix(p * 3 + 2) & 0xff
              out(p * 4) = pix(p * 3)
              out(p * 4 + 1) = pix(p * 3 + 1)
              out(p * 4 + 2) = pix(p * 3 + 2)
              out(p * 4 + 3) =
                if (r == keyR && g == keyG && bl == keyB) 0 else -1
              p += 1
            }
            return new Raster(w, h, 4, out)
          }
          if (color != 3) return new Raster(w, h, bpp, pix)
          // palette expansion: index -> RGB, or RGBA when tRNS is present
          val obpp = if (trns == null) 3 else 4
          val out = new Array[Byte](w * h * obpp)
          var p = 0
          while (p < pix.length) {
            val idx = pix(p) & 0xff
            if (idx >= plte.length) return null // corrupt index stream
            val c = plte(idx)
            out(p * obpp) = (c >> 16).toByte
            out(p * obpp + 1) = ((c >> 8) & 0xff).toByte
            out(p * obpp + 2) = (c & 0xff).toByte
            if (obpp == 4)
              out(p * obpp + 3) = if (idx < trns.length) trns(idx) else -1
            p += 1
          }
          return new Raster(w, h, obpp, out)
        case _ => // ancillary chunk — skip
      }
      off += 12 + len
    }
    null // no IEND
  }

  /** Inflate exactly `expect` bytes of the zlib stream; null on
    * truncation, overrun, corruption, or a preset-dictionary header.
    */
  private def inflateFully(z: Array[Byte], expect: Int): Array[Byte] = {
    val raw = new Array[Byte](expect)
    val inf = new Inflater()
    inf.setInput(z)
    var got = 0
    try {
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        // n == 0 while unfinished covers BOTH truncation (needsInput) and
        // a preset-dictionary stream (needsDictionary) — bailing only on
        // needsInput would spin forever on an FDICT zlib header
        if (n == 0) return null
        got += n
      }
    } catch { case _: java.util.zip.DataFormatException => return null }
    finally inf.end()
    if (got != raw.length) return null
    raw
  }

  /** Undo the per-row filters of one (sub-)image whose filtered rows
    * start at `raw(rawOff)`, returning the h·stride pixel bytes. Works on
    * the whole image (non-interlaced) and on each Adam7 pass (each pass
    * is filtered as an independent image: "left" is bpp back within the
    * pass row, "up" is the previous row of the same pass). `stride` is
    * the CODED row length in bytes — w·bpp at depths ≥ 8, the
    * bit-packed ceil(w·depth/8) below (where the spec fixes the filter
    * bpp at 1: filtering is byte-level arithmetic regardless of how many
    * sub-byte samples share a byte, §9). null on an unknown filter type.
    */
  private def unfilterPass(raw: Array[Byte], rawOff: Int, stride: Int,
                           h: Int, bpp: Int): Array[Byte] = {
    val pix = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val filter = raw(rawOff + y * (stride + 1)) & 0xff
      val ro = rawOff + y * (stride + 1) + 1
      val po = y * stride
      var x = 0
      filter match {
        case 0 =>
          System.arraycopy(raw, ro, pix, po, stride)
        case 1 => // Sub: left
          while (x < stride) {
            val left = if (x >= bpp) pix(po + x - bpp) & 0xff else 0
            pix(po + x) = ((raw(ro + x) & 0xff) + left).toByte; x += 1
          }
        case 2 => // Up
          while (x < stride) {
            val up = if (y > 0) pix(po - stride + x) & 0xff else 0
            pix(po + x) = ((raw(ro + x) & 0xff) + up).toByte; x += 1
          }
        case 3 => // Average
          while (x < stride) {
            val left = if (x >= bpp) pix(po + x - bpp) & 0xff else 0
            val up = if (y > 0) pix(po - stride + x) & 0xff else 0
            pix(po + x) = ((raw(ro + x) & 0xff) + (left + up) / 2).toByte; x += 1
          }
        case 4 => // Paeth
          while (x < stride) {
            val a = if (x >= bpp) pix(po + x - bpp) & 0xff else 0
            val b = if (y > 0) pix(po - stride + x) & 0xff else 0
            val c = if (x >= bpp && y > 0) pix(po - stride + x - bpp) & 0xff else 0
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            pix(po + x) = ((raw(ro + x) & 0xff) + pred).toByte; x += 1
          }
        case _ => return null
      }
      y += 1
    }
    pix
  }

  /** Unpack a bit-packed sub-byte sample grid (depth 1/2/4, MSB-first
    * within each byte, rows independently padded to whole bytes per
    * spec §7.2) into one byte per RAW sample value (0..2^d−1, unscaled).
    */
  private def unpackSub(packed: Array[Byte], w: Int, h: Int, d: Int): Array[Byte] = {
    val rowBytes = (w * d + 7) / 8
    val out = new Array[Byte](w * h)
    val mask = (1 << d) - 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val bit = x * d
        val b = packed(y * rowBytes + (bit >> 3)) & 0xff
        out(y * w + x) = ((b >> (8 - d - (bit & 7))) & mask).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Inflate + unfilter the coded pixel stream — sequential, or the seven
    * Adam7 passes scattered back to raster order. Returns interleaved
    * channel bytes (bpp per pixel) or null. At sub-byte depths (1/2/4,
    * `bpp` must be 1) rows are bit-packed: each (sub-)image unfilters at
    * its ceil(w·depth/8) byte stride with the spec's byte-level bpp=1
    * filter rule, then unpacks to one RAW (unscaled) sample per byte —
    * so Adam7 scatter and every downstream consumer see one byte per
    * sample exactly as at depth 8.
    */
  private def reconstruct(z: Array[Byte], w: Int, h: Int, bpp: Int,
                          interlaced: Boolean, depth: Int = 8): Array[Byte] = {
    def rowBytes(pw: Int): Int =
      if (depth >= 8) pw * bpp else (pw * depth + 7) / 8
    if (!interlaced) {
      val stride = rowBytes(w)
      val raw = inflateFully(z, h * (stride + 1))
      if (raw == null) return null
      val up = unfilterPass(raw, 0, stride, h, if (depth >= 8) bpp else 1)
      if (up == null || depth >= 8) return up
      return unpackSub(up, w, h, depth)
    }
    // pass sizes; the inflated stream is the concatenation of the seven
    // filtered sub-images, empty passes contributing nothing
    var total = 0L
    val pw = new Array[Int](7); val ph = new Array[Int](7)
    var p = 0
    while (p < 7) {
      val (x0, y0, dx, dy) = Adam7(p)
      pw(p) = if (w > x0) (w - x0 + dx - 1) / dx else 0
      ph(p) = if (h > y0) (h - y0 + dy - 1) / dy else 0
      if (pw(p) > 0 && ph(p) > 0) total += ph(p).toLong * (rowBytes(pw(p)) + 1)
      p += 1
    }
    if (total > Int.MaxValue) return null
    val raw = inflateFully(z, total.toInt)
    if (raw == null) return null
    val outBpp = if (depth >= 8) bpp else 1
    val pix = new Array[Byte](w * h * outBpp)
    var rawOff = 0
    p = 0
    while (p < 7) {
      if (pw(p) > 0 && ph(p) > 0) {
        val stride = rowBytes(pw(p))
        val up = unfilterPass(raw, rawOff, stride, ph(p),
          if (depth >= 8) bpp else 1)
        if (up == null) return null
        val pp = if (depth >= 8) up else unpackSub(up, pw(p), ph(p), depth)
        rawOff += ph(p) * (stride + 1)
        val (x0, y0, dx, dy) = Adam7(p)
        var py = 0
        while (py < ph(p)) {
          val y = y0 + py * dy
          var px = 0
          while (px < pw(p)) {
            val x = x0 + px * dx
            var c = 0
            while (c < outBpp) {
              pix((y * w + x) * outBpp + c) = pp((py * pw(p) + px) * outBpp + c)
              c += 1
            }
            px += 1
          }
          py += 1
        }
      }
      p += 1
    }
    pix
  }

  /** Encode a raster back to PNG (filter 0 rows, or a fixed filter for
    * tests exercising the unfilter paths). Shares no state with the
    * fixture generator in ops/Multimodal — this is the production path.
    * `depth` 8 (bpp = channels, one byte per sample) or 16 (bpp =
    * 2·channels, big-endian sample pairs — PNG filtering is byte-level
    * regardless of depth, so the same filter loop serves both).
    */
  def encodePng(r: Raster, filterType: Int = 0, depth: Int = 8): Array[Byte] = {
    require(filterType >= 0 && filterType <= 4, s"bad filter $filterType")
    require(depth == 8 || depth == 16, s"bad depth $depth")
    val stride = r.width * r.bpp
    val raw = new Array[Byte](r.height * (stride + 1))
    var y = 0
    while (y < r.height) {
      raw(y * (stride + 1)) = filterType.toByte
      val ro = y * (stride + 1) + 1
      val po = y * stride
      var x = 0
      while (x < stride) {
        val cur = r.pix(po + x) & 0xff
        val a = if (x >= r.bpp) r.pix(po + x - r.bpp) & 0xff else 0
        val b = if (y > 0) r.pix(po - stride + x) & 0xff else 0
        val c = if (x >= r.bpp && y > 0) r.pix(po - stride + x - r.bpp) & 0xff else 0
        val v = filterType match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            cur - pred
        }
        raw(ro + x) = v.toByte
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    def be(i: Int): Array[Byte] =
      Array(((i >> 24) & 0xff).toByte, ((i >> 16) & 0xff).toByte,
        ((i >> 8) & 0xff).toByte, (i & 0xff).toByte)
    def chunk(tag: String, data: Array[Byte]): Unit = {
      out.write(be(data.length))
      val tagged = tag.getBytes("US-ASCII") ++ data
      out.write(tagged)
      val crc = new CRC32(); crc.update(tagged)
      out.write(be(crc.getValue.toInt))
    }
    out.write(PngSig)
    val channels = if (depth == 16) r.bpp / 2 else r.bpp
    if (depth == 16) require(r.bpp % 2 == 0, s"odd 16-bit bpp ${r.bpp}")
    val color: Byte = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
      case b => throw new IllegalArgumentException(s"unencodable bpp $b")
    }
    chunk("IHDR", be(r.width) ++ be(r.height) ++
      Array[Byte](depth.toByte, color, 0, 0, 0))
    val def_ = new Deflater()
    def_.setInput(raw); def_.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    while (!def_.finished()) zout.write(buf, 0, def_.deflate(buf))
    def_.end()
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.empty)
    out.toByteArray
  }

  /** 16-BIT PNG sample statistics — the scientific/depth-image layouts
    * (gray16, RGB16, gray+alpha16, RGBA16; palette cannot be 16-bit):
    * struct(width, height, channels, px_sum, px_min, px_max) over the
    * big-endian 16-bit SAMPLES. PNG filtering is defined on BYTES with
    * bpp = bytes-per-pixel regardless of depth (spec §9), so the depth-8
    * unfilter and Adam7 machinery above apply verbatim with bpp =
    * 2·channels; only the sample read differs. No 8-bit raster is
    * fabricated (truncating high bytes would diverge from any real
    * decoder) — stats are computed directly at full precision, which is
    * what a gating/dedup pipeline consumes. Null outside the envelope.
    */
  def png16Stats(bytes: Array[Byte]): InternalRow = {
    val r = decodePng16(bytes)
    if (r == null) return null
    val channels = r.bpp / 2
    var sum = 0L; var mn = 65535; var mx = 0
    var p = 0
    while (p < r.pix.length) {
      val v = ((r.pix(p) & 0xff) << 8) | (r.pix(p + 1) & 0xff)
      sum += v; if (v < mn) mn = v; if (v > mx) mx = v
      p += 2
    }
    new GenericInternalRow(
      Array[Any](r.width, r.height, channels, sum, mn, mx))
  }

  /** Full 16-bit PNG raster decode: Raster with bpp = 2·channels where
    * each sample is a big-endian byte pair at FULL precision — no 8-bit
    * truncation. Same chunk walk and envelope as [[png16Stats]]
    * (gray16/RGB16/gray+alpha16/RGBA16, sequential or Adam7); null
    * outside it. Color-key tRNS on types 0/2 (r17) synthesizes a 16-bit
    * alpha channel exactly as the 8-bit path does — gray16 →
    * gray+alpha16, RGB16 → RGBA16, alpha 0x0000 where the full-precision
    * sample(s) equal the key, 0xFFFF elsewhere; at depth 16 every key
    * value is reachable, so the comparison is the spec's plain 16-bit
    * sample equality. tRNS on alpha-bearing types stays invalid, and the
    * §5.6 ordering rule (tRNS before the first IDAT) holds.
    */
  def decodePng16(bytes: Array[Byte]): Raster = {
    if (bytes == null || bytes.length < 33) return null
    var i = 0
    while (i < 8) { if (bytes(i) != PngSig(i)) return null; i += 1 }
    var off = 8
    var w = 0; var h = 0; var channels = 0; var color = -1
    var interlaced = false
    var keyR = -1; var keyG = -1; var keyB = -1 // color-key (types 0/2)
    var idat: java.io.ByteArrayOutputStream = null
    var idatStarted = false // tRNS must precede all image data (§5.6)
    while (off + 8 <= bytes.length) {
      val len = beInt(bytes, off)
      if (len < 0 || off + 12L + len > bytes.length) return null
      val tag = new String(bytes, off + 4, 4, "US-ASCII")
      tag match {
        case "IHDR" =>
          if (len != 13) return null
          w = beInt(bytes, off + 8); h = beInt(bytes, off + 12)
          val depth = bytes(off + 16); color = bytes(off + 17)
          val interlace = bytes(off + 20)
          if (depth != 16 || interlace < 0 || interlace > 1) return null
          interlaced = interlace == 1
          channels = color match {
            case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
            case _ => return null
          }
          // cap on the worst-case OUTPUT size: color-key synthesis can
          // add one 16-bit alpha channel on types 0/2
          val outCh = color match {
            case 0 => 2; case 2 => 4; case _ => channels
          }
          if (w <= 0 || h <= 0 ||
              w.toLong * h * 2 * outCh > 64L * 1024 * 1024) return null
          idat = new java.io.ByteArrayOutputStream()
        case "tRNS" =>
          if (idat == null || idatStarted) return null
          color match {
            case 0 => // color-key: one 16-bit gray sample
              if (len != 2) return null
              keyG = ((bytes(off + 8) & 0xff) << 8) | (bytes(off + 9) & 0xff)
            case 2 => // color-key: three 16-bit samples (R, G, B)
              if (len != 6) return null
              keyR = ((bytes(off + 8) & 0xff) << 8) | (bytes(off + 9) & 0xff)
              keyG = ((bytes(off + 10) & 0xff) << 8) | (bytes(off + 11) & 0xff)
              keyB = ((bytes(off + 12) & 0xff) << 8) | (bytes(off + 13) & 0xff)
            case _ => return null // tRNS on an alpha-bearing type: invalid
          }
        case "IDAT" =>
          if (idat == null) return null
          idatStarted = true
          idat.write(bytes, off + 8, len)
        case "IEND" =>
          if (idat == null) return null
          val pix = reconstruct(idat.toByteArray, w, h, 2 * channels,
            interlaced)
          if (pix == null) return null
          if (keyG < 0) return new Raster(w, h, 2 * channels, pix)
          def s16(o: Int): Int = ((pix(o) & 0xff) << 8) | (pix(o + 1) & 0xff)
          val n = w * h
          val inB = 2 * channels; val outB = inB + 2
          val out = new Array[Byte](n * outB)
          var p = 0
          while (p < n) {
            System.arraycopy(pix, p * inB, out, p * outB, inB)
            val opaque =
              if (color == 0) s16(p * inB) != keyG
              else s16(p * inB) != keyR || s16(p * inB + 2) != keyG ||
                s16(p * inB + 4) != keyB
            val a: Byte = if (opaque) -1 else 0
            out(p * outB + inB) = a
            out(p * outB + inB + 1) = a
            p += 1
          }
          return new Raster(w, h, outB, out)
        case _ => // ancillary chunk — skip
      }
      off += 12 + len
    }
    null // no IEND
  }

  /** Nearest-neighbor resize of a 16-BIT PNG, re-encoded as 16-bit PNG —
    * the raster path for scientific/depth images (`sx = x·srcW/dstW`
    * integer floor, the same oracle-replayable index math as
    * [[pngResizeNearest]]); samples are copied as whole big-endian byte
    * pairs, so full precision survives the roundtrip. null when the
    * input is outside the 16-bit envelope.
    */
  def png16ResizeNearest(bytes: Array[Byte], dstW: Int, dstH: Int): Array[Byte] = {
    val r = decodePng16(bytes)
    if (r == null) return null
    val out = new Array[Byte](dstW * dstH * r.bpp)
    var y = 0
    while (y < dstH) {
      val sy = y * r.height / dstH
      var x = 0
      while (x < dstW) {
        val sx = x * r.width / dstW
        var c = 0
        while (c < r.bpp) {
          out((y * dstW + x) * r.bpp + c) = r.pix((sy * r.width + sx) * r.bpp + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    encodePng(new Raster(dstW, dstH, r.bpp, out), 0, depth = 16)
  }

  /** struct(width, height, channels, px_sum, px_min, px_max) over all
    * channel bytes of the decoded raster; null if not decodable. Integer
    * outputs by design: the DuckDB oracle reproduces them exactly (no
    * float-summation-order hazards), and mean is a trivial downstream
    * `px_sum / (width*height*channels)`.
    */
  def pngStats(bytes: Array[Byte]): InternalRow = {
    val r = decodePng(bytes)
    if (r == null) return null
    var sum = 0L; var mn = 255; var mx = 0
    var i = 0
    while (i < r.pix.length) {
      val v = r.pix(i) & 0xff
      sum += v; if (v < mn) mn = v; if (v > mx) mx = v
      i += 1
    }
    new GenericInternalRow(Array[Any](r.width, r.height, r.bpp, sum, mn, mx))
  }

  val PngStatsType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("px_sum", LongType, nullable = false),
    StructField("px_min", IntegerType, nullable = false),
    StructField("px_max", IntegerType, nullable = false)))

  /** Nearest-neighbor resize, re-encoded as PNG. Source index math is
    * plain integer floor — `sx = x * srcW / dstW` — so an oracle can
    * reproduce the resized raster exactly. null if input not decodable.
    */
  def pngResizeNearest(bytes: Array[Byte], dstW: Int, dstH: Int): Array[Byte] = {
    val r = decodePng(bytes)
    if (r == null) return null
    val out = new Array[Byte](dstW * dstH * r.bpp)
    var y = 0
    while (y < dstH) {
      val sy = y * r.height / dstH
      var x = 0
      while (x < dstW) {
        val sx = x * r.width / dstW
        var c = 0
        while (c < r.bpp) {
          out((y * dstW + x) * r.bpp + c) = r.pix((sy * r.width + sx) * r.bpp + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    encodePng(new Raster(dstW, dstH, r.bpp, out))
  }

  // ---------------- JPEG (baseline decode) ----------------

  /** Zigzag index → natural raster position (row*8+col), ITU-T T.81
    * Figure A.6. The fixture encoder in ops/Multimodal generates its own
    * zigzag algorithmically — no shared table between test-data
    * construction and production decode.
    */
  private val JpegZigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** IDCT basis: IdctCos(u)(x) = C(u)/2 · cos((2x+1)uπ/16), C(0)=1/√2.
    * StrictMath so the table is bit-identical on every JVM; the fixture
    * coefficients are chosen so every decoded value sits ≥0.016 from a
    * rounding boundary (vs ~1e-13 double noise), making the integer
    * outputs deterministic and oracle-replayable.
    */
  private val IdctCos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
    cu / 2.0 * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
  }

  /** Control-flow bail for malformed/out-of-envelope streams: the decoder
    * throws this (or any runtime exception from a bounds check) and the
    * public entry point returns null — honest "can't decode", never
    * garbage pixels.
    */
  private object JpegBail extends RuntimeException with scala.util.control.NoStackTrace

  /** Canonical Huffman table from a DHT segment's BITS/HUFFVAL, decoded by
    * the mincode/maxcode/valptr walk of ITU-T T.81 §F.2.2.3.
    */
  private final class JHuff(counts: Array[Int], val vals: Array[Int]) {
    val minc = new Array[Int](17)
    val maxc = Array.fill(17)(-1)
    val vptr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (counts(l - 1) > 0) {
          vptr(l) = k; minc(l) = code
          code += counts(l - 1); k += counts(l - 1)
          maxc(l) = code - 1
        }
        code <<= 1; l += 1
      }
      if (k != vals.length) throw JpegBail
    }
  }

  // ---------------- implied standard Huffman tables (T.81 Annex K) ----
  //
  // AVI MJPEG frames commonly omit DHT segments entirely, relying on the
  // OpenDML convention that the decoder supplies the "typical" tables of
  // ITU-T T.81 Annex K (Tables K.3–K.6: DC/AC, luminance/chrominance).
  // [[decodeJpeg]] with impliedStdTables=true preloads slots 0 (luma) and
  // 1 (chroma) with these; any DHT actually present overrides them, so
  // mixed streams decode too. The standalone image path never implies
  // tables — a DHT-less still image is simply corrupt.

  private val StdDcLumaCounts = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcChromaCounts = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val StdDcVals = (0 to 11).toArray

  private val StdAcLumaCounts = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val StdAcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)
  private val StdAcChromaCounts = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val StdAcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  private lazy val StdDcHuff: Array[JHuff] = Array(
    new JHuff(StdDcLumaCounts, StdDcVals),
    new JHuff(StdDcChromaCounts, StdDcVals))
  private lazy val StdAcHuff: Array[JHuff] = Array(
    new JHuff(StdAcLumaCounts, StdAcLumaVals),
    new JHuff(StdAcChromaCounts, StdAcChromaVals))

  /** MSB-first bit reader over entropy-coded data with FF00 unstuffing.
    * Any non-stuffing marker hit mid-read throws (entropy data may contain
    * any byte sequence only via stuffing; a bare marker there is corrupt
    * or an unsupported layout). Restart markers are consumed only at the
    * decoder's expected MCU boundaries via [[restart]].
    */
  private final class JBits(b: Array[Byte], var pos: Int, end: Int) {
    private var buf = 0
    private var cnt = 0
    def bit(): Int = {
      if (cnt == 0) {
        if (pos >= end) throw JpegBail
        val v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          if (pos >= end) throw JpegBail
          if ((b(pos) & 0xff) != 0x00) throw JpegBail
          pos += 1
        }
        buf = v; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume the expected RSTn marker. */
    def restart(idx: Int): Unit = {
      cnt = 0
      if (pos + 2 > end) throw JpegBail
      if ((b(pos) & 0xff) != 0xff || (b(pos + 1) & 0xff) != (0xd0 + idx)) throw JpegBail
      pos += 2
    }
  }

  private def jDecodeSym(r: JBits, t: JHuff): Int = {
    var code = 0; var l = 0
    while (l < 16) {
      code = (code << 1) | r.bit(); l += 1
      if (t.maxc(l) >= 0 && code <= t.maxc(l))
        return t.vals(t.vptr(l) + code - t.minc(l))
    }
    throw JpegBail
  }

  /** T.81 §F.2.2.1 EXTEND: map a `t`-bit magnitude to its signed value. */
  private def jExtend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private final class JComp {
    var id = 0
    var h = 1; var v = 1; var tq = 0
    var td = 0; var ta = 0
    var plane: Array[Byte] = null
    var planeW = 0
    var pred = 0
    // progressive only: full-image quantized coefficients, zigzag order
    // per block, on the PADDED (MCU-aligned) block grid
    var coefs: Array[Int] = null
    var bw = 0 // padded grid width in blocks (row stride)
    var bh = 0 // padded grid height in blocks
    var rw = 0 // real (non-interleaved) grid width in blocks
    var rh = 0 // real grid height in blocks
  }

  /** Full baseline JPEG decode — Huffman entropy decode, dequantization,
    * floating IDCT with deterministic rounding, 4:2:0/4:2:2/4:4:4 chroma
    * replication upsample, integer YCbCr→RGB. Pure JVM, zero codec
    * libraries: every piece is bounded public-spec work (ITU-T T.81),
    * same pattern as the PNG inflate+unfilter path above.
    *
    * Envelope (null outside it — honest partial decoder, never garbage):
    * SOF0/SOF1 (baseline/extended sequential, Huffman) in a single
    * interleaved scan or split across multiple full-band non-interleaved
    * scans, SOF2 progressive (spectral selection + successive
    * approximation, Huffman, per the Annex G machinery below), AND the
    * ARITHMETIC-coded frames SOF9 (extended sequential — single
    * interleaved scan OR the non-interleaved multi-scan layout) and
    * SOF10 (progressive: DC/AC first + refinement scans, per-scan
    * statistics segments) — the T.81 Annex D QM-coder with the
    * F.1.4.4/G.2 statistical models and DAC conditioning. 8-bit
    * precision, 1 or 3 components, sampling factors 1 or 2, restart
    * markers, 8- or 16-bit quant tables. Null only for 12-bit precision
    * and lossless/hierarchical frames — lossless (SOF3/SOF11) and 12-bit
    * gray (SOF1) decode at full precision through the dedicated
    * [[jpegLosslessStats]] / [[jpeg12Stats]] paths, never through this
    * 8-bit raster one. Hierarchical frames (Annex J) stay null — the
    * one T.81 coding process with no mainstream decoder support either.
    *
    * Output: gray raster (bpp=1) for 1 component; interleaved RGB (bpp=3)
    * for 3, converted with the fixed-point CCIR 601 constants
    * (91881/22554/46802/116130 : 65536) and floor((x+32768)>>16) rounding
    * so an oracle replays the exact integers.
    */
  def decodeJpeg(bytes: Array[Byte]): Raster = decodeJpeg(bytes, false)

  /** As [[decodeJpeg]], with `impliedStdTables` preloading the Annex K
    * typical Huffman tables into slots 0 (luma) and 1 (chroma) — the
    * OpenDML convention for DHT-less MJPEG frames. In-stream DHT
    * segments still override the implied tables.
    */
  def decodeJpeg(bytes: Array[Byte], impliedStdTables: Boolean): Raster = {
    if (bytes == null || bytes.length < 4) return null
    try decodeJpeg0(bytes, impliedStdTables)
    catch { case _: RuntimeException => null }
  }

  /** True when the marker walk finds no DHT segment before the first SOS
    * — the precondition for the OpenDML implied-standard-tables
    * convention. (DHT between later scans of a multi-scan frame is fine:
    * in-stream tables override the implied ones scan by scan.) Bails
    * false on any malformed walk so the caller never retries garbage.
    */
  private def jpegLacksDhtBeforeScan(b: Array[Byte]): Boolean = {
    if (b == null || b.length < 4 ||
        (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return false
    var off = 2
    while (off + 1 < b.length) {
      if ((b(off) & 0xff) != 0xff) return false
      var m = b(off + 1) & 0xff
      while (m == 0xff && off + 2 < b.length) { off += 1; m = b(off + 1) & 0xff }
      off += 2
      m match {
        case 0xd8 | 0x01 => // standalone, no length
        case x if x >= 0xd0 && x <= 0xd7 => // RSTn: standalone
        case 0xc4 => return false // a DHT exists: nothing to imply
        case 0xda => return true // reached the scan with no DHT seen
        case 0xd9 => return false // EOI before any scan
        case _ =>
          if (off + 2 > b.length) return false
          val len = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
          if (len < 2 || off + len > b.length) return false
          off += len
      }
    }
    false
  }

  /** Strict decode first; when that fails AND the stream carries no DHT
    * before its first scan, retry with the Annex K implied standard
    * tables — so a frame extracted from a DHT-less MJPEG AVI (which
    * [[AviCodecHelper.mjpegStats]] decodes via the same convention)
    * composes with the still-image stats/resize path instead of nulling.
    * A stream that HAS its own DHT never falls back: retrying it under
    * different tables could "succeed" with garbage pixels.
    */
  def decodeJpegAuto(bytes: Array[Byte]): Raster = {
    val r = decodeJpeg(bytes, false)
    if (r != null) r
    else if (jpegLacksDhtBeforeScan(bytes)) decodeJpeg(bytes, true)
    else null
  }

  private def decodeJpeg0(b: Array[Byte], impliedStdTables: Boolean): Raster = {
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return null
    val qt = Array.ofDim[Int](4, 64) // zigzag order
    // a slot is usable only after a DQT populated it (mirrors the
    // dcT/acT null checks): without this, a stream carrying DHT but no
    // DQT dequantizes every coefficient against an all-zero table and
    // fabricates a constant raster instead of the honest null
    val qtDef = new Array[Boolean](4)
    val dcT = new Array[JHuff](4)
    val acT = new Array[JHuff](4)
    if (impliedStdTables) {
      dcT(0) = StdDcHuff(0); dcT(1) = StdDcHuff(1)
      acT(0) = StdAcHuff(0); acT(1) = StdAcHuff(1)
    }
    var w = 0; var h = 0
    var comps: Array[JComp] = null
    var restartInt = 0
    var progressive = false
    var arith = false // SOF9: QM-coded extended sequential
    // DAC conditioning (T.81 B.2.4.3), defaults per F.1.4.4.1.2/F.1.4.4.2
    val dcCondL = Array.fill(4)(0)
    val dcCondU = Array.fill(4)(1)
    val acCondK = Array.fill(4)(5)
    var multiScan = false // sequential (SOF0/1) frame split across scans
    var seqSeen = Set.empty[Int] // component ids already scanned
    var anyScan = false
    var off = 2
    while (off + 1 < b.length) {
      if ((b(off) & 0xff) != 0xff) return null
      var m = b(off + 1) & 0xff
      while (m == 0xff && off + 2 < b.length) { off += 1; m = b(off + 1) & 0xff }
      off += 2
      def segLen: Int = {
        if (off + 2 > b.length) throw JpegBail
        val len = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
        if (len < 2 || off + len > b.length) throw JpegBail
        len
      }
      m match {
        case 0xd8 | 0x01 => // stray SOI / TEM: standalone
        case x if x >= 0xd0 && x <= 0xd7 => // RSTn outside scan: ignore
        case 0xd9 => // EOI: buffered (progressive / multi-scan) decode
          // completes here. A progressive stream may legitimately stop
          // after any scan (partial rendering is the format's point); a
          // sequential multi-scan stream missing a component is corrupt.
          if (progressive && anyScan)
            return jProgFinish(w, h, comps, qt)
          if (multiScan && seqSeen.size == comps.length)
            return jProgFinish(w, h, comps, qt)
          return null // EOI before any scan / incomplete sequential
        case 0xdb => // DQT: one or more tables
          val len = segLen
          var p = off + 2; val stop = off + len
          while (p < stop) {
            val pq = (b(p) & 0xff) >> 4; val tq = b(p) & 0x0f
            if (pq > 1 || tq > 3) throw JpegBail
            p += 1
            val step = if (pq == 0) 1 else 2
            if (p + 64 * step > stop) throw JpegBail
            var i = 0
            while (i < 64) {
              qt(tq)(i) =
                if (pq == 0) b(p + i) & 0xff
                else ((b(p + 2 * i) & 0xff) << 8) | (b(p + 2 * i + 1) & 0xff)
              if (qt(tq)(i) == 0) throw JpegBail
              i += 1
            }
            qtDef(tq) = true
            p += 64 * step
          }
          off += len
        case 0xc4 => // DHT: one or more tables
          val len = segLen
          var p = off + 2; val stop = off + len
          while (p < stop) {
            val tc = (b(p) & 0xff) >> 4; val th = b(p) & 0x0f
            if (tc > 1 || th > 3) throw JpegBail
            p += 1
            if (p + 16 > stop) throw JpegBail
            val counts = Array.tabulate(16)(i => b(p + i) & 0xff)
            p += 16
            val n = counts.sum
            if (n > 256 || p + n > stop) throw JpegBail
            val vals = Array.tabulate(n)(i => b(p + i) & 0xff)
            p += n
            val t = new JHuff(counts, vals)
            if (tc == 0) dcT(th) = t else acT(th) = t
          }
          off += len
        case 0xc0 | 0xc1 | 0xc2 | 0xc9 | 0xca => // SOF0/1 baseline, SOF2
          // progressive, SOF9/SOF10 arithmetic sequential/progressive
          progressive = m == 0xc2 || m == 0xca
          arith = m == 0xc9 || m == 0xca
          val len = segLen
          if (len < 8) throw JpegBail
          val precision = b(off + 2) & 0xff
          h = ((b(off + 3) & 0xff) << 8) | (b(off + 4) & 0xff)
          w = ((b(off + 5) & 0xff) << 8) | (b(off + 6) & 0xff)
          val nc = b(off + 7) & 0xff
          if (precision != 8 || w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return null
          if (len < 8 + 3 * nc) throw JpegBail
          // decoded-size cap, same rationale as PNG: forged dims can't OOM.
          // Progressive additionally buffers 4-byte coefficients for every
          // sample, so its cap is tighter (~64 MB of coefficient state).
          if (w.toLong * h * nc > 64L * 1024 * 1024) return null
          if (progressive && w.toLong * h * nc > 16L * 1024 * 1024) return null
          comps = Array.tabulate(nc) { i =>
            val c = new JComp
            c.id = b(off + 8 + 3 * i) & 0xff
            val hv = b(off + 9 + 3 * i) & 0xff
            c.h = hv >> 4; c.v = hv & 0x0f
            c.tq = b(off + 10 + 3 * i) & 0xff
            if (c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2 || c.tq > 3) return null
            c
          }
          // single-component scans carry one data unit per MCU regardless
          // of declared sampling (T.81 A.2.2) — normalize to 1x1
          if (nc == 1) { comps(0).h = 1; comps(0).v = 1 }
          off += len
        case x if x >= 0xc3 && x <= 0xcf && x != 0xc4 && x != 0xc8 &&
            x != 0xc9 && x != 0xca && x != 0xcc =>
          return null // lossless (SOF3/SOF11) / hierarchical: not an
          // 8-bit raster — lossless flavors decode at full precision
          // through decodeJpegLossless; hierarchical (Annex J) is null
        case 0xcc => // DAC: arithmetic conditioning (T.81 B.2.4.3)
          val len = segLen
          var p = off + 2; val stop = off + len
          while (p + 1 < stop) {
            val tc = (b(p) & 0xff) >> 4; val tb = b(p) & 0x0f
            val v = b(p + 1) & 0xff
            if (tb > 3) throw JpegBail
            if (tc == 0) {
              val l = v & 0x0f; val u = v >> 4
              if (l > u) throw JpegBail // B.2.4.3: 0 <= L <= U <= 15
              dcCondL(tb) = l; dcCondU(tb) = u
            } else if (tc == 1) {
              if (v < 1 || v > 63) throw JpegBail
              acCondK(tb) = v
            } else throw JpegBail
            p += 2
          }
          off += len
        case 0xdd => // DRI
          val len = segLen
          if (len != 4) throw JpegBail
          restartInt = ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
          off += len
        case 0xda => // SOS
          val len = segLen
          if (comps == null) return null
          val ns = b(off + 2) & 0xff
          if (ns < 1 || ns > comps.length || len < 6 + 2 * ns) return null
          // a sequential frame whose first scan covers a strict subset
          // of the components is a MULTI-SCAN sequential stream (T.81
          // non-interleaved layout): decode through the coefficient
          // buffers like progressive, one full-band scan per subset
          if (!progressive && ns != comps.length) multiScan = true
          val scanComps = new Array[JComp](ns)
          var i = 0
          while (i < ns) {
            val cid = b(off + 3 + 2 * i) & 0xff
            // single-interleaved-scan envelope: scan order == frame order
            // (match by position); progressive / multi-scan sequential
            // scans name a subset, matched by id
            val c =
              if (progressive || multiScan) {
                val found = comps.find(_.id == cid).orNull
                if (found == null) return null
                found
              } else comps(i)
            val tdta = b(off + 4 + 2 * i) & 0xff
            c.td = tdta >> 4; c.ta = tdta & 0x0f
            if (c.td > 3 || c.ta > 3) return null
            scanComps(i) = c
            i += 1
          }
          // a scan header naming the same component twice would decode
          // its blocks twice with interleaved MCU geometry — garbage
          // coefficient state, not a partial image. Reject.
          if (scanComps.map(_.id).distinct.length != ns) return null
          // T.81 B.2.4.1: the quant table a scan dequantizes against
          // must have been installed by a preceding DQT
          if (scanComps.exists(c => !qtDef(c.tq))) return null
          val ss = b(off + 3 + 2 * ns) & 0xff
          val se = b(off + 4 + 2 * ns) & 0xff
          val ahal = b(off + 5 + 2 * ns) & 0xff
          if (!progressive && !multiScan) {
            if (ss != 0 || se != 63 || ahal != 0) return null
            if (arith)
              return jScanArith(b, off + len, w, h, comps, qt,
                dcCondL, dcCondU, acCondK, restartInt)
            return jScan(b, off + len, w, h, comps, qt, dcT, acT, restartInt)
          }
          if (multiScan) {
            // sequential scans are always full-band, no approximation,
            // and each component appears in exactly one scan
            if (ss != 0 || se != 63 || ahal != 0) return null
            if (scanComps.exists(c => seqSeen(c.id))) return null
            seqSeen ++= scanComps.map(_.id)
          }
          // buffered path: decode this scan into the coefficient
          // buffers, then continue the marker walk (EOI finishes).
          // multiScan is only discoverable here (at SOS, not SOF), so the
          // tighter buffered-coefficient cap — 4 bytes/sample of Int state,
          // the reason progressive caps at 16M samples — must be re-checked
          // on this entry too, or a 3-component SOF0 multi-scan stream
          // passing the 64M-sample cap allocates ~4x the documented ceiling
          if (multiScan && w.toLong * h * comps.length > 16L * 1024 * 1024)
            return null
          if (comps(0).coefs == null) jProgAlloc(w, h, comps)
          off =
            if (arith)
              jProgScanArith(b, off + len, comps, scanComps, ss, se,
                ahal >> 4, ahal & 0x0f, dcCondL, dcCondU, acCondK,
                restartInt, sequential = multiScan)
            else
              jProgScan(b, off + len, comps, scanComps, ss, se,
                ahal >> 4, ahal & 0x0f, dcT, acT, restartInt,
                sequential = multiScan)
          anyScan = true
        case _ => off += segLen // APPn / COM / other: skip
      }
    }
    null // ran off the end without a scan
  }

  /** Entropy-decode the interleaved scan, IDCT each block into its
    * component plane, then upsample + color-convert + crop.
    */
  private def jScan(b: Array[Byte], scanOff: Int, w: Int, h: Int,
                    comps: Array[JComp], qt: Array[Array[Int]],
                    dcT: Array[JHuff], acT: Array[JHuff],
                    restartInt: Int): Raster = {
    var hmax = 1; var vmax = 1
    comps.foreach { c => if (c.h > hmax) hmax = c.h; if (c.v > vmax) vmax = c.v }
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    comps.foreach { c =>
      if (dcT(c.td) == null || acT(c.ta) == null) throw JpegBail
      c.planeW = mcusX * 8 * c.h
      c.plane = new Array[Byte](c.planeW * mcusY * 8 * c.v)
      c.pred = 0
    }
    val r = new JBits(b, scanOff, b.length)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    var mcu = 0; var rstIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInt > 0 && mcu > 0 && mcu % restartInt == 0) {
          r.restart(rstIdx); rstIdx = (rstIdx + 1) & 7
          comps.foreach(_.pred = 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val q = qt(c.tq)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              // --- decode one block: DC diff + AC run/size, dequantized
              java.util.Arrays.fill(coef, 0)
              val t = jDecodeSym(r, dcT(c.td))
              if (t > 11) throw JpegBail
              c.pred += jExtend(r.receive(t), t)
              coef(0) = c.pred * q(0)
              var k = 1
              while (k < 64) {
                val rs = jDecodeSym(r, acT(c.ta))
                val run = rs >> 4; val s = rs & 15
                if (s == 0) {
                  if (run == 15) k += 16 else k = 64 // ZRL / EOB
                } else {
                  k += run
                  if (k > 63) throw JpegBail
                  coef(JpegZigzag(k)) = jExtend(r.receive(s), s) * q(k)
                  k += 1
                }
              }
              jIdctBlock(coef, tmp, c.plane, c.planeW,
                (mx * c.h + bx) * 8, (my * c.v + by) * 8)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1; mx += 1
      }
      my += 1
    }
    jAssemble(w, h, comps, hmax, vmax)
  }

  /** T.81 Table D.3 — the QM-coder probability estimation state machine
    * (113 working states + the stationary index-113 entry the AC sign's
    * non-adaptive "fixed" bin sits on). Columns: Qe value, next index
    * after LPS, next index after MPS, MPS-switch flag. Public-spec
    * constants (ITU-T T.81, 1992), verified byte-for-byte against the
    * system libjpeg's exported `jpeg_aritab`.
    */
  private val QmQe: Array[Int] = Array(
    0x5a1d, 0x2586, 0x1114, 0x080b, 0x03d8, 0x01da, 0x00e5, 0x006f,
    0x0036, 0x001a, 0x000d, 0x0006, 0x0003, 0x0001, 0x5a7f, 0x3f25,
    0x2cf2, 0x207c, 0x17b9, 0x1182, 0x0cef, 0x09a1, 0x072f, 0x055c,
    0x0406, 0x0303, 0x0240, 0x01b1, 0x0144, 0x00f5, 0x00b7, 0x008a,
    0x0068, 0x004e, 0x003b, 0x002c, 0x5ae1, 0x484c, 0x3a0d, 0x2ef1,
    0x261f, 0x1f33, 0x19a8, 0x1518, 0x1177, 0x0e74, 0x0bfb, 0x09f8,
    0x0861, 0x0706, 0x05cd, 0x04de, 0x040f, 0x0363, 0x02d4, 0x025c,
    0x01f8, 0x01a4, 0x0160, 0x0125, 0x00f6, 0x00cb, 0x00ab, 0x008f,
    0x5b12, 0x4d04, 0x412c, 0x37d8, 0x2fe8, 0x293c, 0x2379, 0x1edf,
    0x1aa9, 0x174e, 0x1424, 0x119c, 0x0f6b, 0x0d51, 0x0bb6, 0x0a40,
    0x5832, 0x4d1c, 0x438e, 0x3bdd, 0x34ee, 0x2eae, 0x299a, 0x2516,
    0x5570, 0x4ca9, 0x44d9, 0x3e22, 0x3824, 0x32b4, 0x2e17, 0x56a8,
    0x4f46, 0x47e5, 0x41cf, 0x3c3d, 0x375e, 0x5231, 0x4c0f, 0x4639,
    0x415e, 0x5627, 0x50e7, 0x4b85, 0x5597, 0x504f, 0x5a10, 0x5522,
    0x59eb, 0x5a1d)
  private val QmNlps: Array[Int] = Array(
    1, 14, 16, 18, 20, 23, 25, 28, 30, 33, 35, 9, 10, 12, 15, 36,
    38, 39, 40, 42, 43, 45, 46, 48, 49, 51, 52, 54, 56, 57, 59, 60,
    62, 63, 32, 33, 37, 64, 65, 67, 68, 69, 70, 72, 73, 74, 75, 77,
    78, 79, 48, 50, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 61, 61,
    65, 80, 81, 82, 83, 84, 86, 87, 87, 72, 72, 74, 74, 75, 77, 77,
    80, 88, 89, 90, 91, 92, 93, 86, 88, 95, 96, 97, 99, 99, 93, 95,
    101, 102, 103, 104, 99, 105, 106, 107, 103, 105, 108, 109, 110, 111,
    110, 112, 112, 113)
  private val QmNmps: Array[Int] = Array(
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 13, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 9, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48,
    49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61, 62, 63, 32,
    65, 66, 67, 68, 69, 70, 71, 72, 73, 74, 75, 76, 77, 78, 79, 48,
    81, 82, 83, 84, 85, 86, 87, 71, 89, 90, 91, 92, 93, 94, 86, 96,
    97, 98, 99, 100, 93, 102, 103, 104, 99, 106, 107, 103, 109, 107,
    111, 109, 111, 113)
  private val QmSwitch: Array[Boolean] = {
    val s = Array(0, 14, 36, 64, 80, 88, 95, 105, 110, 112)
    Array.tabulate(114)(i => s.contains(i))
  }

  /** The QM-coder DECODER register machine (T.81 §F.2.2): 32-bit C
    * register whose high 16 bits race the interval register A, BYTEIN
    * with the D.1.6 zero-BYTE-stuffing convention (a 0x00 following
    * 0xFF is the stuff byte and is discarded — 0xFF is ordinary data;
    * anything else after 0xFF is a marker, after which the decoder
    * feeds zero bytes and leaves the marker unconsumed for the restart
    * walk). The initial interval is the encoder's full 17-bit 0x10000;
    * the first two data bytes land verbatim in C's high half (the
    * interval's 2^16 carry is dropped symmetrically on both sides — the
    * code offset is always < A <= 0xFFFF after the first subdivision).
    * Context bins pack (state index << 1) | MPS into one byte.
    */
  private final class JQm(b: Array[Byte], end: Int) {
    private var c = 0L
    private var a = 0L
    private var ct = 0
    var bp = 0 // index of the byte most recently fed into C

    // Past the PHYSICAL end there is no marker to stop at — a valid
    // stream always terminates its entropy data with a marker (EOI or
    // RSTn), whose zero-feed path never reads beyond it. Reading past
    // the end therefore means a truncated stream: honest-null, never
    // zero-padded garbage.
    private def byteAt(i: Int): Int =
      if (i >= 0 && i < end) b(i) & 0xff else throw JpegBail

    def init(start: Int): Unit = {
      c = 0L; bp = start - 1
      byteIn(); c = (c << 8) & 0xffffffffL
      byteIn(); c = (c << 8) & 0xffffffffL
      ct = 0
      a = 0x10000L
    }

    private def byteIn(): Unit = {
      val nxt = bp + 1
      if (byteAt(nxt) == 0xff) {
        var j = nxt + 1
        while (byteAt(j) == 0xff) j += 1 // 0xFF fill bytes before a marker
        if (byteAt(j) == 0x00) { bp = j; c += 0xff00L } // stuffed zero
        // else: marker — feed a zero byte, do not advance
      } else { bp = nxt; c += byteAt(nxt).toLong << 8 }
      ct = 8
    }

    /** Decode one binary decision against the context bin `st(si)`,
      * updating the bin's adaptive state in place (Figures F.19–F.23:
      * DECODE with MPS/LPS conditional exchange and renormalization).
      */
    def decode(st: Array[Byte], si: Int): Int = {
      val s = st(si) & 0xff
      val idx = s >> 1
      var mps = s & 1
      val qe = QmQe(idx)
      a -= qe
      var d = 0
      if (((c >> 16) & 0xffffL) < a) {
        if ((a & 0x8000L) != 0) return mps
        // MPS_EXCHANGE + RENORM_D
        if (a < qe) {
          d = 1 - mps
          if (QmSwitch(idx)) mps = 1 - mps
          st(si) = ((QmNlps(idx) << 1) | mps).toByte
        } else {
          d = mps
          st(si) = ((QmNmps(idx) << 1) | mps).toByte
        }
      } else {
        // LPS_EXCHANGE + RENORM_D
        c -= a << 16
        if (a < qe) {
          d = mps
          st(si) = ((QmNmps(idx) << 1) | mps).toByte
        } else {
          d = 1 - mps
          if (QmSwitch(idx)) mps = 1 - mps
          st(si) = ((QmNlps(idx) << 1) | mps).toByte
        }
        a = qe
      }
      while ({
        if (ct == 0) byteIn()
        a <<= 1
        c = (c << 1) & 0xffffffffL
        ct -= 1
        a < 0x8000L
      }) ()
      d
    }

    /** Byte-align at a restart boundary: the next marker in the stream
      * must be the expected RSTn (within entropy data every 0xFF is
      * followed by a stuffed byte < 0x80, so the first 0xFF followed by
      * >= 0x90 IS the marker). Returns the offset just past it.
      */
    def seekRestart(idx: Int): Int = {
      var i = bp
      while (i + 1 < end && !((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) >= 0x90))
        i += 1
      if (i + 1 >= end || (b(i + 1) & 0xff) != 0xd0 + idx) throw JpegBail
      i + 2
    }
  }

  /** The interleaved SOF9 scan: per block, the T.81 F.1.4.4.1 DC model
    * (sign/magnitude decision tree conditioned on the previous diff's
    * classification against the DAC L/U bounds) and the F.1.4.4.2 AC
    * model (per-position EOB/run decisions, the non-adaptive sign bin,
    * Kx-split magnitude trees), decoded by the Annex-D QM-coder —
    * then the same dequant + IDCT + assembly as the Huffman scan.
    * Restart intervals re-initialize the coder AND zero every
    * statistics bin (F.1.4.1.1), exactly like the encoder side.
    */
  private def jScanArith(b: Array[Byte], scanOff: Int, w: Int, h: Int,
                         comps: Array[JComp], qt: Array[Array[Int]],
                         dcCondL: Array[Int], dcCondU: Array[Int],
                         acCondK: Array[Int], restartInt: Int): Raster = {
    var hmax = 1; var vmax = 1
    comps.foreach { c => if (c.h > hmax) hmax = c.h; if (c.v > vmax) vmax = c.v }
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    comps.foreach { c =>
      c.planeW = mcusX * 8 * c.h
      c.plane = new Array[Byte](c.planeW * mcusY * 8 * c.v)
      c.pred = 0
    }
    val dcStats = Array.ofDim[Byte](4, 64)
    val acStats = Array.ofDim[Byte](4, 256)
    // non-adaptive AC sign bin: the stationary index-113 state
    val fixedBin = Array[Byte]((113 << 1).toByte)
    val dcContext = new Array[Int](comps.length)
    val qm = new JQm(b, b.length)
    qm.init(scanOff)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    var mcu = 0; var rstIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInt > 0 && mcu > 0 && mcu % restartInt == 0) {
          val next = qm.seekRestart(rstIdx)
          rstIdx = (rstIdx + 1) & 7
          var t = 0
          while (t < 4) {
            java.util.Arrays.fill(dcStats(t), 0.toByte)
            java.util.Arrays.fill(acStats(t), 0.toByte)
            t += 1
          }
          comps.foreach(_.pred = 0)
          java.util.Arrays.fill(dcContext, 0)
          qm.init(next)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val q = qt(c.tq)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              java.util.Arrays.fill(coef, 0)
              // ---- DC: F.1.4.4.1 / F.2.4.1 ----
              val dst = dcStats(c.td)
              val ctx = dcContext(ci)
              if (qm.decode(dst, ctx) == 0) {
                dcContext(ci) = 0
              } else {
                val sign = qm.decode(dst, ctx + 1)
                var m = 0
                var si = ctx + 2 + sign
                if (qm.decode(dst, si) != 0) {
                  m = 1
                  si = 20 // X1 bin (Table F.4 layout)
                  while (qm.decode(dst, si) != 0) {
                    m <<= 1
                    if (m == 0x8000) throw JpegBail
                    si += 1
                  }
                }
                dcContext(ci) =
                  if (m < ((1 << dcCondL(c.td)) >> 1)) 0
                  else if (m > ((1 << dcCondU(c.td)) >> 1)) 12 + sign * 4
                  else 4 + sign * 4
                var v = m
                si += 14 // the matching M (mantissa) bin
                while ({ m >>= 1; m != 0 }) {
                  if (qm.decode(dst, si) != 0) v |= m
                }
                v += 1
                c.pred += (if (sign != 0) -v else v)
              }
              coef(0) = c.pred * q(0)
              // ---- AC: F.1.4.4.2 / F.2.4.2 ----
              val ast = acStats(c.ta)
              var k = 1
              var eob = false
              while (!eob && k < 64) {
                var si = 3 * (k - 1)
                if (qm.decode(ast, si) != 0) eob = true
                else {
                  while (qm.decode(ast, si + 1) == 0) {
                    si += 3; k += 1
                    if (k > 63) throw JpegBail
                  }
                  val sign = qm.decode(fixedBin, 0)
                  si += 2
                  var m = qm.decode(ast, si)
                  if (m != 0 && qm.decode(ast, si) != 0) {
                    m <<= 1
                    si = if (k <= acCondK(c.ta)) 189 else 217
                    while (qm.decode(ast, si) != 0) {
                      m <<= 1
                      if (m == 0x8000) throw JpegBail
                      si += 1
                    }
                  }
                  var v = m
                  si += 14
                  while ({ m >>= 1; m != 0 }) {
                    if (qm.decode(ast, si) != 0) v |= m
                  }
                  v += 1
                  coef(JpegZigzag(k)) = (if (sign != 0) -v else v) * q(k)
                  k += 1
                }
              }
              jIdctBlock(coef, tmp, c.plane, c.planeW,
                (mx * c.h + bx) * 8, (my * c.v + by) * 8)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1; mx += 1
      }
      my += 1
    }
    jAssemble(w, h, comps, hmax, vmax)
  }

  /** Decode one PROGRESSIVE arithmetic scan (SOF10) into the coefficient
    * buffers; returns the byte offset of the next marker's 0xFF. The
    * four T.81 §G.2 procedures over the QM coder, matching the Huffman
    * progressive envelope: interleaved/single-component DC-first scans
    * (the sequential DC diff model, values shifted left Al), DC
    * refinement (one fixed-bin correction bit per block), AC-first
    * scans over [Ss, Se] (the sequential AC model with per-position EOB
    * decisions, values shifted left Al), and AC refinement (per-band
    * EOB-extension decision beyond the previous pass's end-of-block
    * index, st+2 correction bits on known coefficients, fixed-bin signs
    * on new ones). Every scan is its own arithmetic segment: fresh
    * statistics, fresh coder — as are restart intervals within a scan.
    */
  private def jProgScanArith(b: Array[Byte], dataOff: Int,
                             comps: Array[JComp], scanComps: Array[JComp],
                             ss: Int, se: Int, ah: Int, al: Int,
                             dcCondL: Array[Int], dcCondU: Array[Int],
                             acCondK: Array[Int], restartInt: Int,
                             sequential: Boolean = false): Int = {
    if (al < 0 || al > 13) throw JpegBail
    if (ah != 0 && ah != al + 1) throw JpegBail
    val isDc = ss == 0 && !sequential
    if (!sequential) {
      if (isDc && se != 0) throw JpegBail
      if (!isDc && (scanComps.length != 1 || se < ss || se > 63))
        throw JpegBail
    }
    val dcStats = Array.ofDim[Byte](4, 64)
    val acStats = Array.ofDim[Byte](4, 256)
    val fixedBin = Array[Byte]((113 << 1).toByte)
    val dcContext = new Array[Int](comps.length)
    val compIdx = scanComps.map(c => comps.indexOf(c))
    val qm = new JQm(b, b.length)
    qm.init(dataOff)
    scanComps.foreach(_.pred = 0)
    val p1 = 1 << al
    val m1 = -1 << al

    def decodeDcFirst(c: JComp, ci: Int, blkOff: Int): Unit = {
      val dst = dcStats(c.td)
      val ctx = dcContext(ci)
      if (qm.decode(dst, ctx) == 0) dcContext(ci) = 0
      else {
        val sign = qm.decode(dst, ctx + 1)
        var m = 0
        var si = ctx + 2 + sign
        if (qm.decode(dst, si) != 0) {
          m = 1
          si = 20
          while (qm.decode(dst, si) != 0) {
            m <<= 1
            if (m == 0x8000) throw JpegBail
            si += 1
          }
        }
        dcContext(ci) =
          if (m < ((1 << dcCondL(c.td)) >> 1)) 0
          else if (m > ((1 << dcCondU(c.td)) >> 1)) 12 + sign * 4
          else 4 + sign * 4
        var v = m
        si += 14
        while ({ m >>= 1; m != 0 }) {
          if (qm.decode(dst, si) != 0) v |= m
        }
        v += 1
        c.pred += (if (sign != 0) -v else v)
      }
      c.coefs(blkOff) = c.pred << al
    }

    def decodeDcRefine(c: JComp, blkOff: Int): Unit =
      if (qm.decode(fixedBin, 0) != 0) c.coefs(blkOff) |= p1

    val acFrom = if (sequential) 1 else ss
    val acTo = if (sequential) 63 else se
    def decodeAcFirst(c: JComp, blkOff: Int): Unit = {
      val ast = acStats(c.ta)
      val cf = c.coefs
      var k = acFrom
      var eob = false
      while (!eob && k <= acTo) {
        var si = 3 * (k - 1)
        if (qm.decode(ast, si) != 0) eob = true
        else {
          while (qm.decode(ast, si + 1) == 0) {
            si += 3; k += 1
            if (k > acTo) throw JpegBail
          }
          val sign = qm.decode(fixedBin, 0)
          si += 2
          var m = qm.decode(ast, si)
          if (m != 0 && qm.decode(ast, si) != 0) {
            m <<= 1
            si = if (k <= acCondK(c.ta)) 189 else 217
            while (qm.decode(ast, si) != 0) {
              m <<= 1
              if (m == 0x8000) throw JpegBail
              si += 1
            }
          }
          var v = m
          si += 14
          while ({ m >>= 1; m != 0 }) {
            if (qm.decode(ast, si) != 0) v |= m
          }
          v += 1
          cf(blkOff + k) = (if (sign != 0) -v else v) << al
          k += 1
        }
      }
    }

    def decodeAcRefine(c: JComp, blkOff: Int): Unit = {
      val ast = acStats(c.ta)
      val cf = c.coefs
      // previous pass's end-of-block index: the highest occupied position
      var kex = se
      while (kex > 0 && cf(blkOff + kex) == 0) kex -= 1
      var k = ss
      var eob = false
      while (!eob && k <= se) {
        var si = 3 * (k - 1)
        if (k > kex && qm.decode(ast, si) != 0) eob = true
        else {
          var placed = false
          while (!placed) {
            val cur = cf(blkOff + k)
            if (cur != 0) {
              if (qm.decode(ast, si + 2) != 0)
                cf(blkOff + k) = if (cur < 0) cur + m1 else cur + p1
              placed = true
            } else if (qm.decode(ast, si + 1) != 0) {
              cf(blkOff + k) = if (qm.decode(fixedBin, 0) != 0) m1 else p1
              placed = true
            } else {
              si += 3; k += 1
              if (k > se) throw JpegBail
            }
          }
          k += 1
        }
      }
    }

    def decodeBlock(c: JComp, ci: Int, blkOff: Int): Unit =
      if (sequential) {
        // full-band scan of a multi-scan SEQUENTIAL stream: the
        // sequential DC diff model then the AC model over 1..63, raw
        // coefficients into the buffer (dequant happens once at EOI)
        decodeDcFirst(c, ci, blkOff)
        decodeAcFirst(c, blkOff)
      } else if (isDc) {
        if (ah == 0) decodeDcFirst(c, ci, blkOff) else decodeDcRefine(c, blkOff)
      } else {
        if (ah == 0) decodeAcFirst(c, blkOff) else decodeAcRefine(c, blkOff)
      }

    var mcu = 0; var rstIdx = 0
    def maybeRestart(): Unit =
      if (restartInt > 0 && mcu > 0 && mcu % restartInt == 0) {
        val next = qm.seekRestart(rstIdx)
        rstIdx = (rstIdx + 1) & 7
        var t = 0
        while (t < 4) {
          java.util.Arrays.fill(dcStats(t), 0.toByte)
          java.util.Arrays.fill(acStats(t), 0.toByte)
          t += 1
        }
        scanComps.foreach(_.pred = 0)
        java.util.Arrays.fill(dcContext, 0)
        qm.init(next)
      }

    if (scanComps.length == 1) {
      // non-interleaved: one block per MCU over the REAL grid
      val c = scanComps(0)
      val ci = compIdx(0)
      var by = 0
      while (by < c.rh) {
        var bx = 0
        while (bx < c.rw) {
          maybeRestart()
          decodeBlock(c, ci, (by * c.bw + bx) * 64)
          mcu += 1
          bx += 1
        }
        by += 1
      }
    } else {
      // interleaved DC scan: MCU order over the padded grid
      val mcusX = comps.map(c => c.bw / c.h).max
      val mcusY = comps.map(c => c.bh / c.v).max
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          maybeRestart()
          var ci = 0
          while (ci < scanComps.length) {
            val c = scanComps(ci)
            var v = 0
            while (v < c.v) {
              var hh = 0
              while (hh < c.h) {
                decodeBlock(c, compIdx(ci),
                  ((my * c.v + v) * c.bw + (mx * c.h + hh)) * 64)
                hh += 1
              }
              v += 1
            }
            ci += 1
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }
    }
    // scan data ends where the coder stopped: the next marker at/after
    // the last consumed byte (fill 0xFFs allowed; FF00 is data)
    var i = qm.bp
    while (i + 1 < b.length) {
      if ((b(i) & 0xff) == 0xff) {
        var j = i + 1
        while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
        if (j < b.length && (b(j) & 0xff) >= 0x90) return j - 1
        i = j + 1
      } else i += 1
    }
    throw JpegBail // ran off the end without a terminating marker
  }

  /** Separable IDCT of one dequantized NATURAL-order coefficient block
    * into a component plane at (x0, y0), with the deterministic
    * floor(x+128.5) rounding the oracle replays.
    */
  private def jIdctBlock(coef: Array[Int], tmp: Array[Double],
                         plane: Array[Byte], planeW: Int,
                         x0: Int, y0: Int): Unit = {
    var x = 0
    while (x < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) { acc += coef(v * 8 + u) * IdctCos(u)(x); u += 1 }
        tmp(v * 8 + x) = acc
        v += 1
      }
      x += 1
    }
    var y = 0
    while (y < 8) {
      var xx = 0
      while (xx < 8) {
        var f = 0.0
        var v = 0
        while (v < 8) { f += tmp(v * 8 + xx) * IdctCos(v)(y); v += 1 }
        var p = StrictMath.floor(f + 128.5).toInt
        if (p < 0) p = 0 else if (p > 255) p = 255
        plane((y0 + y) * planeW + x0 + xx) = p.toByte
        xx += 1
      }
      y += 1
    }
  }

  /** Assemble decoded component planes into the output raster: crop
    * (gray) or replication-upsample + fixed-point YCbCr→RGB (color) —
    * shared by the baseline and progressive paths.
    */
  private def jAssemble(w: Int, h: Int, comps: Array[JComp],
                        hmax: Int, vmax: Int): Raster = {
    if (comps.length == 1) {
      val c = comps(0)
      val pix = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        System.arraycopy(c.plane, y * c.planeW, pix, y * w, w)
        y += 1
      }
      new Raster(w, h, 1, pix)
    } else {
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      val pix = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        val yY = y * cy.v / vmax; val yB = y * cb.v / vmax; val yR = y * cr.v / vmax
        var x = 0
        while (x < w) {
          val yv = cy.plane(yY * cy.planeW + x * cy.h / hmax) & 0xff
          val cbv = (cb.plane(yB * cb.planeW + x * cb.h / hmax) & 0xff) - 128
          val crv = (cr.plane(yR * cr.planeW + x * cr.h / hmax) & 0xff) - 128
          var rv = yv + ((91881 * crv + 32768) >> 16)
          var gv = yv - ((22554 * cbv + 46802 * crv + 32768) >> 16)
          var bv = yv + ((116130 * cbv + 32768) >> 16)
          if (rv < 0) rv = 0 else if (rv > 255) rv = 255
          if (gv < 0) gv = 0 else if (gv > 255) gv = 255
          if (bv < 0) bv = 0 else if (bv > 255) bv = 255
          val o = (y * w + x) * 3
          pix(o) = rv.toByte; pix(o + 1) = gv.toByte; pix(o + 2) = bv.toByte
          x += 1
        }
        y += 1
      }
      new Raster(w, h, 3, pix)
    }
  }

  // ---------------- progressive JPEG (SOF2) scan machinery ----------------
  //
  // T.81 Annex G, Huffman procedures: a progressive frame carries its DCT
  // coefficients across MULTIPLE scans — spectral selection (each AC scan
  // covers a zigzag band [Ss, Se] of ONE component; DC scans cover
  // coefficient 0, optionally interleaved over several components) and
  // successive approximation (the first scan of a band delivers the
  // point-transformed value << Al; each refinement scan appends one
  // magnitude bit at the next lower Al). Decoding therefore buffers the
  // quantized coefficients for the whole image (zigzag order, padded
  // MCU-aligned block grid per component) and runs dequant + IDCT +
  // assemble once, at EOI.

  /** Allocate per-component coefficient buffers and block-grid geometry:
    * padded (MCU-aligned) grid bw×bh for interleaved addressing, real
    * grid rw×rh (T.81 A.2.2) for the non-interleaved scans that only
    * visit blocks covering actual samples.
    */
  private def jProgAlloc(w: Int, h: Int, comps: Array[JComp]): Unit = {
    var hmax = 1; var vmax = 1
    comps.foreach { c => if (c.h > hmax) hmax = c.h; if (c.v > vmax) vmax = c.v }
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    comps.foreach { c =>
      c.bw = mcusX * c.h
      c.bh = mcusY * c.v
      c.rw = ((w * c.h + hmax - 1) / hmax + 7) / 8
      c.rh = ((h * c.v + vmax - 1) / vmax + 7) / 8
      c.coefs = new Array[Int](c.bw * c.bh * 64)
      c.pred = 0
    }
  }

  /** Decode one progressive scan into the coefficient buffers; returns
    * the byte offset of the next marker's 0xFF. Envelope: DC scans
    * (Ss=Se=0) interleaved or single-component, AC scans (1≤Ss≤Se≤63)
    * single-component, first (Ah=0) and refinement (Ah=Al+1) passes,
    * restart markers. Anything else bails → null from the entry point.
    */
  private def jProgScan(b: Array[Byte], dataOff: Int, comps: Array[JComp],
                        scanComps: Array[JComp], ss: Int, se: Int,
                        ah: Int, al: Int, dcT: Array[JHuff],
                        acT: Array[JHuff], restartInt: Int,
                        sequential: Boolean = false): Int = {
    if (al < 0 || al > 13) throw JpegBail
    if (ah != 0 && ah != al + 1) throw JpegBail
    val isDc = ss == 0 && !sequential
    if (sequential) // full-band DC+AC per block: both tables required
      scanComps.foreach(c =>
        if (dcT(c.td) == null || acT(c.ta) == null) throw JpegBail)
    else {
      if (isDc && se != 0) throw JpegBail
      if (!isDc && (scanComps.length != 1 || se < ss || se > 63)) throw JpegBail
      if (isDc && ah == 0)
        scanComps.foreach(c => if (dcT(c.td) == null) throw JpegBail)
      if (!isDc && acT(scanComps(0).ta) == null) throw JpegBail
    }
    var hmax = 1; var vmax = 1
    comps.foreach { c => if (c.h > hmax) hmax = c.h; if (c.v > vmax) vmax = c.v }
    val r = new JBits(b, dataOff, b.length)
    scanComps.foreach(_.pred = 0)
    var eobrun = 0
    val p1 = 1 << al

    def decodeDc(c: JComp, blkOff: Int): Unit =
      if (ah == 0) {
        val t = jDecodeSym(r, dcT(c.td))
        if (t > 11) throw JpegBail
        c.pred += jExtend(r.receive(t), t)
        c.coefs(blkOff) = c.pred << al
      } else if (r.bit() == 1) c.coefs(blkOff) |= p1

    // AC first pass (Ah=0): baseline run/size coding plus EOB runs —
    // symbol (r, 0) with r < 15 ends the band for 2^r + receive(r)
    // consecutive blocks (this one included).
    def decodeAcFirst(c: JComp, blkOff: Int): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      val cf = c.coefs
      var k = ss
      while (k <= se) {
        val rs = jDecodeSym(r, acT(c.ta))
        val run = rs >> 4; val s = rs & 15
        if (s == 0) {
          if (run == 15) k += 16 // ZRL
          else {
            eobrun = (1 << run) - 1
            if (run > 0) eobrun += r.receive(run)
            return
          }
        } else {
          k += run
          if (k > se) throw JpegBail
          cf(blkOff + k) = jExtend(r.receive(s), s) << al
          k += 1
        }
      }
    }

    // AC refinement pass (Ah=Al+1): newly nonzero coefficients arrive as
    // (run, 1) symbols with a sign bit; coefficients already nonzero from
    // earlier passes read one correction bit wherever the scan advances
    // past them (they do not break zero runs); EOB runs carry correction
    // bits for the remainder of each ended band. The history-bit test
    // (cur & p1) is exact because every magnitude at this level is a
    // multiple of 2^Al, so two's complement keeps bit Al equal to the
    // magnitude's bit Al.
    def decodeAcRefine(c: JComp, blkOff: Int): Unit = {
      val cf = c.coefs
      var k = ss
      if (eobrun == 0) {
        var atEob = false
        while (k <= se && !atEob) {
          val rs = jDecodeSym(r, acT(c.ta))
          var run = rs >> 4; val s = rs & 15
          var newval = 0
          if (s == 0) {
            if (run != 15) {
              eobrun = 1 << run
              if (run > 0) eobrun += r.receive(run)
              atEob = true
            }
            // run == 15: ZRL — advance over 16 zero-history positions
          } else {
            if (s != 1) throw JpegBail
            newval = if (r.bit() == 1) p1 else -p1
          }
          if (!atEob) {
            var placed = false
            while (k <= se && !placed) {
              val cur = cf(blkOff + k)
              if (cur != 0) {
                if (r.bit() == 1 && (cur & p1) == 0)
                  cf(blkOff + k) = if (cur >= 0) cur + p1 else cur - p1
              } else {
                if (run == 0) {
                  if (s != 0) cf(blkOff + k) = newval
                  placed = true
                } else run -= 1
              }
              k += 1
            }
            if (!placed && s != 0) throw JpegBail // ran off the band
          }
        }
      }
      if (eobrun > 0) {
        // correction sweep over the rest of the band, then consume one
        // block of the run
        while (k <= se) {
          val cur = cf(blkOff + k)
          if (cur != 0) {
            if (r.bit() == 1 && (cur & p1) == 0)
              cf(blkOff + k) = if (cur >= 0) cur + p1 else cur - p1
          }
          k += 1
        }
        eobrun -= 1
      }
    }

    // sequential full-band block: the baseline per-block entropy decode
    // (DC diff + AC run/size), stored RAW in zigzag order — dequant
    // happens once at EOI like every buffered path
    def decodeSeq(c: JComp, blkOff: Int): Unit = {
      val cf = c.coefs
      val t = jDecodeSym(r, dcT(c.td))
      if (t > 11) throw JpegBail
      c.pred += jExtend(r.receive(t), t)
      cf(blkOff) = c.pred
      var k = 1
      while (k < 64) {
        val rs = jDecodeSym(r, acT(c.ta))
        val run = rs >> 4; val s = rs & 15
        if (s == 0) {
          if (run == 15) k += 16 else k = 64 // ZRL / EOB
        } else {
          k += run
          if (k > 63) throw JpegBail
          cf(blkOff + k) = jExtend(r.receive(s), s)
          k += 1
        }
      }
    }

    def decodeBlock(c: JComp, blkOff: Int): Unit =
      if (sequential) decodeSeq(c, blkOff)
      else if (isDc) decodeDc(c, blkOff)
      else if (ah == 0) decodeAcFirst(c, blkOff)
      else decodeAcRefine(c, blkOff)

    var mcu = 0; var rstIdx = 0
    def maybeRestart(): Unit =
      if (restartInt > 0 && mcu > 0 && mcu % restartInt == 0) {
        r.restart(rstIdx); rstIdx = (rstIdx + 1) & 7
        scanComps.foreach(_.pred = 0)
        eobrun = 0
      }

    if (scanComps.length == 1) {
      // non-interleaved: one block per MCU over the REAL grid, row
      // stride = the padded grid width
      val c = scanComps(0)
      var by = 0
      while (by < c.rh) {
        var bx = 0
        while (bx < c.rw) {
          maybeRestart()
          decodeBlock(c, (by * c.bw + bx) * 64)
          mcu += 1
          bx += 1
        }
        by += 1
      }
    } else {
      // interleaved DC scan: MCU order over the padded grid
      val mcusX = (comps.map(c => c.bw / c.h).max)
      val mcusY = (comps.map(c => c.bh / c.v).max)
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          maybeRestart()
          var ci = 0
          while (ci < scanComps.length) {
            val c = scanComps(ci)
            var v = 0
            while (v < c.v) {
              var hh = 0
              while (hh < c.h) {
                decodeBlock(c,
                  ((my * c.v + v) * c.bw + (mx * c.h + hh)) * 64)
                hh += 1
              }
              v += 1
            }
            ci += 1
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }
    }
    r.pos
  }

  /** Dequantize + IDCT every buffered block into component planes, then
    * crop/upsample/color-convert — the progressive twin of [[jScan]]'s
    * tail, run once at EOI.
    */
  private def jProgFinish(w: Int, h: Int, comps: Array[JComp],
                          qt: Array[Array[Int]]): Raster = {
    var hmax = 1; var vmax = 1
    comps.foreach { c => if (c.h > hmax) hmax = c.h; if (c.v > vmax) vmax = c.v }
    val nat = new Array[Int](64)
    val tmp = new Array[Double](64)
    comps.foreach { c =>
      val q = qt(c.tq)
      c.planeW = c.bw * 8
      c.plane = new Array[Byte](c.planeW * c.bh * 8)
      var by = 0
      while (by < c.bh) {
        var bx = 0
        while (bx < c.bw) {
          val blkOff = (by * c.bw + bx) * 64
          var k = 0
          while (k < 64) {
            nat(JpegZigzag(k)) = c.coefs(blkOff + k) * q(k)
            k += 1
          }
          jIdctBlock(nat, tmp, c.plane, c.planeW, bx * 8, by * 8)
          bx += 1
        }
        by += 1
      }
    }
    jAssemble(w, h, comps, hmax, vmax)
  }

  // ---------------- 12-bit extended-sequential JPEG (SOF1) ----------------
  //
  // T.81 extended sequential DCT at 12-bit sample precision — the
  // DICOM/medical-imaging JPEG shape (SOF0 baseline is 8-bit BY
  // DEFINITION; 12-bit rides SOF1). The entropy/dequant/IDCT machinery
  // is the 8-bit path's with three changes: the level shift is 2^11, the
  // clamp is [0, 4095], and DC difference categories run to 15 (Table
  // F.1). Like the 16-bit-PNG and lossless-JPEG surfaces, no truncated
  // 8-bit raster is fabricated — full-precision statistics are the
  // decode surface.

  /** Decoded 12-bit frame: gray samples at full precision. */
  final class J12(val width: Int, val height: Int, val samples: Array[Int])

  /** 12-bit JPEG sample statistics at FULL precision: struct(width,
    * height, px_sum, px_min, px_max). Null outside the envelope (see
    * [[decodeJpeg12]]).
    */
  def jpeg12Stats(bytes: Array[Byte]): InternalRow = {
    val r = decodeJpeg12(bytes)
    if (r == null) return null
    var sum = 0L; var mn = Int.MaxValue; var mx = 0
    var i = 0
    while (i < r.samples.length) {
      val v = r.samples(i)
      sum += v; if (v < mn) mn = v; if (v > mx) mx = v
      i += 1
    }
    new GenericInternalRow(Array[Any](r.width, r.height, sum, mn, mx))
  }

  /** 12-bit extended-sequential JPEG decode (T.81, SOF1, Huffman).
    *
    * Envelope (null outside it): SOF1 frames with precision 12, ONE
    * gray component (the DICOM shape — 12-bit color would need a
    * 12-bit chroma convention no ecosystem agrees on), single full-band
    * scan, 8- or 16-bit quant tables, restart markers. The IDCT applies
    * the 12-bit level shift with the same deterministic floor(x+2048.5)
    * rounding the 8-bit path proves at floor(x+128.5), clamped to
    * [0, 4095].
    */
  def decodeJpeg12(bytes: Array[Byte]): J12 = {
    if (bytes == null || bytes.length < 4) return null
    try decodeJpeg12_0(bytes)
    catch { case _: RuntimeException => null }
  }

  private def decodeJpeg12_0(b: Array[Byte]): J12 = {
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return null
    val qt = Array.ofDim[Int](4, 64)
    // DQT-populated flag per slot, same honest-null rationale as the
    // 8-bit path: never dequantize against a never-installed table
    val qtDef = new Array[Boolean](4)
    val dcT = new Array[JHuff](4)
    val acT = new Array[JHuff](4)
    var w = 0; var h = 0
    var haveFrame = false
    var tq = 0; var td = 0; var ta = 0
    var restartInt = 0
    var off = 2
    while (off + 1 < b.length) {
      if ((b(off) & 0xff) != 0xff) return null
      var m = b(off + 1) & 0xff
      while (m == 0xff && off + 2 < b.length) { off += 1; m = b(off + 1) & 0xff }
      off += 2
      def segLen: Int = {
        if (off + 2 > b.length) throw JpegBail
        val len = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
        if (len < 2 || off + len > b.length) throw JpegBail
        len
      }
      m match {
        case 0xd8 | 0x01 => // standalone
        case 0xd9 => return null // EOI before the scan
        case 0xdb => // DQT: 8- or 16-bit tables
          val len = segLen
          var p = off + 2; val stop = off + len
          while (p < stop) {
            val pq = (b(p) & 0xff) >> 4; val t = b(p) & 0x0f
            if (pq > 1 || t > 3) throw JpegBail
            p += 1
            val step = if (pq == 0) 1 else 2
            if (p + 64 * step > stop) throw JpegBail
            var i = 0
            while (i < 64) {
              qt(t)(i) =
                if (pq == 0) b(p + i) & 0xff
                else ((b(p + 2 * i) & 0xff) << 8) | (b(p + 2 * i + 1) & 0xff)
              if (qt(t)(i) == 0) throw JpegBail
              i += 1
            }
            qtDef(t) = true
            p += 64 * step
          }
          off += len
        case 0xc4 => // DHT
          val len = segLen
          var p = off + 2; val stop = off + len
          while (p < stop) {
            val tc = (b(p) & 0xff) >> 4; val th = b(p) & 0x0f
            if (tc > 1 || th > 3) throw JpegBail
            p += 1
            if (p + 16 > stop) throw JpegBail
            val counts = Array.tabulate(16)(i => b(p + i) & 0xff)
            p += 16
            val n = counts.sum
            if (n > 256 || p + n > stop) throw JpegBail
            val vals = Array.tabulate(n)(i => b(p + i) & 0xff)
            p += n
            val t = new JHuff(counts, vals)
            if (tc == 0) dcT(th) = t else acT(th) = t
          }
          off += len
        case 0xc1 => // SOF1: extended sequential
          val len = segLen
          if (len < 11) throw JpegBail
          val precision = b(off + 2) & 0xff
          h = ((b(off + 3) & 0xff) << 8) | (b(off + 4) & 0xff)
          w = ((b(off + 5) & 0xff) << 8) | (b(off + 6) & 0xff)
          val nc = b(off + 7) & 0xff
          if (precision != 12 || w <= 0 || h <= 0 || nc != 1) return null
          if (w.toLong * h > 16L * 1024 * 1024) return null
          val hv = b(off + 9) & 0xff
          if (hv != 0x11) return null // 1x1 sampling
          tq = b(off + 10) & 0xff
          if (tq > 3) return null
          haveFrame = true
          off += len
        case x if (x >= 0xc0 && x <= 0xcf && x != 0xc1 && x != 0xc4) =>
          return null // 8-bit baseline / progressive / lossless: other paths
        case 0xdd =>
          val len = segLen
          if (len != 4) throw JpegBail
          restartInt = ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
          off += len
        case 0xda =>
          val len = segLen
          if (!haveFrame) return null
          if ((b(off + 2) & 0xff) != 1 || len != 8) return null
          val tdta = b(off + 4) & 0xff
          td = tdta >> 4; ta = tdta & 0x0f
          if (td > 3 || ta > 3) return null
          val ss = b(off + 5) & 0xff
          val se = b(off + 6) & 0xff
          if (ss != 0 || se != 63 || (b(off + 7) & 0xff) != 0) return null
          if (dcT(td) == null || acT(ta) == null) return null
          if (!qtDef(tq)) return null // DQT never installed this slot
          return jScan12(b, off + len, w, h, qt(tq), dcT(td), acT(ta),
            restartInt)
        case x if x >= 0xd0 && x <= 0xd7 => // RSTn outside scan: ignore
        case _ => off += segLen
      }
    }
    null
  }

  /** The single-component 12-bit scan: per 8×8 block, DC diff (category
    * ≤ 15 per Table F.1) + AC run/size, dequantize, IDCT with the
    * 12-bit level shift floor(x+2048.5) clamped to [0, 4095], crop.
    */
  private def jScan12(b: Array[Byte], scanOff: Int, w: Int, h: Int,
                      q: Array[Int], dc: JHuff, ac: JHuff,
                      restartInt: Int): J12 = {
    val bxN = (w + 7) / 8; val byN = (h + 7) / 8
    val planeW = bxN * 8
    val plane = new Array[Int](planeW * byN * 8)
    val r = new JBits(b, scanOff, b.length)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    var pred = 0
    var mcu = 0; var rstIdx = 0
    var by = 0
    while (by < byN) {
      var bx = 0
      while (bx < bxN) {
        if (restartInt > 0 && mcu > 0 && mcu % restartInt == 0) {
          r.restart(rstIdx); rstIdx = (rstIdx + 1) & 7
          pred = 0
        }
        java.util.Arrays.fill(coef, 0)
        val t = jDecodeSym(r, dc)
        if (t > 15) throw JpegBail // 12-bit DC categories run 0..15
        pred += jExtend(r.receive(t), t)
        coef(0) = pred * q(0)
        var k = 1
        while (k < 64) {
          val rs = jDecodeSym(r, ac)
          val run = rs >> 4; val s = rs & 15
          if (s == 0) {
            if (run == 15) k += 16 else k = 64
          } else {
            k += run
            if (k > 63) throw JpegBail
            coef(JpegZigzag(k)) = jExtend(r.receive(s), s) * q(k)
            k += 1
          }
        }
        // IDCT with the 12-bit level shift and clamp
        var x = 0
        while (x < 8) {
          var v = 0
          while (v < 8) {
            var acc = 0.0
            var u = 0
            while (u < 8) { acc += coef(v * 8 + u) * IdctCos(u)(x); u += 1 }
            tmp(v * 8 + x) = acc
            v += 1
          }
          x += 1
        }
        var y = 0
        while (y < 8) {
          var xx = 0
          while (xx < 8) {
            var f = 0.0
            var v = 0
            while (v < 8) { f += tmp(v * 8 + xx) * IdctCos(v)(y); v += 1 }
            var p = StrictMath.floor(f + 2048.5).toInt
            if (p < 0) p = 0 else if (p > 4095) p = 4095
            plane((by * 8 + y) * planeW + bx * 8 + xx) = p
            xx += 1
          }
          y += 1
        }
        mcu += 1; bx += 1
      }
      by += 1
    }
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      System.arraycopy(plane, y * planeW, out, y * w, w)
      y += 1
    }
    new J12(w, h, out)
  }

  val Jpeg12StatsType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("px_sum", LongType, nullable = false),
    StructField("px_min", IntegerType, nullable = false),
    StructField("px_max", IntegerType, nullable = false)))

  // ---------------- lossless JPEG (SOF3 / SOF11) ----------------
  //
  // T.81 Annex H: a lossless frame codes each SAMPLE
  // as a Huffman-coded DPCM difference from one of seven spatial
  // predictors (Ss in the scan header selects it), with the same
  // SSSS-category + magnitude-bits encoding as baseline DC coefficients
  // (SSSS=16 is the special no-bits code for difference 32768), and
  // reconstruction modulo 2^16 (H.1.2.1). Precision runs 2–16 bits —
  // the DNG/raw-camera and medical-imaging layouts — so, exactly like
  // [[png16Stats]], no 8-bit raster is fabricated: full-precision
  // statistics are the decode surface.

  /** Decoded lossless frame: interleaved full-precision samples. */
  final class JLossless(val width: Int, val height: Int, val nc: Int,
                        val precision: Int, val samples: Array[Int])

  /** Lossless-JPEG (SOF3) sample statistics at FULL precision:
    * struct(width, height, components, precision, px_sum, px_min,
    * px_max) over every sample of every component. Null outside the
    * envelope (see [[decodeJpegLossless]]) — honest partial decoder,
    * never garbage.
    */
  def jpegLosslessStats(bytes: Array[Byte]): InternalRow = {
    val r = decodeJpegLossless(bytes)
    if (r == null) return null
    var sum = 0L; var mn = Int.MaxValue; var mx = 0
    var i = 0
    while (i < r.samples.length) {
      val v = r.samples(i)
      sum += v; if (v < mn) mn = v; if (v > mx) mx = v
      i += 1
    }
    new GenericInternalRow(
      Array[Any](r.width, r.height, r.nc, r.precision, sum, mn, mx))
  }

  /** Full lossless-JPEG decode (ITU-T T.81 Annex H): SOF3 Huffman and
    * SOF11 arithmetic (QM-coded differences under the H.1.2.2 model,
    * with DAC conditioning bounds honoured — see [[jLosslessScanArith]]).
    *
    * Envelope (null outside it): SOF3/SOF11 frames, 2–16 bit precision,
    * 1–4 components all with 1×1 sampling factors, ONE interleaved scan
    * covering every frame component in frame order, predictors 1–7,
    * point transform 0 ≤ Pt < precision, and ROW-aligned restart
    * intervals (r19: a DRI whose MCU interval is a multiple of the
    * samples-per-line decodes with the full T.81 H.2.2 reset — the
    * restarted row predicts as a scan-start first line, and on the
    * arithmetic path each interval is its own coder segment with zeroed
    * statistics and conditioning; a MID-row interval still nulls, since
    * the H.1.1 "first line of the restart interval" rules are only
    * unambiguous on line boundaries). Per H.1.2: the first
    * sample predicts from 1<<(P−Pt−1), the rest of the first line from
    * Ra (left), the first column of later lines from Rb (above);
    * elsewhere the scan's predictor applies, with >>1 as the arithmetic
    * shift (floor) on possibly-negative sums. Reconstruction is
    * (prediction + diff) mod 2^16, and the inverse point transform
    * (<< Pt) stays in the same mod-2^16 ring — every step is exact
    * integer arithmetic an oracle replays as prefix sums.
    *
    * RESIDUAL CONFORMANCE RISK, SOF11 only (ADVICE r19, documented per
    * its own prescription): the QM statistical-model layout — the
    * 25-context (Da, Db) ordering, the Db-large X/M bin-set selection,
    * the MSB-based magnitude classification of H.1.2.2/H.1.2.3 — is
    * verified against (a) the in-tree QmEnc fixture encoder and (b) the
    * cross-coder law that identical diffs through SOF3-Huffman and
    * SOF11-QM decode to identical samples. No EXTERNAL SOF11 oracle
    * exists in this container: libjpeg declines lossless-arithmetic
    * (its arith support covers SOF9/SOF10 only) and the ITU reference
    * software is not present, so a misreading of the H.1.2.2 context
    * tables SHARED by QmEnc and this decoder would decode a third-party
    * SOF11 stream to wrong pixels rather than null — unlike every other
    * JPEG flavor here, whose entropy layer is pinned by the external
    * libjpeg goldens in MediaCodecSpec. The QM coder CORE carries no such
    * risk (it is byte-identical machinery to the SOF9/SOF10 path, which
    * IS libjpeg-pinned); only the lossless context-selection layer does.
    * Sourcing one third-party SOF11 golden closes this; until then,
    * treat SOF11 decodes of externally-produced streams as unverified.
    */
  def decodeJpegLossless(bytes: Array[Byte]): JLossless = {
    if (bytes == null || bytes.length < 4) return null
    try decodeJpegLossless0(bytes)
    catch { case _: RuntimeException => null }
  }

  private def decodeJpegLossless0(b: Array[Byte]): JLossless = {
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return null
    val dcT = new Array[JHuff](4)
    var w = 0; var h = 0; var precision = 0
    var comps: Array[JComp] = null
    var arith = false // SOF11: QM-coded differences instead of Huffman
    val condL = Array.fill(4)(0) // DAC DC-class conditioning bounds
    val condU = Array.fill(4)(1) // (defaults per F.1.4.4.1.4: L=0, U=1)
    var restartInt = 0 // DRI interval in MCUs (row-aligned only; see SOS)
    var off = 2
    while (off + 1 < b.length) {
      if ((b(off) & 0xff) != 0xff) return null
      var m = b(off + 1) & 0xff
      while (m == 0xff && off + 2 < b.length) { off += 1; m = b(off + 1) & 0xff }
      off += 2
      def segLen: Int = {
        if (off + 2 > b.length) throw JpegBail
        val len = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
        if (len < 2 || off + len > b.length) throw JpegBail
        len
      }
      m match {
        case 0xd8 | 0x01 => // stray SOI / TEM: standalone
        case 0xd9 => return null // EOI before any scan
        case 0xc4 => // DHT: lossless uses the DC table class
          val len = segLen
          var p = off + 2; val stop = off + len
          while (p < stop) {
            val tc = (b(p) & 0xff) >> 4; val th = b(p) & 0x0f
            if (tc > 1 || th > 3) throw JpegBail
            p += 1
            if (p + 16 > stop) throw JpegBail
            val counts = Array.tabulate(16)(i => b(p + i) & 0xff)
            p += 16
            val n = counts.sum
            if (n > 256 || p + n > stop) throw JpegBail
            val vals = Array.tabulate(n)(i => b(p + i) & 0xff)
            p += n
            if (tc == 0) dcT(th) = new JHuff(counts, vals)
          }
          off += len
        case 0xc3 | 0xcb => // SOF3 (Huffman) / SOF11 (arithmetic) lossless
          arith = m == 0xcb
          val len = segLen
          if (len < 8) throw JpegBail
          precision = b(off + 2) & 0xff
          h = ((b(off + 3) & 0xff) << 8) | (b(off + 4) & 0xff)
          w = ((b(off + 5) & 0xff) << 8) | (b(off + 6) & 0xff)
          val nc = b(off + 7) & 0xff
          if (precision < 2 || precision > 16 || w <= 0 || h <= 0 ||
              nc < 1 || nc > 4) return null
          if (len < 8 + 3 * nc) throw JpegBail
          // 4-byte Int state per sample: same buffered-decode cap as the
          // progressive path (forged dims can't OOM)
          if (w.toLong * h * nc > 16L * 1024 * 1024) return null
          comps = Array.tabulate(nc) { i =>
            val c = new JComp
            c.id = b(off + 8 + 3 * i) & 0xff
            val hv = b(off + 9 + 3 * i) & 0xff
            c.h = hv >> 4; c.v = hv & 0x0f
            if (c.h != 1 || c.v != 1) return null // 1x1 sampling only
            c
          }
          off += len
        case 0xcc => // DAC: conditioning bounds for the arithmetic scan
          val len = segLen
          var p = off + 2; val stop = off + len
          while (p + 1 < stop) {
            val tc = (b(p) & 0xff) >> 4; val tb = b(p) & 0x0f
            val v = b(p + 1) & 0xff
            if (tc > 1 || tb > 3) throw JpegBail
            if (tc == 0) { // DC class: (U << 4) | L, 0 <= L <= U <= 15
              condL(tb) = v & 0x0f
              condU(tb) = v >> 4
              if (condL(tb) > condU(tb)) throw JpegBail
            } // AC-class (Kx) tables are meaningless in a lossless frame
            p += 2
          }
          off += len
        case x if (x >= 0xc0 && x <= 0xcf && x != 0xc3 && x != 0xc4 &&
            x != 0xcb && x != 0xcc) =>
          return null // any other frame type: not a lossless stream
        case 0xdd => // DRI: ROW-aligned restart intervals are in envelope
          val len = segLen
          if (len != 4) throw JpegBail
          restartInt = ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
          off += len
        case 0xda => // SOS: predictor in Ss, point transform in Al
          val len = segLen
          if (comps == null) return null
          val ns = b(off + 2) & 0xff
          if (ns != comps.length || len != 6 + 2 * ns) return null
          var i = 0
          while (i < ns) {
            val cid = b(off + 3 + 2 * i) & 0xff
            if (cid != comps(i).id) return null // scan order == frame order
            val tdta = b(off + 4 + 2 * i) & 0xff
            comps(i).td = tdta >> 4
            if (comps(i).td > 3) return null
            if (!arith && dcT(comps(i).td) == null) return null
            i += 1
          }
          val sel = b(off + 3 + 2 * ns) & 0xff
          val se = b(off + 4 + 2 * ns) & 0xff
          val ahal = b(off + 5 + 2 * ns) & 0xff
          val pt = ahal & 0x0f
          if (sel < 1 || sel > 7 || se != 0 || (ahal >> 4) != 0 ||
              pt >= precision) return null
          // Restart envelope: intervals must land on row starts (at 1x1
          // interleaved sampling a line is w MCUs). The H.1.1 reset rules
          // name "the first line of the restart interval", which is only
          // unambiguous when intervals ARE whole lines — mid-row restarts
          // would need Rb/Rc references across the resynchronization
          // point, defeating it; they stay honest-null.
          val restartRows =
            if (restartInt == 0) 0
            else if (restartInt % w == 0) restartInt / w
            else return null
          return if (arith)
            jLosslessScanArith(b, off + len, w, h, comps, condL, condU,
              precision, sel, pt, restartRows)
          else jLosslessScan(b, off + len, w, h, comps, dcT,
            precision, sel, pt, restartRows)
        case x if x >= 0xd0 && x <= 0xd7 => return null // RSTn w/o DRI
        case _ => off += segLen // APPn / COM / DQT(ignored) / other: skip
      }
    }
    null // ran off the end without a scan
  }

  /** One interleaved lossless scan: for each sample in raster order
    * (components interleaved per MCU — one sample each at 1×1 sampling),
    * Huffman-decode the SSSS category from the component's DC-class
    * table, EXTEND the magnitude bits (SSSS=16 → 32768, no bits), add to
    * the prediction modulo 2^16, then apply the inverse point transform.
    */
  private def jLosslessScan(b: Array[Byte], scanOff: Int, w: Int, h: Int,
                            comps: Array[JComp], dcT: Array[JHuff],
                            p: Int, sel: Int, pt: Int,
                            restartRows: Int = 0): JLossless = {
    val nc = comps.length
    val r = new JBits(b, scanOff, b.length)
    val out = new Array[Int](w * h * nc)
    val init = 1 << (p - pt - 1)
    val prev = Array.ofDim[Int](nc, w) // reconstructed row above (Rb/Rc)
    val cur = Array.ofDim[Int](nc, w)
    var rstIdx = 0
    var y = 0
    while (y < h) {
      // H.2.2 row-aligned restart: byte-align onto the expected RSTn and
      // treat this row as a scan-start first line (default prediction at
      // x=0, Ra for the rest — the H.1.1 reset rules)
      val restartRow = restartRows > 0 && y > 0 && y % restartRows == 0
      if (restartRow) {
        r.restart(rstIdx)
        rstIdx = (rstIdx + 1) & 7
      }
      val firstLine = y == 0 || restartRow
      var x = 0
      while (x < w) {
        var ci = 0
        while (ci < nc) {
          val t = jDecodeSym(r, dcT(comps(ci).td))
          if (t > 16) throw JpegBail
          val diff = if (t == 16) 32768 else jExtend(r.receive(t), t)
          val pred =
            if (firstLine && x == 0) init
            else if (firstLine) cur(ci)(x - 1) // first line: Ra
            else if (x == 0) prev(ci)(0) // first column: Rb
            else {
              val ra = cur(ci)(x - 1)
              val rb = prev(ci)(x)
              val rc = prev(ci)(x - 1)
              sel match {
                case 1 => ra
                case 2 => rb
                case 3 => rc
                case 4 => ra + rb - rc
                case 5 => ra + ((rb - rc) >> 1)
                case 6 => rb + ((ra - rc) >> 1)
                case _ => (ra + rb) >> 1
              }
            }
          val rx = (pred + diff) & 0xffff
          cur(ci)(x) = rx
          out((y * w + x) * nc + ci) = (rx << pt) & 0xffff
          ci += 1
        }
        x += 1
      }
      var ci = 0
      while (ci < nc) {
        System.arraycopy(cur(ci), 0, prev(ci), 0, w)
        ci += 1
      }
      y += 1
    }
    new JLossless(w, h, nc, p, out)
  }

  /** One interleaved lossless ARITHMETIC scan (SOF11): the same raster
    * walk, predictor rules, and mod-2^16 reconstruction as
    * [[jLosslessScan]], but each difference is decoded by the Annex-D
    * QM coder under the T.81 §H.1.2.2 statistical model — the DC
    * difference decision tree of F.1.4.4.1, with the zero/sign/
    * first-magnitude decisions conditioned on the 5×5 classification of
    * the two neighbouring differences (Da: the diff decoded at the left
    * sample of the current row; Db: the diff at the same column of the
    * row above — both category 0 where the neighbour doesn't exist),
    * each classified by the F.1.4.4.1.3 procedure against the DAC L/U
    * bounds of the component's table, and TWO X/M magnitude-bin sets
    * selected by whether Db classifies large (either sign). Statistics
    * area: 25 contexts × 4 (S0/SS/SP/SN) + 2 × (X1–X15 + M2–M15) =
    * 158 bins per table (the public bin count for the lossless
    * arithmetic process; DC is 49, AC is 245). Magnitudes run to 32768,
    * so X walks may reach X15 — the full 16-bit difference ring.
    */
  private def jLosslessScanArith(b: Array[Byte], scanOff: Int,
                                 w: Int, h: Int, comps: Array[JComp],
                                 condL: Array[Int], condU: Array[Int],
                                 p: Int, sel: Int, pt: Int,
                                 restartRows: Int = 0): JLossless = {
    val nc = comps.length
    val qm = new JQm(b, b.length)
    qm.init(scanOff)
    val stats = Array.ofDim[Byte](4, 158)
    val out = new Array[Int](w * h * nc)
    val init = 1 << (p - pt - 1)
    val prev = Array.ofDim[Int](nc, w)
    val cur = Array.ofDim[Int](nc, w)
    // conditioning state: the CATEGORY (0 zero, 1 small+, 2 small−,
    // 3 large+, 4 large−) of the diff decoded at each column of the row
    // above (Db source, overwritten in place as the row advances) and at
    // the left neighbour (Da)
    val catUp = Array.ofDim[Int](nc, w)
    val catLeft = new Array[Int](nc)
    var rstIdx = 0
    var firstLine = true
    var y = 0
    while (y < h) {
      // H.2.2 row-aligned restart: each interval is its own arithmetic
      // segment — coder re-initialized past the RSTn, every statistics
      // bin AND the (Da, Db) conditioning state zeroed, and the restarted
      // row predicts as a scan-start first line
      val restartRow = restartRows > 0 && y > 0 && y % restartRows == 0
      if (restartRow) {
        val next = qm.seekRestart(rstIdx)
        rstIdx = (rstIdx + 1) & 7
        qm.init(next)
        var t = 0
        while (t < 4) { java.util.Arrays.fill(stats(t), 0.toByte); t += 1 }
        var ci = 0
        while (ci < nc) {
          java.util.Arrays.fill(catUp(ci), 0)
          ci += 1
        }
      }
      firstLine = y == 0 || restartRow
      java.util.Arrays.fill(catLeft, 0)
      var x = 0
      while (x < w) {
        var ci = 0
        while (ci < nc) {
          val c = comps(ci)
          val st = stats(c.td)
          val ctx = (catLeft(ci) * 5 + catUp(ci)(x)) * 4
          var diff = 0
          var cat = 0
          if (qm.decode(st, ctx) != 0) {
            val sign = qm.decode(st, ctx + 1)
            var m = 0
            var si = ctx + 2 + sign
            if (qm.decode(st, si) != 0) {
              m = 1
              si = if (catUp(ci)(x) > 2) 129 else 100 // X set by Db large?
              while (qm.decode(st, si) != 0) {
                m <<= 1
                if (m == 0x8000) throw JpegBail
                si += 1
              }
            }
            cat = // same classification the DC model applies to Da
              if (m < ((1 << condL(c.td)) >> 1)) 0
              else if (m > ((1 << condU(c.td)) >> 1)) 3 + sign
              else 1 + sign
            var v = m
            si += 14
            while ({ m >>= 1; m != 0 }) {
              if (qm.decode(st, si) != 0) v |= m
            }
            v += 1
            diff = if (sign != 0) -v else v
          }
          catLeft(ci) = cat
          catUp(ci)(x) = cat
          val pred =
            if (firstLine && x == 0) init
            else if (firstLine) cur(ci)(x - 1) // first line: Ra
            else if (x == 0) prev(ci)(0) // first column: Rb
            else {
              val ra = cur(ci)(x - 1)
              val rb = prev(ci)(x)
              val rc = prev(ci)(x - 1)
              sel match {
                case 1 => ra
                case 2 => rb
                case 3 => rc
                case 4 => ra + rb - rc
                case 5 => ra + ((rb - rc) >> 1)
                case 6 => rb + ((ra - rc) >> 1)
                case _ => (ra + rb) >> 1
              }
            }
          val rx = (pred + diff) & 0xffff
          cur(ci)(x) = rx
          out((y * w + x) * nc + ci) = (rx << pt) & 0xffff
          ci += 1
        }
        x += 1
      }
      var ci = 0
      while (ci < nc) {
        System.arraycopy(cur(ci), 0, prev(ci), 0, w)
        ci += 1
      }
      y += 1
    }
    new JLossless(w, h, nc, p, out)
  }

  val JpegLosslessStatsType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("components", IntegerType, nullable = false),
    StructField("precision", IntegerType, nullable = false),
    StructField("px_sum", LongType, nullable = false),
    StructField("px_min", IntegerType, nullable = false),
    StructField("px_max", IntegerType, nullable = false)))

  // ---------------- GIF (87a / 89a) ----------------

  /** Full GIF decode — LZW decompression (variable-width LSB-first codes,
    * CLEAR/EOI, 4096-entry dictionary with the KwKwK case), global or
    * local color table, optional interlace (the four-pass 8/8-4/8-2/4-1/2
    * row order). FIRST image only: extension blocks are skipped via their
    * sub-block chains (never scanned for markers), and the walk stops at
    * the first image's end — animation frames beyond it are out of
    * envelope, as is an image whose descriptor places it at a nonzero
    * left/top offset or smaller than the logical screen (that requires
    * background-color compositing; decoding it image-local would diverge
    * from a reference decoder, so it returns null instead). Output is
    * interleaved RGB (bpp = 3). null for non-GIF / malformed / truncated
    * / oversized streams — never garbage.
    */
  def decodeGif(bytes: Array[Byte]): Raster = {
    if (bytes == null || bytes.length < 14) return null
    try decodeGif0(bytes)
    catch { case _: RuntimeException => null }
  }

  private def decodeGif0(b: Array[Byte]): Raster = {
    def u8(i: Int): Int = { if (i < 0 || i >= b.length) throw JpegBail; b(i) & 0xff }
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return null
    def palette(off: Int, n: Int): Array[Int] = {
      val p = new Array[Int](n)
      var i = 0
      while (i < n) {
        p(i) = (u8(off + 3 * i) << 16) | (u8(off + 3 * i + 1) << 8) |
          u8(off + 3 * i + 2)
        i += 1
      }
      p
    }
    var off = 6
    val gpacked = u8(off + 4)
    off += 7
    var gct: Array[Int] = null
    if ((gpacked & 0x80) != 0) {
      val n = 2 << (gpacked & 7)
      gct = palette(off, n); off += 3 * n
    }
    while (off < b.length) {
      u8(off) match {
        case 0x21 => // extension: introducer + label + sub-block chain
          off += 2
          var len = u8(off)
          while (len != 0) { off += 1 + len; len = u8(off) }
          off += 1
        case 0x3b => return null // trailer before any image
        case 0x2c => // image descriptor: decode and return
          val ileft = u16(off + 1); val itop = u16(off + 3)
          val iw = u16(off + 5); val ih = u16(off + 7)
          val ip = u8(off + 9)
          off += 10
          if (iw <= 0 || ih <= 0 || iw.toLong * ih * 3 > 64L * 1024 * 1024)
            return null
          // an image offset within (or smaller than) the logical screen
          // must be composited onto that screen with the background color;
          // decoding it image-local would diverge from a reference decoder.
          // Honest null keeps the envelope strictly reproducing-decoders.
          if (ileft != 0 || itop != 0 || iw != u16(6) || ih != u16(8))
            return null
          var pal = gct
          if ((ip & 0x80) != 0) {
            val n = 2 << (ip & 7)
            pal = palette(off, n); off += 3 * n
          }
          if (pal == null) return null
          val interlaced = (ip & 0x40) != 0
          val mcs = u8(off); off += 1
          if (mcs < 2 || mcs > 8) return null
          val data = new java.io.ByteArrayOutputStream()
          var len = u8(off)
          while (len != 0) {
            if (off + 1 + len > b.length) throw JpegBail
            data.write(b, off + 1, len); off += 1 + len; len = u8(off)
          }
          val indices = gifLzw(data.toByteArray, mcs, iw * ih)
          val pix = new Array[Byte](iw * ih * 3)
          // interlace pass row order; sequential otherwise
          val rows =
            if (!interlaced) 0 until ih
            else (0 until ih by 8) ++ (4 until ih by 8) ++
              (2 until ih by 4) ++ (1 until ih by 2)
          var src = 0
          rows.foreach { y =>
            var x = 0
            while (x < iw) {
              val idx = indices(src) & 0xff; src += 1
              if (idx >= pal.length) throw JpegBail
              val c = pal(idx)
              val o = (y * iw + x) * 3
              pix(o) = (c >> 16).toByte
              pix(o + 1) = ((c >> 8) & 0xff).toByte
              pix(o + 2) = (c & 0xff).toByte
              x += 1
            }
          }
          return new Raster(iw, ih, 3, pix)
        case _ => return null
      }
    }
    null
  }

  /** GIF LZW decompression to exactly `nOut` palette indices. Width
    * grows when the dictionary size reaches the current code capacity
    * (max 12 bits); the encoder's mirror rule is offset by one because
    * it adds each entry one code earlier than the decoder learns it.
    */
  private def gifLzw(d: Array[Byte], mcs: Int, nOut: Int): Array[Byte] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val strlen = new Array[Int](4096)
    var i = 0
    while (i < clear) {
      prefix(i) = -1; suffix(i) = i.toByte; strlen(i) = 1; i += 1
    }
    var dictSize = eoi + 1
    var width = mcs + 1
    val out = new Array[Byte](nOut)
    var outPos = 0
    var bitPos = 0
    val nBits = d.length * 8
    def read(): Int = {
      if (bitPos + width > nBits) throw JpegBail
      var v = 0
      var j = 0
      while (j < width) {
        val p = bitPos + j
        v |= ((d(p >> 3) >> (p & 7)) & 1) << j
        j += 1
      }
      bitPos += width
      v
    }
    def firstChar(code: Int): Byte = {
      var c = code
      while (prefix(c) >= 0) c = prefix(c)
      suffix(c)
    }
    def emit(code: Int): Unit = {
      val n = strlen(code)
      if (outPos + n > nOut) throw JpegBail
      var c = code
      var p = outPos + n - 1
      while (c >= 0) { out(p) = suffix(c); p -= 1; c = prefix(c) }
      outPos += n
    }
    var prev = -1
    while (outPos < nOut) {
      val code = read()
      if (code == clear) { dictSize = eoi + 1; width = mcs + 1; prev = -1 }
      else if (code == eoi) throw JpegBail // EOI before all pixels
      else {
        if (code > dictSize || code == eoi || (code == dictSize && prev < 0))
          throw JpegBail
        if (prev >= 0 && dictSize < 4096) {
          // new entry: prev's string + first char of this code's string
          // (for the KwKwK case code == dictSize, that first char is
          // prev's own first char — the entry being defined)
          val fc = if (code == dictSize) firstChar(prev) else firstChar(code)
          prefix(dictSize) = prev
          suffix(dictSize) = fc
          strlen(dictSize) = strlen(prev) + 1
          dictSize += 1
          if (dictSize == (1 << width) && width < 12) width += 1
        } else if (code == dictSize) throw JpegBail // KwKwK needs the add
        emit(code)
        prev = code
      }
    }
    out
  }

  /** struct(width, height, channels, px_sum, px_min, px_max) over the
    * fully decoded GIF raster (same shape as [[pngStats]]); null outside
    * the envelope.
    */
  /** GIF container metadata — struct(width, height, n_frames): the
    * logical-screen dimensions plus a count of ALL image descriptors via
    * the bounded sub-block walk (local color tables and LZW data are
    * SKIPPED by length, never decoded), so animation length is a cheap
    * header pass while pixel decode stays first-frame
    * ([[decodeGif]]'s envelope). Null for non-GIF / malformed streams,
    * and for a stream with no image before the trailer.
    */
  def gifMeta(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 14) return null
    try {
      def u8(i: Int): Int = { if (i < 0 || i >= bytes.length) throw JpegBail; bytes(i) & 0xff }
      def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      val sig = new String(bytes, 0, 6, "US-ASCII")
      if (sig != "GIF87a" && sig != "GIF89a") return null
      val w = u16(6); val h = u16(8)
      if (w <= 0 || h <= 0) return null
      var off = 6
      val gpacked = u8(off + 4)
      off += 7
      if ((gpacked & 0x80) != 0) off += 3 * (2 << (gpacked & 7))
      var frames = 0
      def skipSubBlocks(): Unit = {
        var len = u8(off)
        while (len != 0) { off += 1 + len; len = u8(off) }
        off += 1
      }
      var done = false
      while (!done && frames < (1 << 20)) {
        u8(off) match { // u8 throws past the end: truncated -> null
          case 0x21 => // extension
            off += 2
            skipSubBlocks()
          case 0x3b => done = true // trailer
          case 0x2c => // image descriptor
            val ip = u8(off + 9)
            off += 10
            if ((ip & 0x80) != 0) off += 3 * (2 << (ip & 7))
            off += 1 // LZW minimum code size
            skipSubBlocks()
            frames += 1
          case _ => throw JpegBail
        }
      }
      // no trailer (truncated stream / frame-count bomb) or no image:
      // malformed -> honest null, like every decoder in this file
      if (!done || frames == 0) return null
      new GenericInternalRow(Array[Any](w, h, frames))
    } catch { case _: RuntimeException => null }
  }

  val GifMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  def gifStats(bytes: Array[Byte]): InternalRow = {
    val r = decodeGif(bytes)
    if (r == null) return null
    var sum = 0L; var mn = 255; var mx = 0
    var i = 0
    while (i < r.pix.length) {
      val v = r.pix(i) & 0xff
      sum += v; if (v < mn) mn = v; if (v > mx) mx = v
      i += 1
    }
    new GenericInternalRow(Array[Any](r.width, r.height, r.bpp, sum, mn, mx))
  }

  /** Multi-frame GIF COMPOSITING decode — the animation-aware path that
    * [[decodeGif]] (first-frame, full-screen-only) deliberately is not.
    * Each image descriptor renders onto the logical screen at its
    * (left, top) offset; the Graphic Control Extension preceding it
    * supplies per-frame transparency (indices equal to the transparent
    * index leave the underlying canvas pixel untouched) and the disposal
    * method applied AFTER the frame is displayed: 0/1 leave the canvas,
    * 2 restores the frame's rectangle to the background state —
    * TRANSPARENT, the universal modern-renderer convention (filling with
    * the header's background COLOR is a spec reading no browser follows)
    * — and 3 restores the canvas to its pre-frame state. The canvas
    * starts fully transparent. Result: struct(width, height,
    * frames: array of struct(px_sum, opaque, px_min, px_max)) where
    * frame k's row is measured after it renders and before its disposal
    * applies — px_sum sums R+G+B over OPAQUE canvas pixels, opaque
    * counts them, px_min/px_max range over their channel bytes (−1/−1
    * when no pixel is opaque). Null on: non-GIF, malformed/truncated
    * streams (trailer required), frames escaping the logical screen,
    * reserved disposal methods 4–7, LZW/palette errors, screens over
    * 16M pixels, or total composited work over 256M pixels (the
    * frame-count × screen-area bound).
    */
  def gifAnimStats(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 14) return null
    try {
      val c = gifComposite(bytes, stopAt = -1, collectStats = true)
      if (c == null) null
      else new GenericInternalRow(Array[Any](c.width, c.height,
        new GenericArrayData(c.stats.asInstanceOf[Array[Any]])))
    } catch { case _: RuntimeException => null }
  }

  /** Extract composited frame `frame` of an animated GIF as an RGBA PNG
    * (alpha 255 on opaque canvas pixels, 0 on transparent) — the GIF
    * analogue of the MJPEG single-frame extract: the canvas state a
    * viewer displays at that frame, disposal methods and transparency
    * honored, re-encoded in the lossless landing format so downstream
    * stages replay byte-exactly. Frames past `frame` are SKIPPED by
    * their sub-block lengths (no LZW decode) but the walk still requires
    * the trailer — a truncated stream is null, like every decoder here.
    * Null outside [[gifAnimStats]]'s envelope or when the stream has
    * fewer than `frame`+1 images.
    */
  def gifFramePng(bytes: Array[Byte], frame: Int): Array[Byte] = {
    if (bytes == null || bytes.length < 14 || frame < 0) return null
    try {
      val c = gifComposite(bytes, stopAt = frame, collectStats = false)
      if (c == null || c.canvas == null) return null
      val pix = new Array[Byte](c.width * c.height * 4)
      var i = 0
      while (i < c.canvas.length) {
        val v = c.canvas(i)
        if (v >= 0) {
          pix(4 * i) = ((v >> 16) & 0xff).toByte
          pix(4 * i + 1) = ((v >> 8) & 0xff).toByte
          pix(4 * i + 2) = (v & 0xff).toByte
          pix(4 * i + 3) = 0xff.toByte
        } // transparent stays (0,0,0,0)
        i += 1
      }
      encodePng(new Raster(c.width, c.height, 4, pix))
    } catch { case _: RuntimeException => null }
  }

  /** Result of the shared compositing walk: per-frame stats rows (when
    * collected) and the canvas captured after frame `stopAt` rendered
    * (before its disposal), or the final canvas for stopAt = −1.
    */
  private final class GifComposite(val width: Int, val height: Int,
                                   val stats: Array[InternalRow],
                                   val canvas: Array[Int])

  /** The compositing walk both [[gifAnimStats]] (stopAt = −1, stats
    * collected per frame) and [[gifFramePng]] (stop after `stopAt`,
    * remaining image data skipped by length, structure still enforced
    * through the trailer) share. Null outside the envelope; `canvas` is
    * null when stopAt names a frame the stream does not have.
    */
  private def gifComposite(b: Array[Byte], stopAt: Int,
                           collectStats: Boolean): GifComposite = {
    def u8(i: Int): Int = { if (i < 0 || i >= b.length) throw JpegBail; b(i) & 0xff }
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return null
    val sw = u16(6); val sh = u16(8)
    if (sw <= 0 || sh <= 0 || sw.toLong * sh > 16L * 1024 * 1024) return null
    def palette(off: Int, n: Int): Array[Int] = {
      val p = new Array[Int](n)
      var i = 0
      while (i < n) {
        p(i) = (u8(off + 3 * i) << 16) | (u8(off + 3 * i + 1) << 8) |
          u8(off + 3 * i + 2)
        i += 1
      }
      p
    }
    var off = 6
    val gpacked = u8(off + 4)
    off += 7
    var gct: Array[Int] = null
    if ((gpacked & 0x80) != 0) {
      val n = 2 << (gpacked & 7)
      gct = palette(off, n); off += 3 * n
    }
    val canvas = Array.fill(sw * sh)(-1) // -1 = transparent, else 0xRRGGBB
    val frames = scala.collection.mutable.ArrayBuffer[InternalRow]()
    var captured: Array[Int] = null
    var rendered = 0
    var disposal = 0 // pending GCE state, consumed by the next image
    var transIdx = -1
    var done = false
    while (!done) {
      u8(off) match {
        case 0x21 => // extension; 0xf9 = Graphic Control for the NEXT image
          val label = u8(off + 1)
          off += 2
          if (label == 0xf9) {
            if (u8(off) != 4) throw JpegBail
            val packed = u8(off + 1)
            disposal = (packed >> 2) & 7
            if (disposal > 3) return null // reserved methods: out of envelope
            transIdx = if ((packed & 1) != 0) u8(off + 4) else -1
          }
          var len = u8(off)
          while (len != 0) { off += 1 + len; len = u8(off) }
          off += 1
        case 0x3b => done = true
        case 0x2c =>
          val pastStop = stopAt >= 0 && rendered > stopAt
          // bound TOTAL compositing work, not just the screen area
          if (!pastStop &&
              (rendered + 1).toLong * sw * sh > 256L * 1024 * 1024)
            return null
          val ileft = u16(off + 1); val itop = u16(off + 3)
          val iw = u16(off + 5); val ih = u16(off + 7)
          val ip = u8(off + 9)
          off += 10
          if (iw <= 0 || ih <= 0 || ileft + iw > sw || itop + ih > sh)
            return null
          var pal = gct
          if ((ip & 0x80) != 0) {
            val n = 2 << (ip & 7)
            if (pastStop) off += 3 * n
            else { pal = palette(off, n); off += 3 * n }
          }
          if (!pastStop && pal == null) return null
          val interlaced = (ip & 0x40) != 0
          val mcs = u8(off); off += 1
          if (mcs < 2 || mcs > 8) return null
          val data = if (pastStop) null else new java.io.ByteArrayOutputStream()
          var len = u8(off)
          while (len != 0) {
            if (off + 1 + len > b.length) throw JpegBail
            if (!pastStop) data.write(b, off + 1, len)
            off += 1 + len; len = u8(off)
          }
          off += 1 // past the 0 sub-block terminator
          if (!pastStop) {
            val indices = gifLzw(data.toByteArray, mcs, iw * ih)
            val snap = if (disposal == 3) canvas.clone() else null
            val rows =
              if (!interlaced) 0 until ih
              else (0 until ih by 8) ++ (4 until ih by 8) ++
                (2 until ih by 4) ++ (1 until ih by 2)
            var src = 0
            rows.foreach { y =>
              var x = 0
              while (x < iw) {
                val idx = indices(src) & 0xff; src += 1
                if (idx >= pal.length) throw JpegBail
                if (idx != transIdx)
                  canvas((itop + y) * sw + (ileft + x)) = pal(idx)
                x += 1
              }
            }
            if (collectStats) {
              var sum = 0L; var opaque = 0; var mn = 255; var mx = 0
              var i = 0
              while (i < canvas.length) {
                val c = canvas(i)
                if (c >= 0) {
                  opaque += 1
                  val r = (c >> 16) & 0xff; val g = (c >> 8) & 0xff
                  val bb = c & 0xff
                  sum += r + g + bb
                  if (r < mn) mn = r; if (g < mn) mn = g; if (bb < mn) mn = bb
                  if (r > mx) mx = r; if (g > mx) mx = g; if (bb > mx) mx = bb
                }
                i += 1
              }
              if (opaque == 0) { mn = -1; mx = -1 }
              frames += new GenericInternalRow(Array[Any](sum, opaque, mn, mx))
            }
            if (rendered == stopAt) captured = canvas.clone()
            if (disposal == 2) {
              var y = 0
              while (y < ih) {
                var x = 0
                while (x < iw) {
                  canvas((itop + y) * sw + (ileft + x)) = -1; x += 1
                }
                y += 1
              }
            } else if (disposal == 3) {
              System.arraycopy(snap, 0, canvas, 0, canvas.length)
            }
          }
          rendered += 1
          disposal = 0; transIdx = -1
        case _ => return null
      }
    }
    if (rendered == 0) return null
    new GifComposite(sw, sh, frames.toArray,
      if (stopAt < 0) canvas else captured)
  }

  val GifAnimStatsType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("frames", ArrayType(StructType(Seq(
      StructField("px_sum", LongType, nullable = false),
      StructField("opaque", IntegerType, nullable = false),
      StructField("px_min", IntegerType, nullable = false),
      StructField("px_max", IntegerType, nullable = false))),
      containsNull = false), nullable = false)))

  /** struct(width, height, channels, px_sum, px_min, px_max) over the
    * fully decoded JPEG raster (same shape as [[pngStats]]); null outside
    * the baseline envelope.
    */
  def jpegStats(bytes: Array[Byte]): InternalRow = {
    val r = decodeJpegAuto(bytes)
    if (r == null) return null
    var sum = 0L; var mn = 255; var mx = 0
    var i = 0
    while (i < r.pix.length) {
      val v = r.pix(i) & 0xff
      sum += v; if (v < mn) mn = v; if (v > mx) mx = v
      i += 1
    }
    new GenericInternalRow(Array[Any](r.width, r.height, r.bpp, sum, mn, mx))
  }

  /** Transcode: baseline JPEG decode → integer-floor nearest-neighbor
    * resize → PNG re-encode (the lossless landing format, so downstream
    * stages replay byte-exactly). null when the JPEG is not decodable.
    */
  def jpegResizeToPng(bytes: Array[Byte], dstW: Int, dstH: Int): Array[Byte] = {
    val r = decodeJpegAuto(bytes)
    if (r == null) return null
    val out = new Array[Byte](dstW * dstH * r.bpp)
    var y = 0
    while (y < dstH) {
      val sy = y * r.height / dstH
      var x = 0
      while (x < dstW) {
        val sx = x * r.width / dstW
        var c = 0
        while (c < r.bpp) {
          out((y * dstW + x) * r.bpp + c) = r.pix((sy * r.width + sx) * r.bpp + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    encodePng(new Raster(dstW, dstH, r.bpp, out))
  }

  // ---------------- JPEG (header metadata only) ----------------

  /** JPEG frame-header metadata via the SOI/SOF marker walk:
    * struct(width, height, components), null for non-JPEG or malformed
    * streams. Metadata needs NO codec: every JPEG segment before the
    * entropy-coded scan is a (FF, marker, 2-byte big-endian length)
    * frame, and the SOF segment carries precision/height/width/component
    * count at fixed offsets. Pixel DECODE stays behind the documented
    * external-codec seam (ops/Multimodal.decodeImageStub) — this walk
    * covers the 90% of what a pipeline does with JPEGs (dimension
    * filtering, aspect gates, metadata columns, content-hash dedup).
    *
    * Accepted SOF markers: C0–CF excluding C4 (DHT), C8 (JPG ext), CC
    * (DAC) — baseline, extended sequential, progressive, lossless, and
    * their arithmetic twins all share the frame-header layout. The walk
    * stops (returns null) at SOS or EOI without a SOF: entropy-coded data
    * may contain any byte sequence and must never be scanned for markers.
    * Bounds-checked throughout — adversarial lengths cannot read out of
    * range.
    */
  def jpegMeta(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 4) return null
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return null
    var off = 2
    while (off + 1 < bytes.length) {
      if ((bytes(off) & 0xff) != 0xff) return null
      // fill bytes: any number of FFs may pad before the marker id
      var m = bytes(off + 1) & 0xff
      while (m == 0xff && off + 2 < bytes.length) {
        off += 1; m = bytes(off + 1) & 0xff
      }
      off += 2
      m match {
        case 0xd8 | 0x01 => // SOI again / TEM: standalone, no length
        case x if x >= 0xd0 && x <= 0xd7 => // RSTn: standalone
        case 0xd9 => return null // EOI before any SOF
        case 0xda => return null // SOS before any SOF
        case x if x >= 0xc0 && x <= 0xcf && x != 0xc4 && x != 0xc8 &&
            x != 0xcc =>
          // SOF: len(2) precision(1) height(2) width(2) ncomp(1)
          if (off + 8 > bytes.length) return null
          val len = ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
          val h = ((bytes(off + 3) & 0xff) << 8) | (bytes(off + 4) & 0xff)
          val w = ((bytes(off + 5) & 0xff) << 8) | (bytes(off + 6) & 0xff)
          val nc = bytes(off + 7) & 0xff
          if (len < 8 + 3 * nc || w <= 0 || h <= 0 || nc <= 0) return null
          return new GenericInternalRow(Array[Any](w, h, nc))
        case _ =>
          if (off + 2 > bytes.length) return null
          val len = ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
          if (len < 2 || off + len > bytes.length) return null
          off += len
      }
    }
    null
  }

  val JpegMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("components", IntegerType, nullable = false)))

  // ---------------- WAV ----------------

  private def leShort(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)).toShort.toInt
  private def leInt(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** The fixed tail (bytes 2..15) of the WAVE_FORMAT_EXTENSIBLE SubFormat
    * GUID {xxxxxxxx-0000-0010-8000-00AA00389B71}: the first two bytes are
    * the wrapped base format tag, the rest must match exactly.
    */
  private val ExtGuidTail = Array(
    0x00, 0x00, 0x00, 0x00, 0x10, 0x00, 0x80, 0x00,
    0x00, 0xaa, 0x00, 0x38, 0x9b, 0x71).map(_.toByte)

  /** (dataOff0based, nSamples, sampleRate, channels, bits, codec) for
    * integer-PCM (codec 1, 8/16/24/32-bit), G.711 µ-law/A-law (codecs
    * 7/6, 8-bit), IEEE float32/float64 (codec 3), and WAVE_FORMAT_EXTENSIBLE
    * (0xFFFE) wrapping any of those — the returned codec is the EFFECTIVE
    * base format from the SubFormat GUID, so downstream sample access and
    * the codec-preserving frame sampler treat an extensible clip exactly
    * as its payload format. Null otherwise (ADPCM, truncated
    * fmt, an unknown GUID).
    */
  private def pcmLayout(bytes: Array[Byte]): Array[Int] = {
    if (bytes == null) return null
    val fmtOff = RiffWalkHelper.chunkDataOffset(bytes, 'f', 'm', 't', ' ')
    val dataOff = RiffWalkHelper.chunkDataOffset(bytes, 'd', 'a', 't', 'a')
    if (fmtOff < 0 || dataOff < 0) return null
    val fo = fmtOff.toInt - 1 // helper returns 1-based for SQL substr
    val dOff = dataOff.toInt - 1
    if (fo + 16 > bytes.length || dOff > bytes.length) return null
    var codec = leShort(bytes, fo)
    val channels = leShort(bytes, fo + 2)
    val rate = leInt(bytes, fo + 4)
    val bits = leShort(bytes, fo + 14)
    if (codec == 0xFFFE || codec == -2) { // WAVE_FORMAT_EXTENSIBLE
      // fmt must carry the 22-byte extension; SubFormat GUID at +24
      val fmtLen = leInt(bytes, fo - 4)
      if (fmtLen < 40 || fo + 40 > bytes.length) return null
      if (leShort(bytes, fo + 16) < 22) return null // cbSize
      var i = 0
      while (i < 14) {
        if (bytes(fo + 26 + i) != ExtGuidTail(i)) return null
        i += 1
      }
      codec = leShort(bytes, fo + 24) // wrapped base format
    }
    val ok = codec match {
      case 1     => bits == 8 || bits == 16 || bits == 24 || bits == 32
      case 3     => bits == 32 || bits == 64 // IEEE float single/double
      case 6 | 7 => bits == 8 // G.711 A-law / µ-law: one byte per sample
      case _     => false
    }
    if (!ok || channels < 1) return null
    val dataLen0 = leInt(bytes, dOff - 4)
    val dataLen = math.min(dataLen0.toLong, (bytes.length - dOff).toLong).toInt
    if (dataLen < 0) return null
    val bytesPer = bits / 8
    Array(dOff, dataLen / (bytesPer * channels), rate, channels, bits, codec)
  }

  /** G.711 µ-law byte → 13-bit-magnitude linear sample: the canonical
    * CCITT expansion (complement, rebias by 0x84, shift by the segment,
    * signed by the post-complement sign bit) — pure integer steps the
    * oracle replays.
    */
  def ulawToLinear(b0: Int): Int = {
    val u = (~b0) & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** G.711 A-law byte → linear sample: the canonical expansion (xor 0x55,
    * segment-scaled mantissa with the 8 / 0x108 low-segment biases).
    */
  def alawToLinear(b0: Int): Int = {
    val a = (b0 & 0xff) ^ 0x55
    val t0 = (a & 0x0f) << 4
    val seg = (a & 0x70) >> 4
    val t = seg match {
      case 0 => t0 + 8
      case 1 => t0 + 0x108
      case s => (t0 + 0x108) << (s - 1)
    }
    if ((a & 0x80) != 0) t else -t
  }

  /** Sample `i` (interleaved index) at the given depth/codec. 8-bit WAV
    * PCM is UNSIGNED; it is reported center-zeroed (u8 − 128), the value
    * the sample represents. 16/24/32-bit are signed little-endian;
    * µ-law/A-law expand through the G.711 formulas. Float32 lands on the
    * 16-bit integer lattice as floor(f·2^15) — a power-of-two scale, so
    * float→double→product are all EXACT and an oracle replays the integer
    * bit-for-bit; NaN reports 0 and ±Inf/huge values clamp to the int
    * range (then trip the same overflow-null guard as hot 32-bit PCM).
    */
  private def pcmSample(b: Array[Byte], dOff: Int, bits: Int, codec: Int,
                        i: Int): Int =
    if (codec == 7) ulawToLinear(b(dOff + i) & 0xff)
    else if (codec == 6) alawToLinear(b(dOff + i) & 0xff)
    else if (codec == 3) {
      // float64 scales exactly too: multiplying any finite double by the
      // power of two 2^15 only shifts the exponent, so floor(d·2^15) is
      // the mathematically exact lattice value at either precision
      val d0 =
        if (bits == 64)
          java.lang.Double.longBitsToDouble(
            (leInt(b, dOff + 8 * i).toLong & 0xffffffffL) |
              (leInt(b, dOff + 8 * i + 4).toLong << 32))
        else java.lang.Float.intBitsToFloat(leInt(b, dOff + 4 * i)).toDouble
      val d = d0 * 32768.0
      if (d.isNaN) 0
      else if (d >= Int.MaxValue.toDouble) Int.MaxValue
      else if (d <= Int.MinValue.toDouble) Int.MinValue
      else math.floor(d).toInt
    }
    else bits match {
      case 8  => (b(dOff + i) & 0xff) - 128
      case 16 => leShort(b, dOff + 2 * i)
      case 24 =>
        val o = dOff + 3 * i
        ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
          ((b(o + 2) & 0xff) << 16)) << 8 >> 8 // sign-extend 24 bits
      case _ => leInt(b, dOff + 4 * i)
    }

  /** struct(n_samples, sample_rate, pcm_sum, pcm_sqsum, pcm_peak, pcm_zc,
    * pcm_bits) over all PCM frames (all channels; zero crossings over
    * channel 0 only — the per-channel metric). Integer outputs for exact
    * oracle reproduction; RMS = sqrt(sqsum/n) downstream. IMA/DVI ADPCM
    * routes through [[wavAdpcmStats]], Microsoft ADPCM through
    * [[wavMsAdpcmStats]]. Null for blobs outside the decode
    * envelope (see [[pcmLayout]] / [[adpcmLayout]] /
    * [[msAdpcmLayout]]), and for a
    * 32-bit or hot-float stream whose sum of squares exceeds int64
    * (honest "can't represent" rather than a silent wrap — only reachable
    * at 32-bit-scale values: 24-bit squares can't overflow any plausible
    * clip length).
    */
  def wavPcmStats(bytes: Array[Byte]): InternalRow = {
    val lay = pcmLayout(bytes)
    if (lay == null) {
      val ima = wavAdpcmStats(bytes)
      return if (ima != null) ima else wavMsAdpcmStats(bytes)
    }
    val Array(dOff, n, rate, channels, bits, codec) = lay
    var sum = 0L; var sq = 0L; var peak = 0L; var zc = 0L
    var prevNeg = false
    var i = 0
    val total = n * channels
    try {
      while (i < total) {
        val v = pcmSample(bytes, dOff, bits, codec, i)
        sum = Math.addExact(sum, v)
        sq = Math.addExact(sq, Math.multiplyExact(v.toLong, v.toLong))
        val a = math.abs(v.toLong); if (a > peak) peak = a
        if (i % channels == 0) { // channel 0 only
          val neg = v < 0
          if (i > 0 && neg != prevNeg) zc += 1
          prevNeg = neg
        }
        i += 1
      }
    } catch { case _: ArithmeticException => return null }
    new GenericInternalRow(Array[Any](n.toLong, rate, sum, sq, peak, zc, bits))
  }

  /** IMA/DVI ADPCM step-size table (IMA Digital Audio Compression and
    * Exchange recommendation, 1992 — the 89-entry table every IMA
    * decoder ships verbatim; also RFC 3551 §4.5.1's DVI4 lineage).
    */
  private val ImaStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Step-index adjustment per nibble magnitude (sign bit ignored). */
  private val ImaIndexAdj: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** (dOff, dataLen, rate, channels, blockAlign) for IMA/DVI ADPCM
    * (WAVE codec 0x11, 4-bit nibbles). Block structure per the IMA WAV
    * mapping: each `blockAlign`-byte block opens with one 4-byte header
    * per channel (int16 predictor = the channel's first output sample,
    * uint8 step index, reserved byte), then 4-byte nibble groups
    * round-robined across channels (8 samples per group). Null unless
    * the geometry is coherent — data a whole number of blocks, the
    * nibble region a whole number of channel rounds, and any DECLARED
    * wSamplesPerBlock (cbSize ≥ 2) equal to the computed
    * `1 + 2·(blockAlign − 4·ch)/ch` (a lying header is an honest null,
    * not a guess).
    */
  private def adpcmLayout(bytes: Array[Byte]): Array[Int] = {
    if (bytes == null) return null
    val fmtOff = RiffWalkHelper.chunkDataOffset(bytes, 'f', 'm', 't', ' ')
    val dataOff = RiffWalkHelper.chunkDataOffset(bytes, 'd', 'a', 't', 'a')
    if (fmtOff < 0 || dataOff < 0) return null
    val fo = fmtOff.toInt - 1
    val dOff = dataOff.toInt - 1
    if (fo + 16 > bytes.length || dOff > bytes.length) return null
    if (leShort(bytes, fo) != 0x11) return null
    val channels = leShort(bytes, fo + 2)
    val rate = leInt(bytes, fo + 4)
    val blockAlign = leShort(bytes, fo + 12)
    if (leShort(bytes, fo + 14) != 4) return null // 4-bit nibbles only
    if (channels < 1) return null
    val head = 4 * channels
    if (blockAlign <= head || (blockAlign - head) % (4 * channels) != 0)
      return null
    val fmtLen = leInt(bytes, fo - 4)
    if (fmtLen >= 20 && fo + 20 <= bytes.length &&
        leShort(bytes, fo + 16) >= 2) {
      val declared = leShort(bytes, fo + 18)
      if (declared != 1 + 2 * (blockAlign - head) / channels) return null
    }
    val dataLen0 = leInt(bytes, dOff - 4)
    val dataLen = math.min(dataLen0.toLong, (bytes.length - dOff).toLong).toInt
    if (dataLen <= 0 || dataLen % blockAlign != 0) return null
    Array(dOff, dataLen, rate, channels, blockAlign)
  }

  /** One nibble through the IMA predictor: bit-serial difference
    * (`step>>3` plus the selected `step>>2`/`step>>1`/`step` terms — the
    * IMA recommendation's integer form, NOT the `(2m+1)·step/8` exact
    * product), int16 clamp, table-adjusted step index. Pure integer
    * steps the DuckDB oracle replays with a recursive CTE. Returns the
    * packed (pred << 8) | index so the caller threads both states.
    */
  private def imaStep(pred0: Int, idx0: Int, nib: Int): Int = {
    val step = ImaStep(idx0)
    var diff = step >> 3
    if ((nib & 1) != 0) diff += step >> 2
    if ((nib & 2) != 0) diff += step >> 1
    if ((nib & 4) != 0) diff += step
    var pred = if ((nib & 8) != 0) pred0 - diff else pred0 + diff
    if (pred > 32767) pred = 32767 else if (pred < -32768) pred = -32768
    var idx = idx0 + ImaIndexAdj(nib & 7)
    if (idx < 0) idx = 0 else if (idx > 88) idx = 88
    (pred << 8) | idx
  }

  /** [[wavPcmStats]] for IMA/DVI ADPCM (codec 0x11): sequential block
    * decode — per block, each channel's header predictor IS its first
    * output frame, then every nibble (low half-byte first) advances the
    * channel's (predictor, step-index) recurrence one frame. n_samples
    * counts FRAMES; sum/sqsum/peak span all channels; zero crossings
    * chain over channel 0 across block boundaries (headers included),
    * matching the PCM path's semantics. pcm_bits reports the STORAGE
    * depth 4 (the fmt value), not the 16-bit decoded lattice.
    */
  def wavAdpcmStats(bytes: Array[Byte]): InternalRow = {
    val lay = adpcmLayout(bytes)
    if (lay == null) return null
    val Array(dOff, dataLen, rate, channels, blockAlign) = lay
    val groupsPerBlock = (blockAlign - 4 * channels) / (4 * channels)
    var sum = 0L; var sq = 0L; var peak = 0L; var zc = 0L
    var prevNeg = false; var c0Seen = false; var frames = 0L
    val pred = new Array[Int](channels)
    val idx = new Array[Int](channels)
    def acc(v: Int, c: Int): Unit = {
      sum += v
      sq += v.toLong * v.toLong // |v| ≤ 2^15: no overflow before ~2^33 frames
      val a = math.abs(v.toLong); if (a > peak) peak = a
      if (c == 0) {
        val neg = v < 0
        if (c0Seen && neg != prevNeg) zc += 1
        prevNeg = neg; c0Seen = true
      }
    }
    var bo = dOff
    while (bo < dOff + dataLen) {
      var c = 0
      while (c < channels) {
        pred(c) = leShort(bytes, bo + 4 * c)
        val si = bytes(bo + 4 * c + 2) & 0xff
        if (si > 88) return null
        idx(c) = si
        // header predictor = the channel's first frame of this block
        acc(pred(c), c)
        c += 1
      }
      frames += 1
      var g = 0
      while (g < groupsPerBlock) {
        c = 0
        while (c < channels) {
          val go = bo + 4 * channels + (g * channels + c) * 4
          var bi = 0
          while (bi < 4) {
            val byt = bytes(go + bi) & 0xff
            var half = 0
            while (half < 2) {
              val nib = if (half == 0) byt & 0x0f else byt >> 4
              val packed = imaStep(pred(c), idx(c), nib)
              pred(c) = packed >> 8
              idx(c) = packed & 0xff
              acc(pred(c), c)
              half += 1
            }
            bi += 1
          }
          c += 1
        }
        frames += 8
        g += 1
      }
      bo += blockAlign
    }
    new GenericInternalRow(Array[Any](frames, rate, sum, sq, peak, zc, 4))
  }

  /** Microsoft ADPCM adaptation table (the WAVE spec's 16-entry delta
    * scaler, indexed by the UNSIGNED nibble; public in every codec
    * reference from the Win3.1 multimedia standards update onward).
    */
  private val MsAdapt: Array[Int] = Array(
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230)

  /** Hostile-stream delta bound: the adaptation step multiplies delta by
    * up to 3 per nibble, so a crafted stream can grow it without limit
    * (the format never clamps it upward). No legitimate encoder exceeds
    * a few times the int16 range — 2^24 is a documented fail-fast bound,
    * the same honest-null discipline as the 32-bit PCM sqsum guard.
    */
  private val MsMaxDelta = 1L << 24

  /** (dOff, dataLen, rate, channels, blockAlign, numCoef, coefOff) for
    * Microsoft ADPCM (WAVE codec 0x02, 4-bit signed nibbles). fmt must
    * carry the full extension — wSamplesPerBlock, wNumCoef and the
    * wNumCoef (iCoef1, iCoef2) int16 pairs the bitstream's bPredictor
    * indexes select (an in-stream table, like DHT: the standard 7 pairs
    * are what encoders write, but the DECLARED table is what decodes).
    * Geometry honest-nulls: channels beyond stereo (the nibble
    * interleave is only defined for 1–2), a declared wSamplesPerBlock
    * that disagrees with `2 + 2·(blockAlign − 7·ch)/ch`, ragged data,
    * a truncated coefficient table.
    */
  private def msAdpcmLayout(bytes: Array[Byte]): Array[Int] = {
    if (bytes == null) return null
    val fmtOff = RiffWalkHelper.chunkDataOffset(bytes, 'f', 'm', 't', ' ')
    val dataOff = RiffWalkHelper.chunkDataOffset(bytes, 'd', 'a', 't', 'a')
    if (fmtOff < 0 || dataOff < 0) return null
    val fo = fmtOff.toInt - 1
    val dOff = dataOff.toInt - 1
    if (fo + 16 > bytes.length || dOff > bytes.length) return null
    if (leShort(bytes, fo) != 0x02) return null
    val channels = leShort(bytes, fo + 2)
    val rate = leInt(bytes, fo + 4)
    val blockAlign = leShort(bytes, fo + 12)
    if (leShort(bytes, fo + 14) != 4) return null // 4-bit nibbles only
    if (channels < 1 || channels > 2) return null
    val head = 7 * channels
    if (blockAlign <= head) return null
    val fmtLen = leInt(bytes, fo - 4)
    // full extension required: cbSize, wSamplesPerBlock, wNumCoef, pairs
    if (fmtLen < 22 || fo + 22 > bytes.length) return null
    val cbSize = leShort(bytes, fo + 16)
    if (cbSize < 4) return null
    val declared = leShort(bytes, fo + 18)
    if (declared != 2 + 2 * (blockAlign - head) / channels) return null
    // the cbSize extension must FIT the fmt chunk (cbSize <= fmtLen-18)
    // and the coefficient table must lie inside it — otherwise a crafted
    // fmtLen/cbSize mismatch reads the next RIFF chunk's bytes as iCoef
    // pairs: no out-of-range read, but a garbage decode instead of the
    // honest null the table-truncation doc promises
    if (cbSize > fmtLen - 18) return null
    val numCoef = leShort(bytes, fo + 20)
    if (numCoef < 1 || cbSize < 4 + 4 * numCoef ||
        fmtLen < 22 + 4 * numCoef ||
        fo + 22 + 4 * numCoef > bytes.length) return null
    val dataLen0 = leInt(bytes, dOff - 4)
    val dataLen = math.min(dataLen0.toLong, (bytes.length - dOff).toLong).toInt
    if (dataLen <= 0 || dataLen % blockAlign != 0) return null
    Array(dOff, dataLen, rate, channels, blockAlign, numCoef, fo + 22)
  }

  /** [[wavPcmStats]] for Microsoft ADPCM (codec 0x02): per block, the
    * 7-byte-per-channel header (bPredictor bytes, then iDelta, iSamp1,
    * iSamp2 int16 runs, each field grouped across channels) emits iSamp2
    * as frame 0 and iSamp1 as frame 1 — the OLDER sample first, the
    * documented output order — then each SIGNED nibble advances the
    * channel's (samp1, samp2, delta) recurrence:
    * pred = trunc((samp1·c1 + samp2·c2)/256) + nib·delta, int16 clamp,
    * delta = max(16, trunc(Adapt[u]·delta/256)). HIGH nibble first; for
    * stereo each byte is one frame (high = channel 0). Every step is
    * trunc-toward-zero integer arithmetic (Java `/` == DuckDB `//`), so
    * the oracle replays the recurrence exactly. n_samples counts FRAMES;
    * zero crossings chain over channel 0 across blocks; pcm_bits reports
    * the storage depth 4, like the IMA path.
    */
  def wavMsAdpcmStats(bytes: Array[Byte]): InternalRow = {
    val lay = msAdpcmLayout(bytes)
    if (lay == null) return null
    val Array(dOff, dataLen, rate, channels, blockAlign, numCoef, coefOff) = lay
    var sum = 0L; var sq = 0L; var peak = 0L; var zc = 0L
    var prevNeg = false; var c0Seen = false; var frames = 0L
    val s1 = new Array[Int](channels)
    val s2 = new Array[Int](channels)
    val delta = new Array[Long](channels)
    val c1 = new Array[Int](channels)
    val c2 = new Array[Int](channels)
    def acc(v: Int, c: Int): Unit = {
      sum += v
      sq += v.toLong * v.toLong // |v| ≤ 2^15: no overflow before ~2^33 frames
      val a = math.abs(v.toLong); if (a > peak) peak = a
      if (c == 0) {
        val neg = v < 0
        if (c0Seen && neg != prevNeg) zc += 1
        prevNeg = neg; c0Seen = true
      }
    }
    var bo = dOff
    while (bo < dOff + dataLen) {
      var c = 0
      while (c < channels) {
        val pi = bytes(bo + c) & 0xff
        if (pi >= numCoef) return null
        c1(c) = leShort(bytes, coefOff + 4 * pi)
        c2(c) = leShort(bytes, coefOff + 4 * pi + 2)
        delta(c) = leShort(bytes, bo + channels + 2 * c).toLong
        s1(c) = leShort(bytes, bo + 3 * channels + 2 * c)
        s2(c) = leShort(bytes, bo + 5 * channels + 2 * c)
        c += 1
      }
      // header samples, older first: frame 0 = iSamp2, frame 1 = iSamp1
      c = 0; while (c < channels) { acc(s2(c), c); c += 1 }
      c = 0; while (c < channels) { acc(s1(c), c); c += 1 }
      frames += 2
      val nibBytes = blockAlign - 7 * channels
      var j = 0
      while (j < nibBytes) {
        var half = 0
        while (half < 2) {
          val u = if (half == 0) (bytes(bo + 7 * channels + j) & 0xff) >> 4
                  else bytes(bo + 7 * channels + j) & 0x0f
          val ch = if (channels == 2) half else 0
          val nib = if (u >= 8) u - 16 else u
          val pred0 = (s1(ch).toLong * c1(ch) + s2(ch).toLong * c2(ch)) / 256 +
            nib * delta(ch)
          val pred = if (pred0 > 32767) 32767
                     else if (pred0 < -32768) -32768 else pred0.toInt
          s2(ch) = s1(ch); s1(ch) = pred
          delta(ch) = math.max(16L, MsAdapt(u) * delta(ch) / 256)
          if (delta(ch) > MsMaxDelta) return null
          acc(pred, ch)
          if (channels == 1 || half == 1) frames += 1
          half += 1
        }
        j += 1
      }
      bo += blockAlign
    }
    new GenericInternalRow(Array[Any](frames, rate, sum, sq, peak, zc, 4))
  }

  val WavPcmStatsType: StructType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("pcm_sum", LongType, nullable = false),
    StructField("pcm_sqsum", LongType, nullable = false),
    StructField("pcm_peak", LongType, nullable = false),
    StructField("pcm_zc", LongType, nullable = false),
    StructField("pcm_bits", IntegerType, nullable = false)))

  /** Keep every `step`-th PCM frame (frame 0, step, 2·step, …) — the audio
    * analogue of video frame-sampling — re-emitted as a canonical
    * RIFF/fmt/data WAV at the original sample rate and depth. An
    * extensible clip re-emits as its EFFECTIVE base format (values are
    * raw-byte-identical; only the wrapper simplifies). null for blobs
    * outside the audio envelope (ADPCM).
    */
  def wavFrameSample(bytes: Array[Byte], step: Int): Array[Byte] = {
    if (step <= 0) return null
    val lay = pcmLayout(bytes)
    if (lay == null) return null
    val Array(dOff, n, rate, channels, bits, codec) = lay
    val bp = bits / 8
    val kept = (n + step - 1) / step
    val dataLen = kept * bp * channels
    // the SOURCE codec rides along: raw sample bytes are copied verbatim,
    // so a µ-law clip must re-emit as µ-law or its values change meaning.
    // Non-PCM codecs additionally carry the spec-required cbSize=0 fmt
    // extension and a fact chunk (WAVE requires both for codec != 1) —
    // the in-repo walk tolerates their absence, strict consumers don't.
    val pcm = codec == 1
    val fmtLen = if (pcm) 16 else 18
    val factLen = if (pcm) 0 else 12 // tag+size+nSamples
    val headLen = 12 + 8 + fmtLen + factLen + 8
    val out = new Array[Byte](headLen + dataLen)
    var o = 0
    def putLe(v: Int, len: Int): Unit = {
      var i = 0
      while (i < len) { out(o + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
      o += len
    }
    def putTag(s: String): Unit = {
      var i = 0
      while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 }
      o += 4
    }
    putTag("RIFF"); putLe(headLen - 8 + dataLen, 4); putTag("WAVE")
    putTag("fmt "); putLe(fmtLen, 4)
    putLe(codec, 2); putLe(channels, 2)
    putLe(rate, 4); putLe(rate * bp * channels, 4)
    putLe(bp * channels, 2); putLe(bits, 2)
    if (!pcm) {
      putLe(0, 2) // cbSize = 0
      putTag("fact"); putLe(4, 4); putLe(kept, 4)
    }
    putTag("data"); putLe(dataLen, 4)
    var f = 0
    while (f < n) {
      var c = 0
      while (c < channels * bp) {
        out(o) = bytes(dOff + f * channels * bp + c)
        o += 1; c += 1
      }
      f += step
    }
    out
  }
}

/** PNG decode + channel statistics (real inflate + unfilter), null when the
  * blob is outside the supported envelope.
  */
case class PngStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaCodecHelper.PngStatsType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_png_stats"
  override def nullSafeEval(input: Any): Any =
    MediaCodecHelper.pngStats(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.MediaCodecHelper.pngStats($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): PngStats =
    copy(child = newChild)
}

/** Nearest-neighbor PNG resize (decode → integer-floor index map →
  * re-encode); null when the input is not decodable.
  */
case class PngResizeNearest(child: Expression, dstW: Int, dstH: Int)
    extends UnaryExpression {
  require(dstW > 0 && dstH > 0, s"bad resize target ${dstW}x$dstH")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_png_resize"
  override def nullSafeEval(input: Any): Any =
    MediaCodecHelper.pngResizeNearest(input.asInstanceOf[Array[Byte]], dstW, dstH)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.MediaCodecHelper.pngResizeNearest($c, $dstW, $dstH);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): PngResizeNearest =
    copy(child = newChild)
}

/** JPEG frame-header metadata (width, height, components) via the
  * bounded SOI/SOF marker walk; null for non-JPEG or malformed blobs.
  */
case class JpegMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaCodecHelper.JpegMetaType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_meta"
  override def nullSafeEval(input: Any): Any =
    MediaCodecHelper.jpegMeta(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.MediaCodecHelper.jpegMeta($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): JpegMeta =
    copy(child = newChild)
}

/** WAV sample statistics (integer PCM 8/16/24/32-bit, G.711, float32/
  * float64, extensible wrappers) through the bounded RIFF walk; null for
  * blobs outside the audio envelope (ADPCM).
  */
case class WavPcmStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaCodecHelper.WavPcmStatsType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_pcm_stats"
  override def nullSafeEval(input: Any): Any =
    MediaCodecHelper.wavPcmStats(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.MediaCodecHelper.wavPcmStats($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): WavPcmStats =
    copy(child = newChild)
}

/** Full baseline JPEG decode + channel statistics (Huffman + dequant +
  * IDCT + upsample + YCbCr→RGB), null outside the baseline envelope.
  */
/** Decode a GIF (LZW + palette, optional interlace) and report raster
  * statistics; null outside the envelope.
  */
case class GifStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaCodecHelper.PngStatsType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_stats"
  override def nullSafeEval(input: Any): Any =
    MediaCodecHelper.gifStats(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.MediaCodecHelper.gifStats($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): GifStats =
    copy(child = newChild)
}

/** 16-bit PNG sample statistics (gray16/RGB16/alpha variants, sequential
  * or Adam7) at full precision — no truncated 8-bit raster; null outside
  * the envelope.
  */
case class Png16Stats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaCodecHelper.PngStatsType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_png16_stats"
  override def nullSafeEval(input: Any): Any =
    MediaCodecHelper.png16Stats(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.MediaCodecHelper.png16Stats($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Png16Stats =
    copy(child = newChild)
}

/** 12-bit extended-sequential JPEG (SOF1) sample statistics at full
  * precision — the DICOM/medical gray shape; null outside the envelope.
  */
case class Jpeg12Stats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaCodecHelper.Jpeg12StatsType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg12_stats"
  override def nullSafeEval(input: Any): Any =
    MediaCodecHelper.jpeg12Stats(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.MediaCodecHelper.jpeg12Stats($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Jpeg12Stats =
    copy(child = newChild)
}

/** Lossless-JPEG (SOF3, T.81 Annex H) sample statistics at full
  * precision (2–16 bit) — like 16-bit PNG, no truncated raster is
  * fabricated; null outside the envelope.
  */
case class JpegLosslessStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaCodecHelper.JpegLosslessStatsType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_lossless_stats"
  override def nullSafeEval(input: Any): Any =
    MediaCodecHelper.jpegLosslessStats(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.MediaCodecHelper.jpegLosslessStats($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): JpegLosslessStats =
    copy(child = newChild)
}

/** Nearest-neighbor resize of a 16-bit PNG re-encoded at depth 16 (whole
  * big-endian sample pairs copied — full precision survives); null
  * outside the 16-bit envelope.
  */
case class Png16ResizeNearest(child: Expression, dstW: Int, dstH: Int)
    extends UnaryExpression {
  require(dstW > 0 && dstH > 0, s"bad resize target ${dstW}x$dstH")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_png16_resize"
  override def nullSafeEval(input: Any): Any =
    MediaCodecHelper.png16ResizeNearest(input.asInstanceOf[Array[Byte]], dstW, dstH)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.MediaCodecHelper.png16ResizeNearest($c, $dstW, $dstH);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Png16ResizeNearest =
    copy(child = newChild)
}

/** Multi-frame GIF compositing decode: per-frame opaque-canvas statistics
  * with GCE disposal methods 0–3 and transparency honored; null outside
  * the animation envelope.
  */
case class GifAnimStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaCodecHelper.GifAnimStatsType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_anim_stats"
  override def nullSafeEval(input: Any): Any =
    MediaCodecHelper.gifAnimStats(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.MediaCodecHelper.gifAnimStats($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): GifAnimStats =
    copy(child = newChild)
}

/** Composited frame `frame` of an animated GIF as an RGBA PNG (alpha 0 on
  * transparent canvas pixels) — the GIF single-frame extract; null
  * outside the animation envelope or past the last frame.
  */
case class GifFramePng(child: Expression, frame: Int)
    extends UnaryExpression {
  require(frame >= 0, s"bad frame index $frame")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_frame_png"
  override def nullSafeEval(input: Any): Any =
    MediaCodecHelper.gifFramePng(input.asInstanceOf[Array[Byte]], frame)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.MediaCodecHelper.gifFramePng($c, $frame);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): GifFramePng =
    copy(child = newChild)
}

/** GIF container metadata (logical-screen dims + image-descriptor count
  * via the bounded sub-block walk — animation length without decode);
  * null for non-GIF / malformed / imageless streams.
  */
case class GifMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaCodecHelper.GifMetaType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_meta"
  override def nullSafeEval(input: Any): Any =
    MediaCodecHelper.gifMeta(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.MediaCodecHelper.gifMeta($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): GifMeta =
    copy(child = newChild)
}

case class JpegStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaCodecHelper.PngStatsType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_stats"
  override def nullSafeEval(input: Any): Any =
    MediaCodecHelper.jpegStats(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.MediaCodecHelper.jpegStats($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): JpegStats =
    copy(child = newChild)
}

/** JPEG → nearest-neighbor resize → PNG transcode (decode is the full
  * baseline path; PNG is the lossless landing format); null when the
  * input is not a decodable baseline JPEG.
  */
case class JpegResizeToPng(child: Expression, dstW: Int, dstH: Int)
    extends UnaryExpression {
  require(dstW > 0 && dstH > 0, s"bad resize target ${dstW}x$dstH")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_resize_png"
  override def nullSafeEval(input: Any): Any =
    MediaCodecHelper.jpegResizeToPng(input.asInstanceOf[Array[Byte]], dstW, dstH)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.MediaCodecHelper.jpegResizeToPng($c, $dstW, $dstH);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): JpegResizeToPng =
    copy(child = newChild)
}

/** Every-`step`-th-frame decimation of an integer-PCM WAV, re-encoded
  * as a canonical WAV at the source depth; null for out-of-envelope audio
  * blobs.
  */
case class WavFrameSample(child: Expression, step: Int) extends UnaryExpression {
  require(step > 0, s"bad frame-sample step $step")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_frame_sample"
  override def nullSafeEval(input: Any): Any =
    MediaCodecHelper.wavFrameSample(input.asInstanceOf[Array[Byte]], step)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.MediaCodecHelper.wavFrameSample($c, $step);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): WavFrameSample =
    copy(child = newChild)
}
