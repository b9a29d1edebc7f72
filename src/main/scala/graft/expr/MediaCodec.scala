package graft.expr

import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Real (not stubbed) pure-JVM media decode for the multimodal column
  * pipeline: PNG raster decode via `java.util.zip.Inflater` + full filter
  * reconstruction, nearest-neighbor resize with re-encode, and WAV PCM
  * sample access via the bounded RIFF walk ([[RiffWalkHelper]]).
  *
  * Scope (honest partial decoder, null on anything else — never garbage):
  *  - PNG: 8-bit depth, color type 0 (grayscale, 1 byte/px) or 2 (RGB,
  *    3 bytes/px), non-interlaced, any of the five scanline filters
  *    (None/Sub/Up/Average/Paeth). Covers the overwhelmingly common
  *    "decoded training image" layouts; palette/alpha/16-bit/interlaced
  *    return null so a pipeline routes them to its bad-blob side.
  *  - WAV: PCM 16-bit, located through the chunk walk (LIST/fact chunks
  *    before `fmt ` are fine).
  *
  * Everything here is per-value scan-side work wrapped in codegen'd
  * expressions (static call per value, same pattern as [[RecodeHelper]]),
  * so decode/resize/feature-extract stay inside whole-stage codegen and
  * scale as a map over the binary column — no shuffle, no driver
  * involvement, memory bounded by one blob per row.
  *
  * Why decode can be real here with zero codec libraries: PNG's IDAT is a
  * zlib stream (java.util.zip) and the filter pass is ~40 lines of integer
  * arithmetic; WAV PCM is length-prefixed little-endian shorts. The
  * remaining `decodeImageStub` seam in ops/Multimodal is only for formats
  * that genuinely need an external codec (JPEG/video).
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

  /** Decode a PNG within the supported envelope; null otherwise (bad
    * magic, unsupported layout, truncated/corrupt stream). Bounds-checked
    * chunk walk — adversarial lengths cannot read out of range.
    */
  def decodePng(bytes: Array[Byte]): Raster = {
    if (bytes == null || bytes.length < 33) return null
    var i = 0
    while (i < 8) { if (bytes(i) != PngSig(i)) return null; i += 1 }
    var off = 8
    var w = 0; var h = 0; var bpp = 0
    var idat: java.io.ByteArrayOutputStream = null
    while (off + 8 <= bytes.length) {
      val len = beInt(bytes, off)
      if (len < 0 || off + 12L + len > bytes.length) return null
      val tag = new String(bytes, off + 4, 4, "US-ASCII")
      tag match {
        case "IHDR" =>
          if (len != 13) return null
          w = beInt(bytes, off + 8); h = beInt(bytes, off + 12)
          val depth = bytes(off + 16); val color = bytes(off + 17)
          val interlace = bytes(off + 20)
          if (depth != 8 || interlace != 0) return null
          bpp = color match { case 0 => 1; case 2 => 3; case _ => return null }
          // cap decoded size at 64 MiB so a forged header can't OOM an executor
          if (w <= 0 || h <= 0 || w.toLong * h * bpp > 64L * 1024 * 1024) return null
          idat = new java.io.ByteArrayOutputStream()
        case "IDAT" =>
          if (idat == null) return null
          idat.write(bytes, off + 8, len)
        case "IEND" =>
          if (idat == null) return null
          return inflateAndUnfilter(idat.toByteArray, w, h, bpp)
        case _ => // ancillary chunk — skip
      }
      off += 12 + len
    }
    null // no IEND
  }

  private def inflateAndUnfilter(z: Array[Byte], w: Int, h: Int, bpp: Int): Raster = {
    val stride = w * bpp
    val raw = new Array[Byte](h * (stride + 1))
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
    val pix = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val filter = raw(y * (stride + 1)) & 0xff
      val ro = y * (stride + 1) + 1
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
    new Raster(w, h, bpp, pix)
  }

  /** Encode a raster back to PNG (filter 0 rows, or a fixed filter for
    * tests exercising the unfilter paths). Shares no state with the
    * fixture generator in ops/Multimodal — this is the production path.
    */
  def encodePng(r: Raster, filterType: Int = 0): Array[Byte] = {
    require(filterType >= 0 && filterType <= 4, s"bad filter $filterType")
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
    val color: Byte = if (r.bpp == 1) 0 else 2
    chunk("IHDR", be(r.width) ++ be(r.height) ++ Array[Byte](8, color, 0, 0, 0))
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

  /** (dataOff0based, nSamples, sampleRate, channels) for PCM-16 WAVs via
    * the bounded chunk walk; null otherwise.
    */
  private def pcm16Layout(bytes: Array[Byte]): Array[Int] = {
    if (bytes == null) return null
    val fmtOff = RiffWalkHelper.chunkDataOffset(bytes, 'f', 'm', 't', ' ')
    val dataOff = RiffWalkHelper.chunkDataOffset(bytes, 'd', 'a', 't', 'a')
    if (fmtOff < 0 || dataOff < 0) return null
    val fo = fmtOff.toInt - 1 // helper returns 1-based for SQL substr
    val dOff = dataOff.toInt - 1
    if (fo + 16 > bytes.length || dOff > bytes.length) return null
    val codec = leShort(bytes, fo)
    val channels = leShort(bytes, fo + 2)
    val rate = leInt(bytes, fo + 4)
    val bits = leShort(bytes, fo + 14)
    if (codec != 1 || bits != 16 || channels < 1) return null
    val dataLen0 = leInt(bytes, dOff - 4)
    val dataLen = math.min(dataLen0.toLong, (bytes.length - dOff).toLong).toInt
    if (dataLen < 0) return null
    Array(dOff, dataLen / (2 * channels), rate, channels)
  }

  /** struct(n_samples, sample_rate, pcm_sum, pcm_sqsum, pcm_peak) over all
    * PCM-16 frames (all channels); null for non-PCM-16 blobs. Integer
    * outputs for exact oracle reproduction; RMS = sqrt(sqsum/n) downstream.
    */
  def wavPcmStats(bytes: Array[Byte]): InternalRow = {
    val lay = pcm16Layout(bytes)
    if (lay == null) return null
    val Array(dOff, n, rate, channels) = lay
    var sum = 0L; var sq = 0L; var peak = 0
    var i = 0
    val total = n * channels
    while (i < total) {
      val v = leShort(bytes, dOff + 2 * i)
      sum += v; sq += v.toLong * v
      val a = math.abs(v); if (a > peak) peak = a
      i += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, rate, sum, sq, peak))
  }

  val WavPcmStatsType: StructType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("pcm_sum", LongType, nullable = false),
    StructField("pcm_sqsum", LongType, nullable = false),
    StructField("pcm_peak", IntegerType, nullable = false)))

  /** Keep every `step`-th PCM frame (frame 0, step, 2·step, …) — the audio
    * analogue of video frame-sampling — re-emitted as a canonical
    * RIFF/fmt/data WAV at the original sample rate. null for non-PCM-16.
    */
  def wavFrameSample(bytes: Array[Byte], step: Int): Array[Byte] = {
    if (step <= 0) return null
    val lay = pcm16Layout(bytes)
    if (lay == null) return null
    val Array(dOff, n, rate, channels) = lay
    val kept = (n + step - 1) / step
    val dataLen = kept * 2 * channels
    val out = new Array[Byte](44 + dataLen)
    def putLe(o: Int, v: Int, len: Int): Unit = {
      var i = 0
      while (i < len) { out(o + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    }
    def putTag(o: Int, s: String): Unit = {
      var i = 0
      while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    putTag(0, "RIFF"); putLe(4, 36 + dataLen, 4); putTag(8, "WAVE")
    putTag(12, "fmt "); putLe(16, 16, 4)
    putLe(20, 1, 2); putLe(22, channels, 2)
    putLe(24, rate, 4); putLe(28, rate * 2 * channels, 4)
    putLe(32, 2 * channels, 2); putLe(34, 16, 2)
    putTag(36, "data"); putLe(40, dataLen, 4)
    var f = 0; var o = 44
    while (f < n) {
      var c = 0
      while (c < channels) {
        val src = dOff + 2 * (f * channels + c)
        out(o) = bytes(src); out(o + 1) = bytes(src + 1)
        o += 2; c += 1
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

/** PCM-16 WAV sample statistics through the bounded RIFF walk; null for
  * non-PCM-16 blobs.
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

/** Every-`step`-th-frame decimation of a PCM-16 WAV, re-encoded as a
  * canonical WAV; null for non-PCM-16 blobs.
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
