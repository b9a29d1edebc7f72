package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass token/shingle hashing.
  *
  * The HOF formulation (`transform(tokens, t => conv(substring(md5(t)...)`
  * is evaluated interpreted per element (higher-order functions are
  * CodegenFallback) — profiling showed it dominating the dedup pack
  * (~57µs/shingle). These expressions do one pass in plain JVM code:
  * build the shingle bytes, md5, take the first 5 bytes as the 40-bit
  * hash. Value-identical to the oracle's
  * `('0x'||substr(md5(x),1,10))::BIGINT`.
  */
object Md5Hash40 {
  def of(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    ((d(0) & 0xffL) << 32) | ((d(1) & 0xffL) << 24) |
    ((d(2) & 0xffL) << 16) | ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
  }
}

/** Distinct word-n-gram shingle hashes from a token array — the fused
  * equivalent of `array_distinct(transform(wordShingles(toks, n),
  * tokenHash40))`, value-identical to it: shingles are the
  * U+0001-joined n-grams (the separator keeps token boundaries —
  * ["ab","c"] and ["a","bc"] must NOT produce the same shingle), with the
  * whole text as a single shingle when there are fewer than n tokens
  * (SimilarityFunctions.wordShingles semantics; the DuckDB oracle joins
  * with chr(1) identically).
  */
case class ShingleHash40(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hash40"

  private final val Sep = '\u0001'

  def compute(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    // concat_ws semantics: null elements are skipped WITHOUT a separator;
    // the separator goes between non-null elements even when one is empty
    // (["","a"] → "\u0001" + "a"), so track first-non-null, not sb.length
    def join(sb: java.lang.StringBuilder, idx: Int, first: Boolean): Boolean =
      if (arr.isNullAt(idx)) first
      else {
        if (!first) sb.append(Sep)
        sb.append(arr.getUTF8String(idx))
        false
      }
    if (m < n) {
      val sb = new java.lang.StringBuilder
      var first = true
      var i = 0
      while (i < m) { first = join(sb, i, first); i += 1 }
      seen.add(Md5Hash40.of(sb.toString.getBytes("UTF-8")))
    } else {
      var i = 0
      while (i + n <= m) {
        val sb = new java.lang.StringBuilder
        var first = true
        var j = 0
        while (j < n) { first = join(sb, i + j, first); j += 1 }
        seen.add(Md5Hash40.of(sb.toString.getBytes("UTF-8")))
        i += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingler", this, classOf[ShingleHash40].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash40 =
    copy(child = newChild)
}

/** Positioned word-n-gram hashes: out(j) = 60-bit md5 hash of the
  * space-joined tokens j..j+n-1, for j in 0..m-n (EMPTY when m < n — a
  * short document has no full window, unlike ShingleHash40's whole-text
  * fallback, because span arithmetic needs every hash to stand for exactly
  * n tokens). Non-distinct and index-aligned so the consumer can map a
  * duplicated hash back to the token span it covers
  * (Dedup.dupSpans). Space-joining is injective here: tokens come from a
  * whitespace split, so they cannot contain the separator. Value-identical
  * to the oracle's `('0x'||substr(md5(array_to_string(ts[j+1:j+n],' ')),1,15))::BIGINT`.
  *
  * Single pass, one StringBuilder per window — the HOF formulation
  * (`transform(sequence(...), j => conv(substring(md5(concat_ws(...`
  * evaluates interpreted per window (see file header).
  */
case class PositionedShingleHash60(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"n must be positive, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_positioned_shingle_hash60"

  def compute(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m - n + 1)
    var i = 0
    while (i + n <= m) {
      val sb = new java.lang.StringBuilder
      var j = 0
      var first = true
      while (j < n) {
        // concat_ws semantics (nulls skipped without separator) — token
        // arrays from TextFunctions.tokens never carry nulls, but stay
        // consistent with the column-function formulation
        if (!arr.isNullAt(i + j)) {
          if (!first) sb.append(' ')
          sb.append(arr.getUTF8String(i + j))
          first = false
        }
        j += 1
      }
      out(i) = Md5Hash60.of(sb.toString.getBytes("UTF-8"))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingler", this, classOf[PositionedShingleHash60].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PositionedShingleHash60 =
    copy(child = newChild)
}

/** First 15 hex digits of md5 as a 60-bit long — the fused equivalent of
  * `conv(substring(md5(x),1,15),16,10)` (TextFunctions.fingerprint and the
  * oracle's `('0x'||substr(md5(x),1,15))::BIGINT`): bytes 0-6 whole, plus
  * the high nibble of byte 7.
  */
object Md5Hash60 {
  def of(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }
}

/** Per-token 40-bit hashes (non-distinct) — the fused equivalent of
  * `transform(toks, tokenHash40)`, feeding SimHash.
  */
case class TokenHash40Array(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_hash40"

  def compute(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      out(i) = Md5Hash40.of(s.getBytes)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hasher", this, classOf[TokenHash40Array].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenHash40Array =
    copy(child = newChild)
}

/** Per-token 60-bit hashes (non-distinct) — the wide twin of
  * [[TokenHash40Array]] (first 15 md5 hex digits, [[Md5Hash60]]), feeding
  * the 60-bit SimHash whose 12-bit pieces give 24-bit band keys — the
  * corpus-size dial for the banded join's birthday-collision residual.
  */
case class TokenHash60Array(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_hash60"

  def compute(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      out(i) = Md5Hash60.of(s.getBytes)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hasher", this, classOf[TokenHash60Array].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenHash60Array =
    copy(child = newChild)
}
