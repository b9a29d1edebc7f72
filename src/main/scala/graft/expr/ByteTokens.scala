package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-fallback piece vocabulary — the SentencePiece `byte_fallback`
  * convention (also the id-space GPT-2's byte-level BPE guarantees): 256
  * reserved pieces `<0x00>`…`<0xFF>`, one per byte value, seeded into
  * every fallback-mode vocabulary so that ANY codepoint the trained
  * pieces cannot cover decomposes into the byte tokens of its UTF-8
  * encoding instead of a lossy `[UNK]`. The closed vocabulary is then
  * trained-pieces ∪ byte-tokens, decode is exact for arbitrary input, and
  * no input can fall outside the id space.
  *
  * Collision discipline (the part SentencePiece gets for free by working
  * in ids): byte tokens here are STRINGS, so a document literally
  * containing the text `<0x41>` must not round-trip to `A`. Three rules
  * keep the mapping bijective — (1) fallback-mode trainers never LEARN a
  * piece whose text is byte-token-shaped (the merge/seed filters below),
  * (2) fallback-mode matchers never text-match byte tokens (they are
  * excluded from the tries — emitted by the fallback path only), so
  * literal `<0x41>` text encodes through its individual characters, and
  * (3) decode therefore inverts byte tokens unconditionally.
  */
object ByteTokens {
  /** `<0x00>`…`<0xFF>` — uppercase hex, the SentencePiece spelling. */
  val tokens: Array[String] = Array.tabulate(256)(b => f"<0x$b%02X>")

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Exactly `<0xHH>` with uppercase hex. */
  def isByteToken(s: String): Boolean =
    s.length == 6 && s.charAt(0) == '<' && s.charAt(1) == '0' &&
      s.charAt(2) == 'x' && s.charAt(5) == '>' &&
      hexVal(s.charAt(3)) >= 0 && hexVal(s.charAt(4)) >= 0

  /** The byte value of a byte token (caller checks [[isByteToken]]). */
  def byteOf(s: String): Int = (hexVal(s.charAt(3)) << 4) | hexVal(s.charAt(4))

  /** Byte tokens of one codepoint's UTF-8 encoding (1–4 tokens). */
  def encodeCp(cp: Int): Array[String] =
    new String(Character.toChars(cp))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => tokens(b & 0xff))
}

/** Decode nested pieces (`array<array<string>>`) back to text: per token,
  * pieces concatenate as UTF-8 bytes — byte tokens contribute their byte,
  * every other piece its encoded text (with the `##` continuation marker
  * stripped at positions > 0 when `wordPiece`) — then tokens join with
  * single spaces. Because byte runs land in one buffer per token, a
  * multi-byte codepoint split across byte tokens reassembles exactly.
  * This is the decode side of the byte-fallback gate; the plain
  * (non-fallback) round-trip queries keep their pure-column decode.
  */
case class PieceDecode(child: Expression, wordPiece: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_piece_decode"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(ArrayType(StringType, _), _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_piece_decode needs array<array<string>>, got ${other.simpleString}")
    }

  def compute(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val sb = new java.lang.StringBuilder
    val buf = new java.io.ByteArrayOutputStream()
    var j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      if (!arr.isNullAt(j)) {
        val ps = arr.getArray(j)
        val m = ps.numElements()
        buf.reset()
        var i = 0
        while (i < m) {
          var p = ps.getUTF8String(i).toString
          if (wordPiece && i > 0 && p.length > 2 && p.startsWith("##") &&
              !ByteTokens.isByteToken(p))
            p = p.substring(2)
          if (ByteTokens.isByteToken(p)) buf.write(ByteTokens.byteOf(p))
          else buf.write(p.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          i += 1
        }
        sb.append(new String(buf.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8))
      }
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pieceDecode", this,
      classOf[PieceDecode].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.compute($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): PieceDecode =
    copy(child = newChild)
}
