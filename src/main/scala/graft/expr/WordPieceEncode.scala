package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenizer model (Schuster & Nakajima 2012; the BERT runtime
  * convention, Devlin et al. 2019): a vocabulary of word-initial pieces
  * and `##`-prefixed continuation pieces, encoded by GREEDY
  * LONGEST-MATCH-FIRST — at each cursor take the longest vocabulary piece
  * (word-initial form at position 0, `##` form after), emit, advance. A
  * word containing a codepoint the vocabulary cannot cover at some cursor
  * encodes as the single `[UNK]` piece — the BERT convention, and the ONE
  * lossy case (documented; the gated corpus round-trip never hits it
  * because training seeds every corpus codepoint, initial and
  * continuation forms both).
  *
  * Deterministic by construction (a set lookup per candidate length,
  * longest wins, no scores), so the corpus-wide decode∘encode oracle
  * hash-gates the train+encode path like the BPE and unigram twins.
  *
  * Per-word results memoize in the same bounded cache as [[BpeModel]].
  */
final class WordPieceModel(val vocab: Array[String],
                           val byteFallback: Boolean = false)
    extends Serializable {
  /** Word-initial matcher: every vocabulary piece verbatim — including
    * pieces that literally start with `##` (hostile markdown-ish tokens
    * can produce them), which at position 0 match as themselves.
    * Byte-fallback mode excludes byte tokens: they are emitted by the
    * fallback path only, never text-matched, so literal `<0x41>` text
    * cannot round-trip to `A`.
    */
  @transient private lazy val initTrie: CpTrie = {
    val t = new CpTrie
    vocab.foreach { p =>
      if (!(byteFallback && ByteTokens.isByteToken(p))) t.insert(p, 0L)
    }
    t
  }
  /** Continuation matcher: the BODY (marker stripped) of every
    * `##`-prefixed piece — a cursor past position 0 matches bodies and
    * re-attaches the marker on emit.
    */
  @transient private lazy val contTrie: CpTrie = {
    val t = new CpTrie
    vocab.foreach { p =>
      if (p.length > 2 && p.startsWith("##") &&
          !(byteFallback && ByteTokens.isByteToken(p.substring(2))))
        t.insert(p.substring(2), 0L)
    }
    t
  }
  /** Codepoint length of the longest piece — the worst-case scan depth
    * (diagnostic; the trie walk self-bounds and typically dies earlier).
    */
  @transient lazy val maxLen: Int =
    if (vocab.isEmpty) 1
    else math.max(1,
      vocab.iterator.map(p => p.codePointCount(0, p.length)).max)

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val CacheCap = 50000

  val Unk = "[UNK]"

  /** Greedy longest-match-first segmentation; Array(Unk) when some cursor
    * position has no matching piece. One trie walk per cursor position —
    * no candidate substrings are materialized, and the walk stops at the
    * first codepoint no vocabulary piece extends past, so a hostile
    * persisted vocabulary with one enormous entry cannot degrade the
    * scan (it only deepens the one path that actually matches it).
    */
  def encodeWord(word: String): Array[String] = {
    val hit = cache.get(word)
    if (hit != null) return hit
    val cps: Array[Int] = word.codePoints().toArray
    val n = cps.length
    if (n == 0) return Array.empty
    val out = collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    var failed = false
    while (i < n && !failed) {
      var node = (if (i == 0) initTrie else contTrie).root
      var k = i
      var best = 0 // deepest terminal depth seen
      while (node != null && k < n) {
        node = node.child(cps(k))
        if (node != null) {
          k += 1
          if (node.terminal) best = k - i
        }
      }
      if (best == 0) {
        if (byteFallback) {
          // the uncovered codepoint decomposes to byte tokens (emitted
          // bare — never ##-prefixed — at any position) and the greedy
          // scan continues: [UNK] is impossible in fallback mode
          out ++= ByteTokens.encodeCp(cps(i))
          i += 1
        } else failed = true
      } else {
        val body = new String(cps, i, best)
        out += (if (i == 0) body else "##" + body)
        i += best
      }
    }
    val res = if (failed) Array(Unk) else out.toArray
    if (cache.size < CacheCap) cache.put(word, res)
    res
  }
}

/** Pieces of every token of a document, nested per token
  * (`array<array<string>>`) — same structure and null contract as
  * [[BpeEncode]]/[[UnigramEncode]]; continuation pieces carry their `##`
  * prefix (the vocabulary form), which decode strips.
  */
case class WordPieceEncode(child: Expression, model: WordPieceModel)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false),
      containsNull = false)
  override def prettyName: String = "graft_wordpiece_encode"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_wordpiece_encode needs array<string>, got ${other.simpleString}")
    }

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[AnyRef](n)
    var j = 0
    while (j < n) {
      out(j) =
        if (arr.isNullAt(j)) new GenericArrayData(Array.empty[AnyRef])
        else {
          val pieces = model.encodeWord(arr.getUTF8String(j).toString)
          new GenericArrayData(
            pieces.map(p => UTF8String.fromString(p): AnyRef))
        }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordPieceEncode", this,
      classOf[WordPieceEncode].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.compute($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncode =
    copy(child = newChild)
}

/** Positional vocabulary symbols of one word — `abc` → `a ##b ##c` —
  * the trainer's coverage explode ([[graft.ops.WordPiece.train]]), as a
  * codegen'd expression so main source keeps UDFs to test fixtures only.
  * Runs over the distinct-word aggregate (never the corpus).
  */
case class WordPieceSymbols(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_wordpiece_symbols"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_wordpiece_symbols needs string, got ${other.simpleString}")
    }

  def compute(w: UTF8String): ArrayData = {
    val cps = w.toString.codePoints().toArray
    val out = new Array[AnyRef](cps.length)
    var i = 0
    while (i < cps.length) {
      val cs = new String(Character.toChars(cps(i)))
      out(i) = UTF8String.fromString(if (i == 0) cs else "##" + cs)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordPieceSymbols", this,
      classOf[WordPieceSymbols].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.compute($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceSymbols =
    copy(child = newChild)
}
