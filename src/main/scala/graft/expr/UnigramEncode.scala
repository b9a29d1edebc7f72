package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenizer model (Kudo 2018, "Subword Regularization" — the
  * SentencePiece unigram algorithm) in the engine's integer-exact
  * discipline: piece scores are [[Log2Fp]] fixed-point log2-probabilities
  * (Longs in units of 2^-20), and segmentation is Viterbi — the maximal
  * total-score split of a word into vocabulary pieces, computed by the
  * standard O(n·maxLen) dynamic program over codepoint positions.
  *
  * Characters absent from the vocabulary segment as single-codepoint UNK
  * pieces at [[unkScore]] — a floor 10 log2-units below the worst real
  * piece, so Viterbi only ever uses it when no vocabulary piece can cover
  * a position. This keeps decode EXACT for any input (the piece sequence
  * always concatenates back to the word), which is what the corpus-wide
  * round-trip oracle gates.
  *
  * Determinism: scores are integers, the DP iterates candidate piece
  * lengths ascending with strict improvement required to replace, so tie
  * breaks prefer the shortest final piece — a pure function of the model,
  * identical on every executor and every run.
  *
  * The per-word segmentation memoizes in a bounded cache (same trick and
  * cap as [[BpeModel]]); per-model, thread-safe, hostile-vocabulary safe.
  */
final class UnigramModel(val pieces: Array[(String, Long)],
                         val byteFallback: Boolean = false)
    extends Serializable {
  /** Piece trie — scores at terminal nodes. The DP walks it forward from
    * each start position, so per-position cost is bounded by the longest
    * vocabulary path the text actually follows (and stops at the first
    * dead codepoint), not by the longest entry of a hostile persisted
    * vocabulary. Byte-fallback mode excludes byte tokens from the trie:
    * they are emitted by the fallback path only, never text-matched, so
    * literal `<0x41>` text cannot round-trip to `A`.
    */
  @transient private lazy val trie: CpTrie = {
    val t = new CpTrie
    var i = 0
    while (i < pieces.length) {
      if (!(byteFallback && ByteTokens.isByteToken(pieces(i)._1)))
        t.insert(pieces(i)._1, pieces(i)._2)
      i += 1
    }
    t
  }
  /** Longest piece in codepoints — the worst-case DP scan depth
    * (diagnostic; the trie walk self-bounds and typically dies earlier).
    */
  @transient lazy val maxLen: Int =
    if (pieces.isEmpty) 1
    else math.max(1,
      pieces.iterator.map(p => p._1.codePointCount(0, p._1.length)).max)
  /** UNK floor: 10 log2-units below the worst vocabulary piece (or a
    * plain -2^F·10 for an empty model). Derived from the scores, so a
    * persisted model reconstructs the identical value.
    */
  @transient lazy val unkScore: Long =
    (if (pieces.isEmpty) 0L else pieces.map(_._2).min) - (10L << Log2Fp.F)

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val CacheCap = 50000

  /** Viterbi segmentation of one word into vocabulary pieces (UNK
    * single codepoints where nothing covers). Always succeeds; the
    * concatenation of the result is exactly `word`.
    */
  def segmentWord(word: String): Array[String] = {
    val hit = cache.get(word)
    if (hit != null) return hit
    val cps: Array[Int] = word.codePoints().toArray
    val n = cps.length
    if (n == 0) return Array.empty
    val dp = new Array[Long](n + 1)
    val back = new Array[Int](n + 1) // length of the best piece ending at i
    val unkAt = new Array[Boolean](n + 1) // best piece ending at i is UNK
    java.util.Arrays.fill(dp, Long.MinValue)
    dp(0) = 0L
    // Forward relaxation, one trie walk per start position. For a fixed
    // END position the candidates arrive start-ascending = length-
    // DESCENDING, so the >= replacement rule below keeps the original
    // tie-break (shortest final piece wins equal scores): the last
    // candidate to relax an end position is the shortest one, exactly the
    // piece the old ascending-length strict-> loop would have kept.
    var j = 0
    while (j < n) {
      if (dp(j) != Long.MinValue) {
        var node = trie.root
        var k = j
        var sawL1 = false
        var live = true
        while (live && k < n) {
          node = node.child(cps(k))
          if (node == null) live = false
          else {
            k += 1
            val l = k - j
            if (l == 1) sawL1 = true
            // at length 1 a non-vocabulary codepoint still relaxes (the
            // single-codepoint UNK floor); beyond that only real pieces do
            if (node.terminal || l == 1) {
              val sc = if (node.terminal) node.score else unkScore
              val cand = dp(j) + sc
              if (cand >= dp(j + l)) {
                dp(j + l) = cand; back(j + l) = l
                unkAt(j + l) = !node.terminal
              }
            }
          }
        }
        if (!sawL1) { // trie died immediately: UNK single codepoint
          val cand = dp(j) + unkScore
          if (cand >= dp(j + 1)) {
            dp(j + 1) = cand; back(j + 1) = 1; unkAt(j + 1) = true
          }
        }
      }
      j += 1
    }
    val out = collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) {
      val l = back(p)
      if (byteFallback && l == 1 && unkAt(p))
        // byte-fallback: the uncovered codepoint decomposes to the byte
        // tokens of its UTF-8 encoding (appended reversed — the whole
        // buffer flips below)
        ByteTokens.encodeCp(cps(p - 1)).reverseIterator.foreach(out += _)
      else out += new String(cps, p - l, l)
      p -= l
    }
    val res = out.reverse.toArray
    if (cache.size < CacheCap) cache.put(word, res)
    res
  }
}

/** Pieces of every token of a document, nested per token
  * (`array<array<string>>`), by Viterbi segmentation under the unigram
  * model — same structure and null contract as [[BpeEncode]]: the model
  * rides as a codegen reference object, null token elements produce
  * empty piece lists so the output stays index-aligned.
  */
case class UnigramEncode(child: Expression, model: UnigramModel)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false),
      containsNull = false)
  override def prettyName: String = "graft_unigram_encode"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_unigram_encode needs array<string>, got ${other.simpleString}")
    }

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[AnyRef](n)
    var j = 0
    while (j < n) {
      out(j) =
        if (arr.isNullAt(j)) new GenericArrayData(Array.empty[AnyRef])
        else {
          val pieces = model.segmentWord(arr.getUTF8String(j).toString)
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
    val ref = ctx.addReferenceObj("unigramEncode", this,
      classOf[UnigramEncode].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.compute($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
}
