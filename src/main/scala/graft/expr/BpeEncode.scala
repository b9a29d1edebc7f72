package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding merge table + the per-word greedy encoder (Sennrich
  * et al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units"; the same apply-lowest-rank-merge-first rule GPT-2's byte-level
  * encoder uses). A word's symbols start as its characters (Unicode code
  * points); merges apply lowest-RANK first, leftmost occurrence first,
  * until no adjacent pair is in the table. No end-of-word marker: word
  * boundaries are preserved STRUCTURALLY (the encode expression returns
  * pieces nested per token), so decode is exact for any token — including
  * ones containing angle brackets or control characters that a sentinel
  * marker scheme ('</w>', U+0001) would corrupt.
  *
  * The per-word encode memoizes in a bounded cache (natural-language
  * corpora repeat words heavily — the same trick as GPT-2's encoder
  * cache); the cache is per-model, thread-safe, and capped so a
  * hostile-vocabulary corpus cannot OOM an executor.
  */
final class BpeModel(val merges: Array[(String, String)],
                     val byteFallback: Boolean = false,
                     val alphabet: Array[String] = Array.empty)
    extends Serializable {
  /** Known single-codepoint symbols (byte-fallback mode): a final piece
    * outside this set and outside the merge outputs decomposes to byte
    * tokens, closing the vocabulary at alphabet ∪ merges ∪ byte tokens.
    */
  @transient private lazy val alphaSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](alphabet.length * 2)
    alphabet.foreach(s.add)
    s
  }
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      m.put(merges(i)._1 + "\u0000" + merges(i)._2, i)
      i += 1
    }
    m
  }
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val CacheCap = 50000

  /** Greedy encode of one word: repeatedly merge the lowest-rank adjacent
    * pair (leftmost on rank ties) until none remains in the table.
    */
  def encodeWord(word: String): Array[String] = {
    val hit = cache.get(word)
    if (hit != null) return hit
    var pieces: Array[String] =
      word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    var done = pieces.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < pieces.length - 1) {
        val r = rank.get(pieces(i) + "\u0000" + pieces(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        val merged = new Array[String](pieces.length - 1)
        System.arraycopy(pieces, 0, merged, 0, bestAt)
        merged(bestAt) = pieces(bestAt) + pieces(bestAt + 1)
        System.arraycopy(pieces, bestAt + 2, merged, bestAt + 1,
          pieces.length - bestAt - 2)
        pieces = merged
        done = pieces.length < 2
      }
    }
    if (byteFallback) {
      // closed-vocabulary pass: any remaining SINGLE-codepoint piece not
      // in the training alphabet decomposes to byte tokens (multi-
      // codepoint pieces are merge outputs, in vocabulary by
      // construction). Runs after merging so in-alphabet text is
      // untouched and existing gates see identical pieces.
      var needs = false
      var i = 0
      while (i < pieces.length && !needs) {
        val p = pieces(i)
        if (p.codePointCount(0, p.length) == 1 && !alphaSet.contains(p))
          needs = true
        i += 1
      }
      if (needs) {
        val out = collection.mutable.ArrayBuffer.empty[String]
        pieces.foreach { p =>
          if (p.codePointCount(0, p.length) == 1 && !alphaSet.contains(p))
            out ++= ByteTokens.encodeCp(p.codePointAt(0))
          else out += p
        }
        pieces = out.toArray
      }
    }
    if (cache.size < CacheCap) cache.put(word, pieces)
    pieces
  }
}

/** Pieces of every token of a document, nested per token:
  * `array<array<string>>` where out(j) is token j's BPE pieces in order.
  * The merge table rides as a codegen reference object, so every task
  * reuses one compiled encoder + one shared word cache.
  *
  * Null contract: null token array → null; null ELEMENTS inside the array
  * (never produced by TextFunctions.tokens) encode as empty piece lists,
  * keeping the output index-aligned with the input tokens.
  */
case class BpeEncode(child: Expression, model: BpeModel)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false),
      containsNull = false)
  override def prettyName: String = "graft_bpe_encode"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bpe_encode needs array<string>, got ${other.simpleString}")
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
    // the merge-loop body lives in compiled Scala (BpeModel.encodeWord);
    // codegen binds the expression instance as a reference object and
    // calls compute — same structure as ShingleHash40, keeps the operator
    // inside WholeStageCodegen without inlining a string algorithm into
    // generated Java
    val ref = ctx.addReferenceObj("bpeEncode", this,
      classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.compute($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
