package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.WordPiece
import graft.expr.WordPieceModel
import TestSpark.spark

/** The WordPiece tokenizer: the likelihood-gain merge rule against
  * hand-computed scores, greedy longest-match laws (the BERT "unaffable"
  * shape), lossless round-trip on the corpus, the [UNK] lossy case, and
  * persisted-vocabulary identity.
  */
class WordPieceSpec extends AnyFunSuite {

  test("merge rule: likelihood gain, not raw count") {
    // "aab"x10, "cb"x9: pair counts (a,##a)=10, (a? ...) symbols:
    // a:20, ##a? no — "aab" -> a ##a ##b. counts: (a,##a)=10, (##a,##b)=10,
    // (c,##b)=9. symbols: a=10, ##a=10, ##b=19, c=9.
    // scores: (a,##a)=10/(10*10)=0.1; (##a,##b)=10/(10*19)=0.0526;
    //         (c,##b)=9/(9*19)=0.0526...
    // raw-count BPE would tie (a,##a) with (##a,##b) at 10 and pick by
    // lexicographic order; WordPiece's gain rule picks (a,##a) OUTRIGHT.
    val m = WordPiece.trainFromCounts(Seq(("aab", 10L), ("cb", 9L)), 1)
    assert(m.vocab.contains("aab".take(2)), s"expected merge a+##a -> aa in ${m.vocab.toSeq}")
    assert(!m.vocab.contains("##ab"), "##a+##b must lose on likelihood gain")
    // and a case where the gain rule INVERTS the count order: pair X
    // appears more often but between very frequent symbols
    // "dede"x20 -> d ##e ##d ##e: (d,##e)=20, (##e,##d)=20, (##d,##e)=20
    // "fg"x3 -> f ##g: (f,##g)=3. symbols: d=20, ##e=40, ##d=20, f=3, ##g=3.
    // scores: (d,##e)=20/800=.025, (##e,##d)=20/800=.025, (##d,##e)=20/800=.025,
    //         (f,##g)=3/9=.333 -> the RARE pair wins.
    val m2 = WordPiece.trainFromCounts(Seq(("dede", 20L), ("fg", 3L)), 1)
    assert(m2.vocab.contains("fg"),
      s"rare-but-cohesive pair must win the gain rule, got ${m2.vocab.toSeq}")
  }

  test("greedy longest-match: BERT semantics, per-position forms") {
    val m = new WordPieceModel(Array(
      "un", "##aff", "##able", "u", "n", "a", "f", "b", "l", "e",
      "##n", "##a", "##f", "##b", "##l", "##e", "hunger", "##hunger"))
    assert(m.encodeWord("unaffable").toSeq == Seq("un", "##aff", "##able"))
    // longest-match prefers "un" over "u"
    assert(m.encodeWord("un").toSeq == Seq("un"))
    // a continuation-form-only piece never matches at position 0
    assert(m.encodeWord("hunger").toSeq == Seq("hunger"))
    // unknown codepoint anywhere -> the single [UNK] piece
    assert(m.encodeWord("unz").toSeq == Seq(m.Unk))
    assert(m.encodeWord("").toSeq == Seq.empty)
  }

  test("corpus round-trip: distributed encode reconstructs every document") {
    val s = spark
    val d = s.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val model = WordPiece.train(d, "text", numMerges = 120)
    val enc = WordPiece.encodeStats(d, "doc_id", "text", model)
    val mism = d.join(enc.select(col("doc_id"), col("decoded")), "doc_id")
      .where(graft.functions.TextFunctions.normalized(col("text")) =!= col("decoded"))
      .count()
    assert(mism == 0L, s"$mism documents failed reconstruction")
    // compression: merges actually reduce piece counts below characters
    val row = enc.agg(sum(col("n_pieces")).as("p"), sum(col("n_tokens")).as("t")).head()
    assert(row.getLong(0) >= row.getLong(1))
    // persisted twin: the vocabulary set IS the model
    val back = WordPiece.modelFromDf(WordPiece.modelToDf(s, model))
    assert(back.vocab.toSeq == model.vocab.toSeq)
    val m2 = WordPiece.train(d, "text", numMerges = 120)
    assert(m2.vocab.toSeq == model.vocab.toSeq, "training not deterministic")
  }

  test("codepoints beyond the word cap still encode (coverage pass)") {
    val s = spark
    import s.implicits._
    // maxWords = 1 keeps only "aaa"; the z/e/t/a and q codepoints of the
    // dropped words reach the vocabulary through the corpus-wide symbol
    // pass, so NO token falls to [UNK] and reconstruction stays exact
    val df = Seq((1L, "aaa aaa aaa zeta"), (2L, "aaa qqq")).toDF("doc_id", "text")
    val m = WordPiece.train(df, "text", numMerges = 2, maxWords = 1)
    val enc = WordPiece.encodeStats(df, "doc_id", "text", m)
    assert(enc.where(col("decoded").contains("[UNK]")).count() == 0L,
      "capped-out codepoints fell to [UNK]")
    val mism = df.join(enc.select(col("doc_id"), col("decoded")), "doc_id")
      .where(graft.functions.TextFunctions.normalized(col("text")) =!= col("decoded"))
      .count()
    assert(mism == 0L)
  }

  test("greedy bound covers word-initial pieces with a literal ## prefix") {
    // vocab holds the 4-codepoint word-initial piece "##ab": the length
    // bound must count its FULL length or greedy misses the whole-word
    // match and splits it
    val m = new WordPieceModel(Array("##ab", "#", "##=#", "a", "##a", "##b"))
    assert(m.encodeWord("##ab").toSeq == Seq("##ab"))
  }

  test("a word-initial literal ## survives decode (position-aware strip)") {
    val s = spark
    import s.implicits._
    val m = new WordPieceModel(Array("##x", "####x", "x", "##y", "y"))
    // token "##x": position 0 matches the plain body "##x" (which happens
    // to look like a continuation form) — decode must NOT strip it
    val df = Seq((1L, "##x")).toDF("doc_id", "text")
    val out = WordPiece.encodeStats(df, "doc_id", "text", m)
      .select("decoded").head().getString(0)
    assert(out == "##x", s"got '$out'")
  }
}
