package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expr.{Log2Fp, Md5Hash60}
import graft.ops.Bm25
import TestSpark.spark

/** BM25 retrieval family. The driver's DuckDB oracle pins Spark↔DuckDB;
  * this spec pins the operator against an independent plain-collections
  * BM25 (the third-replication pattern of KMeansSpec/ModelFilterSpec),
  * checks the ranking laws on a hand-built corpus, and asserts the
  * scale-critical plan shape: scoring never shuffle-joins the corpus.
  */
class Bm25Spec extends AnyFunSuite {

  private def tok(t: String): Seq[String] =
    t.trim.toLowerCase.replaceAll("\\s+", " ")
      .split(' ').toSeq.filter(_.nonEmpty)

  private def h60(s: String): Long = Md5Hash60.of(s.getBytes("UTF-8"))

  /** Independent plain-Scala replication of the fixed-point algebra. */
  private def ref(docs: Seq[(Long, String)], queries: Seq[(String, String)],
                  k: Int): Seq[(String, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> tok(t).map(h60) }
    val dl = toks.map { case (id, ts) => id -> ts.size.toLong }.toMap
    val nd = docs.size.toLong
    val afp = (64L * dl.values.sum) / nd
    val post = toks.flatMap { case (id, ts) => ts.map(h => (id, h)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val df = post.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    queries.flatMap { case (qid, qt) =>
      val qhs = tok(qt).map(h60).distinct
      val scored = docs.map(_._1)
        .filter(id => qhs.exists(h => post.contains((id, h))))
        .map { id =>
          id -> qhs.flatMap { h =>
            post.get((id, h)).map { tf =>
              val idf = Log2Fp.compute(2 * nd + 2) -
                Log2Fp.compute(2 * df(h) + 1)
              val tfn = (22528L * tf * afp) /
                (10L * tf * afp + 3L * afp + 576L * dl(id))
              (idf * tfn) / 1024L
            }
          }.sum
        }
      scored.sortBy { case (id, s) => (-s, -id) }.take(k).zipWithIndex
        .map { case ((id, s), i) => (qid, (i + 1).toLong, id, s) }
    }
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "rank", "id", "score_fp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("bm25 hand corpus: tf saturation, idf ordering, dl normalization") {
    val s = spark
    import s.implicits._
    // rare "zebra" appears in 1/4 docs, common "the" in all; doc 3 repeats
    // zebra (tf saturation), doc 4 is long (length normalization)
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the dog ran far away today"),
      (3L, "the zebra zebra zebra ran"),
      (4L, "the " + Seq.fill(40)("filler").mkString(" ") + " cat"))
    val qs = Seq("qz" -> "zebra", "qc" -> "cat", "qt" -> "the")
    val got = rows(Bm25.bm25(docs.toDF("doc_id", "text"), "doc_id", "text",
      qs, k = 4))
    assert(got == ref(docs, qs, 4).sortBy(t => (t._1, t._2)))
    val byQ = got.groupBy(_._1)
    // zebra: only doc 3 matches
    assert(byQ("qz").map(_._3) == Seq(3L))
    // cat: short doc 1 outranks long doc 4 (same tf, dl-normalized)
    assert(byQ("qc").map(_._3) == Seq(1L, 4L))
    // the: everywhere → idf 0-ish but all four docs returned, short first
    assert(byQ("qt").size == 4)
    assert(byQ("qt").map(_._4).forall(_ >= 0L))
  }

  test("bm25 == plain-collections replication over sf0.001 documents") {
    val d = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val docs = d.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val qs = Seq("q_join" -> "fast hash join",
      "q_stream" -> "stream window batch agg",
      "q_sort" -> "customer query sort order table")
    val got = rows(Bm25.bm25(d, "doc_id", "text", qs, k = 10))
    assert(got.size == 30)
    assert(got == ref(docs, qs, 10).sortBy(t => (t._1, t._2)))
  }

  test("scoring plan: corpus side never shuffle-joins (broadcasts only)") {
    val d = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val (post, dict, stats) = Bm25.index(d, "doc_id", "text")
    val scored = Bm25.scoreIndexed(post, dict, stats,
      Seq("qa" -> "fast hash join"), k = 10)
    scored.collect() // finalize AQE so the executed plan is the real one
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"scoring must broadcast-join, never shuffle the postings: $plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
  }

  test("incremental merge law: split-index union scores == index-at-once") {
    val s = spark
    import s.implicits._
    val docs = (1L to 40L).map(i =>
      (i, s"term${i % 7} term${i % 5} common " + ("pad " * (i % 4).toInt)))
    val d = docs.toDF("doc_id", "text")
    val (p1, d1, s1) = Bm25.index(d.filter(col("doc_id") <= 20), "doc_id", "text")
    val (p2, d2, s2) = Bm25.index(d.filter(col("doc_id") > 20), "doc_id", "text")
    val qs = Seq("q" -> "term1 common")
    val merged = rows(Bm25.scoreIndexed(p1.unionByName(p2),
      d1.unionByName(d2), s1.unionByName(s2), qs, k = 15))
    val once = rows(Bm25.bm25(d, "doc_id", "text", qs, k = 15))
    assert(merged == once)
  }
}
