package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expr.Md5Hash60
import graft.ops.RandomWalks
import TestSpark.spark

/** Deterministic random walks. The driver's oracle (gr_walks) pins
  * Spark↔DuckDB; this spec is the plain-collections third replication
  * plus the termination and determinism laws.
  */
class RandomWalksSpec extends AnyFunSuite {
  import spark.implicits._

  private def ref(edges: Seq[(Long, Long)], starts: Seq[Long],
                  steps: Int): Seq[(Long, Long, Long)] = {
    val nbr = edges.distinct.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    starts.distinct.sorted.flatMap { w =>
      var node = w
      var alive = true
      (w, 0L, node) +: (1 to steps).flatMap { t =>
        if (!alive) None
        else nbr.get(node) match {
          case None => alive = false; None
          case Some(ns) =>
            val h = Md5Hash60.of(s"$w|$t".getBytes("UTF-8"))
            node = ns((h % ns.size).toInt)
            Some((w, t.toLong, node))
        }
      }
    }
  }

  // a cycle, a branch, and a dangling sink (4)
  private val edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (3L, 5L), (5L, 1L),
    (1L, 3L), (1L, 2L)) // duplicate edge collapses

  private def run(starts: Seq[Long], steps: Int) =
    RandomWalks.walks(edges.toDF("src", "dst"), "src", "dst",
        starts.toDF("v"), steps)
      .as[(Long, Long, Long)].collect().toSeq.sorted

  test("walks replay the plain-collections md5-draw model") {
    for (steps <- Seq(1, 6)) {
      assert(run(Seq(1L, 2L, 4L), steps) ==
        ref(edges, Seq(1L, 2L, 4L), steps).sorted, s"steps=$steps")
    }
  }

  test("laws: dangling termination, per-walk independence, idempotence") {
    val out = run(Seq(1L, 2L, 4L), 6)
    // a walk starting AT the dangling node emits only step 0
    assert(out.filter(_._1 == 4L) == Seq((4L, 0L, 4L)))
    // walks are pure functions of (walk_id, t): re-running is identical
    assert(out == run(Seq(1L, 2L, 4L), 6))
    // and dropping a start does not perturb the others' draws
    val solo = run(Seq(1L), 6)
    assert(out.filter(_._1 == 1L) == solo)
  }

  /** Plain-collections node2vec replication: second-order biased pick
    * via the integer cumulative-weight windows.
    */
  private def refN2v(edges: Seq[(Long, Long)], starts: Seq[Long],
                     steps: Int, p: Int, q: Int): Seq[(Long, Long, Long)] = {
    val eset = edges.distinct.toSet
    val nbr = edges.distinct.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    starts.distinct.sorted.flatMap { w =>
      var prev = -1L
      var node = w
      var alive = true
      (w, 0L, node) +: (1 to steps).flatMap { t =>
        if (!alive) None
        else nbr.get(node) match {
          case None => alive = false; None
          case Some(ns) =>
            val h = Md5Hash60.of(s"$w|$t".getBytes("UTF-8"))
            val nxt =
              if (t == 1) ns((h % ns.size).toInt)
              else {
                val biases = ns.map(x =>
                  if (x == prev) q.toLong
                  else if (eset((prev, x))) p.toLong * q
                  else p.toLong)
                val r = h % biases.sum
                var cum = 0L
                var pick = -1
                biases.indices.foreach { i =>
                  if (pick < 0) { cum += biases(i); if (r < cum) pick = i }
                }
                ns(pick)
              }
            prev = node
            node = nxt
            Some((w, t.toLong, node))
        }
      }
    }
  }

  // the base fixture plus a 2→1 back-edge so the RETURN lane (dst ==
  // prev in the neighbor list) is genuinely reachable
  private val n2vEdges = edges :+ (2L, 1L)

  private def runN2v(starts: Seq[Long], steps: Int, p: Int, q: Int) =
    RandomWalks.node2vecWalks(n2vEdges.toDF("src", "dst"), "src", "dst",
        starts.toDF("v"), steps, p, q)
      .as[(Long, Long, Long)].collect().toSeq.sorted

  test("node2vecWalks replay the plain-collections second-order model") {
    for ((steps, p, q) <- Seq((1, 4, 2), (6, 4, 2), (6, 3, 1), (6, 1, 5))) {
      assert(runN2v(Seq(1L, 2L, 4L), steps, p, q) ==
        refN2v(n2vEdges, Seq(1L, 2L, 4L), steps, p, q).sorted,
        s"steps=$steps p=$p q=$q")
    }
  }

  test("node2vec law: p = q = 1 collapses to the first-order walk") {
    // all biases equal 1, so cum = idx+1, tot = deg and the cumulative
    // window pick degenerates to idx = draw mod deg — bit for bit the
    // uniform DeepWalk draw
    val uniform = RandomWalks.walks(n2vEdges.toDF("src", "dst"), "src",
        "dst", Seq(1L, 2L, 4L).toDF("v"), 6)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(runN2v(Seq(1L, 2L, 4L), 6, 1, 1) == uniform)
  }

  test("node2vec laws: dangling termination, independence, contract") {
    val out = runN2v(Seq(1L, 2L, 4L), 6, 4, 2)
    assert(out.filter(_._1 == 4L) == Seq((4L, 0L, 4L)))
    assert(out == runN2v(Seq(1L, 2L, 4L), 6, 4, 2))
    assert(out.filter(_._1 == 2L) == runN2v(Seq(2L), 6, 4, 2))
    intercept[IllegalArgumentException] {
      RandomWalks.node2vecWalks(n2vEdges.toDF("src", "dst"), "src", "dst",
        Seq(1L).toDF("v"), 6, 0, 2)
    }
    intercept[IllegalArgumentException] {
      RandomWalks.node2vecWalks(n2vEdges.toDF("src", "dst"), "src", "dst",
        Seq(1L).toDF("v"), 129, 1, 1)
    }
  }

  test("contract: step bound validated") {
    intercept[IllegalArgumentException] {
      RandomWalks.walks(edges.toDF("src", "dst"), "src", "dst",
        Seq(1L).toDF("v"), 0)
    }
    intercept[IllegalArgumentException] {
      RandomWalks.skipGramPairs(
        Seq((1L, 0L, 1L)).toDF("walk_id", "step", "node"), 0)
    }
  }

  test("skipGramPairs replay the plain-collections window model") {
    val corpus = run(Seq(1L, 2L), 6).map { case (w, s, n) => (w, s, n) }
    val got = RandomWalks.skipGramPairs(
        corpus.toDF("walk_id", "step", "node"), window = 2)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val expect = corpus.groupBy(_._1).values.flatMap { walk =>
      for {
        (_, sc, c) <- walk
        (_, sx, x) <- walk
        if sx != sc && math.abs(sx - sc) <= 2
      } yield (c, x)
    }.groupBy(identity).map { case ((c, x), v) => (c, x, v.size.toLong) }
      .toSeq.sorted
    assert(got == expect)
    // symmetry law: skip-gram windows are symmetric in (center, context)
    val m = got.map { case (c, x, n) => (c, x) -> n }.toMap
    got.foreach { case (c, x, n) => assert(m((x, c)) == n) }
  }

  test("negativeDraws: integer 4th-root weights and the min-hash draw") {
    // ⌊freq^(3/4)⌋ spot values incl. the exact-power boundary 16 (=2^4,
    // where float pow could flip between 7.999... and 8) and the cap
    val pairs = Seq(
      (101L, 1L, 1L),   // freq 1  -> w 1
      (102L, 2L, 2L),   // freq 2  -> w 1   (2^3=8 < 2^4=16)
      (103L, 3L, 5L),   // freq 5  -> w 3   (3^4=81 <= 125 < 4^4=256)
      (104L, 4L, 16L),  // freq 16 -> w 8   (8^4 = 16^3 = 4096 exactly)
      (105L, 5L, 255L), // freq 255 -> w 63 (63^4 <= 255^3 < 64^4)
      (106L, 6L, 300L), // freq 300 -> w 64 (cap short-circuit)
      (107L, 6L, 100L)) // same context as ^: freqs SUM (300+100=400)
      .toDF("center", "context", "n")
    val got = RandomWalks.negativeDraws(pairs, "t1", nDraws = 4)
      .as[(Long, Long, Long)].collect().toSeq
    val wOf = got.map { case (node, _, w) => node -> w }.toMap
    val fOf = got.map { case (node, f, _) => node -> f }.toMap
    // replicate the draw in plain Scala: min over w md5 draws per node
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expectW = Map(1L -> 1L, 2L -> 1L, 5L -> 3L, 16L -> 8L,
      255L -> 63L, 400L -> 64L)
    val freqs = Map(1L -> 1L, 2L -> 2L, 3L -> 5L, 4L -> 16L, 5L -> 255L,
      6L -> 400L)
    val ranked = freqs.toSeq.map { case (node, f) =>
      val w = expectW(f)
      val rk = (1L to w).map(j => md5hex(s"t1$node-$j")).min
      (rk, node, f, w)
    }.sorted.take(4)
    assert(got.toSet ==
      ranked.map { case (_, node, f, w) => (node, f, w) }.toSet)
    got.foreach { case (node, f, w) =>
      assert(f == freqs(node) && w == expectW(f),
        s"node $node: freq $f w $w")
    }
    val _ = (wOf, fOf)
  }
}
