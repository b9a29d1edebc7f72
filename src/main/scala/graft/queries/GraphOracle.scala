package graft.queries

/** Generated DuckDB oracle SQL for the graph family (ops/PageRank.scala):
  * the Lloyd-replay trick applied to power iteration — each PageRank step
  * is unrolled as its own CTE running the identical integer fixed-point
  * map, so the final ranks hash-match Spark bit for bit.
  */
object GraphOracle {

  /** PageRank over the DISTINCT edge set produced by `edgesSql` (must
    * yield columns src, dst; nulls and self-loops are dropped here, the
    * operator's own normalization). `seedPred` is a SQL predicate over
    * node id `v` selecting the personalization seed set; absent = plain
    * PageRank (teleport everywhere).
    */
  def pageRank(edgesSql: String, iters: Int, fpShift: Int = 20,
               dampNum: Int = 85, dampDen: Int = 100,
               seedPred: Option[String] = None,
               weighted: Boolean = false): String = {
    val fp = 1L << fpShift
    val dFp = dampNum.toLong * fp / dampDen
    val omd = fp - dFp
    val tp = seedPred.fold("1")(p => s"CASE WHEN $p THEN 1 ELSE 0 END")
    // unweighted = the exact special case w ≡ 1 over the distinct edge
    // set; the iteration formula below is shared (sw is then out-degree).
    val eCte =
      if (weighted)
        """e AS (SELECT src, dst, sum(w)::BIGINT w FROM e0
          |  WHERE src IS NOT NULL AND dst IS NOT NULL AND w > 0
          |  GROUP BY 1, 2)""".stripMargin
      else
        """e AS (SELECT src, dst, 1::BIGINT w FROM (
          |  SELECT DISTINCT src, dst FROM e0
          |  WHERE src IS NOT NULL AND dst IS NOT NULL))""".stripMargin
    val iterCtes = (1 to iters).map { t =>
      s"""r$t AS (SELECT n.v,
         |    (n.tp * $omd + ($dFp * coalesce(s.acc, 0)) // $fp)::BIGINT r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst v2, sum((r.r * e.w) // od.sw)::BIGINT acc
         |    FROM r${t - 1} r JOIN e ON e.src = r.v JOIN od ON od.src = r.v
         |    GROUP BY 1) s ON s.v2 = n.v)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS ($edgesSql),
       |$eCte,
       |od AS (SELECT src, sum(w)::BIGINT sw FROM e GROUP BY 1),
       |nodes AS (SELECT v, ($tp)::BIGINT tp FROM
       |  (SELECT src v FROM e UNION SELECT dst FROM e)),
       |r0 AS (SELECT v, tp, (tp * $fp)::BIGINT r FROM nodes),
       |$iterCtes
       |SELECT v, r AS rank_fp FROM r$iters""".stripMargin
  }

  /** Clamped majority-vote label propagation (ops/LabelProp.scala),
    * unrolled like [[pageRank]]: per iteration, count in-neighbor labels,
    * pick argmax by (count DESC, label ASC), clamp seeds, keep the
    * previous label when no neighbor is labeled.
    *
    * @param prelude extra CTEs the nodes/edges SQL may reference
    * @param nodesSql yields (v, seed_lbl) — null seed_lbl = unlabeled
    * @param edgesSql yields (src, dst) — src's label flows to dst
    * @param finalSql builds the final SELECT from the last CTE's name,
    *   which exposes (v, lbl)
    */
  def labelProp(prelude: String, nodesSql: String, edgesSql: String,
                iters: Int, finalSql: String => String): String = {
    val iterCtes = (1 to iters).map { t =>
      s"""c$t AS (SELECT e.dst, l.lbl nlbl, count(*)::BIGINT c
         |  FROM e JOIN l${t - 1} l ON l.v = e.src
         |  WHERE l.lbl IS NOT NULL GROUP BY 1, 2),
         |b$t AS (SELECT dst, nlbl FROM (
         |    SELECT dst, nlbl, row_number() OVER (PARTITION BY dst
         |      ORDER BY c DESC, nlbl ASC) r FROM c$t) WHERE r = 1),
         |l$t AS (SELECT n.v, n.seed_lbl,
         |    CASE WHEN n.seed_lbl IS NOT NULL THEN n.seed_lbl
         |         WHEN b.nlbl IS NOT NULL THEN b.nlbl
         |         ELSE p.lbl END lbl
         |  FROM nodes n LEFT JOIN b$t b ON b.dst = n.v
         |    LEFT JOIN l${t - 1} p ON p.v = n.v)""".stripMargin
    }.mkString(",\n")
    s"""WITH $prelude,
       |nodes AS ($nodesSql),
       |e AS (SELECT DISTINCT src, dst FROM ($edgesSql)
       |  WHERE src IS NOT NULL AND dst IS NOT NULL),
       |l0 AS (SELECT v, seed_lbl, seed_lbl lbl FROM nodes),
       |$iterCtes
       |${finalSql(s"l$iters")}""".stripMargin
  }

  /** Deterministic random walks (ops/RandomWalks.scala): one CTE per
    * step, each moving every live walk to out-neighbor index
    * md5_60(walk_id ‖ '|' ‖ t) mod outdeg — the identical md5 arithmetic
    * Spark computes via conv(substring(md5(...),1,15),16,10).
    *
    * @param startsPred SQL predicate over node id `v` selecting seeds
    */
  def randomWalks(edgesSql: String, startsPred: String,
                  steps: Int): String = {
    def h(t: Int): String =
      s"('0x'||substr(md5(CAST(p.walk_id AS VARCHAR)||'|$t'),1,15))::BIGINT"
    val stepCtes = (1 to steps).map { t =>
      s"""w$t AS (SELECT p.walk_id, n.dst node
         |  FROM w${t - 1} p JOIN nbr n ON n.src = p.node
         |    AND n.idx = ${h(t)} % n.deg)""".stripMargin
    }.mkString(",\n")
    val unions = (0 to steps)
      .map(t => s"SELECT walk_id, $t::BIGINT step, node FROM w$t")
      .mkString("\nUNION ALL\n")
    s"""WITH e0 AS ($edgesSql),
       |e AS (SELECT DISTINCT src, dst FROM e0
       |  WHERE src IS NOT NULL AND dst IS NOT NULL),
       |deg AS (SELECT src, count(*)::BIGINT deg FROM e GROUP BY 1),
       |nbr AS (SELECT e.src, e.dst,
       |    row_number() OVER (PARTITION BY e.src ORDER BY e.dst) - 1 idx,
       |    d.deg
       |  FROM e JOIN deg d ON d.src = e.src),
       |w0 AS (SELECT v walk_id, v node FROM
       |  (SELECT DISTINCT src v FROM e UNION SELECT dst FROM e)
       |  WHERE $startsPred),
       |$stepCtes
       |$unions""".stripMargin
  }

  /** Deterministic node2vec walks (ops/RandomWalks.scala#node2vecWalks):
    * step 1 replays the uniform first-order draw, and each step t ≥ 2
    * replays the biased second-order pick — integer weights
    * {dst = prev: q, edge prev→dst exists: p·q, else: p} (α ∈ {1/p, 1,
    * 1/q} scaled by p·q), cumulative sum in dst-index order, and the
    * md5_60(walk_id ‖ '|' ‖ t) mod Σweights draw landing in the unique
    * [cum−bias, cum) window — the identical arithmetic Spark runs.
    */
  def node2vecWalks(edgesSql: String, startsPred: String, steps: Int,
                    p: Int, q: Int): String = {
    def h(t: Int, a: String): String =
      s"('0x'||substr(md5(CAST($a.walk_id AS VARCHAR)||'|$t'),1,15))::BIGINT"
    val stepCtes = (2 to steps).map { t =>
      s"""c$t AS (SELECT w.walk_id, w.prev, w.node, n.idx, n.dst,
         |    (CASE WHEN n.dst = w.prev THEN $q
         |          WHEN m.src IS NOT NULL THEN ${p * q}
         |          ELSE $p END)::BIGINT bias
         |  FROM w${t - 1} w JOIN nbr n ON n.src = w.node
         |  LEFT JOIN e m ON m.src = w.prev AND m.dst = n.dst),
         |s$t AS (SELECT *,
         |    sum(bias) OVER (PARTITION BY walk_id ORDER BY idx) cum,
         |    sum(bias) OVER (PARTITION BY walk_id) tot FROM c$t),
         |w$t AS (SELECT s.walk_id, s.node prev, s.dst node FROM s$t s
         |  WHERE ${h(t, "s")} % s.tot >= s.cum - s.bias
         |    AND ${h(t, "s")} % s.tot < s.cum)""".stripMargin
    }.mkString(",\n")
    val unions = (Seq(s"SELECT walk_id, 0::BIGINT step, node FROM w0") ++
      (1 to steps).map(t =>
        s"SELECT walk_id, $t::BIGINT step, node FROM w$t"))
      .mkString("\nUNION ALL\n")
    s"""WITH e0 AS ($edgesSql),
       |e AS (SELECT DISTINCT src, dst FROM e0
       |  WHERE src IS NOT NULL AND dst IS NOT NULL),
       |deg AS (SELECT src, count(*)::BIGINT deg FROM e GROUP BY 1),
       |nbr AS (SELECT e.src, e.dst,
       |    row_number() OVER (PARTITION BY e.src ORDER BY e.dst) - 1 idx,
       |    d.deg
       |  FROM e JOIN deg d ON d.src = e.src),
       |w0 AS (SELECT v walk_id, v node FROM
       |  (SELECT DISTINCT src v FROM e UNION SELECT dst FROM e)
       |  WHERE $startsPred),
       |w1 AS (SELECT p.walk_id, p.node prev, n.dst node
       |  FROM w0 p JOIN nbr n ON n.src = p.node
       |    AND n.idx = ${h(1, "p")} % n.deg),
       |$stepCtes
       |$unions""".stripMargin
  }

  /** The co-purchase item graph both gr_ queries run on: symmetric
    * co-occurrence — two distinct parts in the same order are linked both
    * ways. Pure set semantics (no row order anywhere), because the
    * synthetic lineitem duplicates l_linenumber within orders, so any
    * sequence-based edge rule would be non-deterministic.
    */
  val CoPurchaseEdges: String = coPurchaseEdges(weighted = false)

  /** Same pairs with w = 1 per shared order, so the weighted aggregate
    * counts how many orders link the pair.
    */
  def coPurchaseEdges(weighted: Boolean): String = {
    val w = if (weighted) ", 1 w" else ""
    s"""SELECT a.l_partkey src, b.l_partkey dst$w
       |FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
       |JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
       |  USING (l_orderkey)
       |WHERE a.l_partkey != b.l_partkey""".stripMargin
  }
}
