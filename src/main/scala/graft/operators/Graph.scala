package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative graph computation — PageRank over an edge list. Complements
  * Dedup.nearDupComponents (min-label propagation): components answer
  * "which rows are the same thing", PageRank answers "which nodes matter",
  * e.g. weighting crawl domains or ranking near-dup cluster exemplars.
  *
  * 100 TB design: each iteration is ONE equi-join (rank onto the edge list,
  * which carries its out-degree) plus ONE groupBy(dst) — both shuffle on
  * the node key, so a k-iteration run is 2k key-partitioned stages with no
  * driver-side state and no global sort. Ranks are lineage-TRUNCATED per
  * iteration via localCheckpoint: a persist alone keeps the full plan tree
  * growing linearly per round, and every later round (and every downstream
  * consumer) re-analyzes that whole tree on the driver — measured ~4 s of
  * pure planning per action behind the x29 chain at sf0.1. The checkpoint
  * swaps in a flat LogicalRDD leaf (non-reliable: executor loss forces a
  * recompute; long-lived cluster jobs should use reliable checkpoint() on
  * a shared dir). Contributions are quantized to DECIMAL before the sum —
  * double summation order differs under partial aggregation, and exact
  * decimal sums make the result independent of shuffle order (and
  * bit-reproducible across engines).
  *
  * Determinism notes: the per-iteration re-quantization uses
  * floor(x·1e10 + 0.5)/1e10, NOT round(x, 10) — round() tie-break
  * semantics differ across engines on boundary values, floor of the same
  * IEEE ops cannot. A fixed iteration count (default 3) rather than a
  * convergence test keeps the plan static and replayable.
  *
  * Cache lifetime (deliberate): the `persist()`ed edge/seed frames back
  * every iteration of a lazy result, so the operators cannot unpersist
  * them before the caller acts on the frame. They stay cached until
  * Spark's LRU evicts them; a long-lived service should scope jobs in
  * [[Caches.withCaches]] (unpersists exactly the caches the job created)
  * or `spark.catalog.clearCache()` between unrelated jobs.
  */
object Graph {

  /** Re-quantize a score onto the exact 1e-10 grid:
    * floor(x·1e10 + 0.5)/1e10, NOT round(x, 10) — round() tie-break
    * semantics differ across engines on boundary values, floor of the
    * same IEEE ops cannot. Every iterate of the rank family lives on
    * this grid (see the object scaladoc). */
  private def quant10(c: Column): Column =
    floor(c * lit(1e10) + lit(0.5)) / lit(1e10)

  /** THE iteration scaffold of the rank family ([[pageRank]],
    * [[labelPropagation]], [[personalizedPageRank]], [[katzCentrality]],
    * [[connectedComponentsDoubling]], [[kCorePeel]] — [[hits]] keeps its
    * own loop because its state is an alternating hub/authority PAIR):
    * run `step` `iters` times from `init`, lineage-TRUNCATING every
    * iterate via [[Checkpoints.truncate]] (persist alone keeps the full
    * plan tree growing linearly per round, and every later round — and
    * every downstream consumer — re-analyzes that whole tree on the
    * driver: measured ~4 s of pure planning per action behind the x29
    * chain at sf0.1). Returns ALL iterates, `init` first, because the
    * per-iteration residual/convergence reports consume the whole
    * trajectory; single-answer callers take `.last`. */
  private def iterate(init: DataFrame, iters: Int,
      checkpointDir: Option[String])(
      step: DataFrame => DataFrame): Seq[DataFrame] = {
    val frames = Seq.newBuilder[DataFrame]
    var cur = init
    frames += cur
    for (_ <- 1 to iters) {
      cur = Checkpoints.truncate(step(cur), checkpointDir)
      frames += cur
    }
    frames.result()
  }

  /** Undirected PageRank: `edges` are (src, dst) pairs; the graph is
    * symmetrized and deduplicated, so every node has out-degree ≥ 1 (no
    * dangling-mass correction needed). Returns (node, rank) after `iters`
    * damped iterations from the uniform start. Pass `checkpointDir` (a
    * shared dir on a real cluster) for reliable per-iteration state — see
    * [[Checkpoints.truncate]]; results are bit-identical either way. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, damping: Double = 0.85,
      checkpointDir: Option[String] = None): DataFrame =
    pageRankFrames(edges, srcCol, dstCol, iters, damping, checkpointDir)
      .last.select("node", "rank")

  /** Per-iteration L1 convergence residuals for [[pageRank]] — the
    * evidence for choosing `iters`: one row per iteration with
    * `l1_e10` = Σ_v |rank_k(v) − rank_{k−1}(v)| in exact 1e-10 rank
    * quanta (a BIGINT — ranks live on the 1e-10 grid by construction, so
    * the residual is an exact integer any engine reproduces bit-for-bit;
    * divide by 1e10 for the usual ‖·‖₁). A fixed-iteration run is a
    * replayable approximation of the fixed point; this query makes the
    * distance from it observable instead of an article of faith. The node
    * sets of consecutive iterations coincide (the symmetrized graph has no
    * rank sinks), so the inner join drops nothing. */
  def pageRankResiduals(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, damping: Double = 0.85,
      checkpointDir: Option[String] = None): DataFrame = {
    val frames = pageRankFrames(edges, srcCol, dstCol, iters, damping,
      checkpointDir)
    l1Residuals(frames.map(_.select("node", "rank")))
  }

  /** rank_0 … rank_iters as (node, rank, n_nodes) frames; rank_0 persists,
    * every iteration truncates lineage (see [[Checkpoints.truncate]]). */
  private def pageRankFrames(edges: DataFrame, srcCol: String,
      dstCol: String, iters: Int, damping: Double,
      checkpointDir: Option[String]): Seq[DataFrame] = {
    require(iters >= 1 && iters <= 20, s"iters=$iters out of [1,20]")
    val fwd = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"))
    val und = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    // edge list with out-degree attached, reused every iteration — and
    // HASH-PARTITIONED ON THE ITERATION JOIN KEY before the persist
    // (guide §2.4: the cached partitioning satisfies every iteration's
    // join requirement, so only the small rank frame shuffles per round;
    // unpartitioned, the full edge frame re-shuffled EVERY iteration —
    // the dominant measured stage at sf0.1. repartition with no explicit
    // count rides spark.sql.shuffle.partitions: scale-adaptive, never a
    // local[32] constant)
    val edgesDeg = und.join(deg, "src").repartition(col("src")).persist()
    // node count as a broadcast 1-row frame (no driver-side action)
    val nNodes = deg.agg(count(lit(1)).cast("double").as("n_nodes"))
    val rank0 = deg.select(col("src").as("node"))
      .crossJoin(broadcast(nNodes))
      .select(col("node"), quant10(lit(1.0) / col("n_nodes")).as("rank"),
        col("n_nodes"))
      .persist()
    iterate(rank0, iters, checkpointDir) { rank =>
      edgesDeg
        .join(rank, col("src") === col("node"))
        .select(col("dst"),
          (col("rank") / col("deg")).cast("decimal(28,14)").as("contrib"),
          col("n_nodes"))
        .groupBy("dst")
        .agg(quant10(lit(1.0 - damping) / first(col("n_nodes")) +
          lit(damping) * sum(col("contrib")).cast("double")).as("rank"),
          first(col("n_nodes")).as("n_nodes"))
        .select(col("dst").as("node"), col("rank"), col("n_nodes"))
    }
  }

  /** (iter, l1_e10) rows from consecutive (node, <score>) frames: the sum
    * of per-node |Δ| in exact 1e-10 quanta. Shared by the rank-family
    * residual reports; scores must live on the 1e-10 grid. */
  private def l1Residuals(frames: Seq[DataFrame]): DataFrame = {
    val scoreCol = frames.head.columns(1)
    frames.sliding(2).zipWithIndex.map {
      case (Seq(prev, next), i) =>
        next.select(col("node"), col(scoreCol).as("__cur"))
          .join(prev.select(col("node"), col(scoreCol).as("__prev")), "node")
          .agg(sum(floor(abs(col("__cur") - col("__prev")) * lit(1e10) +
            lit(0.5)).cast("long")).as("l1_e10"))
          .select(lit(i + 1).as("iter"), col("l1_e10"))
      case _ => sys.error("unreachable: sliding(2) on >= 2 frames")
    }.reduce(_ unionByName _)
  }

  /** Per-node triangle counts — the clustering/community signal (dense
    * near-dup clusters, coordinated-behavior detection). Edges are
    * canonicalized to (a < b) and deduplicated; each triangle a<b<c is
    * found exactly once by the two-hop equi-join e(a,b) ⋈ e(b,c) ⋈ e(a,c),
    * then credited to all three corners.
    *
    * 100 TB design: three hash equi-joins on node keys — no nested loop;
    * the canonical edge frame is persisted and reused by all three join
    * legs. The classic caveat applies: a hub node of degree d contributes
    * O(d²) two-hop candidates — cap degrees upstream (the same move as
    * LSH's maxBucket) when the graph has hubs. */
  /** Synchronous label propagation — community detection between
    * [[pageRank]] (importance) and Dedup.nearDupComponents (connectivity):
    * every node starts labeled with itself; each iteration it adopts the
    * label MOST FREQUENT among its neighbors, ties broken by the smallest
    * label. Unlike classic randomized LPA this update is a total order
    * (count desc, label asc), so the result is deterministic and an
    * external engine can replay it iteration by iteration.
    *
    * 100 TB design: per iteration ONE equi-join (labels onto the
    * symmetrized edge list) + ONE groupBy(dst, label) + ONE argmax
    * aggregate — all shuffles on node keys, no driver state; labels are
    * lineage-truncated per iteration (localCheckpoint, see [[pageRank]] —
    * persist alone leaves a growing plan tree that the driver re-analyzes
    * every round).
    * The argmax is `max(struct(cnt, -label))`, a plain hash aggregate —
    * no per-node window/sort. Labels must be numeric (node ids). */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, checkpointDir: Option[String] = None): DataFrame =
    labelPropagationFrames(edges, srcCol, dstCol, iters, checkpointDir)
      .last.select(col("node"), col("lab").as("community"))

  /** Per-iteration convergence report for [[labelPropagation]]: one row
    * per iteration with `n_changed` = how many nodes adopted a different
    * label that round — exact integers, zero means the fixed point was
    * reached a round earlier. The deterministic argmax update makes the
    * whole trajectory (and so this count) engine-replayable. */
  def labelPropagationConvergence(edges: DataFrame, srcCol: String,
      dstCol: String, iters: Int = 3,
      checkpointDir: Option[String] = None): DataFrame = {
    val frames =
      labelPropagationFrames(edges, srcCol, dstCol, iters, checkpointDir)
    frames.sliding(2).zipWithIndex.map {
      case (Seq(prev, next), i) =>
        next.join(prev.select(col("node"), col("lab").as("__prev")), "node")
          .agg(sum(when(col("lab") =!= col("__prev"), lit(1L))
            .otherwise(lit(0L))).as("n_changed"))
          .select(lit(i + 1).as("iter"), col("n_changed"))
      case _ => sys.error("unreachable: sliding(2) on >= 2 frames")
    }.reduce(_ unionByName _)
  }

  /** The full LPA trajectory (labels_0 … labels_iters) — `private[graft]`
    * so callers comparing DIFFERENT iteration counts of the SAME graph
    * (x206's ARI stability) can run the chain once and index into it:
    * the update is deterministic, so `labelPropagation(…, k)` IS
    * `frames(k)` of any longer run (r15 — two separate runs rebuilt the
    * symmetrized edge frame and re-ran the shared iteration prefix). */
  private[graft] def labelPropagationFrames(edges: DataFrame, srcCol: String,
      dstCol: String, iters: Int,
      checkpointDir: Option[String]): Seq[DataFrame] = {
    require(iters >= 1 && iters <= 20, s"iters=$iters out of [1,20]")
    val fwd = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // iteration-join-keyed cache partitioning — see pageRankFrames
    val und = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().repartition(col("src")).persist()
    val labels0 = Checkpoints.truncate(
      und.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("lab")), checkpointDir)
    iterate(labels0, iters, checkpointDir) { labels =>
      und
        .join(labels, col("src") === col("node"))
        .groupBy(col("dst"), col("lab"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst"))
        .agg(max(struct(col("cnt"), (-col("lab")).as("nl"))).as("best"))
        .select(col("dst").as("node"), (-col("best.nl")).as("lab"))
    }
  }

  /** Personalized PageRank — [[pageRank]] with the restart mass pinned to a
    * SEED set instead of spread uniformly: ranks measure influence *as
    * seen from the seeds* (recommendation, related-entity expansion,
    * taint/contamination spread from known-bad nodes). Identical decimal
    * quantization discipline to pageRank: contributions sum as
    * DECIMAL(28,14), every rank is floor-requantized to 1e-10, so each
    * iteration's fixed point replays bit-exactly. Seeds ride in as a
    * broadcast indicator; the restart term (1−d)/|S| touches only seed
    * rows. */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, iters: Int = 2,
      damping: Double = 0.85,
      checkpointDir: Option[String] = None): DataFrame =
    personalizedPageRankFrames(edges, srcCol, dstCol, seeds, seedCol, iters,
      damping, checkpointDir).last.select(col("node"), col("rank"))

  /** Per-iteration L1 residuals for [[personalizedPageRank]] — same
    * exact-integer `l1_e10` contract as [[pageRankResiduals]]. */
  def personalizedPageRankResiduals(edges: DataFrame, srcCol: String,
      dstCol: String, seeds: DataFrame, seedCol: String, iters: Int = 2,
      damping: Double = 0.85,
      checkpointDir: Option[String] = None): DataFrame =
    l1Residuals(personalizedPageRankFrames(edges, srcCol, dstCol, seeds,
      seedCol, iters, damping, checkpointDir).map(_.select("node", "rank")))

  private def personalizedPageRankFrames(edges: DataFrame, srcCol: String,
      dstCol: String, seeds: DataFrame, seedCol: String, iters: Int,
      damping: Double, checkpointDir: Option[String]): Seq[DataFrame] = {
    require(iters >= 1 && iters <= 20, s"iters=$iters out of [1,20]")
    val fwd = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"))
    val und = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    // iteration-join-keyed cache partitioning — see pageRankFrames
    val edgesDeg = und.join(deg, "src").repartition(col("src")).persist()
    // restart mass is split over |S|, so S must be the seeds PRESENT in
    // the graph: a seed absent from the edge list gets no rank row and its
    // (1-d)/|S| share would silently vanish (ranks no longer sum to 1).
    // The semi-join also makes an all-absent seed set a clear error
    // instead of 1/0 = Infinity ranks.
    val seedSet = seeds.select(col(seedCol).cast("string").as("node"))
      .distinct()
      .join(deg.select("src").withColumnRenamed("src", "node"), Seq("node"),
        "left_semi")
      .persist()
    require(!seedSet.isEmpty,
      "personalizedPageRank: no seed node is present in the edge list")
    val nSeeds = seedSet.agg(count(lit(1)).cast("double").as("n_seeds"))
    val seedMark = seedSet.select(col("node").as("__sn"), lit(1).as("__is"))
    // e(v): (1-d)/|S| on seeds, 0 elsewhere — the personalization vector
    def restart(nodeCol: Column): Column =
      when(col("__is").isNotNull,
        lit(1.0 - damping) / col("n_seeds")).otherwise(lit(0.0))
    val rank0 = deg.select(col("src").as("node"))
      .join(broadcast(seedMark), col("node") === col("__sn"), "left")
      .crossJoin(broadcast(nSeeds))
      .select(col("node"),
        quant10(when(col("__is").isNotNull, lit(1.0) / col("n_seeds"))
          .otherwise(lit(0.0))).as("rank"),
        col("n_seeds"))
      .persist()
    iterate(rank0, iters, checkpointDir) { rank =>
      edgesDeg
        .join(rank, col("src") === col("node"))
        .select(col("dst"),
          (col("rank") / col("deg")).cast("decimal(28,14)").as("contrib"),
          col("n_seeds"))
        .groupBy("dst")
        .agg(sum(col("contrib")).cast("double").as("__c"),
          first(col("n_seeds")).as("n_seeds"))
        .join(broadcast(seedMark), col("dst") === col("__sn"), "left")
        .select(col("dst").as("node"),
          quant10(restart(col("dst")) + lit(damping) * col("__c"))
            .as("rank"),
          col("n_seeds"))
    }
  }

  /** HITS hubs & authorities over a DIRECTED edge list (hub score: "points
    * at good authorities"; authority: "pointed at by good hubs") — the
    * two-sided importance measure PageRank flattens, natural on bipartite
    * graphs (parts→suppliers, queries→documents). Alternating updates
    * with L1 normalization; every sum is a DECIMAL aggregate over
    * floor-quantized scores and each normalization is ONE double division,
    * so the whole trajectory replays bit-exactly. Returns
    * (role='hub'|'authority', node, score). */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 2, checkpointDir: Option[String] = None): DataFrame = {
    val (hubs, auths) =
      hitsFrames(edges, srcCol, dstCol, iters, checkpointDir)
    hubs.last.select(lit("hub").as("role"), col("src").as("node"),
        col("h").as("score"))
      .unionByName(auths.last.select(lit("authority").as("role"),
        col("dst").as("node"), col("a").as("score")))
  }

  /** Per-iteration L1 residuals for [[hits]], per role — the same
    * exact-integer `l1_e10` contract as [[pageRankResiduals]]. Hub rows
    * start at iteration 1 (vs the uniform start); authority rows at
    * iteration 2 (authorities have no iteration-0 state). */
  def hitsResiduals(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 2, s"iters=$iters: residuals need >= 2 iterations")
    val (hubs, auths) =
      hitsFrames(edges, srcCol, dstCol, iters, checkpointDir)
    l1Residuals(hubs.map(_.select(col("src").as("node"), col("h"))))
      .select(lit("hub").as("role"), col("iter"), col("l1_e10"))
      .unionByName(
        l1Residuals(auths.map(_.select(col("dst").as("node"), col("a"))))
          .select(lit("authority").as("role"), (col("iter") + 1).as("iter"),
            col("l1_e10")))
  }

  /** (h_0…h_iters, a_1…a_iters) score frames for [[hits]]. */
  private def hitsFrames(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, checkpointDir: Option[String])
      : (Seq[DataFrame], Seq[DataFrame]) = {
    require(iters >= 1 && iters <= 10, s"iters=$iters out of [1,10]")
    // TWO cached copies of the distinct edge set, each hash-partitioned
    // on its step's join key (see pageRankFrames — the alternating
    // updates join on src for authorities and on dst for hubs, so one
    // partitioning cannot serve both; two pre-shuffles replace 2·iters
    // full edge shuffles)
    val eDistinct = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst")).distinct()
    val eBySrc = eDistinct.repartition(col("src")).persist()
    val eByDst = eDistinct.repartition(col("dst")).persist()
    val dec = (c: Column) => c.cast("decimal(28,14)")
    val nSrc = eBySrc.select("src").distinct()
      .agg(count(lit(1)).cast("double").as("n_src"))
    var hub = Checkpoints.truncate(eBySrc.select("src").distinct()
      .crossJoin(broadcast(nSrc))
      .select(col("src"), quant10(lit(1.0) / col("n_src")).as("h")),
      checkpointDir)
    val hubs = Seq.newBuilder[DataFrame]
    val auths = Seq.newBuilder[DataFrame]
    hubs += hub
    for (_ <- 1 to iters) {
      val aRaw = eBySrc.join(hub, "src")
        .groupBy("dst").agg(sum(dec(col("h"))).as("__raw"))
      val aTot = aRaw.agg(sum(col("__raw")).as("__tot"))
      val auth = Checkpoints.truncate(aRaw.crossJoin(broadcast(aTot))
        .select(col("dst"),
          quant10(col("__raw").cast("double") / col("__tot").cast("double"))
            .as("a")),
        checkpointDir)
      auths += auth
      val hRaw = eByDst.join(auth, "dst")
        .groupBy("src").agg(sum(dec(col("a"))).as("__raw"))
      val hTot = hRaw.agg(sum(col("__raw")).as("__tot"))
      hub = Checkpoints.truncate(hRaw.crossJoin(broadcast(hTot))
        .select(col("src"),
          quant10(col("__raw").cast("double") / col("__tot").cast("double"))
            .as("h")),
        checkpointDir)
      hubs += hub
    }
    (hubs.result(), auths.result())
  }

  /** Degree assortativity — the Pearson correlation of endpoint degrees
    * across edges: positive means hubs link to hubs (social cores),
    * negative means hubs link to leaves (hub-and-spoke; most
    * infrastructure and bipartite-ish graphs). One degree frame joined
    * onto both endpoints of the symmetrized edges, then
    * [[Stats.correlationMatrix]]'s exact-moment closed form. */
  def degreeAssortativity(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(28,6)")
    // null endpoints would survive into the edge count but never join a
    // degree row — drop them up front so n matches the moment sums exactly
    val fwd = edges.select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val und = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    val pairs = und
      .join(deg.select(col("src"), col("deg").as("__dx")), "src")
      .join(deg.select(col("src").as("dst"), col("deg").as("__dy")), "dst")
    val m = pairs.agg(count(lit(1)).cast("double").as("n"),
      sum(dec(col("__dx"))).cast("double").as("sx"),
      sum(dec(col("__dy"))).cast("double").as("sy"),
      sum(dec(col("__dx") * col("__dx"))).cast("double").as("sxx"),
      sum(dec(col("__dy") * col("__dy"))).cast("double").as("syy"),
      sum(dec(col("__dx") * col("__dy"))).cast("double").as("sxy"))
    val denom = sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
      (col("n") * col("syy") - col("sy") * col("sy")))
    m.select(col("n").cast("long").as("n_directed_edges"),
      when(denom === 0.0, lit(null))
        .otherwise(round((col("n") * col("sxy") - col("sx") * col("sy")) /
          denom, 6)).as("assortativity"))
  }

  /** Connected components for GENERAL-diameter graphs in O(log d) rounds —
    * the complement to Dedup.nearDupComponents (which fixes 2 propagation
    * rounds because near-dup clusters are near-cliques). Each round
    * alternates (a) min-label propagation over the symmetrized edges with
    * (b) a POINTER JUMP lab(v) ← lab(lab(v)) — labels always name a node
    * of the same component (propagation picks neighbors' labels, jumping
    * follows a member's label), and the jump doubles the distance
    * information travels, so a chain of length 2^rounds resolves where
    * plain propagation would need 2^rounds iterations.
    *
    * 100 TB design: per round ONE edge equi-join + grouped min (x29's
    * shape) and ONE self-join on the label pointer — all shuffles on node
    * keys, no driver state, lineage truncated per round. `rounds` is
    * data-independent: 5 covers diameter 32, 10 covers 1024. */
  def connectedComponentsDoubling(edges: DataFrame, srcCol: String,
      dstCol: String, rounds: Int = 4,
      checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1 && rounds <= 12, s"rounds=$rounds out of [1,12]")
    val fwd = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // NO iteration-join-keyed cache partitioning here (unlike
    // pageRankFrames): each doubling round is dominated by the pointer-
    // jump SELF-join on the freshly-computed labels, which no stable
    // edge partitioning can serve — the upfront repartition measured
    // 1.17× SLOWER on x151 (r16 A/B) and was reverted
    val und = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    val labels0 = Checkpoints.truncate(
      und.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("lab")), checkpointDir)
    iterate(labels0, rounds, checkpointDir) { labels =>
      // both union branches derive from the same checkpointed `labels`;
      // fresh aliases keep their attribute ids disjoint (Catalyst's union
      // constraint rewrite chokes on shared ids across branches)
      val prop = labels
        .select(col("node").as("node"), col("lab").as("lab"))
        .union(und.join(labels, col("src") === col("node"))
          .select(col("dst").as("node"), col("lab").as("lab")))
        .groupBy("node").agg(min(col("lab")).as("lab"))
      prop.as("a")
        .join(prop.select(col("node").as("__n2"), col("lab").as("__l2")).as("b"),
          col("a.lab") === col("__n2"))
        .select(col("a.node").as("node"), col("__l2").as("lab"))
    }.last.select(col("node"), col("lab").as("component"))
  }

  /** k-core peeling — iteratively drop nodes of degree < k and re-induce
    * the graph: the standard "dense enough to matter" filter (spam rings,
    * coordinated engagement, well-connected near-dup communities survive;
    * tendrils peel away). `rounds` fixed peels are unrolled; each is one
    * grouped degree count + two semi-joins, lineage-truncated — peeling
    * converges when a round removes nothing, and for typical graphs a
    * handful of rounds reaches the fixed point (assert convergence with
    * [[kCorePeel]] twice at different rounds if it matters).
    * Returns surviving (node, degree-in-core). */
  def kCorePeel(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int = 3,
      checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1 && rounds >= 1 && rounds <= 10,
      s"k=$k rounds=$rounds out of range")
    val fwd = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val und0 = Checkpoints.truncate(
      fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
        .distinct(), checkpointDir)
    iterate(und0, rounds, checkpointDir) { und =>
      val keep = und.groupBy("src").agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k).select(col("src").as("__keep"))
      und
        .join(keep, col("src") === col("__keep"), "left_semi")
        .join(keep, col("dst") === col("__keep"), "left_semi")
    }.last.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("core_degree"))
  }

  /** Neighborhood-overlap link prediction on a bipartite graph: for pairs
    * of right-side nodes, the exact Jaccard of their left-side
    * neighborhoods — "suppliers serving the same parts", "users touching
    * the same documents"; high overlap without an existing edge is the
    * classic link/merge candidate. Candidates come ONLY from co-occurrence
    * under a shared left node (one self equi-join keyed on the left id —
    * never all-pairs), so cost is Σ_left d², the triangle-count caveat:
    * cap pathological left-side hubs upstream. Counts are integers; the
    * one division is the reported score. */
  def neighborhoodSimilarity(edges: DataFrame, leftCol: String,
      rightCol: String): DataFrame = {
    val e = edges.select(col(leftCol).cast("string").as("l"),
      col(rightCol).cast("string").as("r")).distinct().persist()
    val deg = e.groupBy("r").agg(count(lit(1)).as("deg"))
    val pairs = e.select(col("l"), col("r").as("r_a"))
      .join(e.select(col("l"), col("r").as("r_b")), "l")
      .filter(col("r_a") < col("r_b"))
      .groupBy("r_a", "r_b").agg(count(lit(1)).as("common"))
    pairs
      .join(broadcast(deg.select(col("r").as("r_a"), col("deg").as("__da"))),
        "r_a")
      .join(broadcast(deg.select(col("r").as("r_b"), col("deg").as("__db"))),
        "r_b")
      .select(col("r_a"), col("r_b"), col("common"),
        round(col("common").cast("double") /
          (col("__da") + col("__db") - col("common")).cast("double"), 6)
          .as("jaccard"))
  }

  /** Katz centrality over the symmetrized graph — [[pageRank]]'s
    * path-counting sibling: x_{t+1}(v) = β + α·Σ_{u∼v} x_t(u), i.e. every
    * walk into v contributes α^length. Unlike PageRank there is no degree
    * normalization, so high-degree hubs adjacent to other hubs dominate —
    * the influence measure link-graph curation uses when edge COUNT, not
    * edge share, is the signal (α must stay below 1/λ_max; the default
    * 0.1 is safe for the bounded-degree graphs here).
    *
    * Same engine-parity discipline as pageRank: scores live on the exact
    * 1e-10 grid after every iteration (floor(x·1e10 + 0.5)/1e10),
    * neighbor contributions are DECIMAL(28,14)-quantized before the
    * order-free sum, and each of the ≤20 iterations is one node-keyed
    * equi-join + hash aggregate with lineage truncated per step. The
    * symmetrized edge set means every node receives ≥1 contribution, so
    * no node drops between iterations. */
  def katzCentrality(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 4, alpha: Double = 0.1, beta: Double = 1.0,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters=$iters out of [1,20]")
    val fwd = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"))
    // iteration-join-keyed cache partitioning — see pageRankFrames
    val und = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().repartition(col("src")).persist()
    val x0 = und.select(col("src").as("node")).distinct()
      .select(col("node"), quant10(lit(beta)).as("katz"))
      .persist()
    iterate(x0, iters, checkpointDir) { x =>
      und
        .join(x, col("src") === col("node"))
        .select(col("dst"), col("katz").cast("decimal(28,14)").as("contrib"))
        .groupBy("dst")
        .agg(quant10(lit(beta) +
          lit(alpha) * sum(col("contrib")).cast("double")).as("katz"))
        .select(col("dst").as("node"), col("katz"))
    }.last
  }

  /** Local clustering coefficient per node — "how much of my
    * neighborhood is itself connected": cc(v) = 2·tri(v) /
    * (deg(v)·(deg(v)−1)), null for degree < 2 (undefined, not zero). The
    * community-tightness profile next to [[triangleCounts]]'s raw counts;
    * in dedup graphs a node with high degree but near-zero cc is a hub
    * stitching unrelated families together (a split candidate).
    *
    * Scale shape: edges canonicalize + distinct once; degrees are one
    * hash aggregate over the exploded endpoints; triangles come from
    * [[triangleCounts]] (two ordered equi-joins, never all-pairs); the
    * final frame is one left join + exact-integer arithmetic with a
    * single double division. */
  def clusteringCoefficient(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = edges.select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist()
    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    deg.join(triangleCounts(e, "a", "b"), Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") < 2, lit(null)).otherwise(
          round(lit(2.0) * coalesce(col("n_triangles"), lit(0L))
              .cast("double") /
            (col("degree").cast("double") *
              (col("degree").cast("double") - lit(1.0))), 6)).as("cc"))
  }

  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist()
    val tri = e
      .join(e.select(col("a").as("__b2"), col("b").as("c")),
        col("b") === col("__b2"))
      .join(e.select(col("a").as("__a3"), col("b").as("__c3")),
        col("a") === col("__a3") && col("c") === col("__c3"))
      .select(col("a"), col("b"), col("c"))
    tri.select(col("a").as("node"))
      .unionAll(tri.select(col("b").as("node")))
      .unionAll(tri.select(col("c").as("node")))
      .groupBy("node")
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Newman modularity of a community assignment over an undirected graph —
    * the QUALITY gauge for [[labelPropagation]] output (and any other
    * membership: connected components, an external clustering):
    * Q = Σ_c [ l_c/m − (d_c/2m)² ], l_c = intra-community edges, d_c = the
    * community's degree sum, m = |undirected edges|. Q ≈ 0 means the
    * partition is no better than random wiring; well-separated communities
    * push toward 1. Emits one row per community (size, intra-edge count,
    * degree mass, its additive contribution) plus the corpus Q on every
    * row, so the operator doubles as a per-community diagnostic — a
    * community with NEGATIVE contribution is worse-than-random and a
    * natural split candidate.
    *
    * Scale shape: edges canonicalize (least, greatest) + distinct ONCE
    * (self-loops dropped); membership attaches via TWO node-keyed
    * equi-joins (never an all-pairs); every aggregate is a hash groupBy on
    * community keys. The modularity arithmetic stays INTEGER to the end —
    * contribution numerator 4m·l_c − d_c², denominator 4m² — in
    * DECIMAL(38,0) (exact past 10¹⁸ edges), with one final double division
    * per output column, so the gate replays bit-exactly in any engine.
    * The corpus Q rides an unbounded window over the per-community frame
    * (≤ |communities| rows), not a second pass over the edges. */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
      membership: DataFrame, nodeCol: String = "node",
      communityCol: String = "community"): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val e0 = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val mem = membership.select(col(nodeCol).cast("long").as("node"),
      col(communityCol).cast("long").as("__comm"))
    val deg = e0.select(col("a").as("node"))
      .unionAll(e0.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("__deg"))
    val intra = e0
      .join(mem.select(col("node").as("a"), col("__comm").as("__ca")), "a")
      .join(mem.select(col("node").as("b"), col("__comm").as("__cb")), "b")
      .filter(col("__ca") === col("__cb"))
      .groupBy(col("__ca").as("__comm"))
      .agg(count(lit(1)).as("intra_edges"))
    val nodes = mem.join(deg, Seq("node"), "left")
      .groupBy("__comm")
      .agg(count(lit(1)).as("n_nodes"),
        sum(coalesce(col("__deg"), lit(0L))).as("degree_sum"))
    val m = e0.agg(count(lit(1)).as("__m"))
    val wAll = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    nodes.join(intra, Seq("__comm"), "left")
      .select(col("__comm"), col("n_nodes"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        col("degree_sum"))
      .crossJoin(broadcast(m))
      .withColumn("__num",
        dec(lit(4L)) * dec(col("__m")) * dec(col("intra_edges")) -
          dec(col("degree_sum")) * dec(col("degree_sum")))
      .select(col("__comm").as("community"), col("n_nodes"),
        col("intra_edges"), col("degree_sum"),
        when(col("__m") === 0L, lit(null)).otherwise(
          round(col("__num").cast("double") /
            (lit(4.0) * col("__m").cast("double") *
              col("__m").cast("double")), 6)).as("contribution"),
        when(col("__m") === 0L, lit(null)).otherwise(
          round(sum(col("__num")).over(wAll).cast("double") /
            (lit(4.0) * col("__m").cast("double") *
              col("__m").cast("double")), 6)).as("modularity"))
      .orderBy("community")
  }

  /** Per-community conductance — [[modularity]]'s local counterpart:
    * φ(c) = cut(c) / min(vol(c), vol(V∖c)), cut = edges leaving the
    * community, vol = its degree mass. Modularity grades the PARTITION;
    * conductance grades each community alone — a community with high φ is
    * a bad cluster no matter how good the global Q looks (the standard
    * Leskovec-style network-community-profile measure). φ ∈ [0,1]; 0 is
    * a perfectly isolated community; null when a side has zero volume
    * (an isolated-node community — cut and vol both 0).
    *
    * Same plan skeleton as modularity (shared canonical-edge + two
    * node-keyed membership joins + hash aggregates); the cut count
    * aggregates each boundary edge once per SIDE (unionAll of the two
    * endpoints' communities on differing-community edges). Ratios are
    * exact integers to the final rounded double division. */
  def conductance(edges: DataFrame, srcCol: String, dstCol: String,
      membership: DataFrame, nodeCol: String = "node",
      communityCol: String = "community"): DataFrame = {
    val e0 = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val mem = membership.select(col(nodeCol).cast("long").as("node"),
      col(communityCol).cast("long").as("__comm"))
    val deg = e0.select(col("a").as("node"))
      .unionAll(e0.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("__deg"))
    val labeled = e0
      .join(mem.select(col("node").as("a"), col("__comm").as("__ca")), "a")
      .join(mem.select(col("node").as("b"), col("__comm").as("__cb")), "b")
    val cut = labeled.filter(col("__ca") =!= col("__cb"))
      .select(col("__ca").as("__comm"))
      .unionAll(labeled.filter(col("__ca") =!= col("__cb"))
        .select(col("__cb").as("__comm")))
      .groupBy("__comm").agg(count(lit(1)).as("cut_edges"))
    val vol = mem.join(deg, Seq("node"), "left")
      .groupBy("__comm")
      .agg(count(lit(1)).as("n_nodes"),
        sum(coalesce(col("__deg"), lit(0L))).as("volume"))
    val m2 = e0.agg((count(lit(1)) * 2).as("__vt"))
    vol.join(cut, Seq("__comm"), "left")
      .select(col("__comm"), col("n_nodes"), col("volume"),
        coalesce(col("cut_edges"), lit(0L)).as("cut_edges"))
      .crossJoin(broadcast(m2))
      .select(col("__comm").as("community"), col("n_nodes"),
        col("cut_edges"), col("volume"),
        when(least(col("volume"), col("__vt") - col("volume")) === 0L,
          lit(null))
          .otherwise(round(col("cut_edges").cast("double") /
            least(col("volume"), col("__vt") - col("volume"))
              .cast("double"), 6)).as("conductance"))
      .orderBy("community")
  }
}
