package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  */
object Graph {

  /** Undirected PageRank: `edges` are (src, dst) pairs; the graph is
    * symmetrized and deduplicated, so every node has out-degree ≥ 1 (no
    * dangling-mass correction needed). Returns (node, rank) after `iters`
    * damped iterations from the uniform start. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters=$iters out of [1,20]")
    val fwd = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"))
    val und = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    // edge list with out-degree attached, reused every iteration
    val edgesDeg = und.join(deg, "src").persist()
    // node count as a broadcast 1-row frame (no driver-side action)
    val nNodes = deg.agg(count(lit(1)).cast("double").as("n_nodes"))
    val quant = (c: org.apache.spark.sql.Column) =>
      floor(c * lit(1e10) + lit(0.5)) / lit(1e10)
    var rank = deg.select(col("src").as("node"))
      .crossJoin(broadcast(nNodes))
      .select(col("node"), quant(lit(1.0) / col("n_nodes")).as("rank"),
        col("n_nodes"))
      .persist()
    for (_ <- 1 to iters) {
      val next = edgesDeg
        .join(rank, col("src") === col("node"))
        .select(col("dst"),
          (col("rank") / col("deg")).cast("decimal(28,14)").as("contrib"),
          col("n_nodes"))
        .groupBy("dst")
        .agg(quant(lit(1.0 - damping) / first(col("n_nodes")) +
          lit(damping) * sum(col("contrib")).cast("double")).as("rank"),
          first(col("n_nodes")).as("n_nodes"))
        .select(col("dst").as("node"), col("rank"), col("n_nodes"))
        .localCheckpoint()
      rank = next
    }
    rank.select("node", "rank")
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
      iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters=$iters out of [1,20]")
    val fwd = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val und = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    var labels = und.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lab")).localCheckpoint()
    for (_ <- 1 to iters) {
      val next = und
        .join(labels, col("src") === col("node"))
        .groupBy(col("dst"), col("lab"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst"))
        .agg(max(struct(col("cnt"), (-col("lab")).as("nl"))).as("best"))
        .select(col("dst").as("node"), (-col("best.nl")).as("lab"))
        .localCheckpoint()
      labels = next
    }
    labels.select(col("node"), col("lab").as("community"))
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
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters=$iters out of [1,20]")
    val fwd = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"))
    val und = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    val edgesDeg = und.join(deg, "src").persist()
    val seedSet = seeds.select(col(seedCol).cast("string").as("node"))
      .distinct().persist()
    val nSeeds = seedSet.agg(count(lit(1)).cast("double").as("n_seeds"))
    val quant = (c: Column) => floor(c * lit(1e10) + lit(0.5)) / lit(1e10)
    val seedMark = seedSet.select(col("node").as("__sn"), lit(1).as("__is"))
    // e(v): (1-d)/|S| on seeds, 0 elsewhere — the personalization vector
    def restart(nodeCol: Column): Column =
      when(col("__is").isNotNull,
        lit(1.0 - damping) / col("n_seeds")).otherwise(lit(0.0))
    var rank = deg.select(col("src").as("node"))
      .join(broadcast(seedMark), col("node") === col("__sn"), "left")
      .crossJoin(broadcast(nSeeds))
      .select(col("node"),
        quant(when(col("__is").isNotNull, lit(1.0) / col("n_seeds"))
          .otherwise(lit(0.0))).as("rank"),
        col("n_seeds"))
      .persist()
    for (_ <- 1 to iters) {
      val next = edgesDeg
        .join(rank, col("src") === col("node"))
        .select(col("dst"),
          (col("rank") / col("deg")).cast("decimal(28,14)").as("contrib"),
          col("n_seeds"))
        .groupBy("dst")
        .agg(sum(col("contrib")).cast("double").as("__c"),
          first(col("n_seeds")).as("n_seeds"))
        .join(broadcast(seedMark), col("dst") === col("__sn"), "left")
        .select(col("dst").as("node"),
          quant(restart(col("dst")) + lit(damping) * col("__c")).as("rank"),
          col("n_seeds"))
        .localCheckpoint()
      rank = next
    }
    rank.select(col("node"), col("rank"))
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
      iters: Int = 2): DataFrame = {
    require(iters >= 1 && iters <= 10, s"iters=$iters out of [1,10]")
    val e = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst")).distinct().persist()
    val quant = (c: Column) => floor(c * lit(1e10) + lit(0.5)) / lit(1e10)
    val dec = (c: Column) => c.cast("decimal(28,14)")
    val nSrc = e.select("src").distinct()
      .agg(count(lit(1)).cast("double").as("n_src"))
    var hub = e.select("src").distinct()
      .crossJoin(broadcast(nSrc))
      .select(col("src"), quant(lit(1.0) / col("n_src")).as("h"))
      .localCheckpoint()
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      val aRaw = e.join(hub, "src")
        .groupBy("dst").agg(sum(dec(col("h"))).as("__raw"))
      val aTot = aRaw.agg(sum(col("__raw")).as("__tot"))
      auth = aRaw.crossJoin(broadcast(aTot))
        .select(col("dst"),
          quant(col("__raw").cast("double") / col("__tot").cast("double"))
            .as("a"))
        .localCheckpoint()
      val hRaw = e.join(auth, "dst")
        .groupBy("src").agg(sum(dec(col("a"))).as("__raw"))
      val hTot = hRaw.agg(sum(col("__raw")).as("__tot"))
      hub = hRaw.crossJoin(broadcast(hTot))
        .select(col("src"),
          quant(col("__raw").cast("double") / col("__tot").cast("double"))
            .as("h"))
        .localCheckpoint()
    }
    hub.select(lit("hub").as("role"), col("src").as("node"),
        col("h").as("score"))
      .unionByName(auth.select(lit("authority").as("role"),
        col("dst").as("node"), col("a").as("score")))
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
    val fwd = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"))
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
      dstCol: String, rounds: Int = 4): DataFrame = {
    require(rounds >= 1 && rounds <= 12, s"rounds=$rounds out of [1,12]")
    val fwd = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val und = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    var labels = und.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lab")).localCheckpoint()
    for (_ <- 1 to rounds) {
      // both union branches derive from the same checkpointed `labels`;
      // fresh aliases keep their attribute ids disjoint (Catalyst's union
      // constraint rewrite chokes on shared ids across branches)
      val prop = labels
        .select(col("node").as("node"), col("lab").as("lab"))
        .union(und.join(labels, col("src") === col("node"))
          .select(col("dst").as("node"), col("lab").as("lab")))
        .groupBy("node").agg(min(col("lab")).as("lab"))
      val jumped = prop.as("a")
        .join(prop.select(col("node").as("__n2"), col("lab").as("__l2")).as("b"),
          col("a.lab") === col("__n2"))
        .select(col("a.node").as("node"), col("__l2").as("lab"))
        .localCheckpoint()
      labels = jumped
    }
    labels.select(col("node"), col("lab").as("component"))
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
      k: Int, rounds: Int = 3): DataFrame = {
    require(k >= 1 && rounds >= 1 && rounds <= 10,
      s"k=$k rounds=$rounds out of range")
    val fwd = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    var und = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = und.groupBy("src").agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k).select(col("src").as("__keep"))
      und = und
        .join(keep, col("src") === col("__keep"), "left_semi")
        .join(keep, col("dst") === col("__keep"), "left_semi")
        .localCheckpoint()
    }
    und.groupBy(col("src").as("node"))
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
}
