package graft

import graft.functions.{Curation, TextAnalysis}
import graft.operators.{Graph, Snapshot}
import org.apache.spark.sql.functions._

/** Controlled-fixture semantics for the wave-10 operators: snapshot diff
  * (CDC), PageRank, URL canonicalization/dedup, exact-n group sampling, and
  * the bigram-model score (the x51-x55 oracle queries cover the
  * testdata-scale paths). */
class SnapshotGraphSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies insert/delete/update/same with null safety") {
    val v1 = Seq((1L, Some(10.0), "a"), (2L, Some(20.0), "b"),
      (3L, None: Option[Double], "c"), (4L, Some(40.0), "d"))
      .toDF("k", "bal", "seg")
    val v2 = Seq((1L, Some(10.0), "a"),          // same
      (2L, Some(99.0), "b"),                     // update (value change)
      (3L, Some(30.0), "c"),                     // update (null → value)
      (5L, Some(50.0), "e"))                     // insert; 4 deleted
      .toDF("k", "bal", "seg")
    val out = Snapshot.snapshotDiff(v1, v2, "k", Seq("bal", "seg"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(5))).toSeq ==
      Seq((1L, "same"), (2L, "update"), (3L, "update"), (4L, "delete"),
        (5L, "insert")))
    val changes = Snapshot.changesOnly(v1, v2, "k", Seq("bal", "seg"))
    assert(changes.count() == 4 &&
      changes.filter(col("change_type") === "same").count() == 0)
  }

  test("CDC algebra: applying the diff to v1 reconstructs v2 exactly") {
    // diff(v1,v2) → delete + upsert must rebuild v2 for several mutation mixes
    for ((dm, um, im) <- Seq((7, 5, 9), (3, 2, 11), (13, 4, 6))) {
      val v1 = (1L to 60L).map(k => (k, k * 1.5, s"seg${k % 3}"))
        .toDF("k", "bal", "seg")
      val v2 = (1L to 60L).filterNot(_ % dm == 0)
        .map(k => (k, if (k % um == 0) k * 1.5 + 99 else k * 1.5, s"seg${k % 3}"))
        .++((1L to 60L).filter(_ % im == 0).map(k => (k + 1000, -1.0, "new")))
        .toDF("k", "bal", "seg")
      val diff = Snapshot.changesOnly(v1, v2, "k", Seq("bal", "seg"))
      val deletes = diff.filter(col("change_type") === "delete").select("k")
      val upserts = diff.filter(col("change_type").isin("update", "insert"))
        .select(col("k"), col("bal_new").as("bal"), col("seg_new").as("seg"))
      val rec = graft.operators.Merge.mergeUpsert(
          v1.join(deletes, Seq("k"), "left_anti"), upserts, "k")
        .select("k", "bal", "seg")
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getLong(0), r.getDouble(1), r.getString(2))
      assert(rec.collect().map(key).sortBy(_._1).toSeq ==
        v2.collect().map(key).sortBy(_._1).toSeq, s"mods ($dm,$um,$im)")
    }
  }

  test("pageRank: ranks sum to ~1 and the hub outranks the spokes") {
    // star graph: hub 0 connected to 1..4
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("src", "dst")
    val out = Graph.pageRank(edges, "src", "dst", iters = 5)
      .orderBy(desc("rank")).collect()
    assert(out.head.getString(0) == "0", "hub must rank first")
    val total = out.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < 1e-6, s"ranks should sum to ~1, got $total")
    // spokes are symmetric → identical ranks
    assert(out.tail.map(_.getDouble(1)).distinct.length == 1)
  }

  test("pageRank is deterministic across runs") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val a = Graph.pageRank(edges, "src", "dst", iters = 3)
      .orderBy("node").collect().map(r => (r.getString(0), r.getDouble(1)))
    val b = Graph.pageRank(edges, "src", "dst", iters = 3)
      .orderBy("node").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(a.sameElements(b))
  }

  test("reliable checkpointDir: bit-identical results, truncated-leaf plan, files on disk") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (5L, 6L))
      .toDF("src", "dst")
    val local = Graph.pageRank(edges, "src", "dst", iters = 3)
      .orderBy("node").collect().map(r => (r.getString(0), r.getDouble(1)))
    val reliable = Graph.pageRank(edges, "src", "dst", iters = 3,
        checkpointDir = Some(dir))
      .orderBy("node").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(local.sameElements(reliable))
    // reliable state actually landed on storage
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(files > 0, "checkpoint() must write RDD state under the dir")
    // both modes keep the flat truncated-lineage leaf (no growing plan tree)
    val plan = Graph.pageRank(edges, "src", "dst", iters = 2,
        checkpointDir = Some(dir))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD"), s"expected scan-leaf plan, got:\n$plan")
    // the other iterative ops accept the same mode and agree with local
    val ccL = Graph.connectedComponentsDoubling(edges, "src", "dst", 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    val ccR = Graph.connectedComponentsDoubling(edges, "src", "dst", 3,
        checkpointDir = Some(dir))
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ccL.sameElements(ccR))
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val ndL = graft.operators.Dedup.nearDupComponents(pairs, 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    val ndR = graft.operators.Dedup.nearDupComponents(pairs, 3,
        checkpointDir = Some(dir))
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ndL.sameElements(ndR))
  }

  test("convergence residuals: star graph reaches the PageRank fixed point; LPA change counts hit zero") {
    // star: hub 0 — spokes 1..4; symmetric structure converges fast
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("src", "dst")
    val res = Graph.pageRankResiduals(edges, "src", "dst", iters = 6)
      .orderBy("iter").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(res.map(_._1).toSeq == (1 to 6))
    // damped PR contracts by ~the damping factor per iteration (‖Δ_k‖ ≈
    // d·‖Δ_{k−1}‖): residuals must decrease strictly, at roughly 0.85×
    assert(res.map(_._2).sliding(2).forall(w => w(1) < w(0)),
      s"expected strictly shrinking residuals, got ${res.toSeq}")
    val ratio = res.last._2.toDouble / res(res.length - 2)._2.toDouble
    assert(ratio > 0.7 && ratio < 0.95, s"contraction ~damping, got $ratio")
    // the convergence report EXPOSES pathologies: synchronous LPA on a
    // bipartite star oscillates (hub and spokes swap labels forever) —
    // n_changed never drops, which is exactly what a user must see before
    // trusting a fixed iteration count …
    val lpaStar = Graph
      .labelPropagationConvergence(edges, "src", "dst", iters = 4)
      .orderBy("iter").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(lpaStar.map(_._1).toSeq == (1 to 4))
    assert(lpaStar.forall(_._2 == 5L),
      s"bipartite star oscillates under synchronous LPA: ${lpaStar.toSeq}")
    // … while a non-bipartite triangle reaches its fixed point (zero)
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val lpaTri = Graph.labelPropagationConvergence(tri, "src", "dst", iters = 4)
      .orderBy("iter").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(lpaTri.last._2 == 0L, s"triangle should converge: ${lpaTri.toSeq}")
    val hits = Graph.hitsResiduals(edges, "src", "dst", iters = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(hits.map(t => (t._1, t._2)).toSet ==
      Set(("hub", 1), ("hub", 2), ("authority", 2)))
    val seeds = Seq(Tuple1(0L)).toDF("node")
    val ppr = Graph.personalizedPageRankResiduals(edges, "src", "dst",
        seeds, "node", iters = 3)
      .orderBy("iter").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(ppr.map(_._1).toSeq == (1 to 3) && ppr.forall(_._2 >= 0L))
  }

  test("qualityReport aggregates gate counts and pass rate per stratum") {
    val good = "the quick brown fox jumps over a lazy dog and then " +
      "runs far away to the hills in the morning light again and again ok"
    val docs = Seq((good, "en"), (good, "en"), ("1 2 3", "xx"))
      .toDF("text", "lang")
    val out = TextAnalysis.qualityReport(docs, "text", "lang")
      .orderBy("lang").collect()
    val en = out(0)
    assert(en.getString(0) == "en" && en.getAs[Long]("n_docs") == 2L &&
      en.getAs[Long]("n_pass") == 2L && en.getAs[Long]("pass_bps") == 10000L)
    val xx = out(1)
    assert(xx.getAs[Long]("n_pass") == 0L && xx.getAs[Long]("pass_bps") == 0L)
  }

  test("repetitionProfile: looped text fails the gate, natural text passes") {
    val docs = Seq(
      (1L, "one two three four " * 10),            // all repeated 4-grams
      (2L, (1 to 40).map("w" + _).mkString(" ")),  // all distinct
      (3L, "a b c"))                               // < 4 words → 0 grams
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionProfile(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    val (g1, d1, bps1, pass1) = out(1L)
    assert(g1 == 37L && d1 == 4L && bps1 > 8000L && !pass1)
    assert(out(2L) == (37L, 37L, 0L, true))
    assert(out(3L) == (0L, 0L, 0L, true))
  }

  test("cdcChunks: boundaries are content-local (stable under prefix edits)") {
    val text = ("the quick brown fox jumps over the lazy dog " * 8).trim
    val docs = Seq((1L, text), (2L, "PREFIX-EDIT " + text)).toDF("doc_id", "text")
    val bounds = Curation.cdcChunks(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    // the prefix shifts every absolute position by 12, but the boundary
    // COUNT from the shared suffix must be preserved within ±1 (only the
    // window spanning the splice can change)
    val (n1, n2) = (bounds(1L)._1, bounds(2L)._1)
    assert(math.abs(n1 - n2) <= 1, s"chunk counts diverged: $n1 vs $n2")
    // short doc (< window) → exactly one chunk covering the whole text
    val short = Curation.cdcChunks(Seq((9L, "tiny")).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    assert(short.getLong(1) == 1L && short.getLong(2) == 4L &&
      short.getLong(3) == 0L)
  }

  test("triangleCounts: K4 yields 3 per node; duplicates/reversals collapse") {
    // complete graph on 4 nodes (C(4,3)=4 triangles, each node in 3), with
    // noisy duplicate and reversed edges that must canonicalize away
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (3L, 2L), (2L, 4L), (3L, 4L), (5L, 6L)) // 5-6 edge is in no triangle
      .toDF("s", "d")
    val out = Graph.triangleCounts(edges, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("canonicalizeUrl normalizes case/port/tracking/fragment/slash") {
    val cases = Seq(
      ("HTTPS://WWW.Example.COM:443/Path?utm_source=x&id=1#frag",
        "https://www.example.com/Path?id=1"),
      ("http://site.com:80/a/", "http://site.com/a"),
      ("https://Site.com/a?fbclid=abc", "https://site.com/a"),
      ("https://site.com/a?gclid=1&utm_medium=m&keep=2",
        "https://site.com/a?keep=2"),
      ("http://site.com", "http://site.com"),
      // path case is preserved; only scheme+host fold
      ("HTTP://HOST.COM/CaseSensitive", "http://host.com/CaseSensitive"))
    val out = cases.map(_._1).toDF("url")
      .select(Curation.canonicalizeUrl(col("url")).as("c")).collect()
    out.zip(cases).foreach { case (r, (in, want)) =>
      assert(r.getString(0) == want, s"canonicalize($in)") }
  }

  test("urlDedup keeps the min-id row per canonical URL with dup counts") {
    val df = Seq(
      (3L, "https://a.com/x?utm_source=s"),
      (1L, "HTTPS://A.COM/x"),
      (2L, "https://a.com/y")).toDF("doc_id", "url")
    val out = Curation.urlDedup(df, "doc_id", "url")
      .orderBy("canonical_url").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("canonical_url") == "https://a.com/x" &&
      out(0).getAs[Long]("doc_id") == 1L && out(0).getAs[Long]("n_dups") == 2L)
    assert(out(1).getAs[Long]("doc_id") == 2L &&
      out(1).getAs[Long]("n_dups") == 1L)
  }

  test("groupSample returns exactly n rows per stratum (or all if fewer)") {
    val df = (1L to 100L).map(i => (i, if (i <= 90) "big" else "small"))
      .toDF("id", "stratum")
    val out = Curation.groupSample(df, "id", "stratum", n = 7)
    val counts = out.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("big") == 7L && counts("small") == 7L)
    // deterministic: same call, same rows
    val ids1 = out.orderBy("id").collect().map(_.getLong(0)).toSeq
    val ids2 = Curation.groupSample(df, "id", "stratum", n = 7)
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(ids1 == ids2)
  }

  test("weightedSample: exact k, deterministic, higher weight wins more often") {
    val df = (1L to 400L).map(i => (i, if (i <= 200) 16 else 1))
      .toDF("id", "wt")
    val out = Curation.weightedSample(df, "id", "wt", k = 50)
    val rows = out.collect()
    assert(rows.length == 50)
    val heavy = rows.count(_.getLong(0) <= 200)
    // 200 docs at weight 16 vs 200 at weight 1 → heavy side should dominate
    assert(heavy > 35, s"heavy-weight docs won only $heavy/50")
    val again = Curation.weightedSample(df, "id", "wt", k = 50)
      .collect().map(_.getLong(0)).toSeq
    assert(rows.map(_.getLong(0)).toSeq == again)
    // weights are capped at maxWeight and floored at 1
    val capped = Curation.weightedSample(
      Seq((1L, 1000), (2L, -5)).toDF("id", "wt"), "id", "wt", k = 2,
      maxWeight = 8).collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(capped(1L) == 8 && capped(2L) == 1)
  }

  test("pmiPairs: frequent co-occurrence lifts above chance, integer-exact") {
    // "alpha beta" always together (5 docs), "gamma" alone in 5 others
    val df = ((1L to 5L).map(i => (i, "alpha beta filler")) ++
      (6L to 10L).map(i => (i, "gamma filler other"))).toDF("doc_id", "text")
    val out = TextAnalysis.pmiPairs(df, "doc_id", "text",
        vocabSize = 10, minPairCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // alpha+beta: n_ab=5, n_a=n_b=5, N=10 → lift = 5*10*1e6/25 = 2,000,000
    assert(out(("alpha", "beta")) == (5L, 2000000L))
    // alpha+filler: 5*10*1e6/(5*10) = 1,000,000 (independence)
    assert(out(("alpha", "filler")) == (5L, 1000000L))
  }

  test("datasetCard: one-row corpus stats with exact dup basis points") {
    val df = Seq(
      (1L, "one two three", "en"), (2L, "one two three", "en"),
      (3L, "vier fuenf sechs sieben", "de"), (4L, "uno", "es"))
      .toDF("doc_id", "text", "lang")
    val r = graft.operators.Profiler.datasetCard(df, "doc_id", "text", "lang")
      .collect().head
    assert(r.getAs[Long]("n_docs") == 4L &&
      r.getAs[Long]("n_distinct_texts") == 3L &&
      r.getAs[Long]("n_langs") == 3L)
    assert(r.getAs[Long]("total_tokens") == 3 + 3 + 4 + 1)
    assert(r.getAs[Long]("min_tokens") == 1L && r.getAs[Long]("max_tokens") == 4L)
    assert(r.getAs[Long]("dup_bps") == 2500L) // 1 dup of 4 docs
  }

  test("incrementalDedup: history dups dropped, batch dups collapsed, bloom transparent") {
    val hist = Seq((1L, "known text one"), (2L, "known text two"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "known text one"),   // dup of history → dropped
      (11L, "fresh text a"), (12L, "fresh text a"),  // batch-internal dup
      (13L, "fresh text b")).toDF("doc_id", "text")
    val out = graft.operators.Dedup.incrementalDedup(hist, batch, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((11L, 2L), (13L, 1L)))
    // empty history → pure within-batch dedup
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val solo = graft.operators.Dedup.incrementalDedup(empty, batch, "doc_id", "text")
    assert(solo.count() == 3)
    // bloom transparency: result equals the exact anti-join at any fpp
    val loose = graft.operators.Dedup
      .incrementalDedup(hist, batch, "doc_id", "text", fpp = 0.5)
      .orderBy("doc_id").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(loose.toSeq == out.toSeq)
  }

  test("minhashCrossDups finds cross-corpus near-dups, never same-side pairs") {
    val base = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through the green fields toward the river bank"
    val left = Seq((1L, base), (2L, "completely unrelated content here " +
      "about databases and distributed systems at large scale today"))
      .toDF("doc_id", "text")
    val right = Seq((100L, base + " tail"), (200L, "nothing like anything " +
      "in the left corpus at all whatsoever in any shingle"))
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup
      .minhashCrossDups(left, right, "doc_id", "text", threshold = 0.7)
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 100L)
    assert(out.head.getDouble(2) > 0.8)
  }

  test("invertedIndex: distinct-per-doc postings, sorted, capped with flag") {
    val df = Seq(
      (3L, "apple banana apple"),  // dup token counts once per doc
      (1L, "apple cherry"),
      (2L, "apple banana")).toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(df, "doc_id", "text", maxPostings = 2)
      .orderBy("token").collect()
    val byTok = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getString(2), r.getBoolean(3))).toMap
    assert(byTok("apple") == (3L, "1,2", true))   // capped at 2, sorted
    assert(byTok("banana") == (2L, "2,3", false))
    assert(byTok("cherry") == (1L, "1", false))
  }

  test("bigramModelScore: in-model docs score 1, alien docs 0, <2 words dropped") {
    val df = Seq(
      (1L, "the cat sat"), (2L, "the cat sat"), (3L, "the cat sat"),
      (4L, "zzz qqq"),      // bigram "zzz qqq" appears once → still in model
      (5L, "single")        // < 2 words → dropped
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramModelScore(df, "doc_id", "text", modelSize = 10)
      .orderBy("doc_id").collect()
    assert(out.length == 4)
    assert(out.forall(_.getDouble(3) == 1.0))
    // tiny model that excludes the alien bigram
    val out2 = TextAnalysis.bigramModelScore(df, "doc_id", "text", modelSize = 2)
      .orderBy("doc_id").collect()
    assert(out2.take(3).forall(_.getDouble(3) == 1.0) &&
      out2(3).getDouble(3) == 0.0)
  }

  test("connectedComponentsDoubling: a 20-chain resolves in 5 doubling rounds") {
    import spark.implicits._
    // path graph 1-2-3-…-20 (diameter 19): plain min-propagation needs 19
    // rounds; alternating propagate+jump must finish within 5 (2^5 > 19)
    val chain = (1L until 20L).map(i => (i, i + 1)).toDF("src", "dst")
    val out = graft.operators.Graph
      .connectedComponentsDoubling(chain, "src", "dst", rounds = 5)
      .collect()
    assert(out.length == 20)
    assert(out.forall(_.getLong(1) == 1L), "every node must reach min label 1")
    // two separate components stay separate
    val two = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val comps = graft.operators.Graph
      .connectedComponentsDoubling(two, "src", "dst", rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comps(1L) == 1L && comps(2L) == 1L && comps(3L) == 1L)
    assert(comps(10L) == 10L && comps(11L) == 10L)
  }

  test("personalizedPageRank: mass stays in the seed component") {
    import spark.implicits._
    // two disconnected triangles; seeds only in the first
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L),
      (10L, 12L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val pr = graft.operators.Graph
      .personalizedPageRank(g, "src", "dst", seeds, "node", iters = 3)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(pr("1") > 0 && pr("2") > 0 && pr("3") > 0)
    assert(pr("10") == 0.0 && pr("11") == 0.0 && pr("12") == 0.0)
    // the seed outranks its symmetric peers (restart mass lands on it)
    assert(pr("1") > pr("2") && pr("2") == pr("3"))
  }

  test("hits: shared authority outranks exclusive one; scores L1-normalize") {
    import spark.implicits._
    val g = Seq(("p1", "s1"), ("p2", "s1"), ("p1", "s2")).toDF("src", "dst")
    val out = graft.operators.Graph.hits(g, "src", "dst", iters = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out(("authority", "s1")) > out(("authority", "s2")))
    assert(out(("hub", "p1")) > out(("hub", "p2"))) // p1 points at both
    val hubSum = out.collect { case (("hub", _), v) => v }.sum
    val authSum = out.collect { case (("authority", _), v) => v }.sum
    assert(math.abs(hubSum - 1.0) < 1e-6 && math.abs(authSum - 1.0) < 1e-6)
  }

  test("degreeAssortativity: a star is perfectly disassortative (-1)") {
    import spark.implicits._
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val r = graft.operators.Graph.degreeAssortativity(star, "src", "dst").head()
    assert(r.getLong(0) == 6L)
    assert(r.getDouble(1) == -1.0)
    // regular graph (4-cycle): zero degree variance → null, not an error
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val rc = graft.operators.Graph.degreeAssortativity(cycle, "src", "dst").head()
    assert(rc.isNullAt(1))
  }

  test("neighborhoodSimilarity: exact Jaccard of shared left neighborhoods") {
    import spark.implicits._
    // sA serves {1,2,3}, sB {2,3,4} → J = 2/4; sC {9} shares nothing and
    // must not pair with anyone (no shared left node, no candidate)
    val e = Seq((1L, "sA"), (2L, "sA"), (3L, "sA"), (2L, "sB"), (3L, "sB"),
      (4L, "sB"), (9L, "sC")).toDF("part", "supp")
    val out = graft.operators.Graph.neighborhoodSimilarity(e, "part", "supp")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "sA" && r.getString(1) == "sB")
    assert(r.getLong(2) == 2L && r.getDouble(3) == 0.5)
  }

  test("kCorePeel: the triangle survives 2-core peeling, the tail peels away") {
    import spark.implicits._
    // triangle 1-2-3 plus a tail 3-4-5: 2-core = exactly the triangle,
    // and the tail needs TWO peels (5 goes first, then 4)
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val core = graft.operators.Graph.kCorePeel(g, "src", "dst", k = 2, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(core.keySet == Set(1L, 2L, 3L))
    assert(core.values.forall(_ == 2L))
    // one round is NOT enough: node 4 still present after a single peel
    val onePeel = graft.operators.Graph.kCorePeel(g, "src", "dst", k = 2, rounds = 1)
      .collect().map(_.getLong(0)).toSet
    assert(onePeel.contains(4L))
  }

  test("modularity: two disjoint triangles score 0.5; one community scores 0") {
    import spark.implicits._
    // two triangles {1,2,3} and {4,5,6}: m=6, each community l_c=3, d_c=6
    // Q = 2 · (3/6 − (6/12)²) = 0.5
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L), (6L, 4L))
      .toDF("src", "dst")
    val mem = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("node", "community")
    val r = Graph.modularity(e, "src", "dst", mem).collect()
    assert(r.length == 2)
    assert(r.forall(_.getAs[Long]("n_nodes") == 3L))
    assert(r.forall(_.getAs[Long]("intra_edges") == 3L))
    assert(r.forall(_.getAs[Long]("degree_sum") == 6L))
    assert(r.forall(_.getAs[Double]("contribution") == 0.25))
    assert(r.forall(_.getAs[Double]("modularity") == 0.5))

    // everything in ONE community: Q = m/m − (2m/2m)² = 0 exactly
    val one = mem.withColumn("community", lit(7L))
    val r1 = Graph.modularity(e, "src", "dst", one).collect()
    assert(r1.length == 1 && r1.head.getAs[Double]("modularity") == 0.0)

    // duplicate/reversed/self-loop edges canonicalize away
    val dirty = e.unionAll(e.select($"dst".as("src"), $"src".as("dst")))
      .unionAll(Seq((1L, 1L)).toDF("src", "dst"))
    val r2 = Graph.modularity(dirty, "src", "dst", mem).collect()
    assert(r2.forall(_.getAs[Double]("modularity") == 0.5))
  }

  test("conductance: bridged triangles have phi = 1/7; isolated community 0") {
    import spark.implicits._
    // two triangles joined by one bridge edge 1–4: vol(c)=7, cut=1, m=7
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L), (6L, 4L),
      (1L, 4L)).toDF("src", "dst")
    val mem = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("node", "community")
    val r = Graph.conductance(e, "src", "dst", mem).collect()
    assert(r.length == 2)
    assert(r.forall(_.getAs[Long]("volume") == 7L))
    assert(r.forall(_.getAs[Long]("cut_edges") == 1L))
    assert(r.forall(_.getAs[Double]("conductance") == 0.142857))

    // drop the bridge: both communities perfectly isolated → phi = 0
    val clean = e.filter(!($"src" === 1L && $"dst" === 4L))
    val rc = Graph.conductance(clean, "src", "dst", mem).collect()
    assert(rc.forall(_.getAs[Double]("conductance") == 0.0))

    // an isolated-node community has zero volume → null, not 0/0
    val mem2 = mem.unionAll(Seq((9L, 9L)).toDF("node", "community"))
    val r9 = Graph.conductance(clean, "src", "dst", mem2)
      .filter($"community" === 9L).head()
    assert(r9.isNullAt(r9.fieldIndex("conductance")))
  }

  test("katzCentrality: hand values on the 3-path at two iterations; " +
    "middle node dominates") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val k = Graph.katzCentrality(e, "src", "dst", iters = 2,
      alpha = 0.1, beta = 1.0)
      .collect().map(r => r.getAs[String]("node") ->
        r.getAs[Double]("katz")).toMap
    // k1: ends 1.1, middle 1.2; k2: ends 1 + 0.1·1.2 = 1.12,
    // middle 1 + 0.1·(1.1 + 1.1) = 1.22
    assert(k("1") == 1.12 && k("3") == 1.12)
    assert(k("2") == 1.22)
  }

  test("clusteringCoefficient: closed triangle scores 1, the bridge " +
    "node dilutes, degree-1 nodes are null") {
    // triangle 1-2-3 plus pendant edge 3-4
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val cc = Graph.clusteringCoefficient(e, "src", "dst").collect()
      .map(r => r.getAs[Long]("node") -> r).toMap
    assert(cc(1L).getAs[Double]("cc") == 1.0)
    assert(cc(2L).getAs[Double]("cc") == 1.0)
    assert(cc(3L).getAs[Double]("cc") == 0.333333) // 2·1/(3·2)
    assert(cc(4L).isNullAt(cc(4L).fieldIndex("cc")))
    assert(cc(3L).getAs[Long]("degree") == 3L)
    assert(cc(4L).getAs[Long]("n_triangles") == 0L)
  }
}
