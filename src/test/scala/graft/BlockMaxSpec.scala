package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** Block-Max pruning (bmwTopK): exactness against the full scorer on
  * every query shape, the block refinement pruning STRICTLY tighter than
  * global MaxScore on a block-skewed fixture, and the `_bm` companion's
  * lifecycle (x272/x273 gate the testdata-scale paths against the x171
  * oracle). */
class BlockMaxSpec extends SparkSpec {
  import spark.implicits._

  // WandSpec's corpus: 20 docs with the stopword, 3 rare, two mids
  private def corpus = (10L to 29L).map { i =>
    val rare = if (i <= 12) " rare" else ""
    val mid = if (i % 2 == 0) " mid" else ""
    val mid2 = if (i % 3 == 0) " midtwo midtwo" else ""
    (i, s"common common$rare$mid$mid2 filler$i")
  }.toDF("doc_id", "text")

  private def build(tbl: String, nBlocks: Int = 8): Unit = {
    Retrieval.buildPostingsIndex(corpus, "doc_id", "text", tbl,
      buckets = 4)
    Retrieval.buildImpactBounds(spark, tbl)
    Retrieval.buildBlockMax(spark, tbl, nBlocks)
  }

  private val queries = Seq(
    (1L, "rare common"), // the pruning shape: rare + stopword
    (2L, "common"), // single stopword — nothing prunable
    (3L, "rare"), // single rare term
    (4L, "mid midtwo rare common"), // full mix
    (5L, "absent zzz"), // no term in corpus
    (6L, "rare absent")).toDF("doc_id", "text")

  test("bmwTopK equals bm25TopKIndexed exactly on every query shape") {
    build("graft_test_bmw")
    for (k <- Seq(1, 3, 10, 50)) {
      val exact = Retrieval.bm25TopKIndexed(spark, "graft_test_bmw",
        queries, "doc_id", "text", k = k)
        .orderBy("query_id", "rank").collect().toSeq
      val bmw = Retrieval.bmwTopK(spark, "graft_test_bmw",
        queries, "doc_id", "text", k = k)
        .orderBy("query_id", "rank").collect().toSeq
      assert(bmw == exact, s"k=$k: block-max diverged from the full scorer")
      assert(exact.nonEmpty)
    }
  }

  test("block bounds prune docs global MaxScore keeps: one high-tf " +
    "outlier inflates only its own block's bound") {
    // 'heavy' (df 6, idf ≈ 1.17) has ONE tf=50 outlier whose saturated
    // impact (≈ 2.5) exceeds θ (≈ 1.5, seeded by the 5 'rare' docs), so
    // the GLOBAL bound makes 'heavy' essential and all 6 of its matches
    // MaxScore candidates. Per-block, only the outlier's block carries
    // max_tf=50 — the tf=1 matches in other blocks bound at ≈ 1.14 < θ
    // and prune.
    val tbl = "graft_test_bmwskew"
    val docs = (10L to 29L).map { i =>
      val body =
        if (i <= 14) "rare " + (1 to 20).map(j => s"pad${i}x$j").mkString(" ")
        else if (i == 20L) Seq.fill(50)("heavy").mkString(" ")
        else if (i >= 21 && i <= 25)
          "heavy " + (1 to 30).map(j => s"pad${i}x$j").mkString(" ")
        else (1 to 30).map(j => s"pad${i}x$j").mkString(" ")
      (i, body)
    }.toDF("doc_id", "text")
    Retrieval.buildPostingsIndex(docs, "doc_id", "text", tbl, buckets = 4)
    Retrieval.buildImpactBounds(spark, tbl)
    Retrieval.buildBlockMax(spark, tbl, nBlocks = 8)
    val q = Seq((1L, "rare heavy")).toDF("doc_id", "text")
    val qTerms = broadcast(q.select(col("doc_id").as("query_id"),
      explode(array_distinct(graft.operators.Dedup.words(col("text"))))
        .as("token")))
    val rows = Retrieval.bm25TermRows(spark, tbl, qTerms,
      k1 = 1.2, b = 0.75)
    val wand = Retrieval.wandCandidateDocs(spark, tbl, qTerms, rows,
      k = 3, k1 = 1.2, b = 0.75)
    val bmw = Retrieval.bmwCandidateDocs(spark, tbl, qTerms, rows,
      k = 3, k1 = 1.2, b = 0.75)
    val (nWand, nBmw) = (wand.count(), bmw.count())
    assert(nWand == 11L,
      s"fixture drift: global bounds should keep all 11 matches, got $nWand")
    assert(nBmw < nWand,
      s"block refinement did not tighten: $nBmw of $nWand candidates")
    val bmwDocs = bmw.collect().map(_.getAs[Long]("doc")).toSet
    // the seeds and the outlier survive — they are the true top-k pool
    assert(Set(10L, 11L, 12L, 13L, 14L, 20L).subsetOf(bmwDocs))
    // and the refined set still yields the exact ranking
    val exact = Retrieval.bm25TopKIndexed(spark, tbl, q, "doc_id",
      "text", k = 3).orderBy("query_id", "rank").collect().toSeq
    val served = Retrieval.bmwTopK(spark, tbl, q, "doc_id", "text",
      k = 3).orderBy("query_id", "rank").collect().toSeq
    assert(served == exact)
  }

  test("_bm lifecycle: append merges per-block extremes; delete leaves " +
    "valid bounds; compaction re-tightens; bmw stays exact throughout") {
    val tbl = "graft_test_bmwlc"
    Retrieval.buildPostingsIndex(corpus.filter($"doc_id" <= 25), "doc_id",
      "text", tbl, buckets = 4)
    Retrieval.buildImpactBounds(spark, tbl)
    Retrieval.buildBlockMax(spark, tbl, nBlocks = 8)
    // append: merged per-block extremes must equal a from-scratch rebuild
    Retrieval.appendToPostingsIndex(corpus.filter($"doc_id" > 25),
      "doc_id", "text", tbl, buckets = 4)
    val merged = spark.table(s"${tbl}_bm").orderBy("token", "block")
      .collect().toSeq
    Retrieval.buildBlockMax(spark, tbl, nBlocks = 8)
    assert(spark.table(s"${tbl}_bm").orderBy("token", "block")
      .collect().toSeq == merged,
      "append-merged block extremes diverged from a rebuild")
    def exactEq(): Unit = {
      val e = Retrieval.bm25TopKIndexed(spark, tbl, queries, "doc_id",
        "text", k = 5).orderBy("query_id", "rank").collect().toSeq
      val w = Retrieval.bmwTopK(spark, tbl, queries, "doc_id", "text",
        k = 5).orderBy("query_id", "rank").collect().toSeq
      assert(w == e && e.nonEmpty)
    }
    exactEq()
    // delete: `_bm` is untouched (stale-but-valid) — bmw must stay exact
    Retrieval.deleteFromPostingsIndex(spark, Seq(10L, 28L).toDF("doc_id"),
      "doc_id", tbl)
    exactEq()
    // compaction rebuilds the block bounds from survivors at the SAME
    // pinned n_blocks
    Retrieval.compactPostingsIndex(spark, tbl, buckets = 4)
    assert(spark.table(s"${tbl}_bm_meta").head().getAs[Int]("n_blocks")
      == 8, "compaction lost the pinned block count")
    val afterCompact = spark.table(s"${tbl}_bm").orderBy("token", "block")
      .collect().toSeq
    Retrieval.buildBlockMax(spark, tbl, nBlocks = 8)
    assert(spark.table(s"${tbl}_bm").orderBy("token", "block")
      .collect().toSeq == afterCompact,
      "compaction left stale block extremes")
    exactEq()
  }
}
