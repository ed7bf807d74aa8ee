package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** MaxScore dynamic pruning (wandTopK): exactness against the full
  * scorer on adversarial shapes, pruning actually pruning, and the
  * `_ub` bounds companion's lifecycle (x265-x267 gate the testdata-scale
  * paths against the x171 oracle). */
class WandSpec extends SparkSpec {
  import spark.implicits._

  // 20 docs containing the stopword 'common'; only 3 contain 'rare';
  // two mid-frequency terms for multi-term queries
  private def corpus = (10L to 29L).map { i =>
    val rare = if (i <= 12) " rare" else ""
    val mid = if (i % 2 == 0) " mid" else ""
    val mid2 = if (i % 3 == 0) " midtwo midtwo" else ""
    (i, s"common common$rare$mid$mid2 filler$i")
  }.toDF("doc_id", "text")

  private def build(tbl: String): Unit = {
    Retrieval.buildPostingsIndex(corpus, "doc_id", "text", tbl,
      buckets = 4)
    Retrieval.buildImpactBounds(spark, tbl)
  }

  private val queries = Seq(
    (1L, "rare common"), // the MaxScore shape: rare + stopword
    (2L, "common"), // single stopword — nothing prunable
    (3L, "rare"), // single rare term
    (4L, "mid midtwo rare common"), // full mix
    (5L, "absent zzz"), // no term in corpus
    (6L, "rare absent")).toDF("doc_id", "text")

  test("wandTopK equals bm25TopKIndexed exactly on every query shape") {
    build("graft_test_wand")
    for (k <- Seq(1, 3, 10, 50)) {
      val exact = Retrieval.bm25TopKIndexed(spark, "graft_test_wand",
        queries, "doc_id", "text", k = k)
        .orderBy("query_id", "rank").collect().toSeq
      val wand = Retrieval.wandTopK(spark, "graft_test_wand",
        queries, "doc_id", "text", k = k)
        .orderBy("query_id", "rank").collect().toSeq
      assert(wand == exact, s"k=$k: wand diverged from the full scorer")
      assert(exact.nonEmpty)
    }
  }

  test("pruning bites: the stopword's corpus-wide matches stay out of " +
    "the candidate set once the rare term seeds the threshold") {
    build("graft_test_wandp")
    val q = Seq((1L, "rare common")).toDF("doc_id", "text")
    val qTerms = broadcast(q.select(col("doc_id").as("query_id"),
      explode(array_distinct(graft.operators.Dedup.words(col("text"))))
        .as("token")))
    // the operator's own term rows — the candidate derivation must see
    // the real quantized scores or the seeded threshold is meaningless
    val rows = Retrieval.bm25TermRows(spark, "graft_test_wandp", qTerms,
      k1 = 1.2, b = 0.75)
    val matchedDocs = rows.select("query_id", "doc").distinct().count()
    val cand = Retrieval.wandCandidateDocs(spark, "graft_test_wandp",
      qTerms, rows, k = 3, k1 = 1.2, b = 0.75)
    val candCount = cand.count()
    assert(matchedDocs == 20L,
      s"fixture drift: expected 20 matching docs, got $matchedDocs")
    assert(candCount < matchedDocs,
      s"no pruning happened: $candCount candidates of $matchedDocs matches")
    // the 3 rare docs must all be candidates (they are the true top-k)
    val candDocs = cand.collect().map(_.getAs[Long]("doc")).toSet
    assert(Set(10L, 11L, 12L).subsetOf(candDocs))
  }

  test("_ub lifecycle: append merges extremes; delete leaves a valid " +
    "bound; compaction re-tightens; wand stays exact throughout") {
    val tbl = "graft_test_wandlc"
    Retrieval.buildPostingsIndex(corpus.filter($"doc_id" <= 25), "doc_id",
      "text", tbl, buckets = 4)
    Retrieval.buildImpactBounds(spark, tbl)
    // append: merged extremes must equal a from-scratch rebuild's
    Retrieval.appendToPostingsIndex(corpus.filter($"doc_id" > 25),
      "doc_id", "text", tbl, buckets = 4)
    val merged = spark.table(s"${tbl}_ub").orderBy("token")
      .collect().toSeq
    Retrieval.buildImpactBounds(spark, tbl) // rebuild over live postings
    assert(spark.table(s"${tbl}_ub").orderBy("token").collect().toSeq ==
      merged, "append-merged extremes diverged from a rebuild")
    def exactEq(): Unit = {
      val e = Retrieval.bm25TopKIndexed(spark, tbl, queries, "doc_id",
        "text", k = 5).orderBy("query_id", "rank").collect().toSeq
      val w = Retrieval.wandTopK(spark, tbl, queries, "doc_id", "text",
        k = 5).orderBy("query_id", "rank").collect().toSeq
      assert(w == e && e.nonEmpty)
    }
    exactEq()
    // delete: `_ub` is untouched (stale-but-valid) — wand must stay exact
    Retrieval.deleteFromPostingsIndex(spark, Seq(10L, 28L).toDF("doc_id"),
      "doc_id", tbl)
    exactEq()
    // compaction rebuilds the bounds from survivors
    Retrieval.compactPostingsIndex(spark, tbl, buckets = 4)
    val afterCompact = spark.table(s"${tbl}_ub").orderBy("token")
      .collect().toSeq
    Retrieval.buildImpactBounds(spark, tbl)
    assert(spark.table(s"${tbl}_ub").orderBy("token").collect().toSeq ==
      afterCompact, "compaction left stale extremes")
    exactEq()
  }
}
