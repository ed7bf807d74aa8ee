package graft

import graft.functions.{Curation, TextAnalysis}
import graft.model.Template
import graft.operators._
import org.apache.spark.sql.functions._

/** Degenerate-input behavior: empty frames, empty text, missing keys —
  * every operator must degrade gracefully, not throw. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDf = Seq.empty[(String, String)].toDF("report_date", "sales_amount")

  test("transform pipeline on an empty frame returns empty, metrics compute") {
    val (out, m) = TransformEngine.transform(emptyDf,
      Template(providerName = Some("p"), combineOn = List("x"), dedupeOn = List("y")))
    assert(out.count() == 0)
    val metrics = m.compute()
    assert(metrics("unpivot_before") == ((0L, 2)))
    assert(metrics("date_parse_failures") == 0L)
  }

  test("nearDupComponents on an empty pair frame returns no components") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.nearDupComponents(pairs, iters = 2).count() == 0)
  }

  test("simhashNearDups on empty and single-doc corpora return no pairs") {
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    assert(Dedup.simhashNearDups(empty, "id", "text").count() == 0)
    val one = Seq((1L, "only doc here with words")).toDF("id", "text")
    assert(Dedup.simhashNearDups(one, "id", "text").count() == 0)
  }

  test("embeddingNearDups on an empty frame returns no pairs") {
    val empty = Seq.empty[(Long, Int, Seq[Float])].toDF("vec_id", "label", "embedding")
    assert(Similarity.embeddingNearDups(empty, "vec_id", "label", "embedding", 0.9)
      .count() == 0)
    assert(Similarity.embeddingNearDupsMultiProbe(empty, "vec_id", "label",
      "embedding", 0.9).count() == 0)
  }

  test("bloom prune with an empty build side yields an empty (not full) join") {
    val large = Seq((1L, "x")).toDF("k", "v")
    val none = Seq.empty[(Long, String)].toDF("k", "tag")
    assert(BloomPrune.prunedJoin(large, none, "k").count() == 0)
  }

  test("zOrdered requires two columns; single-row frame still lays out") {
    intercept[IllegalArgumentException] {
      ZOrder.zOrdered(Seq((1.0, 2.0)).toDF("a", "b"), Seq("a"), 4)
    }
    val one = Seq((1.0, 2.0)).toDF("a", "b")
    assert(ZOrder.zOrdered(one, Seq("a", "b"), 4).count() == 1)
  }

  test("attribution join on frames with no matching side is empty") {
    val clicks = Seq.empty[(Long, java.sql.Timestamp, Long)]
      .toDF("event_id", "ts", "user_id")
    val purchases = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 7L))
      .toDF("event_id", "ts", "user_id")
    assert(graft.streaming.EventStream.attributionJoin(clicks, purchases)
      .count() == 0)
  }

  test("compaction reduces file count, preserves rows, survives re-run") {
    val dir = java.nio.file.Files.createTempDirectory("compact_spec")
      .resolve("t").toString
    spark.range(10000).selectExpr("id", "id * 2 AS v")
      .repartition(32).write.parquet(dir)
    val (b1, a1) = Compaction.compact(spark, dir, targetFileBytes = 1L << 20)
    assert(b1 == 32 && a1 < b1)
    assert(spark.read.parquet(dir).count() == 10000)
    // idempotent: compacting a compacted table is a no-op-sized rewrite
    val (b2, a2) = Compaction.compact(spark, dir, targetFileBytes = 1L << 20)
    assert(b2 == a1 && a2 <= b2)
    assert(spark.read.parquet(dir).count() == 10000)
  }

  test("profile on an empty frame yields zero counts, null percentages") {
    val row = Profiler.profile(emptyDf).head()
    assert(row.getAs[Long]("n_rows") == 0L)
    assert(row.getAs[Long]("dup_rows") == 0L)
  }

  test("dropNullColumns on an empty frame keeps the frame usable") {
    val out = TransformEngine.dropNullColumns(emptyDf, 0.5)
    assert(out.count() == 0)
  }

  test("dedupe/combineOn with keys absent from the frame are no-ops") {
    val df = Seq((1, "a")).toDF("k", "v")
    assert(TransformEngine.dedupe(df, List("missing")).count() == 1)
    assert(TransformEngine.combineOn(df, List("missing"), Nil).count() == 1)
  }

  test("minhash near-dups on empty and single-doc corpora return no pairs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.minhashNearDups(empty, "doc_id", "text").count() == 0)
    val one = Seq((1L, "only one document here with several words")).toDF("doc_id", "text")
    assert(Dedup.minhashNearDups(one, "doc_id", "text").count() == 0)
  }

  test("text analysis over empty and whitespace-only strings") {
    val df = Seq("", "   ", "\t\n").toDF("text")
    val rows = df.select(
      TextAnalysis.langId($"text").as("lang"),
      TextAnalysis.tokenCount($"text").as("t"),
      TextAnalysis.qualityScore($"text").as("q"),
      TextAnalysis.fingerprint($"text").as("f")).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("lang") == "und")
      assert(r.getAs[Int]("t") == 0)
      // empty text scores 0; whitespace-only earns only the punct band (0.25)
      assert(r.getAs[Double]("q") <= 0.25)
      assert(r.isNullAt(3))
    }
  }

  test("chunking skips empty documents, single-word docs yield one chunk") {
    val df = Seq((1L, ""), (2L, "word"), (3L, "a b c")).toDF("doc_id", "text")
    val out = Curation.chunkDocuments(df, "doc_id", "text", chunkTokens = 2, overlap = 1)
      .collect()
    assert(!out.exists(_.getLong(0) == 1L)) // empty doc dropped
    assert(out.count(_.getLong(0) == 2L) == 1)
  }

  test("scrub on text without PII is the identity") {
    val t = "plain text with no addresses at all"
    assert(Seq(t).toDF("text").select(Curation.scrubPii($"text")).head().getString(0) == t)
  }

  test("concat of a single frame and merge of a single frame are identities") {
    val df = Seq((1, "a")).toDF("k", "v")
    assert(Combiner.concat(Seq(df)).count() == 1)
    assert(Combiner.merge(Seq(df), Seq("k")).count() == 1)
  }

  test("frequency table on an empty frame returns no rows") {
    assert(Profiler.frequencyTable(emptyDf, "report_date").count() == 0)
  }

  test("similarity against an empty data side returns no results") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val q = Seq((0L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Similarity.bruteForceTopK(empty, "vec_id", "embedding", q, 5).count() == 0)
  }

  test("round-4 second-half operators survive empty inputs") {
    import graft.operators.{Graph, Indexing, Snapshot}
    val emptyKV = Seq.empty[(Long, Double)].toDF("k", "v")
    // snapshot diff of two empty versions → empty, schema intact
    val d = Snapshot.snapshotDiff(emptyKV, emptyKV, "k", Seq("v"))
    assert(d.count() == 0 && d.columns.contains("change_type"))
    // pagerank on an empty edge list → no nodes, no failure
    assert(Graph.pageRank(Seq.empty[(Long, Long)].toDF("s", "d"), "s", "d",
      iters = 2).count() == 0)
    // zone map / global index over empty frames → empty
    assert(Indexing.zoneMap(emptyKV, "k", Seq("v"), 10).count() == 0)
    assert(Indexing.globalIndex(emptyKV, "k").count() == 0)
    // weighted sample with k larger than the frame returns every row
    val small = Seq((1L, 3), (2L, 1)).toDF("id", "w")
    assert(Curation.weightedSample(small, "id", "w", k = 10).count() == 2)
    // cross-corpus LSH with one empty side → no pairs
    val docs = Seq((1L, "some long enough text here ok")).toDF("doc_id", "text")
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.minhashCrossDups(docs, noDocs, "doc_id", "text").count() == 0)
  }

  test("round-5 curation/stats additions degrade gracefully on empty input") {
    val emptyText = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // card scrub: no rows in, no rows out; text column keeps its type
    val scrubbed = Curation.scrubCardsWithAudit(emptyText, "doc_id", "text")
    assert(scrubbed.count() == 0 &&
      scrubbed.schema("text").dataType.typeName == "string")
    // text with NO card candidates keeps every row, zero counts, same text
    val clean = Seq((1L, "nothing numeric"), (2L, "")).toDF("doc_id", "text")
    val out = Curation.scrubCardsWithAudit(clean, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("n_cards")).toSeq == Seq(0L, 0L))
    assert(out.map(_.getAs[String]("text")).toSeq == Seq("nothing numeric", ""))
    // quantile prune of an empty frame: empty, not a crash
    val emptyKeyed = Seq.empty[(Long, Long)].toDF("id", "key")
    assert(Curation.pruneBottomQuantile(emptyKeyed, "key", 0.5).count() == 0)
    // exact quantiles of an empty frame: no groups, no failure
    assert(Stats.exactQuantiles(emptyKeyed.withColumnRenamed("key", "v")
      .withColumn("g", lit("x")), Seq("g"), "v", Seq(0.5)).count() == 0)
  }

  test("privacy/agreement/rank additions degrade gracefully on empty input") {
    // t-closeness over an empty frame: no classes, no rows, no crash
    val emptyGs = Seq.empty[(String, String)].toDF("g", "s")
    assert(Stats.tCloseness(emptyGs, Seq("g"), "s", 1L, 5L).count() == 0)
    // one-class frame matching itself: TVD exactly 0, never violating
    val one = Seq(("g1", "A"), ("g1", "B")).toDF("g", "s")
    val r = Stats.tCloseness(one, Seq("g"), "s", 1L, 100L).head()
    assert(r.getAs[Double]("tvd") == 0.0 && !r.getAs[Boolean]("violates_t"))
    // kappa on an empty frame: one row, zero counts, null kappa (0/0)
    val emptyBb = Seq.empty[(Boolean, Boolean)].toDF("ra", "rb")
    val k = Stats.cohenKappa(emptyBb, col("ra"), col("rb")).head()
    assert(k.getAs[Long]("n_docs") == 0L)
    assert(k.isNullAt(k.fieldIndex("kappa")) ||
      k.getAs[Double]("kappa").isNaN) // 0/0 — undefined, never a crash
    // effective rank of an empty embedding frame: no vectors, no crash
    val emptyVec = Seq.empty[(Long, Array[Float])].toDF("id", "vec")
    val er = graft.operators.Similarity.effectiveRank(emptyVec, "id", "vec")
    assert(er.count() <= 1)
  }

  test("time-series/monitoring additions degrade gracefully on short input") {
    import graft.operators.Stats
    // series shorter than the period: every trend/remainder is null
    val short = Seq((1, 5L), (2, 6L)).toDF("i", "y")
    val sd = graft.operators.Resample.seasonalDecompose(short, "i", "y", 7)
      .orderBy("i").collect()
    assert(sd.length == 2 && sd.forall(_.isNullAt(2)))
    // CUSUM over a single bucket: zero deviation, no crash
    val one = Seq((1, 5L)).toDF("d", "y")
    val cu = Stats.cusumChangepoint(one, "d", "y").head()
    assert(cu.getAs[Long]("max_dev") == 0L &&
      cu.getAs[Double]("uniformity_distance") == 0.0)
    // CUSUM with zero totals: null distance rather than a divide error
    val zeros = Seq((1, 0L), (2, 0L)).toDF("d", "y")
    val cz = Stats.cusumChangepoint(zeros, "d", "y").head()
    assert(cz.isNullAt(cz.fieldIndex("uniformity_distance")))
    // Gini of a single key: 2·1·x − 2x = 0 → perfectly equal
    val single = Seq("only", "only", "only").toDF("k")
    assert(Stats.giniConcentration(single, "k").head()
      .getAs[Double]("gini") == 0.0)
    // KS with one empty side: null statistic, no crash
    val oneSided = Seq(("A", 1L), ("A", 2L)).toDF("g", "v")
    val ks = Stats.ksTest(oneSided, "v", "g", "A", "B").head()
    assert(ks.getAs[Long]("n_b") == 0L && ks.isNullAt(ks.fieldIndex("ks")))
  }
}
