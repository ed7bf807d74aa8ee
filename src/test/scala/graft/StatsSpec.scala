package graft

import graft.functions.Curation
import graft.operators.Stats
import org.apache.spark.sql.functions._

/** Stats operators: correlation, OLS, winsorize, k-anonymity, boilerplate
  * removal — closed-form results checked against hand-computed values. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("correlationMatrix: perfect line r=1, anti-line r=-1, one row per pair") {
    val df = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0),
      (4.0, 8.0, -4.0)).toDF("x", "y", "z")
    val m = Stats.correlationMatrix(df, Seq("x", "y", "z"))
      .orderBy("col_x", "col_y").collect()
    assert(m.length == 3)
    val byPair = m.map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(byPair(("x", "y")) == 1.0)
    assert(byPair(("x", "z")) == -1.0)
    assert(byPair(("y", "z")) == -1.0)
  }

  test("olsTrend: recovers exact slope/intercept of a noiseless line per group") {
    val df = (0 to 9).flatMap(i => Seq(("a", i, 3.0 * i + 1.0), ("b", i, -0.5 * i + 4.0)))
      .toDF("g", "x", "y")
    val fit = Stats.olsTrend(df, Seq("g"), "x", "y").orderBy("g").collect()
    assert(fit(0).getString(0) == "a" && fit(0).getLong(1) == 10)
    assert(fit(0).getDouble(2) == 3.0 && fit(0).getDouble(3) == 1.0)
    assert(fit(1).getDouble(2) == -0.5 && fit(1).getDouble(3) == 4.0)
  }

  test("winsorize: values clamp to the discrete percentile bounds per group") {
    val df = ((1 to 100).map(i => ("g", i.toDouble)) :+ (("g", 10000.0)))
      .toDF("grp", "v")
    val w = Stats.winsorize(df, "grp", "v", 0.05, 0.95)
    val rows = w.select("v", "__lo", "__hi", "__w").collect()
    val lo = rows.head.getDouble(1)
    val hi = rows.head.getDouble(2)
    assert(lo > 1.0 && hi < 10000.0)
    assert(rows.forall(r => r.getDouble(3) >= lo && r.getDouble(3) <= hi))
    // the outlier clamps to hi; in-range values pass through
    assert(rows.find(_.getDouble(0) == 10000.0).get.getDouble(3) == hi)
    assert(rows.find(_.getDouble(0) == 50.0).get.getDouble(3) == 50.0)
  }

  test("kAnonymity: reports min class size, violators, and rows at risk") {
    val df = (Seq.fill(5)(("US", "A")) ++ Seq.fill(3)(("US", "B")) ++
      Seq(("FI", "A"))).toDF("country", "seg")
    val r = Stats.kAnonymity(df, Seq("country", "seg"), 3L).head()
    assert(r.getLong(0) == 3L)           // k
    assert(r.getLong(1) == 1L)           // min class size (FI,A)
    assert(r.getLong(2) == 3L)           // classes
    assert(r.getLong(3) == 1L)           // violating classes
    assert(r.getLong(4) == 1L)           // rows at risk
    assert(!r.getBoolean(5))             // not 3-anonymous
    assert(Stats.kAnonymity(df, Seq("seg"), 3L).head().getBoolean(5))
  }

  test("bpeLearnMerges: hand-computed merge sequence with weighted counts and tie order") {
    // corpus: aaab ×2, ab ×1 →
    //   iter1: 'a a' appears 2× in aaab, weighted 4 > 'a b' (3) → merge 'a a'
    //   iter2: vocab 'aa a b'(2), 'a b'(1) → 'a b' = 3 > 'aa a' = 2
    //   iter3: vocab 'aa ab'(2), 'ab'(1) → 'aa ab' = 2
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val m = graft.functions.TextAnalysis.bpeLearnMerges(docs, "text", iters = 3)
      .orderBy("iter").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(m.toSeq == Seq((1, "a a", 4L), (2, "a b", 3L), (3, "aa ab", 2L)))
  }

  test("bpeLearnMerges: single-char words contribute no pairs") {
    val docs = Seq((1L, "a a a bc")).toDF("doc_id", "text")
    val m = graft.functions.TextAnalysis.bpeLearnMerges(docs, "text", iters = 1)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(m.toSeq == Seq(("b c", 1L)))
  }

  test("bpeEncode: subword counts reflect the learned merges") {
    // merges: 'a a', then 'a b', then 'aa ab' — so aaab collapses all the
    // way to ONE token and ab to one: "aaab aaab ab" → 1+1+1 subwords;
    // with only 2 merges applied it is 2+2+1
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val r3 = graft.functions.TextAnalysis.bpeEncode(docs, "doc_id", "text", 3)
      .head()
    assert(r3.getLong(1) == 3 && r3.getLong(2) == 10 && r3.getLong(3) == 3)
    val r2 = graft.functions.TextAnalysis.bpeEncode(docs, "doc_id", "text", 2)
      .head()
    assert(r2.getLong(3) == 5)
  }

  test("epochShuffle: seeded permutation is deterministic, positions contiguous per shard") {
    val df = (1L to 100L).map(i => Tuple1(i)).toDF("id")
    val a = Curation.epochShuffle(df, "id", "s1", 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    val b = Curation.epochShuffle(df, "id", "s1", 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq) // same seed → identical shards AND positions
    val c = Curation.epochShuffle(df, "id", "s2", 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    assert(a.toSeq != c.toSeq) // new seed → new permutation
    assert(a.length == 100)
    // positions are 1..n within each shard
    a.groupBy(_._2).values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
  }

  test("clusterInertia: hand-computed centroid distances") {
    val df = Seq((1L, 0, Seq(0.0f, 0.0f)), (2L, 0, Seq(2.0f, 0.0f)),
      (3L, 1, Seq(5.0f, 5.0f))).toDF("id", "cell", "vec")
    val r = graft.operators.Stats.clusterInertia(df, "id", "cell", "vec")
      .orderBy("cell").collect()
    // cell 0: centroid (1,0), inertia 1+1 = 2, avg 1; cell 1: singleton, 0
    assert(r(0).getLong(1) == 2 && r(0).getDouble(2) == 2.0 &&
      r(0).getDouble(3) == 1.0)
    assert(r(1).getLong(1) == 1 && r(1).getDouble(2) == 0.0)
  }

  test("simplifiedSilhouette: hand-computed a/b distances; misassigned " +
      "point counted; single-cluster silhouette is null") {
    // cell 0 at x≈0, cell 1 at x≈10; point 4 labeled 0 but sits at x=9
    val df = Seq(
      (1L, 0, Seq(0.0f, 0.0f)), (2L, 0, Seq(2.0f, 0.0f)),
      (3L, 1, Seq(10.0f, 0.0f)), (5L, 1, Seq(12.0f, 0.0f)),
      (4L, 0, Seq(9.0f, 0.0f))).toDF("id", "cell", "vec")
    val r = graft.operators.Stats.simplifiedSilhouette(df, "id", "cell", "vec")
      .collect()
    // centroids: cell0 = (11/3, 0), cell1 = (11, 0)
    // point 4: a = |9 - 11/3| = 16/3, b = |9-11| = 2 -> b < a, misassigned
    val c0 = r.find(_.getAs[Long]("cell") == 0L).get
    assert(c0.getAs[Long]("n_vectors") == 3L)
    assert(c0.getAs[Long]("n_misassigned") == 1L)
    val c1 = r.find(_.getAs[Long]("cell") == 1L).get
    assert(c1.getAs[Long]("n_misassigned") == 0L)
    // tight well-separated cells: mean silhouette strongly positive
    assert(c1.getAs[Double]("mean_silhouette") > 0.5)
    // single cluster: no foreign centroid -> null mean, 0 misassigned
    val one = graft.operators.Stats.simplifiedSilhouette(
      df.withColumn("cell", lit(0)), "id", "cell", "vec").collect()
    assert(one.length == 1 && one.head.isNullAt(2) &&
      one.head.getAs[Long]("n_misassigned") == 0L)
  }

  test("adjustedRandIndex: identical partitions = 1, maximally crossed " +
      "2x2 = -0.5, degenerate = null") {
    val same = Seq((1L, 0, 0), (2L, 0, 0), (3L, 1, 1), (4L, 1, 1))
      .toDF("id", "a", "b")
    val r1 = graft.operators.Stats.adjustedRandIndex(same, "id", "a", "b")
      .collect().head
    assert(r1.getAs[Long]("n_items") == 4L)
    assert(r1.getAs[Long]("pairs_both") == 2L)
    assert(r1.getAs[Double]("ari") == 1.0)
    // every (a,b) cell is a singleton: 0 co-pairs, E = 2/3, den = 4/3
    val crossed = Seq((1L, 0, 0), (2L, 0, 1), (3L, 1, 0), (4L, 1, 1))
      .toDF("id", "a", "b")
    val r2 = graft.operators.Stats.adjustedRandIndex(crossed, "id", "a", "b")
      .collect().head
    assert(r2.getAs[Long]("pairs_both") == 0L)
    assert(r2.getAs[Double]("ari") == -0.5)
    // all-singleton partitions on both sides: denominator 0 -> null
    val single = Seq((1L, 1, 1), (2L, 2, 2), (3L, 3, 3)).toDF("id", "a", "b")
    val r3 = graft.operators.Stats.adjustedRandIndex(single, "id", "a", "b")
      .collect().head
    assert(r3.isNullAt(2))
  }

  test("prefixFilterJoin finds EXACTLY the exhaustive ≥0.8-Jaccard pairs (no false negatives)") {
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again today",
      2L -> "the quick brown fox jumps over the lazy dog again tomorrow",
      3L -> "a completely different sentence about spark query planning",
      4L -> "a completely different sentence about spark query planning", // exact dup of 3
      5L -> "nothing in common with anything else whatsoever here now")
    val df = texts.toDF("doc_id", "text")
    val got = graft.operators.Dedup.prefixFilterJoin(df, "doc_id", "text", 4, 5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exhaustive ground truth on 3-word shingle sets
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val expected = (for {
      (ia, ta) <- texts; (ib, tb) <- texts if ia < ib
      i = (shingles(ta) intersect shingles(tb)).size
      u = (shingles(ta) union shingles(tb)).size
      if i * 5 >= 4 * u
    } yield (ia, ib)).toSet
    assert(got == expected)
    assert(expected.contains((3L, 4L))) // sanity: the planted pairs exist
    assert(expected.contains((1L, 2L)))
    // exact-dup pair is expanded from the content group, Jaccard exactly 1
    val full = graft.operators.Dedup.prefixFilterJoin(df, "doc_id", "text", 4, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(full((3L, 4L)) == 1.0)
    assert(full((1L, 2L)) < 1.0 && full((1L, 2L)) >= 0.8)
    // maxTokenDf=0 (default) is the zero-false-negative contract; a cap of 1
    // bars every shared prefix token of the near-dup pair (their shared
    // shingles have rep-df 2) but can never drop the within-group exact dup
    val capped = graft.operators.Dedup
      .prefixFilterJoin(df, "doc_id", "text", 4, 5, maxTokenDf = 1)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((3L, 4L)))
    // diagnostic: shared prefix shingles of the (1,2) pair show df_pref=2 →
    // 1 candidate pair; everything is over DISTINCT contents (3≡4 collapse)
    val stats = graft.operators.Dedup
      .prefixCandidateStats(df, "doc_id", "text", 4, 5).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(stats.values.forall { case (df_, dp, cp) =>
      dp <= df_ && cp == dp * (dp - 1) / 2 })
    assert(stats.values.exists(_._3 == 1L)) // at least one real candidate token
  }

  test("removeBoilerplate: recurring segments drop everywhere, order survives, all-boilerplate docs stay") {
    val docs = Seq(
      (1L, "foo bar alpha beta next one"),
      (2L, "foo bar gamma delta"),
      (3L, "foo bar"),
      (4L, "solo text here now")).toDF("doc_id", "text")
    val out = Curation.removeBoilerplate(docs, "doc_id", "text",
        segWords = 2, minDocs = 3)
      .orderBy("doc_id").collect()
    // "foo bar" appears in 3 distinct docs → boilerplate
    assert(out(0).getString(1) == "alpha beta next one" &&
      out(0).getLong(2) == 2 && out(0).getLong(3) == 1)
    assert(out(1).getString(1) == "gamma delta")
    assert(out(2).getString(1) == "" && out(2).getLong(2) == 0 &&
      out(2).getLong(3) == 1) // fully boilerplate, still present
    assert(out(3).getString(1) == "solo text here now" && out(3).getLong(3) == 0)
  }

  test("exactQuantiles: odd/even groups, interpolated quartiles, n") {
    val df = (Seq(("odd", 10.0), ("odd", 20.0), ("odd", 30.0),
        ("odd", 40.0), ("odd", 50.0)) ++
      Seq(("even", 1.0), ("even", 2.0), ("even", 3.0), ("even", 4.0)))
      .toDF("g", "v")
    val out = Stats.exactQuantiles(df, Seq("g"), "v", Seq(0.25, 0.5, 0.75))
      .orderBy("g").collect()
    // even n=4: pos(q)=3q → p25 at 0.75 between 1 and 2, median 2.5
    assert(out(0).getString(0) == "even")
    assert(out(0).getDouble(1) == 1.75 && out(0).getDouble(2) == 2.5 &&
      out(0).getDouble(3) == 3.25 && out(0).getLong(4) == 4L)
    // odd n=5: pos(q)=4q lands on exact ranks — no interpolation
    assert(out(1).getString(0) == "odd")
    assert(out(1).getDouble(1) == 20.0 && out(1).getDouble(2) == 30.0 &&
      out(1).getDouble(3) == 40.0 && out(1).getLong(4) == 5L)
  }

  test("madOutliers flags the extreme day a mean/std z-score would mask") {
    val df = (Seq(8.0, 9.0, 10.0, 11.0, 12.0, 1000.0).map(("a", _)) ++
      Seq(5.0, 5.0, 5.0).map(("flat", _))).toDF("g", "v")
    val out = Stats.madOutliers(df, Seq("g"), "v").collect()
    val a = out.filter(_.getString(0) == "a")
    // median 10.5, MAD 1.5: the 1000 day is z ≈ 445 — flagged. (Its own
    // presence drags the MEAN to 175 and the stddev to ~404, so the
    // classic z-score is only ~2 and would miss it.)
    assert(a.count(_.getAs[Boolean]("is_anomaly")) == 1)
    assert(a.find(_.getAs[Double]("v") == 1000.0)
      .get.getAs[Double]("robust_z") > 100)
    assert(a.find(_.getAs[Double]("v") == 8.0)
      .get.getAs[Double]("robust_z") < 0) // signed, not |z|
    // all-identical group: MAD = 0 → null z, nothing flagged
    val flat = out.filter(_.getString(0) == "flat")
    assert(flat.forall(r => r.isNullAt(r.fieldIndex("robust_z")) &&
      !r.getAs[Boolean]("is_anomaly")))
  }

  test("exactQuantiles: single-row group returns the value at every q") {
    val df = Seq(("a", 7.5)).toDF("g", "v")
    val r = Stats.exactQuantiles(df, Seq("g"), "v", Seq(0.25, 0.5, 0.75)).collect().head
    assert(r.getDouble(1) == 7.5 && r.getDouble(2) == 7.5 && r.getDouble(3) == 7.5)
    assert(r.getLong(4) == 1L)
  }

  test("globalQuantiles: percentile_disc ranks on hand data; duplicates " +
    "and nulls handled; no single-partition window in the plan") {
    // values 10,20,...,100 (n=10): p25 → rank ceil(2500*10/10000)=3 → 30;
    // p50 → rank 5 → 50; p90 → rank 9 → 90; p100 → rank 10 → 100
    val df = ((1 to 10).map(i => Some(i * 10.0)) :+ None)
      .toDF("v")
    val r = Stats.globalQuantiles(df, "v", Seq(2500, 5000, 9000, 10000))
      .collect()
    assert(r.map(_.getAs[Double]("q")).toSeq ==
      Seq(0.25, 0.5, 0.9, 1.0))
    assert(r.map(_.getAs[Long]("rank")).toSeq == Seq(3L, 5L, 9L, 10L))
    assert(r.map(_.getAs[Double]("value")).toSeq ==
      Seq(30.0, 50.0, 90.0, 100.0))
    assert(r.forall(_.getAs[Long]("n_values") == 10L)) // null excluded
    // duplicates: 1,1,1,9 (n=4): p50 → rank 2 → 1; p7500 → rank 3 → 1;
    // p7600 → rank ceil(3.04)=4 → 9
    val dup = Seq(1.0, 1.0, 1.0, 9.0).toDF("v")
    val d = Stats.globalQuantiles(dup, "v", Seq(5000, 7500, 7600))
      .collect()
    assert(d.map(_.getAs[Double]("value")).toSeq == Seq(1.0, 1.0, 9.0))
    // the integer-bps rank would be WRONG in double arithmetic:
    // ceil(0.1 * 30) in IEEE is 4, the exact rational rank is 3
    val thirty = (1 to 30).map(_.toDouble).toDF("v")
    val t = Stats.globalQuantiles(thirty, "v", Seq(1000)).collect().head
    assert(t.getAs[Long]("rank") == 3L && t.getAs[Double]("value") == 3.0)
    // scale shape: the only ungrouped window orders by __pid — the
    // ≤|partitions|-row offsets frame of the prefix-sum path; the
    // corpus-sized cumulative NEVER rides a single-partition window
    val plan = Stats.globalQuantiles(df, "v", Seq(5000))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val ungrouped = """windowspecdefinition\(([^,)]*) (ASC|DESC)""".r
    val heads = ungrouped.findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(heads.forall(_.contains("__pid")),
      "corpus-sized ungrouped window found:\n" + heads.mkString(", "))
  }

  test("globalQuantilesBy: per-group percentile_disc ranks; groups " +
    "independent; nulls excluded per group") {
    // g=a: 10..100 (n=10); g=b: 1,1,9 (n=3, duplicates)
    val df = ((1 to 10).map(i => ("a", Some(i * 10.0))) ++
      Seq(("b", Some(1.0)), ("b", Some(1.0)), ("b", Some(9.0)),
        ("b", None))).toDF("g", "v")
    val r = Stats.globalQuantilesBy(df, "g", "v", Seq(5000, 9000))
      .collect()
    val a = r.filter(_.getAs[String]("g") == "a")
    assert(a.map(x => (x.getAs[Double]("q"), x.getAs[Long]("rank"),
      x.getAs[Double]("value"))).toSeq ==
      Seq((0.5, 5L, 50.0), (0.9, 9L, 90.0)))
    val b = r.filter(_.getAs[String]("g") == "b")
    // n=3: p50 → rank 2 → 1.0; p90 → rank ceil(2.7)=3 → 9.0
    assert(b.map(x => (x.getAs[Double]("q"), x.getAs[Long]("rank"),
      x.getAs[Double]("value"))).toSeq ==
      Seq((0.5, 2L, 1.0), (0.9, 3L, 9.0)))
    assert(b.forall(_.getAs[Long]("n_values") == 3L))
  }

  test("tCloseness: exact TVD per class, absent values included, t gate") {
    // global: A=9/12, B=3/12. g1 (2A,2B): TVD=.25; g2 (4A): TVD=.25 — the
    // B it never saw must count; g3 (3A,1B) matches global: TVD=0.
    val df = (Seq.fill(2)(("g1", "A")) ++ Seq.fill(2)(("g1", "B")) ++
      Seq.fill(4)(("g2", "A")) ++
      Seq.fill(3)(("g3", "A")) ++ Seq(("g3", "B"))).toDF("g", "s")
    val r = Stats.tCloseness(df, Seq("g"), "s", 1L, 5L).orderBy("g").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(4L, 4L, 4L))
    assert(r.map(_.getDouble(2)).toSeq == Seq(0.25, 0.25, 0.0))
    assert(r.map(_.getBoolean(3)).toSeq == Seq(true, true, false))
    // exactly-at-threshold is NOT a violation (strict >): t = 1/4
    val eq = Stats.tCloseness(df, Seq("g"), "s", 1L, 4L).orderBy("g").collect()
    assert(eq.map(_.getBoolean(3)).toSeq == Seq(false, false, false))
  }

  test("ridge2: recovers an exact planar fit at lambda=0; singular gives nulls") {
    // y = 2*x1 + 3*x2 + 5 exactly on non-collinear integer points
    val df = Seq((1.0, 1.0, 10.0), (2.0, 1.0, 12.0), (1.0, 2.0, 13.0),
      (3.0, 2.0, 17.0)).toDF("x1", "x2", "y")
    val r = Stats.ridge2(df, "x1", "x2", "y", lambda = 0.0).head()
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 2.0 && r.getDouble(2) == 3.0 &&
      r.getDouble(3) == 5.0)
    assert(r.getDouble(4) == 1.0)
    // constant feature at lambda=0: singular normal matrix → null weights
    val sing = Seq((1.0, 7.0, 1.0), (2.0, 7.0, 2.0), (3.0, 7.0, 3.0))
      .toDF("x1", "x2", "y")
    val rs = Stats.ridge2(sing, "x1", "x2", "y", lambda = 0.0).head()
    assert(rs.isNullAt(1) && rs.isNullAt(2) && rs.isNullAt(3) && rs.isNullAt(4))
    // ...but ridge regularization makes the same system solvable
    val rr = Stats.ridge2(sing, "x1", "x2", "y", lambda = 1.0).head()
    assert(!rr.isNullAt(1))
  }

  test("chiSquare: independent table gives 0, perfect association gives V=1") {
    val indep = Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val r0 = Stats.chiSquare(indep.toDF("r", "c"), "r", "c").head()
    assert(r0.getAs[Long]("n_rows") == 40L && r0.getAs[Long]("dof") == 1L)
    assert(r0.getAs[Double]("chi2") == 0.0 && r0.getAs[Double]("cramers_v") == 0.0)
    // diagonal-only table: the two ABSENT cells must contribute E=5 each
    val assoc = Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("b", "y"))
    val r1 = Stats.chiSquare(assoc.toDF("r", "c"), "r", "c").head()
    assert(r1.getAs[Long]("n_cells") == 4L)
    assert(r1.getAs[Double]("chi2") == 20.0)
    assert(r1.getAs[Double]("cramers_v") == 1.0)
    // single-column table: dof 0, V undefined → null, no divide error
    val flat = Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("b", "x"))
    val r2 = Stats.chiSquare(flat.toDF("r", "c"), "r", "c").head()
    assert(r2.getAs[Long]("dof") == 0L &&
      r2.isNullAt(r2.fieldIndex("cramers_v")))
  }

  test("ksTest: exact sup-distance; identical gives 0, disjoint gives 1") {
    val df = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("B", 2L), ("B", 3L),
      ("B", 4L)).toDF("g", "v")
    val r = Stats.ksTest(df, "v", "g", "A", "B").head()
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("ks_num") == 3L) // sup |F_A - F_B| = 1/3
    assert(r.getAs[Double]("ks") == 0.333333)
    val same = Seq(("A", 5L), ("A", 7L), ("B", 5L), ("B", 7L)).toDF("g", "v")
    assert(Stats.ksTest(same, "v", "g", "A", "B").head()
      .getAs[Double]("ks") == 0.0)
    val disjoint = Seq(("A", 1L), ("A", 2L), ("B", 8L), ("B", 9L)).toDF("g", "v")
    assert(Stats.ksTest(disjoint, "v", "g", "A", "B").head()
      .getAs[Double]("ks") == 1.0)
  }

  test("benfordAudit: string-of-integer digit extraction, exact shares") {
    // digits: 1 (from 1.5, 123.0, 19.9), 9 (from 987.0), sub-1 filtered
    val df = Seq(1.5, 123.0, 19.9, 987.0, 0.4).toDF("v")
    val out = Stats.benfordAudit(df, "v").orderBy("digit").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 3L), (9L, 1L)))
    assert(out.head.getAs[Double]("observed") == 0.75)
    assert(out.head.getAs[Double]("benford") == 0.30103) // log10(2)
  }

  test("mannWhitney: exact U with ties; separated groups hit the extremes") {
    // A={1,2}, B={3,4}: A never wins → U_A = 0; no ties → tsum term 0
    val sep = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L)).toDF("g", "v")
    val r = Stats.mannWhitney(sep, "v", "g", "A", "B").head()
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("u2") == 0L && r.getAs[Double]("u") == 0.0)
    assert(r.getAs[Double]("z") < -1.5)
    // fully tied on one value: U = n1*n2/2 (all average ranks), σ = 0 → z null
    val tied = Seq(("A", 5L), ("A", 5L), ("B", 5L)).toDF("g", "v")
    val rt = Stats.mannWhitney(tied, "v", "g", "A", "B").head()
    assert(rt.getAs[Double]("u") == 1.0) // 2*1*(2*0+3+1)/2... U_A = n1*n2/2
    assert(rt.isNullAt(rt.fieldIndex("z")))
    // hand case with a tie across groups: A={1,2}, B={2,3}
    // ranks: 1→1, 2,2→avg 2.5, 3→4; R_A = 3.5 → U_A = 3.5 - 3 = 0.5
    val mix = Seq(("A", 1L), ("A", 2L), ("B", 2L), ("B", 3L)).toDF("g", "v")
    val rm = Stats.mannWhitney(mix, "v", "g", "A", "B").head()
    assert(rm.getAs[Long]("u2") == 1L && rm.getAs[Double]("u") == 0.5)
  }

  test("mixDrift: matching groups give 0, shifted groups get symmetric chi2") {
    // both groups match the pooled 50/50 mix exactly → zero drift
    val even = Seq(("d1", "a"), ("d1", "b"), ("d2", "a"), ("d2", "b"))
      .toDF("g", "c")
    val r0 = Stats.mixDrift(even, "g", "c").orderBy("g").collect()
    assert(r0.map(_.getAs[Double]("chi2")).toSeq == Seq(0.0, 0.0))
    // pooled mix 6a:2b; d1=(2a,2b), d2=(4a,0b): chi2 = 1/3 + 1 each —
    // the absent (d2, b) cell must contribute its expected mass
    val skew = (Seq.fill(2)(("d1", "a")) ++ Seq.fill(2)(("d1", "b")) ++
      Seq.fill(4)(("d2", "a"))).toDF("g", "c")
    val r1 = Stats.mixDrift(skew, "g", "c").orderBy("g").collect()
    assert(r1.map(_.getAs[Long]("n_rows")).toSeq == Seq(4L, 4L))
    assert(r1.map(_.getAs[Double]("chi2")).toSeq == Seq(1.333333, 1.333333))
  }

  test("cusumChangepoint: finds the rate-shift day; uniform series scores 0") {
    // rate triples after day 3 → max |n·P_t − t·T| lands on day 3
    val shift = Seq((1, 1L), (2, 1L), (3, 1L), (4, 9L), (5, 9L), (6, 9L))
      .toDF("day", "y")
    val r = Stats.cusumChangepoint(shift, "day", "y").head()
    assert(r.getAs[Long]("n_buckets") == 6L && r.getAs[Long]("total") == 30L)
    assert(r.getAs[Int]("changepoint") == 3)
    assert(r.getAs[Long]("max_dev") == 72L)
    assert(r.getAs[Double]("uniformity_distance") == 0.4)
    // perfectly uniform: zero deviation, earliest day wins the tie
    val flat = (1 to 6).map(d => (d, 5L)).toDF("day", "y")
    val rf = Stats.cusumChangepoint(flat, "day", "y").head()
    assert(rf.getAs[Long]("max_dev") == 0L &&
      rf.getAs[Int]("changepoint") == 1 &&
      rf.getAs[Double]("uniformity_distance") == 0.0)
  }

  test("giniConcentration: equal counts give 0, (1,9) split gives 0.4") {
    val equal = (1 to 4).flatMap(u => Seq.fill(3)(s"u$u")).toDF("k")
    val re = Stats.giniConcentration(equal, "k").head()
    assert(re.getAs[Long]("n_keys") == 4L && re.getAs[Long]("total") == 12L)
    assert(re.getAs[Double]("gini") == 0.0)
    val skewed = (Seq.fill(1)("a") ++ Seq.fill(9)("b")).toDF("k")
    val rs = Stats.giniConcentration(skewed, "k").head()
    assert(rs.getAs[Double]("gini") == 0.4)
  }

  test("autocorrelation: period-3 series has acf=1 at lag 3, negative at lag 1") {
    val df = (1 to 12).map(i => (i, Seq(3L, 6L, 9L)((i - 1) % 3))).toDF("i", "y")
    val out = Stats.autocorrelation(df, "i", "y", maxLag = 3)
      .orderBy("lag").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getLong(1)).toSeq == Seq(11L, 10L, 9L))
    assert(out(2).getDouble(2) == 1.0) // exact self-similarity at the period
    assert(out(0).getDouble(2) < 0.0) // adjacent values anti-correlate
    // constant series: zero variance → null acf, no divide error
    val flat = (1 to 6).map(i => (i, 5L)).toDF("i", "y")
    val rf = Stats.autocorrelation(flat, "i", "y", maxLag = 2).collect()
    assert(rf.forall(r => r.isNullAt(2)))
  }

  test("cohenKappa: textbook 2x2 table gives kappa = 0.4") {
    // a=20 b=5 c=10 d=15: po=.7, pe=.5, kappa=(.7-.5)/(1-.5)=0.4
    val rows = Seq.fill(20)((true, true)) ++ Seq.fill(5)((true, false)) ++
      Seq.fill(10)((false, true)) ++ Seq.fill(15)((false, false))
    val r = Stats.cohenKappa(rows.toDF("ra", "rb"), col("ra"), col("rb")).head()
    assert(r.getLong(0) == 20L && r.getLong(1) == 5L &&
      r.getLong(2) == 10L && r.getLong(3) == 15L)
    assert(r.getLong(4) == 50L)
    assert(r.getDouble(5) == 0.4)
    // perfect agreement: kappa = 1
    val perfect = Seq.fill(3)((true, true)) ++ Seq.fill(3)((false, false))
    assert(Stats.cohenKappa(perfect.toDF("ra", "rb"),
      col("ra"), col("rb")).head().getDouble(5) == 1.0)
  }

  test("dpCounts: seeded Laplace release is deterministic, bounded, unbiased-ish") {
    val df = (Seq.fill(100)("a") ++ Seq.fill(50)("b") ++ Seq.fill(7)("c"))
      .toDF("g")
    val r1 = Stats.dpCounts(df, "g", epsilon = 0.5, seed = "s1")
      .orderBy("g").collect()
    val r2 = Stats.dpCounts(df, "g", epsilon = 0.5, seed = "s1")
      .orderBy("g").collect()
    // same seed → bit-identical release (one privacy-budget spend)
    assert(r1.map(_.getDouble(1)).toSeq == r2.map(_.getDouble(1)).toSeq)
    // a different seed draws different noise
    val r3 = Stats.dpCounts(df, "g", epsilon = 0.5, seed = "s2")
      .orderBy("g").collect()
    assert(r1.map(_.getDouble(1)).toSeq != r3.map(_.getDouble(1)).toSeq)
    // noise has Laplace(2) scale: |released − true| < 40 with prob 1−2e−20;
    // anything bigger is an arithmetic bug, not bad luck
    val truth = Map("a" -> 100.0, "b" -> 50.0, "c" -> 7.0)
    r1.foreach { r =>
      assert(math.abs(r.getDouble(1) - truth(r.getString(0))) < 40.0, r)
    }
    assert(r1.forall(_.getDouble(2) == 0.5)) // epsilon echoed
    val e = intercept[IllegalArgumentException](
      Stats.dpCounts(df, "g", epsilon = 0.0, seed = "s"))
    assert(e.getMessage.contains("epsilon"))
    // binding the seed to a dataset version changes the noise stream —
    // adjacent snapshots under one seed no longer share noise
    val v1 = Stats.dpCounts(df, "g", 0.5, "s1", datasetVersion = "v1")
      .orderBy("g").collect()
    assert(v1.map(_.getDouble(1)).toSeq != r1.map(_.getDouble(1)).toSeq)
  }

  test("PrivacyLedger spends per release, replays free, refuses over budget") {
    val df = (Seq.fill(10)("a") ++ Seq.fill(5)("b")).toDF("g")
    val ledger = new graft.operators.PrivacyLedger(budget = 1.0)
    val first = ledger.release(df, "g", epsilon = 0.6, seed = "s1",
      datasetVersion = "v1").orderBy("g").collect()
    assert(ledger.spent("v1") == 0.6)
    // replaying the SAME (version, seed, eps) is free and bit-identical
    val replay = ledger.release(df, "g", 0.6, "s1", "v1")
      .orderBy("g").collect()
    assert(replay.map(_.getDouble(1)).toSeq ==
      first.map(_.getDouble(1)).toSeq)
    assert(ledger.spent("v1") == 0.6)
    // a second seed against the same version would cross 1.0 → refused
    // BEFORE any frame is built
    val e = intercept[IllegalStateException](
      ledger.release(df, "g", 0.6, "s2", "v1"))
    assert(e.getMessage.contains("budget exhausted"), e.getMessage)
    assert(ledger.spent("v1") == 0.6) // refusal spends nothing
    // a smaller release still fits; other versions are independent
    ledger.release(df, "g", 0.4, "s3", "v1")
    assert(math.abs(ledger.remaining("v1")) < 1e-9)
    ledger.release(df, "g", 0.9, "s1", "v2")
    assert(ledger.spent("v2") == 0.9)
  }

  test("Caches.withCaches frees exactly the caches the block created") {
    val sc = spark.sparkContext
    // a pre-existing cache must survive the scope
    val outer = Seq(1, 2, 3).toDF("x").persist()
    outer.count()
    val before = sc.getPersistentRDDs.size
    graft.operators.Caches.withCaches(spark) {
      // correlationTest/chi-square persist contingency cells internally;
      // materialize through an action inside the scope
      val inner = Seq(("a", 1.0), ("b", 2.0), ("a", 3.0)).toDF("k", "v")
        .persist()
      assert(inner.count() == 3)
      assert(sc.getPersistentRDDs.size > before)
    }
    // scope exit released the inner cache (async unpersist — poll briefly)
    val deadline = System.currentTimeMillis + 10000
    while (sc.getPersistentRDDs.size > before &&
      System.currentTimeMillis < deadline) Thread.sleep(50)
    assert(sc.getPersistentRDDs.size == before)
    assert(sc.getPersistentRDDs.nonEmpty) // outer cache untouched
    outer.unpersist()
  }

  test("binaryAuc: perfect separation 1.0, reversed 0.0, all-tied 0.5") {
    val perfect = Seq((1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1))
      .toDF("score", "y")
    val p = Stats.binaryAuc(perfect, "score", $"y" === 1).head()
    assert(p.getAs[Long]("n_pos") == 2 && p.getAs[Long]("n_neg") == 2)
    assert(p.getAs[Double]("auc") == 1.0)
    assert(p.getAs[Double]("gini") == 1.0)
    assert(p.getAs[Double]("ks") == 1.0)

    val reversed = Stats.binaryAuc(perfect, "score", $"y" === 0).head()
    assert(reversed.getAs[Double]("auc") == 0.0)

    val tied = Seq((5.0, 0), (5.0, 1), (5.0, 0), (5.0, 1)).toDF("score", "y")
    val tr = Stats.binaryAuc(tied, "score", $"y" === 1).head()
    assert(tr.getAs[Double]("auc") == 0.5) // ties count half
    assert(tr.getAs[Double]("ks") == 0.0)
  }

  test("binaryAuc: hand case with a tie matches the rank formula; " +
    "single-class emits null") {
    // scores: pos {3, 2}, neg {2, 1} — U1 = 2·(1) + ... average-rank math:
    // ranks of 1,2,2,3 = 1, 2.5, 2.5, 4; R1(pos) = 2.5 + 4 = 6.5;
    // U1 = 6.5 - 2·3/2 = 3.5; AUC = 3.5/4 = 0.875
    val df = Seq((3.0, 1), (2.0, 1), (2.0, 0), (1.0, 0)).toDF("score", "y")
    val r = Stats.binaryAuc(df, "score", $"y" === 1).head()
    assert(r.getAs[Long]("u2") == 7L) // 2·U1
    assert(r.getAs[Double]("auc") == 0.875)

    val onlyPos = Stats.binaryAuc(df.filter($"y" === 1), "score",
      $"y" === 1).head()
    assert(onlyPos.isNullAt(onlyPos.fieldIndex("auc")))
    assert(onlyPos.isNullAt(onlyPos.fieldIndex("ks")))
  }

  test("quantileNormalize: reference is the mean of group quantiles; " +
    "median drift is signed") {
    // group a: 1..5 (p50=3); group b: 11..15 (p50=13) → ref_p50 = 8
    val df = ((1 to 5).map(v => ("a", v)) ++ (11 to 15).map(v => ("b", v)))
      .toDF("src", "v")
    val r = Stats.quantileNormalize(df, "src", "v").collect()
    assert(r.map(_.getAs[String]("src")).toSeq == Seq("a", "b"))
    val a = r(0); val b = r(1)
    assert(a.getAs[Double]("p50") == 3.0 && b.getAs[Double]("p50") == 13.0)
    assert(a.getAs[Double]("ref_p50") == 8.0)
    assert(b.getAs[Double]("ref_p50") == 8.0)
    assert(a.getAs[Double]("delta_p50") == -5.0)
    assert(b.getAs[Double]("delta_p50") == 5.0)
    // interpolated quartiles: p25 of 1..5 = 2.0 (pos = 4·0.25 = 1)
    assert(a.getAs[Double]("p25") == 2.0 && a.getAs[Double]("p75") == 4.0)
  }

  test("binaryAucBy: slices evaluate independently") {
    val df = Seq(
      ("a", 1.0, 0), ("a", 2.0, 0), ("a", 3.0, 1), ("a", 4.0, 1), // perfect
      ("b", 1.0, 1), ("b", 2.0, 1), ("b", 3.0, 0), ("b", 4.0, 0)) // reversed
      .toDF("src", "score", "y")
    val r = Stats.binaryAucBy(df, "src", "score", $"y" === 1).collect()
    assert(r.map(_.getAs[String]("src")).toSeq == Seq("a", "b"))
    assert(r(0).getAs[Double]("auc") == 1.0)
    assert(r(1).getAs[Double]("auc") == 0.0)
    assert(r.forall(_.getAs[Long]("n_pos") == 2L))
  }

  test("averagePrecision: step-wise AP with tie groups; perfect ranking = 1") {
    // groups desc: v=3 (1 pos) term 1·1/(2·1); v=2 (1 pos, 1 neg tied)
    // term 1·2/(2·3); v=1 contributes 0 → AP = 1/2 + 1/3 = 0.833333
    val df = Seq((3.0, 1), (2.0, 1), (2.0, 0), (1.0, 0)).toDF("score", "y")
    val r = Stats.averagePrecision(df, "score", $"y" === 1).head()
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 2L)
    assert(r.getAs[Double]("ap") == 0.833333)
    assert(r.getAs[Double]("base_rate") == 0.5)

    val perfect = Seq((4.0, 1), (3.0, 1), (2.0, 0), (1.0, 0))
      .toDF("score", "y")
    assert(Stats.averagePrecision(perfect, "score", $"y" === 1)
      .head().getAs[Double]("ap") == 1.0)

    val onlyNeg = Stats.averagePrecision(df.filter($"y" === 0), "score",
      $"y" === 1).head()
    assert(onlyNeg.isNullAt(onlyNeg.fieldIndex("ap")))
  }

  test("gainsTable: distinct scores split into singleton deciles; " +
    "tied scores stay group-atomic") {
    // 10 rows, scores 10..1, top-3 positive
    val df = (1 to 10).map(i => (i.toDouble, if (i >= 8) 1 else 0))
      .toDF("score", "y")
    val g = Stats.gainsTable(df, "score", $"y" === 1, buckets = 10)
      .collect()
    assert(g.length == 10)
    val b0 = g.head
    assert(b0.getAs[Long]("bucket") == 0L && b0.getAs[Long]("n") == 1L)
    assert(b0.getAs[Double]("rate") == 1.0)
    assert(b0.getAs[Double]("cum_lift") == 3.333333) // (1·10)/(1·3)
    assert(b0.getAs[Double]("capture") == 0.333333)
    val b9 = g.last
    assert(b9.getAs[Double]("cum_lift") == 1.0)
    assert(b9.getAs[Double]("capture") == 1.0)

    // every row tied: ONE group → one bucket holding everything
    val tied = (1 to 10).map(i => (5.0, i % 2)).toDF("score", "y")
    val gt = Stats.gainsTable(tied, "score", $"y" === 1).collect()
    assert(gt.length == 1 && gt.head.getAs[Long]("n") == 10L)
    assert(gt.head.getAs[Double]("cum_lift") == 1.0)
  }

  test("calibration: perfectly calibrated bins have gap 0 and ece 0; " +
    "p=1.0 lands in the top bin") {
    // bin 2 (p=0.25): 1 of 4 positive; bin 7 (p=0.75): 3 of 4 positive
    val rows = Seq.fill(3)((0.25, 0)) ++ Seq((0.25, 1)) ++
      Seq.fill(3)((0.75, 1)) ++ Seq((0.75, 0)) :+ ((1.0, 1))
    val df = rows.toDF("p", "y")
    val c = Stats.calibration(df, $"p", $"y" === 1, bins = 10)
      .collect()
    assert(c.map(_.getAs[Long]("bin")).toSeq == Seq(2L, 7L, 9L))
    val byBin = c.map(r => r.getAs[Long]("bin") -> r).toMap
    assert(byBin(2L).getAs[Double]("conf") == 0.25)
    assert(byBin(2L).getAs[Double]("acc") == 0.25)
    assert(byBin(2L).getAs[Double]("gap") == 0.0)
    assert(byBin(9L).getAs[Long]("n") == 1L) // p = 1.0 → bin 9, not 10
    // ece = (|1.0-1| + |3.0-3| + |1.0-1|)/9 = 0 here
    assert(c.forall(_.getAs[Double]("ece") == 0.0))

    // a miscalibrated frame: all p=0.9, none positive → gap = 0.9 = ece
    val bad = Seq.fill(5)((0.9, 0)).toDF("p", "y")
    val b = Stats.calibration(bad, $"p", $"y" === 1).head()
    assert(b.getAs[Double]("gap") == 0.9)
    assert(b.getAs[Double]("ece") == 0.9)
  }

  test("calibrationBy: slices get independent diagrams and ECE; the " +
    "ungrouped variant equals the constant-slice delegate") {
    // slice a perfectly calibrated (bin 2: 1/4 pos at p=0.25);
    // slice b fully miscalibrated (p=0.9, no positives)
    val rows = (Seq.fill(3)(("a", 0.25, 0)) :+ (("a", 0.25, 1))) ++
      Seq.fill(5)(("b", 0.9, 0))
    val df = rows.toDF("src", "p", "y")
    val out = Stats.calibrationBy(df, "src", $"p", $"y" === 1, bins = 10)
      .collect()
    val byKey = out.map(r => (r.getAs[String]("src"),
      r.getAs[Long]("bin")) -> r).toMap
    assert(byKey(("a", 2L)).getAs[Double]("gap") == 0.0)
    assert(byKey(("a", 2L)).getAs[Double]("ece") == 0.0)
    assert(byKey(("b", 9L)).getAs[Double]("gap") == 0.9)
    assert(byKey(("b", 9L)).getAs[Double]("ece") == 0.9)
  }

  test("bestThreshold: picks the F1-optimal cut with the hand confusion " +
    "matrix; perfect scorer reaches f1=1 at the boundary") {
    // thresholds desc: v=5 f1=.5, v=4 f1=.8, v=3 f1=2/3, v=2 f1=6/7, v=1 f1=.75
    val df = Seq((5L, 1), (4L, 1), (3L, 0), (2L, 1), (1L, 0))
      .toDF("score", "y")
    val r = Stats.bestThreshold(df, "score", $"y" === 1).head()
    assert(r.getAs[Long]("threshold") == 2L)
    assert(r.getAs[Long]("tp") == 3L && r.getAs[Long]("fp") == 1L)
    assert(r.getAs[Long]("tn") == 1L && r.getAs[Long]("fn") == 0L)
    assert(r.getAs[Double]("precision") == 0.75)
    assert(r.getAs[Double]("recall") == 1.0)
    assert(r.getAs[Double]("f1") == 0.857143)
    assert(r.getAs[Double]("accuracy") == 0.8)
    // mcc = (3·1 − 1·0)/sqrt(4·3·2·1) = 3/sqrt(24)
    assert(r.getAs[Double]("mcc") == math.rint(3.0 / math.sqrt(24.0) * 1e6) / 1e6)

    val perfect = Seq((9L, 1), (8L, 1), (2L, 0), (1L, 0)).toDF("score", "y")
    val p = Stats.bestThreshold(perfect, "score", $"y" === 1).head()
    assert(p.getAs[Long]("threshold") == 8L)
    assert(p.getAs[Double]("f1") == 1.0 && p.getAs[Double]("mcc") == 1.0)
  }

  test("recalibrate: per-bin empirical rates replace raw probs; unseen " +
    "bins back off to the global calibration rate; Brier before/after") {
    val calib = Seq((0.1, 0), (0.3, 1), (0.3, 0), (0.6, 1)).toDF("p", "y")
    val target = Seq((0.1, 0), (0.35, 1), (0.9, 1)).toDF("p", "y")
    val out = Stats.recalibrate(target, calib, $"p", $"y" === 1, bins = 4)
      .collect()
    assert(out.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 1L, 3L))
    val byBin = out.map(r => r.getAs[Long]("bin") -> r).toMap
    assert(byBin(0L).getAs[Long]("n_cal") == 1L)
    assert(byBin(0L).getAs[Double]("rate_cal") == 0.0)
    assert(byBin(1L).getAs[Double]("rate_cal") == 0.5)
    // bin 3 never seen in calibration → n_cal 0, null mapping, backoff 0.5
    assert(byBin(3L).getAs[Long]("n_cal") == 0L)
    assert(byBin(3L).isNullAt(byBin(3L).fieldIndex("rate_cal")))
    assert(byBin(3L).getAs[Double]("rate_tgt") == 1.0)
    // brier_raw = (0.01 + 0.4225 + 0.01)/3; brier_cal = (0 + .25 + .25)/3
    assert(out.head.getAs[Double]("brier_raw") == 0.1475)
    assert(out.head.getAs[Double]("brier_cal") == 0.166667)
  }

  test("spearmanRho: monotone nonlinear = 1, reversed = -1, tie-corrected " +
    "hand case") {
    val mono = Seq((1L, 1L), (2L, 4L), (3L, 9L), (4L, 16L)).toDF("a", "b")
    assert(Stats.spearmanRho(mono, "a", "b").head().getAs[Double]("rho") == 1.0)
    val rev = Seq((1L, 16L), (2L, 9L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    assert(Stats.spearmanRho(rev, "a", "b").head().getAs[Double]("rho") == -1.0)
    // ties in a: doubled ranks a=(3,3,6), b=(2,4,6) → ρ = 18/sqrt(18·24)
    val tied = Seq((1L, 10L), (1L, 20L), (2L, 30L)).toDF("a", "b")
    val r = Stats.spearmanRho(tied, "a", "b").head()
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Double]("rho") ==
      math.rint(18.0 / math.sqrt(18.0 * 24.0) * 1e6) / 1e6)
  }

  test("bootstrapAuc: perfect separation stays perfect in every " +
    "half-sample replicate; band is ordered") {
    // 100 high-score positives + 100 low-score negatives: any subsample
    // containing both classes (certain at this size) has AUC 1
    val df = ((1 to 100).map(i => (i.toLong, 1000L + i, 1)) ++
      (101 to 200).map(i => (i.toLong, i.toLong, 0))).toDF("id", "score", "y")
    val r = Stats.bootstrapAuc(df, "id", "score", $"y" === 1,
      replicates = 8).head()
    assert(r.getAs[Long]("n_replicates") == 8L)
    assert(r.getAs[Long]("n_valid") == 8L)
    assert(r.getAs[Double]("auc_mean") == 1.0)
    assert(r.getAs[Double]("auc_min") == 1.0)
    assert(r.getAs[Double]("auc_max") == 1.0)

    // a noisy scorer: the band brackets the mean and stays in [0, 1]
    val noisy = (1 to 200).map(i =>
      (i.toLong, (i * 37 % 101).toLong, i % 3 == 0)).toDF("id", "score", "y")
    val b = Stats.bootstrapAuc(noisy, "id", "score", $"y", 8).head()
    assert(b.getAs[Double]("auc_min") <= b.getAs[Double]("auc_mean"))
    assert(b.getAs[Double]("auc_mean") <= b.getAs[Double]("auc_max"))
    assert(b.getAs[Double]("auc_min") >= 0.0 &&
      b.getAs[Double]("auc_max") <= 1.0)
  }

  test("bootstrapAuc: degenerate replicates are excluded from the mean, " +
    "not just the band") {
    // 2 positives, 200 negatives: some half-sample replicates lose both
    // positives and degenerate to a single class (null AUC). The mean
    // must divide by the valid count — with perfect separation every
    // valid replicate has AUC 1, so auc_mean stays exactly 1.0.
    val df = (Seq((1L, 1000L, 1), (2L, 1001L, 1)) ++
      (3 to 202).map(i => (i.toLong, i.toLong, 0))).toDF("id", "score", "y")
    val r = Stats.bootstrapAuc(df, "id", "score", $"y" === 1,
      replicates = 64).head()
    assert(r.getAs[Long]("n_replicates") == 64L)
    val valid = r.getAs[Long]("n_valid")
    assert(valid < 64L, "fixture should produce some degenerate replicates")
    assert(valid > 0L)
    assert(r.getAs[Double]("auc_mean") == 1.0)
  }

  test("welchT: hand case hits the closed forms; lower arm is control") {
    // arm 0: (1,2,3) → mean 2, var 1; arm 1: (4,6) → mean 5, var 2
    val df = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 4L), (1L, 6L))
      .toDF("arm", "v")
    val r = Stats.welchT(df, "arm", "v").head()
    assert(r.getAs[Long]("n_arms") == 2L)
    assert(r.getAs[Long]("arm0") == 0L && r.getAs[Long]("arm1") == 1L)
    assert(r.getAs[Long]("n0") == 3L && r.getAs[Long]("n1") == 2L)
    assert(r.getAs[Double]("mean0") == 2.0 && r.getAs[Double]("mean1") == 5.0)
    assert(r.getAs[Double]("diff") == 3.0)
    // se0 = 1/3, se1 = 1: t = 3/sqrt(4/3); df = (16/9)/(1/18 + 1) = 32/19
    assert(r.getAs[Double]("t") ==
      math.rint(3.0 / math.sqrt(4.0 / 3.0) * 1e6) / 1e6)
    assert(r.getAs[Double]("df_welch") ==
      math.rint(32.0 / 19.0 * 1e6) / 1e6)
  }

  test("welchT: wrong arm counts surface as n_arms with null comparison " +
    "columns instead of a plausible-looking answer") {
    // one arm: min and max pick the SAME arm — a self-comparison
    val one = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("arm", "v")
    val r1 = Stats.welchT(one, "arm", "v").head()
    assert(r1.getAs[Long]("n_arms") == 1L)
    assert(r1.isNullAt(r1.fieldIndex("diff")))
    assert(r1.isNullAt(r1.fieldIndex("t")))
    assert(r1.isNullAt(r1.fieldIndex("df_welch")))
    // three arms: the middle arm would be silently dropped
    val three = Seq((0L, 1L), (0L, 2L), (1L, 4L), (1L, 5L), (2L, 8L),
      (2L, 9L)).toDF("arm", "v")
    val r3 = Stats.welchT(three, "arm", "v").head()
    assert(r3.getAs[Long]("n_arms") == 3L)
    assert(r3.isNullAt(r3.fieldIndex("t")))
  }

  test("cupedAdjust: closed-form theta/variance-reduction on the hand " +
    "case; adjustment removes the pre-period imbalance") {
    // arm 0: (x,y)=(1,2),(2,4); arm 1: (3,7),(4,9) — y ≈ 2x + noise, so
    // CUPED should collapse the arms' means toward each other
    val df = Seq((0L, 1L, 2L), (0L, 2L, 4L), (1L, 3L, 7L), (1L, 4L, 9L))
      .toDF("arm", "pre", "post")
    val out = Stats.cupedAdjust(df, "arm", "pre", "post").collect()
    assert(out.map(_.getAs[Long]("arm")).toSeq == Seq(0L, 1L))
    // pooled: varx=1.25, cov=3.0, vary=7.25 → theta=2.4
    assert(out.forall(_.getAs[Double]("theta") == 2.4))
    assert(out(0).getAs[Double]("mean_post") == 3.0)
    assert(out(1).getAs[Double]("mean_post") == 8.0)
    assert(out(0).getAs[Double]("mean_adj") == 5.4)
    assert(out(1).getAs[Double]("mean_adj") == 5.6)
    // var reduction = (cov²/varx)/vary = 7.2/7.25
    assert(out.forall(_.getAs[Double]("var_reduction") == 0.993103))
  }

  test("informationValue: perfectly separating bins hit the smoothed " +
    "closed form; grid materializes empty bins") {
    // bin 0 all-positive, bin 1 all-negative: pp=(0.8,0.2), pn=(0.2,0.8)
    val rows = Seq((1.0, 1), (2.0, 1), (3.0, 1), (6.0, 0), (7.0, 0),
      (8.0, 0)).toDF("v", "y")
    val out = Stats.informationValue(rows, "v", $"y" === 1,
      bins = 2, lo = 0.0, hi = 10.0).collect()
    assert(out.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 1L))
    assert(out(0).getAs[Long]("n_pos") == 3L && out(0).getAs[Long]("n_neg") == 0L)
    assert(out(0).getAs[Double]("woe") ==
      math.rint(math.log(4.0) * 1e6) / 1e6)
    assert(out(1).getAs[Double]("woe") ==
      -math.rint(math.log(4.0) * 1e6) / 1e6)
    assert(out.forall(_.getAs[Double]("iv") ==
      math.rint(1.2 * math.log(4.0) * 1e6) / 1e6))

    // a bin with no rows at all still appears, Laplace-smoothed
    val sparse = Seq((1.0, 1), (9.0, 0)).toDF("v", "y")
    val s = Stats.informationValue(sparse, "v", $"y" === 1,
      bins = 4, lo = 0.0, hi = 10.0).collect()
    assert(s.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(s(1).getAs[Long]("n") == 0L && s(2).getAs[Long]("n") == 0L)
  }

  test("psiByGroup: identical distribution scores 0; a fully shifted " +
    "group scores the closed-form smoothed mass") {
    val rows = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 1.0), ("b", 2.0), ("b", 3.0),
      ("c", 101.0), ("c", 102.0), ("c", 103.0)).toDF("g", "v")
    val out = Stats.psiByGroup(rows, "g", "v", baseline = "a",
      bins = 2, lo = 0.0, hi = 200.0).collect()
    assert(out.map(_.getAs[String]("g")).toSeq == Seq("b", "c"))
    val byG = out.map(r => r.getAs[String]("g") -> r).toMap
    assert(byG("b").getAs[Double]("psi") == 0.0)
    // shares a = (0.8, 0.2), c = (0.2, 0.8): psi = 2·0.6·ln(4)
    assert(byG("c").getAs[Double]("psi") ==
      math.rint(1.2 * math.log(4.0) * 1e6) / 1e6)
    assert(byG("c").getAs[Long]("n") == 3L)
  }
}
