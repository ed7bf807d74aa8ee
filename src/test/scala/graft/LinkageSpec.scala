package graft

import graft.functions.Curation
import graft.functions.expr.JaroWinkler
import graft.operators.Linkage
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Record linkage: Jaro-Winkler semantics (pinned to the independent DuckDB
  * implementation's values), sorted-neighborhood pair generation, feature
  * hashing, and the group-aware split's no-leak invariant. */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaro_winkler matches the textbook/DuckDB values") {
    // expected values taken from DuckDB jaro_winkler_similarity
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("jellyfish", "smellyfish") - 0.8962962962962964) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-12)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
    assert(jw("ab", "ba") == 0.0)      // window 0: transposed pair can't match
    assert(jw("", "") == 0.0)          // DuckDB convention: empty → 0
    assert(jw("a", "") == 0.0)
    assert(jw("abcdxxxxxx", "abcdyyyyyy") == 0.6) // jaro ≤ 0.7 → NO prefix boost
    assert(JaroWinkler.similarity(null, UTF8String.fromString("x")) == 0.0)
  }

  test("sortedNeighborhood yields exactly the O(n·w) successor pairs") {
    val df = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
      .toDF("id", "key")
    // sort order: alpha, beta, delta, gamma
    val pairs = Linkage.sortedNeighborhood(df, "id", "key", window = 2)
      .select("id_a", "id_b", "rank_distance").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 1), (1L, 4L, 2), (2L, 4L, 1), (2L, 3L, 2),
      (4L, 3L, 1)))
    // n·w bound: 4 records, window 2 → at most 8, actual 5 (tail truncates)
    assert(pairs.size == 5)
  }

  test("linkBySortedNeighborhood thresholds on the jw score") {
    val df = Seq((1L, "smith john"), (2L, "smith jon"), (3L, "zzz zzz"))
      .toDF("id", "key")
    val linked = Linkage.linkBySortedNeighborhood(df, "id", "key",
      window = 2, minSimilarity = 0.9).collect()
    assert(linked.length == 1)
    assert(linked.head.getAs[Long]("id_a") == 1L &&
      linked.head.getAs[Long]("id_b") == 2L) // sort order: john < jon
  }

  test("featureHash: deterministic buckets, counts add up, dim respected") {
    val df = Seq((1L, "aa bb aa cc"), (2L, "aa bb aa cc"), (3L, "dd"))
      .toDF("doc_id", "text")
    val v = Curation.featureHash(df, "doc_id", "text", dim = 8)
      .orderBy("doc_id").collect()
    // identical docs → identical vectors
    assert(v(0).getAs[String]("vec_md5") == v(1).getAs[String]("vec_md5"))
    assert(v(0).getAs[Long]("l1") == 4 && v(0).getAs[Long]("nnz") <= 3)
    assert(v(2).getAs[Long]("l1") == 1 && v(2).getAs[Long]("nnz") == 1)
    // buckets stay inside [0, dim)
    val vec = v(0).getSeq[String](v(0).fieldIndex("vector"))
    assert(vec.forall(_.split(":")(0).toLong < 8))
  }

  test("groupAwareSplit: clusters never straddle splits; singletons split too") {
    val docs = (1L to 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // pairs chain 1-2-3 into one cluster and 10-11 into another
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val split = Curation.groupAwareSplit(docs, "doc_id", pairs, "seed7")
    val bad = split.groupBy("cluster")
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(bad == 0)
    // the chained cluster holds 3 docs under one label
    val c1 = split.filter(col("doc_id").isin(1L, 2L, 3L))
      .select("cluster", "split").distinct().collect()
    assert(c1.length == 1 && c1.head.getLong(0) == 1L)
    // every doc is assigned, splits are non-degenerate at n=40
    assert(split.count() == 40)
    assert(split.select("split").distinct().count() >= 2)
  }
}
