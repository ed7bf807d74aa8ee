package graft

import graft.functions.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("count-min estimates are never below exact counts (overestimate only)") {
    val toks = (Seq.fill(50)("hot") ++ (1 to 200).map(i => s"w${i % 40}"))
      .toDF("tok")
    val sketch = Sketches.countMin(toks, "tok", depth = 4, width = 16)
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
    val est = Sketches.cmsEstimate(sketch, exact.select("tok"), "tok",
      depth = 4, width = 16)
    val joined = exact.join(est, "tok").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("cms_estimate") >= r.getAs[Long]("exact"),
        s"under-estimate for ${r.getAs[String]("tok")}")
    }
  }

  test("count-min is exact when width is collision-free") {
    val toks = Seq("a", "a", "a", "b", "b", "c").toDF("tok")
    val sketch = Sketches.countMin(toks, "tok", depth = 4, width = 4096)
    val est = Sketches.cmsEstimate(sketch, Seq("a", "b", "c").toDF("tok"),
      "tok", depth = 4, width = 4096)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("cms_estimate")).toMap
    assert(est == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("cmsEstimate returns 0 for keys the sketch never saw") {
    val toks = Seq("x").toDF("tok")
    val sketch = Sketches.countMin(toks, "tok", depth = 4, width = 4096)
    val est = Sketches.cmsEstimate(sketch, Seq("unseen").toDF("tok"), "tok",
      depth = 4, width = 4096).collect()
    assert(est.head.getAs[Long]("cms_estimate") == 0L)
  }

  test("KMV estimate lands near the true distinct count and is deterministic") {
    val df = (1 to 2000).map(i => ("g", i % 500)).toDF("grp", "v")
    val run1 = Sketches.kmvDistinct(df, "grp", "v", k = 16).collect().head
      .getAs[Double]("kmv_estimate")
    val run2 = Sketches.kmvDistinct(df, "grp", "v", k = 16).collect().head
      .getAs[Double]("kmv_estimate")
    assert(run1 == run2)
    // KMV with k=16 has ~1/sqrt(k-1) ≈ 26% relative s.d.; allow 3 sigma
    assert(run1 > 500 * 0.25 && run1 < 500 * 2.5, s"estimate $run1 vs 500")
  }

  test("KMV emits nothing for groups with fewer than k distinct values") {
    val df = Seq(("small", 1), ("small", 2), ("big", 1), ("big", 2),
      ("big", 3), ("big", 4)).toDF("grp", "v")
    val out = Sketches.kmvDistinct(df, "grp", "v", k = 3)
      .collect().map(_.getString(0)).toSet
    assert(out == Set("big"))
  }

  test("cmsJoinSize never underestimates and is exact without collisions") {
    import org.apache.spark.sql.functions.col
    // 2 keys, a:(x×3, y×1), b:(x×2, y×4) → true join size 3·2 + 1·4 = 10
    val a = Seq("x", "x", "x", "y").toDF("k")
    val b = Seq("x", "x", "y", "y", "y", "y").toDF("k")
    val est = Sketches.cmsJoinSize(a, b, "k", depth = 4, width = 64)
      .collect().head.getLong(0)
    val exact = a.join(b, Seq("k")).count()
    assert(exact == 10L)
    assert(est >= exact, s"CMS must overestimate: $est < $exact")
    // 2 keys in 64 buckets × 4 rows: at least one row collision-free
    assert(est == exact, s"no-collision case should be exact, got $est")
  }
}
