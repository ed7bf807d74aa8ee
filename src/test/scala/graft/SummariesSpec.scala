package graft

import graft.operators.Summaries
import org.apache.spark.sql.functions._

/** Mirrors the reference's YouTube tests (tests/test_youtube.py:4-58):
  * ISO-duration parsing incl. invalid, zero-view engagement guard, summary
  * shapes and column sets. */
class SummariesSpec extends SparkSpec {
  import spark.implicits._

  test("ISO-8601 durations parse; invalid and missing yield 0") {
    val cases = Seq(
      "PT1H2M3S" -> 3723L, "PT15M" -> 900L, "PT2H" -> 7200L, "P1DT1S" -> 86401L,
      "P2D" -> 172800L, "PT45S" -> 45L, "P" -> 0L, "bogus" -> 0L, "" -> 0L)
    val df = cases.map(_._1).toDF("d")
    val got = df.select(Summaries.durationSeconds(col("d"))).collect().map(_.getLong(0))
    assert(got.toSeq == cases.map(_._2))
    // null duration → 0
    val n = Seq(Option.empty[String]).toDF("d")
      .select(Summaries.durationSeconds(col("d"))).head().getLong(0)
    assert(n == 0L)
  }

  private def videos = Seq(
    ("v1", "ch_a", "2021-01-01", 100L, Some(10L), 10L),
    ("v2", "ch_a", "2022-06-01", 0L, Some(5L), 1L),    // zero views
    ("v3", "ch_b", "2021-03-01", 200L, None, 2L))      // null likes
    .toDF("video_id", "channel_title", "published_at", "view_count", "like_count",
      "comment_count")
    .withColumn("published_at", to_timestamp(col("published_at")))

  test("engagement guards zero/null views and null likes (rate 0.0, not NaN)") {
    val out = Summaries.addEngagementMetrics(videos).orderBy("video_id").collect()
    assert(out(0).getAs[Double]("engagement_rate") == 0.2)
    assert(out(0).getAs[Double]("engagement_rate_pct") == 20.0)
    assert(out(1).getAs[Double]("engagement_rate") == 0.0) // zero views → 0.0
    assert(out(2).getAs[Double]("engagement_rate") == 0.01) // null likes → 0
  }

  test("per-channel summary has the reference column set, sorted views desc") {
    val out = Summaries.perChannel(Summaries.addEngagementMetrics(videos))
    assert(out.columns.toSeq == Seq("channel_title", "video_count", "views", "likes",
      "comments", "avg_engagement_pct"))
    val rows = out.collect()
    assert(rows(0).getAs[String]("channel_title") == "ch_b") // 200 views first
    assert(rows(1).getAs[Long]("video_count") == 2L)
  }

  test("per-year summary extracts year and sorts ascending") {
    val out = Summaries.perYear(videos).collect()
    assert(out.map(_.getAs[Int]("year")).toSeq == Seq(2021, 2022))
    assert(out(0).getAs[Long]("views") == 300L)
  }

  test("top-k keeps highest views with like tie-break") {
    val out = Summaries.topVideos(videos, 2, Seq(asc("video_id"))).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("v3", "v1"))
  }

  test("thumbnail priority pick prefers standard > high > medium > default") {
    val df = Seq(
      (Some("s"), Some("h"), Some("m"), "d"),
      (None, Some("h"), None, "d"),
      (None, None, None, "d"))
      .toDF("standard", "high", "medium", "default")
      .select(struct(col("standard"), col("high"), col("medium"), col("default")).as("t"))
    val got = df.select(Summaries.thumbnailUrl(col("t"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("s", "h", "d"))
  }
}
