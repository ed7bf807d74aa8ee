package graft.queries

import graft.operators.Summaries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** YouTube-summary operator queries (SURVEY §2.6 A2-A3, §2.8 O2, §2.9
  * C7-C12). The reference ingests from the YouTube API; offline, both engines
  * derive an identical deterministic `videos` dataset from the `events`
  * table (same expressions on both sides), then run the real operators.
  */
object YoutubeQueries {
  import Tables.t

  /** Deterministic videos frame: one video per event. Mirrors VIDEOS_CTE. */
  private def videos(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val vid = concat(lit("v"), col("event_id").cast("string"))
    e.select(
      vid.as("video_id"),
      col("event_type").as("channel_title"),
      make_timestamp(
        (lit(2020) + col("event_id") % 3).cast("int"), lit(1),
        (lit(1) + col("event_id") % 28).cast("int"),
        (col("event_id") % 24).cast("int"), (col("event_id") % 60).cast("int"),
        lit(0).cast("decimal(8,6)")).as("published_at"),
      when(col("event_id") % 13 === 0, lit(0L))
        .otherwise(round(col("value") * 100).cast("long")).as("view_count"),
      when(col("event_id") % 17 === 0, lit(null).cast("long"))
        .otherwise(col("event_id") % 50).as("like_count"),
      (col("event_id") % 20).as("comment_count"),
      when(col("event_id") % 23 === 0, lit("bogus"))
        .when(col("event_id") % 29 === 0,
          concat(lit("P"), (col("event_id") % 3).cast("string"), lit("D")))
        .otherwise(concat(lit("PT"), (col("event_id") % 4).cast("string"), lit("H"),
          (col("event_id") % 60).cast("string"), lit("M"),
          ((col("event_id") * 7) % 60).cast("string"), lit("S"))).as("duration"),
      array(concat(lit("tag"), (col("event_id") % 3).cast("string")),
        concat(lit("cat"), (col("event_id") % 5).cast("string"))).as("tags"),
      struct(
        when(col("event_id") % 2 === 0, concat(lit("std_"), vid)).as("standard"),
        when(col("event_id") % 3 === 0, concat(lit("high_"), vid)).as("high"),
        when(col("event_id") % 5 === 0, concat(lit("med_"), vid)).as("medium"),
        concat(lit("def_"), vid).as("default")).as("thumbnails"))
  }

  /** DuckDB twin of `videos` (identical expressions; make_timestamp +
    * round-half-even cast both agree across engines). */
  private val VIDEOS_CTE =
    """videos AS (
      |  SELECT 'v' || CAST(event_id AS VARCHAR) AS video_id,
      |    event_type AS channel_title,
      |    make_timestamp(CAST(2020 + event_id % 3 AS BIGINT), 1,
      |      CAST(1 + event_id % 28 AS BIGINT), CAST(event_id % 24 AS BIGINT),
      |      CAST(event_id % 60 AS BIGINT), 0.0) AS published_at,
      |    CASE WHEN event_id % 13 = 0 THEN 0
      |         ELSE CAST(round(value * 100) AS BIGINT) END AS view_count,
      |    CASE WHEN event_id % 17 = 0 THEN NULL
      |         ELSE event_id % 50 END AS like_count,
      |    event_id % 20 AS comment_count,
      |    CASE WHEN event_id % 23 = 0 THEN 'bogus'
      |         WHEN event_id % 29 = 0 THEN 'P' || CAST(event_id % 3 AS VARCHAR) || 'D'
      |         ELSE 'PT' || CAST(event_id % 4 AS VARCHAR) || 'H' ||
      |              CAST(event_id % 60 AS VARCHAR) || 'M' ||
      |              CAST((event_id * 7) % 60 AS VARCHAR) || 'S' END AS duration,
      |    event_id % 23 AS dur_bogus, event_id % 29 AS dur_days_only,
      |    event_id % 3 AS d_days, event_id % 4 AS d_h, event_id % 60 AS d_m,
      |    (event_id * 7) % 60 AS d_s,
      |    'tag' || CAST(event_id % 3 AS VARCHAR) || ', ' ||
      |      'cat' || CAST(event_id % 5 AS VARCHAR) AS tags_joined,
      |    CASE WHEN event_id % 2 = 0 THEN 'std_v' || CAST(event_id AS VARCHAR)
      |         WHEN event_id % 3 = 0 THEN 'high_v' || CAST(event_id AS VARCHAR)
      |         WHEN event_id % 5 = 0 THEN 'med_v' || CAST(event_id AS VARCHAR)
      |         ELSE 'def_v' || CAST(event_id AS VARCHAR) END AS thumbnail_url
      |  FROM events)""".stripMargin

  // C7 + C12 engagement metrics with zero/null-view guard
  // (reference: src/youtube.py:211-224).
  private val c7 = Q("c7_engagement_metrics", Some(
    s"""WITH $VIDEOS_CTE
       |SELECT video_id, view_count, like_count, comment_count,
       |  round(coalesce((coalesce(like_count, 0) + comment_count) /
       |    nullif(CAST(view_count AS DOUBLE), 0.0), 0.0), 6) AS engagement_rate,
       |  round(coalesce((coalesce(like_count, 0) + comment_count) /
       |    nullif(CAST(view_count AS DOUBLE), 0.0), 0.0) * 100, 2) AS engagement_rate_pct
       |FROM videos ORDER BY video_id""".stripMargin)) { (s, dir) =>
    Summaries.addEngagementMetrics(videos(s, dir))
      .select(col("video_id"), col("view_count"), col("like_count"), col("comment_count"),
        round(col("engagement_rate"), 6).as("engagement_rate"), col("engagement_rate_pct"))
      .orderBy("video_id")
  }

  // C8 ISO-8601 duration → seconds, 0 on parse failure
  // (reference: src/youtube.py:64-83).
  private val c8 = Q("c8_duration_seconds", Some(
    s"""WITH $VIDEOS_CTE
       |SELECT video_id, duration,
       |  CASE WHEN dur_bogus = 0 THEN 0
       |       WHEN dur_days_only = 0 THEN d_days * 86400
       |       ELSE d_h * 3600 + d_m * 60 + d_s END AS duration_seconds
       |FROM videos ORDER BY video_id""".stripMargin)) { (s, dir) =>
    videos(s, dir).select(col("video_id"), col("duration"),
      Summaries.durationSeconds(col("duration")).as("duration_seconds"))
      .orderBy("video_id")
  }

  // C10 tags flatten + C11 thumbnail priority pick over the nested struct
  // (reference: src/youtube.py:140-145,201).
  private val c10 = Q("c10_c11_tags_thumbnail", Some(
    s"""WITH $VIDEOS_CTE
       |SELECT video_id, tags_joined AS tags, thumbnail_url
       |FROM videos ORDER BY video_id""".stripMargin)) { (s, dir) =>
    videos(s, dir).select(col("video_id"),
      Summaries.flattenTags(col("tags")).as("tags"),
      Summaries.thumbnailUrl(col("thumbnails")).as("thumbnail_url"))
      .orderBy("video_id")
  }

  // O2 top-k by views/likes with deterministic tie-break
  // (reference: src/youtube.py:241).
  private val o2 = Q("o2_top_videos", Some(
    s"""WITH $VIDEOS_CTE
       |SELECT video_id, channel_title, view_count, like_count FROM videos
       |ORDER BY view_count DESC, like_count DESC NULLS LAST, video_id LIMIT 10""".stripMargin)) {
    (s, dir) =>
      Summaries.topVideos(
        videos(s, dir).select("video_id", "channel_title", "view_count", "like_count"),
        10, tieBreak = Seq(asc("video_id")))
  }

  // A2 per-channel summary (count + 3×sum + mean pct), views desc
  // (reference: src/youtube.py:243-254).
  private val a2 = Q("a2_per_channel", Some(
    s"""WITH $VIDEOS_CTE, m AS (
       |  SELECT *, round(coalesce((coalesce(like_count, 0) + comment_count) /
       |    nullif(CAST(view_count AS DOUBLE), 0.0), 0.0) * 100, 2) AS pct
       |  FROM videos)
       |SELECT channel_title, count(video_id) AS video_count,
       |  CAST(sum(view_count) AS BIGINT) AS views,
       |  CAST(sum(like_count) AS BIGINT) AS likes,
       |  CAST(sum(comment_count) AS BIGINT) AS comments,
       |  round(avg(pct), 4) AS avg_engagement_pct
       |FROM m GROUP BY channel_title ORDER BY views DESC""".stripMargin)) { (s, dir) =>
    val out = Summaries.perChannel(Summaries.addEngagementMetrics(videos(s, dir)))
    out.withColumn("avg_engagement_pct", round(col("avg_engagement_pct"), 4))
  }

  // A3 per-year summary + C9 year extraction (reference: src/youtube.py:256-267).
  private val a3 = Q("a3_per_year", Some(
    s"""WITH $VIDEOS_CTE
       |SELECT CAST(year(published_at) AS INT) AS year, count(video_id) AS video_count,
       |  CAST(sum(view_count) AS BIGINT) AS views,
       |  CAST(sum(like_count) AS BIGINT) AS likes,
       |  CAST(sum(comment_count) AS BIGINT) AS comments
       |FROM videos GROUP BY 1 ORDER BY year""".stripMargin)) { (s, dir) =>
    Summaries.perYear(videos(s, dir))
  }

  val qs: Seq[Q] = Seq(c7, c8, c10, o2, a2, a3)
}
