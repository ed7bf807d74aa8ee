package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** YouTube-dataset derived metrics and summaries (SURVEY §2.6 A2-A3,
  * §2.8 O1-O2, §2.9 C7-C12) — reference: src/youtube.py:211-274.
  *
  * All scalar work is built-in Catalyst expressions (codegen'd, no UDFs);
  * the summaries are single-shuffle groupBy aggregations and top-k plans
  * (TakeOrderedAndProject — never a full global sort).
  */
object Summaries {

  /** C7 + C12 engagement metrics with the zero/null-division guard
    * (reference: src/youtube.py:211-224): missing likes/comments count as 0,
    * a zero or null view count yields rate 0.0 (`views.replace({0: None})`
    * then `.fillna(0.0)`), and pct = round(rate*100, 2). */
  def addEngagementMetrics(df: DataFrame): DataFrame = {
    def colOr0(n: String): Column =
      if (df.columns.contains(n)) coalesce(col(n).cast("double"), lit(0.0)) else lit(0.0)
    val engagement = colOr0("like_count") + colOr0("comment_count")
    val denom = nullif(col("view_count").cast("double"), lit(0.0))
    val rate = coalesce(engagement / denom, lit(0.0))
    df.withColumn("engagement_rate", rate)
      .withColumn("engagement_rate_pct", round(rate * 100, 2))
  }

  /** C8 ISO-8601 duration → seconds, 0 on any parse failure
    * (reference: src/youtube.py:64-83). A native Catalyst expression with
    * codegen — ONE compiled regex match per row (the pure-built-ins form
    * costs up to 9 regex executions: rlike + 4 extract/compare pairs).
    * Also registered as SQL `duration_seconds` via GraftExtensions. */
  def durationSeconds(duration: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    coalesce(
      Bridge.column(graft.functions.expr.DurationSeconds(
        Bridge.expression(duration.cast("string")))),
      lit(0L))
  }

  /** C10 tags flatten: list → `", "`-joined string (reference: src/youtube.py:201). */
  def flattenTags(tags: Column): Column = array_join(tags, ", ")

  /** C11 thumbnail priority pick over the nested thumbnails struct:
    * first present of standard/high/medium/default (reference: src/youtube.py:140-145). */
  def thumbnailUrl(thumbnails: Column): Column =
    coalesce(thumbnails.getField("standard"), thumbnails.getField("high"),
      thumbnails.getField("medium"), thumbnails.getField("default"))

  /** O1+O2 top-k by views then likes; `tieBreak` keeps the plan deterministic
    * (pandas relies on file order for ties — reference: src/youtube.py:241). */
  def topVideos(df: DataFrame, n: Int, tieBreak: Seq[Column] = Nil): DataFrame =
    df.orderBy(desc("view_count") +: desc("like_count") +: tieBreak: _*).limit(n)

  /** A2 per-channel summary, sorted by views desc (reference: src/youtube.py:243-254).
    * Spark groups nulls by default = pandas `dropna=False`. Partial aggregation
    * (map-side combine) makes this one small shuffle at any scale. */
  def perChannel(df: DataFrame): DataFrame =
    df.groupBy("channel_title").agg(
      count("video_id").as("video_count"),
      sum("view_count").as("views"),
      sum("like_count").as("likes"),
      sum("comment_count").as("comments"),
      avg("engagement_rate_pct").as("avg_engagement_pct"))
      .orderBy(desc("views"))

  /** A3 per-year summary (+ C9 year extraction), sorted by year
    * (reference: src/youtube.py:256-267). */
  def perYear(df: DataFrame): DataFrame =
    df.withColumn("year", year(col("published_at")))
      .groupBy("year").agg(
        count("video_id").as("video_count"),
        sum("view_count").as("views"),
        sum("like_count").as("likes"),
        sum("comment_count").as("comments"))
      .orderBy("year")
}
