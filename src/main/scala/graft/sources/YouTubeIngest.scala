package graft.sources

import graft.operators.Summaries
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** S8 REST API scan, offline (reference: src/youtube.py:86-208).
  *
  * The reference pages `playlistItems` 50 ids at a time via `nextPageToken`
  * and hydrates `videos` in 50-id chunks, then flattens the nested JSON to 13
  * scalar columns. The build environment has no egress, so the same
  * `VideoApi` interface is implemented over checked-in JSONL fixtures; the
  * pagination/chunking/flatten logic is identical and unit-tested. A real
  * HTTPS client (JDK HttpClient) would implement the same trait.
  *
  * Ingest is driver-side by design (the API caps page size at 50 — the
  * bottleneck is the remote API, not Spark); the resulting frame then flows
  * through the distributed summary pipeline.
  */
object YouTubeIngest {

  val PageSize = 50 // API page cap (reference: src/youtube.py:123,174)

  /** The reference's OUTPUT_COLUMNS (reference: src/youtube.py:15-29). */
  val OutputSchema: StructType = StructType(Seq(
    StructField("video_id", StringType), StructField("title", StringType),
    StructField("description", StringType), StructField("channel_id", StringType),
    StructField("channel_title", StringType), StructField("published_at", StringType),
    StructField("duration", StringType), StructField("view_count", LongType),
    StructField("like_count", LongType), StructField("comment_count", LongType),
    StructField("tags", StringType), StructField("thumbnail_url", StringType)))

  /** The remote surface the reference talks to. */
  trait VideoApi {
    /** One page of video ids + next-page token (reference: src/youtube.py:109-137). */
    def playlistItems(playlistId: String, pageToken: Option[String]): (Seq[String], Option[String])
    /** channel → uploads playlist (reference: src/youtube.py:97-106). */
    def uploadsPlaylist(channelId: String): String
    /** Hydrate ≤50 ids with full metadata (reference: src/youtube.py:174-204). */
    def videos(ids: Seq[String]): Seq[Map[String, Any]]
  }

  /** Fixture-backed API over a JSONL file: one video object per line with a
    * `playlist_id` field. Paging and chunking behave like the remote API. */
  final class FixtureApi(path: Path) extends VideoApi {
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    private val lines: Vector[Map[String, Any]] =
      Files.readAllLines(path).asScala.filter(_.trim.nonEmpty).map { l =>
        mapper.readValue(l, classOf[java.util.Map[String, Any]])
          .asScala.toMap
      }.toVector

    def playlistItems(playlistId: String, pageToken: Option[String]): (Seq[String], Option[String]) = {
      val all = lines.filter(_.get("playlist_id").contains(playlistId))
        .map(_("video_id").toString)
      val start = pageToken.map(_.toInt).getOrElse(0)
      val page = all.slice(start, start + PageSize)
      val next = if (start + PageSize < all.length) Some((start + PageSize).toString) else None
      (page, next)
    }

    def uploadsPlaylist(channelId: String): String = s"uploads_$channelId"

    def videos(ids: Seq[String]): Seq[Map[String, Any]] = {
      require(ids.length <= PageSize, s"hydrate chunk exceeds API cap: ${ids.length}")
      val byId = lines.map(m => m("video_id").toString -> m).toMap
      ids.flatMap(byId.get)
    }
  }

  private def chunked[A](items: Seq[A], size: Int): Seq[Seq[A]] =
    items.grouped(size).toSeq

  /** Paginate all ids of a playlist (reference: src/youtube.py:109-137). */
  def allVideoIds(api: VideoApi, playlistId: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var token: Option[String] = None
    var first = true
    while (first || token.isDefined) {
      first = false
      val (page, next) = api.playlistItems(playlistId, token)
      out ++= page
      token = next
    }
    out.toSeq
  }

  /** Full ingest: paginate → hydrate in 50-id chunks → flatten nested JSON
    * (thumbnail priority pick, tags join) → DataFrame
    * (reference: src/youtube.py:148-208). */
  def fetchVideosDataFrame(spark: SparkSession, api: VideoApi,
      playlistId: String): DataFrame = {
    val ids = allVideoIds(api, playlistId)
    val rows = chunked(ids, PageSize).flatMap(api.videos).map { m =>
      def s(k: String): String = m.get(k).map(_.toString).orNull
      def l(k: String): java.lang.Long = m.get(k) match {
        case Some(n: Number) => n.longValue()
        case Some(v) => v.toString.toLongOption.map(Long.box).orNull
        case None => null
      }
      val tags = m.get("tags") match {
        case Some(ts: java.util.List[_]) => ts.asScala.map(_.toString).mkString(", ")
        case _ => ""
      }
      // C11 thumbnail priority pick on the nested object
      val thumb = m.get("thumbnails") match {
        case Some(t: java.util.Map[_, _]) =>
          val tm = t.asScala.map { case (k, v) => k.toString -> v }
          Seq("standard", "high", "medium", "default")
            .flatMap(k => tm.get(k).map(_.toString)).headOption.orNull
        case _ => null
      }
      Row(s("video_id"), s("title"), s("description"), s("channel_id"),
        s("channel_title"), s("published_at"), s("duration"),
        l("view_count"), l("like_count"), l("comment_count"), tags, thumb)
    }
    val df = spark.createDataFrame(rows.asJava, OutputSchema)
    df.withColumn("duration_seconds", Summaries.durationSeconds(col("duration")))
  }

  /** Channel ingest = uploads-playlist lookup + the same path
    * (reference: src/cli.py:197-213). */
  def fetchChannelDataFrame(spark: SparkSession, api: VideoApi,
      channelId: String): DataFrame =
    fetchVideosDataFrame(spark, api, api.uploadsPlaylist(channelId))
      .withColumn("source", lit(s"channel:$channelId"))
}
