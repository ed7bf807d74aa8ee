package graft.sources

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import scala.jdk.CollectionConverters._

/** Live HTTP implementation of [[YouTubeIngest.VideoApi]] over the JDK
  * HttpClient — the same three endpoints, query shapes, and JSON paths the
  * reference hits (reference: src/youtube.py:49-60 `_request`,
  * 96-106 `_uploads_playlist_id`, 109-137 `_fetch_playlist_video_ids`,
  * 181-204 hydrate): `playlistItems?part=contentDetails`,
  * `channels?part=contentDetails`, `videos?part=snippet,contentDetails,
  * statistics`, all with `key` appended and 50-item page caps. Responses
  * flatten to the same Map shape [[YouTubeIngest.FixtureApi]] emits
  * (thumbnails as key→url), so the whole downstream
  * paginate→hydrate→flatten pipeline is implementation-agnostic.
  *
  * The build sandbox has no egress, so this class is verified against a
  * local `com.sun.net.httpserver` stub (HttpVideoApiSpec), not the live
  * service — but it is a complete client: non-2xx raises with the body
  * text (the reference's `raise_for_status` + detail behavior). */
final class HttpVideoApi(baseUrl: String, apiKey: String,
    timeout: Duration = Duration.ofSeconds(30)) extends YouTubeIngest.VideoApi {

  private val client = HttpClient.newBuilder()
    .connectTimeout(timeout)
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def enc(s: String): String = URLEncoder.encode(s, StandardCharsets.UTF_8)

  /** GET {base}/{endpoint}?{params}&key=… → parsed JSON object. */
  private def request(endpoint: String, params: Seq[(String, String)]): Map[String, Any] = {
    val query = (params :+ ("key" -> apiKey))
      .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    val req = HttpRequest.newBuilder()
      .uri(URI.create(s"$baseUrl/$endpoint?$query"))
      .timeout(timeout)
      .GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() < 200 || resp.statusCode() >= 300)
      throw new RuntimeException(
        s"YouTube API error for $endpoint: ${resp.body()}")
    mapper.readValue(resp.body(), classOf[java.util.Map[String, Any]])
      .asScala.toMap
  }

  private def items(data: Map[String, Any]): Seq[Map[String, Any]] =
    data.get("items") match {
      case Some(l: java.util.List[_]) => l.asScala.toSeq.collect {
        case m: java.util.Map[_, _] =>
          m.asScala.map { case (k, v) => k.toString -> v }.toMap
      }
      case _ => Seq.empty
    }

  private def obj(m: Map[String, Any], key: String): Map[String, Any] =
    m.get(key) match {
      case Some(o: java.util.Map[_, _]) =>
        o.asScala.map { case (k, v) => k.toString -> v }.toMap
      case _ => Map.empty
    }

  def playlistItems(playlistId: String,
      pageToken: Option[String]): (Seq[String], Option[String]) = {
    val data = request("playlistItems", Seq(
      "part" -> "contentDetails",
      "playlistId" -> playlistId,
      "maxResults" -> YouTubeIngest.PageSize.toString) ++
      pageToken.map("pageToken" -> _))
    val ids = items(data)
      .flatMap(it => obj(it, "contentDetails").get("videoId"))
      .map(_.toString)
    (ids, data.get("nextPageToken").map(_.toString).filter(_.nonEmpty))
  }

  def uploadsPlaylist(channelId: String): String = {
    val data = request("channels", Seq(
      "part" -> "contentDetails", "id" -> channelId, "maxResults" -> "1"))
    val first = items(data).headOption.getOrElse(
      throw new IllegalArgumentException(s"Channel '$channelId' not found."))
    obj(obj(first, "contentDetails"), "relatedPlaylists").get("uploads")
      .map(_.toString).getOrElse(
        throw new IllegalArgumentException(s"Channel '$channelId' has no uploads playlist."))
  }

  def videos(ids: Seq[String]): Seq[Map[String, Any]] = {
    require(ids.length <= YouTubeIngest.PageSize,
      s"hydrate chunk exceeds API cap: ${ids.length}")
    if (ids.isEmpty) return Seq.empty
    val data = request("videos", Seq(
      "part" -> "snippet,contentDetails,statistics",
      "id" -> ids.mkString(","),
      "maxResults" -> ids.length.toString))
    items(data).map { it =>
      val snippet = obj(it, "snippet")
      val stats = obj(it, "statistics")
      // nested thumbnails {k: {url, w, h}} → flat {k: url}, the FixtureApi
      // shape (reference picks thumbs[key]["url"]: src/youtube.py:140-146)
      val thumbs = new java.util.HashMap[String, Any]()
      obj(snippet, "thumbnails").foreach {
        case (k, v: java.util.Map[_, _]) =>
          v.asScala.collectFirst { case (uk, uv) if uk.toString == "url" =>
            thumbs.put(k, uv.toString)
          }
        case _ => ()
      }
      Map[String, Any](
        "video_id" -> it.getOrElse("id", null),
        "title" -> snippet.getOrElse("title", null),
        "description" -> snippet.getOrElse("description", null),
        "channel_id" -> snippet.getOrElse("channelId", null),
        "channel_title" -> snippet.getOrElse("channelTitle", null),
        "published_at" -> snippet.getOrElse("publishedAt", null),
        "duration" -> obj(it, "contentDetails").getOrElse("duration", null),
        "view_count" -> stats.getOrElse("viewCount", null),
        "like_count" -> stats.getOrElse("likeCount", null),
        "comment_count" -> stats.getOrElse("commentCount", null),
        "tags" -> snippet.getOrElse("tags", null),
        "thumbnails" -> thumbs
      ).filter(_._2 != null)
    }
  }
}
