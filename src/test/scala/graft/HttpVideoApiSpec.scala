package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.{HttpVideoApi, YouTubeIngest}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Drives [[HttpVideoApi]] against a local in-process HTTP stub that mimics
  * the three YouTube endpoints: pagination via nextPageToken, 50-id hydrate
  * chunks, nested snippet/statistics JSON, and error bodies. This is the
  * closest a zero-egress sandbox gets to the live service; the client code
  * is production-shaped (JDK HttpClient, full URL encoding, non-2xx raise). */
class HttpVideoApiSpec extends SparkSpec {

  private def withServer(test: (String, () => Seq[String]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    def reply(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    server.createContext("/playlistItems", (ex: HttpExchange) => {
      val q = ex.getRequestURI.getQuery
      seen += s"playlistItems?$q"
      if (!q.contains("key=k123")) reply(ex, 403, """{"error":"no key"}""")
      else if (q.contains("playlistId=uploads_ch9")) {
        // two pages: v1..v50 then v51..v60
        if (!q.contains("pageToken"))
          reply(ex, 200, (1 to 50).map(i =>
            s"""{"contentDetails":{"videoId":"v$i"}}""")
            .mkString("""{"nextPageToken":"p2","items":[""", ",", "]}"))
        else
          reply(ex, 200, (51 to 60).map(i =>
            s"""{"contentDetails":{"videoId":"v$i"}}""")
            .mkString("""{"items":[""", ",", "]}"))
      } else reply(ex, 200, """{"items":[]}""")
    })
    server.createContext("/channels", (ex: HttpExchange) => {
      seen += s"channels?${ex.getRequestURI.getQuery}"
      reply(ex, 200,
        """{"items":[{"contentDetails":{"relatedPlaylists":{"uploads":"uploads_ch9"}}}]}""")
    })
    server.createContext("/videos", (ex: HttpExchange) => {
      val q = ex.getRequestURI.getQuery
      seen += s"videos?${ex.getRequestURI.getQuery}"
      // getQuery returns the percent-DECODED query, so the comma list is
      // literal again by the time we parse it
      val ids = q.split("&").find(_.startsWith("id=")).get.stripPrefix("id=")
        .split(",")
      reply(ex, 200, ids.map { id =>
        s"""{"id":"$id","snippet":{"title":"T $id","description":"d",
           |"channelId":"ch9","channelTitle":"Chan Nine",
           |"publishedAt":"2024-01-01T00:00:00Z","tags":["a","b"],
           |"thumbnails":{"high":{"url":"http://t/$id-high.jpg","width":480},
           |"default":{"url":"http://t/$id-def.jpg"}}},
           |"contentDetails":{"duration":"PT1M30S"},
           |"statistics":{"viewCount":"100","likeCount":"7","commentCount":"2"}}"""
          .stripMargin.replace("\n", "")
      }.mkString("""{"items":[""", ",", "]}"))
    })
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}", () => seen.toSeq)
    finally server.stop(0)
  }

  test("paginates playlistItems across nextPageToken pages") {
    withServer { (base, _) =>
      val api = new HttpVideoApi(base, "k123")
      val ids = YouTubeIngest.allVideoIds(api, api.uploadsPlaylist("ch9"))
      assert(ids == (1 to 60).map(i => s"v$i"))
    }
  }

  test("full ingest through fetchVideosDataFrame: hydrate chunks + flatten") {
    withServer { (base, seen) =>
      val api = new HttpVideoApi(base, "k123")
      val df = YouTubeIngest.fetchVideosDataFrame(spark, api, "uploads_ch9")
      val rows = df.collect()
      assert(rows.length == 60)
      val r = rows.find(_.getAs[String]("video_id") == "v7").get
      assert(r.getAs[String]("title") == "T v7")
      assert(r.getAs[Long]("view_count") == 100L)
      assert(r.getAs[String]("tags") == "a, b")
      // C11 priority pick: high beats default when standard is absent
      assert(r.getAs[String]("thumbnail_url") == "http://t/v7-high.jpg")
      // hydrate respected the 50-id page cap: 60 ids → exactly 2 chunks
      assert(seen().count(_.startsWith("videos?")) == 2)
    }
  }

  test("non-2xx raises with the response body (raise_for_status parity)") {
    withServer { (base, _) =>
      val api = new HttpVideoApi(base, "WRONG")
      val e = intercept[RuntimeException] {
        api.playlistItems("uploads_ch9", None)
      }
      assert(e.getMessage.contains("no key"))
    }
  }
}
