package graft.queries

import graft.model.Template
import graft.sources.{SqlSource, YouTubeIngest}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** S7 (JDBC scan against a real embedded Derby DB) and S8 (offline REST
  * ingest with 50-item pagination + chunked hydration) queries.
  */
object ApiSourceQueries {
  import Tables.t

  // S7: load nation into Derby via JDBC, then scan it back through the
  // template SQL source — sql_table path + sql_query path with LIMIT
  // injection (reference: src/connectors.py:104-142).
  private val s7 = Q("s7_jdbc_scan", Some(
    """SELECT n_nationkey AS nation_key, n_name FROM nation
      |WHERE n_nationkey < 10 ORDER BY nation_key""".stripMargin)) { (s, dir) =>
    val dbDir = Files.createTempDirectory("graft_derby")
    val url = s"jdbc:derby:${dbDir.resolve("db")};create=true"
    // driver-side load of the tiny dim table into the database
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE nation (n_nationkey INT, n_name VARCHAR(64))")
      val ps = conn.prepareStatement("INSERT INTO nation VALUES (?, ?)")
      t(s, dir, "nation").select("n_nationkey", "n_name").collect().foreach { r =>
        ps.setInt(1, r.getInt(0)); ps.setString(2, r.getString(1)); ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()

    val conns = Map("warehouse" -> SqlSource.Connection(url))
    assert(SqlSource.testConnection(s, conns("warehouse")), "Derby probe failed")
    // sql_query path with WHERE pushdown into the database
    val tpl = Template(sourceType = "sql", connectionName = Some("warehouse"),
      sqlQuery = Some("SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 10"),
      columnMappings = Map("N_NATIONKEY" -> "nation_key", "N_NAME" -> "n_name"))
    SqlSource.read(s, tpl, conns).orderBy("nation_key")
  }

  // S8: offline REST ingest — fixture JSONL paged at 50 ids/page, hydrated in
  // 50-id chunks, nested JSON flattened (tags join, thumbnail priority)
  // (reference: src/youtube.py:86-208).
  private val s8 = Q("s8_rest_ingest", Some(
    """SELECT 'v' || CAST(p_partkey AS VARCHAR) AS video_id, p_name AS title,
      |  p_brand AS channel_title, 'PT' || CAST(p_size % 60 AS VARCHAR) || 'M' AS duration,
      |  CAST((p_size % 60) * 60 AS BIGINT) AS duration_seconds,
      |  CAST(round(p_retailprice * 10) AS BIGINT) AS view_count,
      |  p_type || ', extra' AS tags,
      |  CASE WHEN p_partkey % 2 = 0 THEN 'std_' ELSE 'def_' END
      |    || CAST(p_partkey AS VARCHAR) AS thumbnail_url
      |FROM part WHERE p_partkey < 120 ORDER BY video_id""".stripMargin)) { (s, dir) =>
    val fixture = Files.createTempDirectory("graft_s8").resolve("videos.jsonl")
    val rows = t(s, dir, "part").filter(col("p_partkey") < 120)
      .select("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice", "p_type")
      .collect()
    val sb = new StringBuilder
    rows.foreach { r =>
      val id = r.getLong(0)
      val thumbs =
        if (id % 2 == 0) s""""standard": "std_$id", "default": "def_$id""""
        else s""""default": "def_$id""""
      sb ++= s"""{"playlist_id": "pl1", "video_id": "v$id", "title": ${jstr(r.getString(1))}, """ +
        s""""channel_id": "ch1", "channel_title": ${jstr(r.getString(2))}, """ +
        s""""published_at": "2021-01-01T00:00:00Z", "duration": "PT${r.getInt(3) % 60}M", """ +
        s""""view_count": ${math.round(r.getDouble(4) * 10)}, "like_count": 1, "comment_count": 2, """ +
        s""""tags": [${jstr(r.getString(5))}, "extra"], "thumbnails": {$thumbs}}""" + "\n"
    }
    Files.writeString(fixture, sb.toString)

    val api = new YouTubeIngest.FixtureApi(fixture)
    // pagination really pages: 120 ids → 3 pages of ≤50
    assert(YouTubeIngest.allVideoIds(api, "pl1").length == rows.length)
    YouTubeIngest.fetchVideosDataFrame(s, api, "pl1")
      .select("video_id", "title", "channel_title", "duration", "duration_seconds",
        "view_count", "tags", "thumbnail_url")
      .orderBy("video_id")
  }

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  val qs: Seq[Q] = Seq(s7, s8)
}
