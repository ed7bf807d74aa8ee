package graft

import graft.model.{Template, TemplateCodec}
import java.nio.file.Files

/** End-to-end CLI lifecycle (reference: src/cli.py §3.1-3.3) — run through
  * Main's subcommand logic against temp dirs. Main.main creates its own
  * SparkSession via getOrCreate, which reuses the test session. */
class CliSpec extends SparkSpec {

  test("run subcommand: template-driven pipeline with archive") {
    spark // force session init so getOrCreate reuses it
    val dir = Files.createTempDirectory("cli_run")
    val in = dir.resolve("input"); Files.createDirectories(in)
    val out = dir.resolve("output")
    // one bad-date row in eleven (9%) — under the 10% quarantine threshold,
    // so the file processes and F6 drops just the unparseable row
    Files.writeString(in.resolve("sales.csv"),
      "article_sku,report_date,sales_amount\n" +
        (1 to 10).map(i => s"s$i,2021-01-${i + 10},$i.5\n").mkString +
        "sbad,bad-date,3\n")
    TemplateCodec.save(
      Template(sourceType = "csv", providerName = Some("acme")),
      in.resolve("sales" + TemplateCodec.TemplateSuffixJson))
    Main.main(Array("run", "--target-dir", in.toString, "--output-dir", out.toString))
    val result = spark.read.parquet(out.resolve("sales_clean.parquet").toString)
    assert(result.count() == 10) // bad-date row dropped by F6
    assert(result.columns.contains("provider_id"))
    assert(Files.exists(in.resolve("archive").resolve("sales.csv")))
  }

  test("combine subcommand merges parquet files on keys") {
    spark
    val dir = Files.createTempDirectory("cli_combine")
    import spark.implicits._
    Seq((1, "a")).toDF("k", "v1").write.parquet(dir.resolve("f1.parquet").toString)
    Seq((1, "b")).toDF("k", "v2").write.parquet(dir.resolve("f2.parquet").toString)
    val out = dir.resolve("merged.parquet")
    Main.main(Array("combine", "--mode", "merge", "--keys", "k", "--out", out.toString,
      dir.resolve("f1.parquet").toString, dir.resolve("f2.parquet").toString))
    val merged = spark.read.parquet(out.toString)
    assert(merged.columns.toSet == Set("k", "v1", "v2"))
    assert(merged.count() == 1)
  }

  test("youtube subcommand: fixture → summaries workbook + manifest") {
    spark
    val dir = Files.createTempDirectory("cli_yt")
    val fixture = dir.resolve("videos.jsonl")
    Files.writeString(fixture,
      """{"playlist_id": "pl1", "video_id": "v1", "title": "T1", "channel_id": "c", "channel_title": "CH", "published_at": "2021-01-01T00:00:00Z", "duration": "PT2M", "view_count": 100, "like_count": 5, "comment_count": 1, "tags": ["t"], "thumbnails": {"default": "d1"}}
        |{"playlist_id": "pl1", "video_id": "v2", "title": "T2", "channel_id": "c", "channel_title": "CH", "published_at": "2022-01-01T00:00:00Z", "duration": "PT3M", "view_count": 200, "like_count": 8, "comment_count": 2, "tags": [], "thumbnails": {"default": "d2"}}
        |""".stripMargin)
    val out = dir.resolve("out")
    Main.main(Array("youtube", "--fixture", fixture.toString, "--playlist", "pl1",
      "--out-dir", out.toString))
    assert(Files.exists(out.resolve("youtube_summary.xlsx")))
    assert(Files.exists(out.resolve("youtube_detail.manifest.json")))
    assert(graft.sources.XlsxMini.sheetNames(out.resolve("youtube_summary.xlsx")) ==
      Seq("detail", "top_videos", "per_channel", "per_year"))
    val detail = spark.read.parquet(out.resolve("youtube_detail.parquet").toString)
    assert(detail.count() == 2)
    assert(detail.columns.contains("engagement_rate_pct"))
  }
}
