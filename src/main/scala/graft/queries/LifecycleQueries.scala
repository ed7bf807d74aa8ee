package graft.queries

import graft.functions.AutoMapper
import graft.model.{Template, TemplateCodec}
import graft.operators.Combiner
import graft.plans.Pipeline
import graft.sources.TemplateReader
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Queries for the remaining spec-only §2 rows (S5, C4, V2, V3, K7, K8,
  * H3, H4) plus the template-codec round-trip, so every inventory row has a
  * CORRECTNESS entry. Driver-side control flow is surfaced as observable
  * facts; fixed-input paths use VALUES oracles.
  */
object LifecycleQueries {
  import Tables.t

  // S5 cached preview read: limit-n cap + the mislabeled-xlsx CSV fallback
  // (reference: src/services/io.py:25-118).
  private val s5 = Q("s5_preview_read", Some(
    """SELECT least(200, (SELECT count(*) FROM customer)) AS preview_rows,
      |  (SELECT count(*) FROM customer) AS fallback_rows""".stripMargin)) { (s, dir) =>
    val tmp = Files.createTempDirectory("graft_s5")
    // preview cap on a real csv
    val csv = tmp.resolve("cust.csv")
    t(s, dir, "customer").write.option("header", "true").csv(csv.toString)
    val preview = TemplateReader.preview(s, csv, Template(sourceType = "csv"), 200)
    // mislabeled: CSV bytes with an .xlsx suffix → fallback path reads it all
    val fake = tmp.resolve("cust.xlsx")
    import scala.jdk.CollectionConverters._
    val lines = Files.list(csv).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".csv")).toList.sortBy(_.toString)
      .flatMap(p => Files.readAllLines(p).asScala)
    // keep one header + data rows
    Files.write(fake, (lines.head +: lines.filterNot(_ == lines.head)).asJava)
    val fallback = TemplateReader.read(s, fake, Template())
    // fixture files above are setup; the QUERY itself is one lazy plan
    preview.agg(count(lit(1)).as("preview_rows"))
      .crossJoin(fallback.agg(count(lit(1)).as("fallback_rows")))
  }

  // C4 string coercion via the field_types vocabulary
  // (reference: src/api/v1/engine.py:48-49).
  private val c4 = Q("c4_string_coercion", Some(
    """SELECT p_partkey, CAST(p_size AS VARCHAR) AS p_size, p_name FROM part
      |ORDER BY p_partkey""".stripMargin)) { (s, dir) =>
    val out = graft.operators.TransformEngine.coerceFieldTypes(
      t(s, dir, "part").select("p_partkey", "p_size", "p_name"),
      Map("p_size" -> "str"))
    assert(out.schema("p_size").dataType == org.apache.spark.sql.types.StringType)
    out.orderBy("p_partkey")
  }

  // V2 strict-schema union guard: pass on identical schemas, raise on drift
  // (reference: src/combine_runner.py:24-28).
  private val v2 = Q("v2_strict_schema_guard", Some(
    """SELECT 'match' AS case_name, (SELECT count(*) * 2 FROM region) AS outcome
      |UNION ALL SELECT 'mismatch', -1
      |ORDER BY case_name""".stripMargin)) { (s, dir) =>
    val r = t(s, dir, "region")
    val ok = Combiner.concat(Seq(r, r), strictSchema = true).count()
    val raised =
      try { Combiner.concat(Seq(r, r.drop("r_name")), strictSchema = true); 0L }
      catch { case _: IllegalArgumentException => -1L }
    import s.implicits._
    Seq(("match", ok), ("mismatch", raised)).toDF("case_name", "outcome")
      .orderBy("case_name")
  }

  // V3 + K7 + K8: full pipeline control flow — success writes output +
  // K7 sidecar + archives; validation failure quarantines with error log
  // (reference: src/pipeline.py:61-184).
  private val v3 = Q("v3_k7_k8_pipeline_flow", Some(
    """SELECT * FROM (VALUES
      |  ('fail_archived', false), ('fail_quarantined', true),
      |  ('fail_success', false), ('ok_archived', true),
      |  ('ok_quarantined', false), ('ok_report', true), ('ok_success', true))
      |AS t(fact, value) ORDER BY fact""".stripMargin)) { (s, dir) =>
    val base = Files.createTempDirectory("graft_v3")
    def mkcase(name: String, csv: String): java.nio.file.Path = {
      val d = base.resolve(name); Files.createDirectories(d)
      Files.writeString(d.resolve("in.csv"), csv); d
    }
    // success case
    val okDir = mkcase("ok",
      "article_sku,report_date,sales_amount\ns1,2021-01-02,5.5\n")
    val okOut = okDir.resolve("out.parquet")
    val ok = Pipeline.runPipeline(s, okDir.resolve("in.csv"),
      Template(sourceType = "csv", providerName = Some("p")), okOut,
      okDir.resolve("archive"), okDir.resolve("quarantine"))
    // failure case: required column missing under contract level
    val failDir = mkcase("fail", "a,b\n1,2\n")
    val fail = Pipeline.runPipeline(s, failDir.resolve("in.csv"),
      Template(sourceType = "csv", requiredFields = List("article_sku")),
      failDir.resolve("out.parquet"),
      failDir.resolve("archive"), failDir.resolve("quarantine"),
      validationLevel = "contract")
    import s.implicits._
    Seq(
      ("ok_success", ok.success),
      ("ok_archived", Files.exists(okDir.resolve("archive").resolve("in.csv"))),
      ("ok_quarantined", Files.exists(okDir.resolve("quarantine").resolve("in.csv"))),
      ("ok_report", Files.exists(okDir.resolve("out.parquet.validation.txt"))),
      ("fail_success", fail.success),
      ("fail_quarantined",
        Files.exists(failDir.resolve("quarantine").resolve("in.csv")) &&
        Files.exists(failDir.resolve("quarantine").resolve("in.csv.error.txt"))),
      ("fail_archived", Files.exists(failDir.resolve("archive").resolve("in.csv"))))
      .toDF("fact", "value").orderBy("fact")
  }

  // H3 synonym config: base + user overlay merge, learned pair persists
  // (reference: src/core.py:102-235).
  private val h3 = Q("h3_synonym_config", Some(
    """SELECT * FROM (VALUES
      |  ('provider_id', 'lieferant'), ('provider_id', 'firma'),
      |  ('region', 'gebiet'))
      |AS t(field, synonym) ORDER BY field, synonym""".stripMargin)) { (s, dir) =>
    val d = Files.createTempDirectory("graft_h3")
    Files.writeString(d.resolve("config.yaml"),
      "synonyms:\n  provider_id:\n    - lieferant\n  region:\n    - gebiet\n")
    AutoMapper.learnMapping(d.resolve("config.user.yaml"), "provider_id", "Firma")
    val cfg = AutoMapper.loadConfig(d.resolve("config.yaml"), d.resolve("config.user.yaml"))
    import s.implicits._
    cfg.synonyms.toSeq.flatMap { case (f, syns) => syns.map(f -> _) }
      .toDF("field", "synonym").orderBy("field", "synonym")
  }

  // H4 type sniffing from the real orders schema
  // (reference: webapp/pages/02_Mapping.py:50-57).
  private val h4 = Q("h4_type_sniffing", Some(
    """SELECT * FROM (VALUES
      |  ('o_orderkey', 'Number'), ('o_orderdate', 'Date'), ('o_orderstatus', 'Text'))
      |AS t(col_name, sniffed) ORDER BY col_name""".stripMargin)) { (s, dir) =>
    val schema = t(s, dir, "orders").schema
    import s.implicits._
    Seq("o_orderkey", "o_orderdate", "o_orderstatus")
      .map(c => (c, AutoMapper.sniffType(schema(c).dataType)))
      .toDF("col_name", "sniffed").orderBy("col_name")
  }

  // Template codec: version-3 JSON round-trip + from_dict aliases
  // (reference: src/templates.py:167-384; tests/test_templates_roundtrip.py).
  private val tc = Q("t1_template_roundtrip", Some(
    """SELECT * FROM (VALUES
      |  ('roundtrip_equal', 'true'), ('alias_sheet', 'S1'), ('alias_header_row', '2'),
      |  ('alias_columns', 'a,b'), ('alias_mapping', 'a->x'), ('combine_split', 'k1,k2'))
      |AS t(fact, value) ORDER BY fact""".stripMargin)) { (s, dir) =>
    val full = Template(sheet = Some("Sales"), sheets = List("Sales"), headerRow = 3,
      columns = List("sku", "Jan"), columnMappings = Map("sku" -> "article_sku"),
      skiprows = List(0, 1), delimiter = ";", sourceType = "csv",
      providerName = Some("acme"), combineOn = List("article_sku"),
      unpivot = true, fieldTypes = Map("amount" -> "float"))
    val rt = TemplateCodec.parse(TemplateCodec.toJson(full)) == full &&
      TemplateCodec.parse(TemplateCodec.toYaml(full)) == full
    val aliased = TemplateCodec.parse(
      """{"sheet_name": "S1", "header": 2, "selected_headers": ["a", "b"],
        |"header_mapping": {"a": "x"}, "combine_on": "k1, k2"}""".stripMargin)
    import s.implicits._
    Seq(
      ("roundtrip_equal", rt.toString),
      ("alias_sheet", aliased.sheet.getOrElse("")),
      ("alias_header_row", aliased.headerRow.toString),
      ("alias_columns", aliased.columns.mkString(",")),
      ("alias_mapping", aliased.columnMappings.map { case (k, v) => s"$k->$v" }.mkString(",")),
      ("combine_split", aliased.combineOn.mkString(",")))
      .toDF("fact", "value").orderBy("fact")
  }

  val qs: Seq[Q] = Seq(s5, c4, v2, v3, h3, h4, tc)
}
