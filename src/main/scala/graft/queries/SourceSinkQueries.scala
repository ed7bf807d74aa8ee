package graft.queries

import graft.model.Template
import graft.operators.{Contract, Exporter}
import graft.sources.{HeaderNormalizer, TemplateReader, XlsxMini}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink operator queries (SURVEY §2.1 S1-S6, §2.2 K1-K6, §2.11 V1).
  * Each query pushes driver-testdata through the REAL reader/writer code
  * path (temp artifacts), then the oracle replays the equivalent result
  * straight from the parquet tables.
  */
object SourceSinkQueries {
  import Tables.t

  // S1 template Excel scan: parquet → xlsx → template read (columns subset,
  // rename) → typed frame (reference: src/templates.py:515-588).
  private val s1 = Q("s1_excel_template_scan", Some(
    """SELECT n_nationkey AS nation_key, n_name AS nation_name FROM nation
      |ORDER BY nation_key""".stripMargin)) { (s, dir) =>
    val dirp = Files.createTempDirectory("graft_s1")
    val nation = t(s, dir, "nation")
    Exporter.writeXlsx(nation, dirp.resolve("nation.xlsx"), "Sheet1")
    val tpl = Template(
      columns = List("n_nationkey", "n_name"),
      columnMappings = Map("n_nationkey" -> "nation_key", "n_name" -> "nation_name"))
    TemplateReader.readExcel(s, dirp.resolve("nation.xlsx"), tpl)
      .select(col("nation_key").cast("int").as("nation_key"), col("nation_name"))
      .orderBy("nation_key")
  }

  // S1 multi-sheet combine: union-by-name with null-fill + source_sheet
  // lineage (P4) across sheets of one workbook
  // (reference: src/templates.py:575-588).
  private val s1b = Q("s1b_excel_multisheet", Some(
    """SELECT CAST(r_regionkey AS INT) AS key, r_name AS name,
      |  CAST(NULL AS INT) AS region_ref, 'Regions' AS source_sheet FROM region
      |UNION ALL
      |SELECT n_nationkey, n_name, n_regionkey, 'Nations' FROM nation
      |ORDER BY source_sheet DESC, key""".stripMargin)) { (s, dir) =>
    val dirp = Files.createTempDirectory("graft_s1b")
    val wb = dirp.resolve("multi.xlsx")
    Exporter.writeWorkbook(wb, Seq(
      "Regions" -> t(s, dir, "region")
        .select(col("r_regionkey").as("key"), col("r_name").as("name")),
      "Nations" -> t(s, dir, "nation")
        .select(col("n_nationkey").as("key"), col("n_name").as("name"),
          col("n_regionkey").as("region_ref"))))
    val tpl = Template(sheets = List("Regions", "Nations"), combineSheets = true)
    TemplateReader.readExcel(s, wb, tpl)
      .select(col("key").cast("int").as("key"), col("name"),
        col("region_ref").cast("int").as("region_ref"), col("source_sheet"))
      .orderBy(desc("source_sheet"), col("key"))
  }

  // Distributed DSv2 XLSX scan (SURVEY §7.3's DataSource V2 fallback,
  // beyond-reference): a DIRECTORY of workbooks scans with one partition
  // per (file, sheet) and executor-side parsing — here two workbooks split
  // by key parity, recombined by the scan with source_file lineage. The
  // oracle replays the split/recombine straight from parquet.
  private val s1c = Q("s1c_xlsx_dsv2_scan", Some(
    """SELECT c_custkey, c_mktsegment, c_acctbal,
      |  CASE WHEN c_custkey % 2 = 0 THEN 'cust_even.xlsx'
      |       ELSE 'cust_odd.xlsx' END AS source_file
      |FROM customer WHERE c_custkey <= 1000
      |ORDER BY c_custkey""".stripMargin)) { (s, dir) =>
    val dirp = Files.createTempDirectory("graft_s1c")
    val cust = t(s, dir, "customer").filter(col("c_custkey") <= 1000)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    Exporter.writeXlsx(cust.filter(col("c_custkey") % 2 === 0),
      dirp.resolve("cust_even.xlsx"), "Sheet1")
    Exporter.writeXlsx(cust.filter(col("c_custkey") % 2 =!= 0),
      dirp.resolve("cust_odd.xlsx"), "Sheet1")
    s.read.format("graft-xlsx").load(dirp.toString)
      .select(col("c_custkey").cast("long").as("c_custkey"),
        col("c_mktsegment"), col("c_acctbal"), col("source_file"))
      .orderBy("c_custkey")
  }

  // S2 template CSV scan (fast path: distributed spark.read.csv with header
  // + delimiter; header_row/skiprows replay covered by XlsxSourcesSpec)
  // (reference: src/templates.py:521-529).
  private val s2 = Q("s2_csv_template_scan", Some(
    """SELECT c_custkey AS customer_id, c_mktsegment AS segment,
      |  c_acctbal AS balance FROM customer ORDER BY customer_id""".stripMargin)) { (s, dir) =>
    val dirp = Files.createTempDirectory("graft_s2")
    val csvPath = dirp.resolve("customer_csv")
    t(s, dir, "customer").write
      .option("header", "true").option("sep", ";").csv(csvPath.toString)
    val tpl = Template(sourceType = "csv", delimiter = ";",
      columns = List("c_custkey", "c_mktsegment", "c_acctbal"),
      columnMappings = Map("c_custkey" -> "customer_id",
        "c_mktsegment" -> "segment", "c_acctbal" -> "balance"))
    TemplateReader.readCsv(s, csvPath, tpl)
      .select(col("customer_id").cast("long").as("customer_id"), col("segment"),
        col("balance").cast("double").as("balance"))
      .orderBy("customer_id")
  }

  // S3 merged-header normalization + S4 header-row guessing on a driver-built
  // workbook (reference: src/templates.py:406-465; src/services/header_detection.py:16-26).
  private val s3 = Q("s3_s4_header_intelligence", Some(
    """SELECT * FROM (VALUES
      |  (0, '2020'), (1, '2020'), (2, '2020'), (3, 'Region'),
      |  (4, 'merged_E1_E'), (5, 'merged_E1_F'), (6, '1')) AS t(pos, header)
      |ORDER BY pos""".stripMargin)) { (s, dir) =>
    val p = Files.createTempDirectory("graft_s3").resolve("merged.xlsx")
    XlsxMini.write(p, Seq(XlsxMini.Sheet("Sales",
      Vector(
        Vector("2020", null, null, "Region", null, null, 1.0),
        Vector("Jan", "Feb", "Mar", "north", "x", "y", 2.0),
        Vector(10.0, 20.0, 30.0, "south", "p", "q", 3.0)),
      merged = Seq((0, 0, 0, 2), (0, 4, 0, 5)))))
    val sheet = XlsxMini.readSheet(p, None).get
    val (headers, merged) = HeaderNormalizer.normalize(sheet, 0, Nil)
    assert(merged, "merged ranges must be detected")
    // row 0 is only 2/3 stringish (banner + stray number); row 1 is the
    // first >80%-string, >50%-width row — the reference's heuristic target
    assert(HeaderNormalizer.guessHeaderRow(sheet.grid) == 1)
    import s.implicits._
    headers.zipWithIndex.map { case (h, i) => (i, h) }.toDF("pos", "header")
      .orderBy("pos")
  }

  // S6 sheet-name listing from the workbook XML (reference: src/services/io.py:121-133).
  private val s6 = Q("s6_sheet_names", Some(
    """SELECT * FROM (VALUES (0, 'detail'), (1, 'top_videos'), (2, 'per_channel'))
      |AS t(pos, sheet) ORDER BY pos""".stripMargin)) { (s, dir) =>
    val p = Files.createTempDirectory("graft_s6").resolve("wb.xlsx")
    val small = t(s, dir, "region").limit(3)
    Exporter.writeWorkbook(p, Seq("detail" -> small, "top_videos" -> small,
      "per_channel" -> small))
    import s.implicits._
    XlsxMini.sheetNames(p).zipWithIndex.map { case (n, i) => (i, n) }
      .toDF("pos", "sheet").orderBy("pos")
  }

  // K1 xlsx writer round-trip (reference: src/cli.py:44-51).
  private val k1 = Q("k1_xlsx_roundtrip", Some(
    """SELECT r_regionkey AS k, r_name AS name FROM region ORDER BY k""")) { (s, dir) =>
    val p = Files.createTempDirectory("graft_k1").resolve("region") // suffix forced
    val out = Exporter.writeXlsx(
      t(s, dir, "region").select(col("r_regionkey").as("k"), col("r_name").as("name")), p)
    assert(out.getFileName.toString == "region.xlsx")
    TemplateReader.readExcel(s, out, Template())
      .select(col("k").cast("int").as("k"), col("name"))
      .orderBy("k")
  }

  // K2 parquet writer round-trip (reference: src/exporter.py:106-109).
  private val k2 = Q("k2_parquet_roundtrip", Some(
    """SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY o_orderkey""".stripMargin)) { (s, dir) =>
    val p = Files.createTempDirectory("graft_k2").resolve("orders_f.parquet")
    Exporter.writeParquet(
      t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_totalprice"), p)
    s.read.parquet(p.toString).orderBy("o_orderkey")
  }

  // K3 jsonl writer round-trip (reference: src/exporter.py:61-66).
  private val k3 = Q("k3_jsonl_roundtrip", Some(
    """SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey""")) {
    (s, dir) =>
      val p = Files.createTempDirectory("graft_k3").resolve("nation_jsonl")
      Exporter.writeJsonl(t(s, dir, "nation"), p)
      s.read.json(p.toString)
        .select(col("n_nationkey").cast("int"), col("n_name"),
          col("n_regionkey").cast("int"))
        .orderBy("n_nationkey")
  }

  // K4 csv writer round-trip (reference: webapp/pages/07_Combine.py:91-97).
  private val k4 = Q("k4_csv_roundtrip", Some(
    """SELECT r_regionkey AS k, r_name AS name FROM region ORDER BY k""")) { (s, dir) =>
    val p = Files.createTempDirectory("graft_k4").resolve("region_csv")
    Exporter.writeCsv(
      t(s, dir, "region").select(col("r_regionkey").as("k"), col("r_name").as("name")), p)
    s.read.option("header", "true").csv(p.toString)
      .select(col("k").cast("int").as("k"), col("name"))
      .orderBy("k")
  }

  // K6 manifest quality metrics: exportDataset writes parquet + manifest.json;
  // the metrics re-emitted here come from the PARSED manifest file
  // (reference: src/exporter.py:14-33,69-118).
  private val k6 = Q("k6_manifest_metrics", Some(
    """SELECT count(*) AS rows, 2 AS columns,
      |  CAST(count(*) - (SELECT count(*) FROM (SELECT DISTINCT o_orderstatus,
      |    o_orderpriority FROM orders)) AS BIGINT) AS duplicate_rows,
      |  round(100.0 * sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
      |    / count(*), 2) AS null_pct_status
      |FROM orders""".stripMargin)) { (s, dir) =>
    val outDir = Files.createTempDirectory("graft_k6")
    val sparse = t(s, dir, "orders").select(
      when(col("o_orderstatus") =!= "O", col("o_orderstatus")).as("status"),
      col("o_orderpriority").as("prio"))
    val (manifestPath, _) = Exporter.exportDataset(sparse, outDir, "sparse",
      Seq("parquet"), runId = "verify-run")
    // parse the manifest back (JSON ⊂ YAML; SnakeYAML ships with Spark)
    val yaml = new org.yaml.snakeyaml.Yaml(
      new org.yaml.snakeyaml.constructor.SafeConstructor(new org.yaml.snakeyaml.LoaderOptions()))
    val m = yaml.load[java.util.Map[String, Any]](Files.readString(manifestPath))
    val metrics = m.get("metrics").asInstanceOf[java.util.Map[String, Any]]
    val nullPct = metrics.get("null_pct").asInstanceOf[java.util.Map[String, Any]]
    import s.implicits._
    Seq((
      metrics.get("rows").toString.toLong,
      metrics.get("columns").toString.toInt,
      metrics.get("duplicate_rows").toString.toLong,
      nullPct.get("status").toString.toDouble,
    )).toDF("rows", "columns", "duplicate_rows", "null_pct_status")
  }

  // V1 contract validation levels: missing required column + uncoercible
  // field_types produce pandera-style (column, failure) cases
  // (reference: src/api/v1/engine.py:55-80; src/schema.py:12-22).
  private val v1 = Q("v1_contract_validation", Some(
    """WITH c AS (SELECT count(*) AS n FROM orders WHERE o_orderkey % 3 = 0)
      |SELECT * FROM (
      |  SELECT 'contract_missing' AS level, 'article_sku' AS col_name,
      |         'missing required column' AS failure
      |  UNION ALL
      |  SELECT 'contract_types', 'sales_amount',
      |         CAST((SELECT n FROM c) AS VARCHAR) || ' values not coercible to float'
      |  UNION ALL
      |  SELECT 'coerce_ok', '', 'valid')
      |ORDER BY level""".stripMargin)) { (s, dir) =>
    val df = t(s, dir, "orders").select(
      col("o_orderkey").cast("string").as("provider_id"),
      when(col("o_orderkey") % 3 === 0, lit("oops"))
        .otherwise(col("o_totalprice").cast("string")).as("sales_amount"))
    // contract: required column absent
    val r1 = Contract.validate(df, Template(requiredFields = List("article_sku")), "contract")
    assert(!r1.isValid)
    // contract: sales_amount has uncoercible values
    val r2 = Contract.validate(df,
      Template(fieldTypes = Map("sales_amount" -> "float")), "contract")
    assert(!r2.isValid)
    // coerce: passes and coerces canonical columns
    val r3 = Contract.validate(df, Template(), "coerce")
    assert(r3.isValid &&
      r3.data.schema("sales_amount").dataType ==
        org.apache.spark.sql.types.DoubleType)
    import s.implicits._
    (r1.errors.map { case (c, f) => ("contract_missing", c, f) } ++
      r2.errors.map { case (c, f) => ("contract_types", c, f) } ++
      Seq(("coerce_ok", "", "valid")))
      .toDF("level", "col_name", "failure").orderBy("level")
  }

  // K9 ORC round-trip: same contract as k2, through the other columnar
  // lakehouse format (ORC ships in Spark's jars — no extra deps).
  private val k9 = Q("k9_orc_roundtrip", Some(
    """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
      |FROM lineitem WHERE l_returnflag = 'A' AND l_linenumber = 1
      |ORDER BY l_orderkey, l_linenumber""".stripMargin)) { (s, dir) =>
    val p = Files.createTempDirectory("graft_k9").resolve("lineitem_a.orc")
    Exporter.writeOrc(
      t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "A" && col("l_linenumber") === 1)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"), p)
    s.read.orc(p.toString).orderBy("l_orderkey", "l_linenumber")
  }

  // Federated three-format join: the fact stays parquet, one dim written to
  // ORC and one to CSV, all three joined in ONE plan — the "query the lake
  // as it is" capability. The CSV/ORC legs re-read what this query wrote,
  // while the oracle runs over the original parquet tables: format
  // round-trips AND the join must both be exact.
  private val k10 = Q("k10_federated_join", Some(
    """SELECT n.n_name,
      |  count(*) AS n_rows,
      |  round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price
      |FROM lineitem l
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
      |  AND l.l_shipdate < TIMESTAMP '1998-04-01'
      |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin)) { (s, dir) =>
    val tmp = Files.createTempDirectory("graft_k10")
    Exporter.writeOrc(t(s, dir, "supplier")
      .select("s_suppkey", "s_nationkey"), tmp.resolve("supplier.orc"))
    Exporter.writeCsv(t(s, dir, "nation")
      .select("n_nationkey", "n_name"), tmp.resolve("nation.csv"))
    val sup = s.read.orc(tmp.resolve("supplier.orc").toString)
    val nat = s.read.option("header", "true").option("inferSchema", "true")
      .csv(tmp.resolve("nation.csv").toString)
      .select(col("n_nationkey").cast("int"), col("n_name").cast("string"))
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1998-01-01") &&
        col("l_shipdate") < lit("1998-04-01"))
      .select("l_suppkey", "l_extendedprice")
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 2)
          .as("total_price"))
      .orderBy("n_name")
  }

  // Schema-evolution read: two parquet batches written with DIFFERENT
  // schemas (a column added later) read back as one evolved table via
  // mergeSchema; pre-evolution rows surface the new column as null. The
  // oracle replays the same union-with-null semantics.
  private val k11 = Q("k11_schema_evolution", Some(
    """WITH evolved AS (
      |  SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
      |  FROM orders WHERE o_orderkey % 2 = 0
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice, o_orderpriority
      |  FROM orders WHERE o_orderkey % 2 = 1)
      |SELECT coalesce(o_orderpriority, '(pre-schema)') AS priority,
      |  count(*) AS n_orders,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
      |FROM evolved GROUP BY 1 ORDER BY 1""".stripMargin)) { (s, dir) =>
    val tmp = Files.createTempDirectory("graft_k11").resolve("evolved")
    val o = t(s, dir, "orders")
    o.filter(col("o_orderkey") % 2 === 0)
      .select("o_orderkey", "o_totalprice")
      .write.parquet(tmp.resolve("batch=1").toString)
    o.filter(col("o_orderkey") % 2 === 1)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .write.parquet(tmp.resolve("batch=2").toString)
    s.read.option("mergeSchema", "true")
      .parquet(tmp.resolve("batch=1").toString, tmp.resolve("batch=2").toString)
      .groupBy(coalesce(col("o_orderpriority"), lit("(pre-schema)")).as("priority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
          .as("total_value"))
      .orderBy("priority")
  }

  // S9 upload scan: the bytes→scratch-file→template-read path the webapp
  // upload uses (reference: src/core/streamlit_io.py:11-47) — round-trips
  // region through a real xlsx payload handed over as raw bytes.
  private val s9 = Q("s9_upload_scan", Some(
    """SELECT CAST(r_regionkey AS INT) AS region_key, r_name AS region_name
      |FROM region ORDER BY region_key""".stripMargin)) { (s, dir) =>
    val dirp = Files.createTempDirectory("graft_s9")
    val p = dirp.resolve("region.xlsx")
    Exporter.writeXlsx(t(s, dir, "region"), p, "Sheet1")
    val tpl = Template(
      columns = List("r_regionkey", "r_name"),
      columnMappings = Map("r_regionkey" -> "region_key", "r_name" -> "region_name"))
    TemplateReader.readBytes(s, Files.readAllBytes(p), "upload.xlsx", tpl)
      .select(col("region_key").cast("int").as("region_key"), col("region_name"))
      .orderBy("region_key")
  }

  val qs: Seq[Q] = Seq(s1, s1b, s1c, s2, s3, s6, s9, k1, k2, k3, k4, k6, v1, k9,
    k10, k11)
}
