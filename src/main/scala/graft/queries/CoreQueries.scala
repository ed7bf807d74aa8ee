package graft.queries

import graft.model.Template
import graft.operators.TransformEngine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core transform-engine queries (SURVEY §2.3/§2.4/§2.6–§2.9): one
  * driver-checkable query per operator family, each exercising the real
  * `TransformEngine` code path, with a DuckDB oracle built under Q's parity
  * rules. Tables come from the driver testdata (TESTDATA.md).
  */
object CoreQueries {
  import Tables.t

  // P1 filter_and_rename, name mode (reference: src/templates.py:484-512).
  private val p1 = Q("p1_filter_rename", Some(
    """SELECT c_custkey AS customer_id, c_name AS customer_name, c_acctbal AS acctbal
      |FROM customer ORDER BY customer_id""".stripMargin)) { (s, dir) =>
    val tpl = Template(
      columns = List("c_custkey", "c_name", "c_acctbal"),
      columnMappings = Map("c_custkey" -> "customer_id", "c_name" -> "customer_name",
        "c_acctbal" -> "acctbal"))
    TransformEngine.filterAndRename(t(s, dir, "customer"), tpl)
      .orderBy("customer_id")
  }

  // P2 header replacement with pad/truncate (reference: src/templates.py:468-481).
  private val p2 = Q("p2_replace_headers", Some(
    """SELECT r_regionkey AS regionkey, r_name AS region_name
      |FROM region ORDER BY regionkey""".stripMargin)) { (s, dir) =>
    TransformEngine.replaceHeaders(t(s, dir, "region"), Seq("regionkey", "region_name"))
      .orderBy("regionkey")
  }

  // P3 provider_id literal + P4 lineage columns
  // (reference: src/api/v1/engine.py:160-163; src/templates.py:575-576).
  private val p3 = Q("p3_provider_lineage", Some(
    """SELECT n_nationkey AS nation_key, n_name AS nation_name, 'acme' AS provider_id,
      |  'Sheet1' AS source_sheet, 'nation.parquet' AS source_file
      |FROM nation ORDER BY nation_key""".stripMargin)) { (s, dir) =>
    val tpl = Template(
      columns = List("n_nationkey", "n_name"),
      columnMappings = Map("n_nationkey" -> "nation_key", "n_name" -> "nation_name"),
      providerName = Some("acme"))
    val renamed = TransformEngine.filterAndRename(t(s, dir, "nation"), tpl)
    val (out, _) = TransformEngine.transform(renamed, tpl)
    out.withColumn("source_sheet", lit("Sheet1"))
      .withColumn("source_file", lit("nation.parquet"))
      .orderBy("nation_key")
  }

  private def monthCase(m: Int): String =
    s"sum(CASE WHEN month(o_orderdate) = $m THEN o_totalprice END) AS m${f"$m%02d"}"

  // R1 unpivot + P3 + C3 fillna(0) end-to-end through the engine
  // (reference: src/api/v1/engine.py:144-158,193-197).
  private val r1 = Q("r1_unpivot_engine", Some({
    val wide = (1 to 12).map(monthCase).mkString(", ")
    val stack = (1 to 12).map { m =>
      val n = f"m$m%02d"
      s"SELECT o_custkey, '$n' AS period, $n AS sales_amount FROM wide"
    }.mkString(" UNION ALL ")
    s"""WITH wide AS (SELECT o_custkey, $wide FROM orders GROUP BY o_custkey)
       |SELECT o_custkey, period, round(coalesce(sales_amount, 0.0), 2) AS sales_amount,
       |  'acme' AS provider_id
       |FROM ($stack) ORDER BY o_custkey, period""".stripMargin
  })) { (s, dir) =>
    val orders = t(s, dir, "orders")
    val wide = orders.groupBy("o_custkey").agg(
      sum(when(month(col("o_orderdate")) === 1, col("o_totalprice"))).as("m01"),
      (2 to 12).map(m =>
        sum(when(month(col("o_orderdate")) === m, col("o_totalprice"))).as(f"m$m%02d")): _*)
    val tpl = Template(
      columnMappings = Map("o_custkey" -> "o_custkey"),
      unpivot = true, varName = "period", valueName = "sales_amount",
      providerName = Some("acme"))
    val (out, _) = TransformEngine.transform(wide, tpl)
    out.select(col("o_custkey"), col("period"),
        round(col("sales_amount"), 2).as("sales_amount"), col("provider_id"))
      .orderBy("o_custkey", "period")
  }

  // A1 combine_on group-sum with min_count=1 semantics: the all-null group
  // must sum to NULL, not 0 (reference: src/api/v1/engine.py:199-221).
  private val a1 = Q("a1_combine_groupsum", Some(
    """SELECT l_returnflag, l_linestatus, 'acme' AS provider_id,
      |  round(sum(l_quantity), 2) AS l_quantity,
      |  round(sum(l_extendedprice), 2) AS l_extendedprice,
      |  round(sum(CASE WHEN l_returnflag <> 'A' THEN l_tax END), 2) AS maybe_tax
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin)) { (s, dir) =>
    val proj = t(s, dir, "lineitem").select(
      col("l_returnflag"), col("l_linestatus"), col("l_quantity"), col("l_extendedprice"),
      when(col("l_returnflag") =!= "A", col("l_tax")).as("maybe_tax"))
    val tpl = Template(combineOn = List("l_returnflag", "l_linestatus"),
      providerName = Some("acme"))
    val (out, _) = TransformEngine.transform(proj, tpl)
    out.select(col("l_returnflag"), col("l_linestatus"), col("provider_id"),
        round(col("l_quantity"), 2).as("l_quantity"),
        round(col("l_extendedprice"), 2).as("l_extendedprice"),
        round(col("maybe_tax"), 2).as("maybe_tax"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // D1 keyed dedupe keep-first, parity mode: window row_number over an explicit
  // order — one shuffle, no global sort (reference: src/api/v1/engine.py:223-230).
  private val d1 = Q("d1_dedupe_first", Some(
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem
      |QUALIFY row_number() OVER (
      |  PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_quantity) = 1
      |ORDER BY l_orderkey""".stripMargin)) { (s, dir) =>
    val proj = t(s, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    TransformEngine.dedupe(proj, List("l_orderkey"),
        Some(Seq(col("l_linenumber"), col("l_partkey"), col("l_quantity"))))
      .orderBy("l_orderkey")
  }

  // F3 drop rows where every column is null (reference: src/api/v1/engine.py:165-166).
  private val f3 = Q("f3_drop_empty_rows", Some(
    """SELECT a, b, count(*) AS n FROM (
      |  SELECT CASE WHEN o_orderstatus <> 'O' THEN o_orderstatus END AS a,
      |         CASE WHEN o_totalprice > 150000 THEN o_orderpriority END AS b
      |  FROM orders)
      |WHERE NOT (a IS NULL AND b IS NULL)
      |GROUP BY a, b ORDER BY a NULLS FIRST, b NULLS FIRST""".stripMargin)) { (s, dir) =>
    val sparse = t(s, dir, "orders").select(
      when(col("o_orderstatus") =!= "O", col("o_orderstatus")).as("a"),
      when(col("o_totalprice") > 150000, col("o_orderpriority")).as("b"))
    TransformEngine.dropEmptyRows(sparse)
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("a"), asc_nulls_first("b"))
  }

  // F4 drop null columns by threshold — one avg(isNotNull) agg then select
  // (reference: src/api/v1/engine.py:168-176). `half` (~50% non-null) survives
  // threshold 0.4; `mostly_null` (~1%) is dropped.
  private val f4 = Q("f4_drop_null_columns", Some(
    """SELECT o_orderkey AS k, CASE WHEN o_orderkey % 2 = 0 THEN 'x' END AS half
      |FROM orders ORDER BY k""".stripMargin)) { (s, dir) =>
    val sparse = t(s, dir, "orders").select(
      col("o_orderkey").as("k"),
      when(col("o_orderkey") % 2 === 0, lit("x")).as("half"),
      when(col("o_orderkey") % 100 === 0, lit("y")).as("mostly_null"))
    TransformEngine.dropNullColumns(sparse, 0.4).orderBy("k")
  }

  // C1 date coercion + F6 drop unparseable + C3 sales_amount fillna(0),
  // full engine path (reference: src/api/v1/engine.py:186-197).
  private val c1 = Q("c1_f6_date_coercion", Some(
    """WITH raw AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 7 = 0 THEN 'not-a-date'
      |         ELSE strftime(o_orderdate, '%Y-%m-%d') END AS report_date,
      |    CASE WHEN o_orderkey % 11 = 0 THEN 'N/A'
      |         ELSE CAST(o_totalprice AS VARCHAR) END AS sales_amount
      |  FROM orders)
      |SELECT o_orderkey, try_strptime(report_date, '%Y-%m-%d') AS report_date,
      |  round(coalesce(try_cast(sales_amount AS DOUBLE), 0.0), 2) AS sales_amount,
      |  'acme' AS provider_id
      |FROM raw WHERE try_strptime(report_date, '%Y-%m-%d') IS NOT NULL
      |ORDER BY o_orderkey""".stripMargin)) { (s, dir) =>
    val raw = t(s, dir, "orders").select(
      col("o_orderkey"),
      when(col("o_orderkey") % 7 === 0, lit("not-a-date"))
        .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("report_date"),
      when(col("o_orderkey") % 11 === 0, lit("N/A"))
        .otherwise(col("o_totalprice").cast("string")).as("sales_amount"))
    val (out, _) = TransformEngine.transform(raw, Template(providerName = Some("acme")))
    out.select(col("o_orderkey"), col("report_date"),
        round(col("sales_amount"), 2).as("sales_amount"), col("provider_id"))
      .orderBy("o_orderkey")
  }

  // C2 tolerant int coercion incl. the "15.0"-parses-as-15 pandas behavior
  // (reference: src/api/v1/engine.py:34-40).
  private val c2 = Q("c2_int_coercion", Some(
    """WITH raw AS (
      |  SELECT p_partkey,
      |    CASE WHEN p_partkey % 5 = 0 THEN p_name
      |         WHEN p_partkey % 7 = 0 THEN CAST(p_size AS VARCHAR) || '.0'
      |         ELSE CAST(p_size AS VARCHAR) END AS s
      |  FROM part)
      |SELECT p_partkey,
      |  CAST(CASE WHEN try_cast(s AS DOUBLE) = floor(try_cast(s AS DOUBLE))
      |       THEN try_cast(s AS DOUBLE) END AS BIGINT) AS size_int
      |FROM raw ORDER BY p_partkey""".stripMargin)) { (s, dir) =>
    val raw = t(s, dir, "part").select(
      col("p_partkey"),
      when(col("p_partkey") % 5 === 0, col("p_name"))
        .when(col("p_partkey") % 7 === 0, concat(col("p_size").cast("string"), lit(".0")))
        .otherwise(col("p_size").cast("string")).as("s"))
    raw.select(col("p_partkey"), TransformEngine.coerceInt(col("s")).as("size_int"))
      .orderBy("p_partkey")
  }

  // C5 trim + C6 strip thousands over all string columns
  // (reference: src/api/v1/engine.py:178-184).
  private val c5 = Q("c5_c6_trim_strip", Some(
    """SELECT c_custkey,
      |  regexp_replace(trim('  ' || c_mktsegment || '  '), '[,\s]', '', 'g') AS seg,
      |  regexp_replace(trim(CAST(c_custkey AS VARCHAR) || ',999 '), '[,\s]', '', 'g') AS ns
      |FROM customer ORDER BY c_custkey""".stripMargin)) { (s, dir) =>
    val raw = t(s, dir, "customer").select(
      col("c_custkey"),
      concat(lit("  "), col("c_mktsegment"), lit("  ")).as("seg"),
      concat(col("c_custkey").cast("string"), lit(",999 ")).as("ns"))
    TransformEngine.stripThousands(TransformEngine.trimStrings(raw))
      .orderBy("c_custkey")
  }

  // A6 parse-failure counting in ONE pass via try_cast markers — never a
  // second read (reference: src/api/v1/engine.py:27-47,186-197; SURVEY §7.4.3).
  private val a6 = Q("a6_parse_failures", Some(
    """WITH raw AS (
      |  SELECT CASE WHEN o_orderkey % 7 = 0 THEN 'not-a-date'
      |              ELSE strftime(o_orderdate, '%Y-%m-%d') END AS rd,
      |         CASE WHEN o_orderkey % 11 = 0 THEN 'N/A'
      |              ELSE CAST(o_totalprice AS VARCHAR) END AS sa
      |  FROM orders)
      |SELECT
      |  CAST(sum(CASE WHEN rd IS NOT NULL AND try_strptime(rd, '%Y-%m-%d') IS NULL
      |      THEN 1 ELSE 0 END) AS BIGINT) AS date_failures,
      |  CAST(sum(CASE WHEN sa IS NOT NULL AND try_cast(sa AS DOUBLE) IS NULL
      |      THEN 1 ELSE 0 END) AS BIGINT) AS numeric_failures,
      |  count(*) AS rows_total
      |FROM raw""".stripMargin)) { (s, dir) =>
    val raw = t(s, dir, "orders").select(
      when(col("o_orderkey") % 7 === 0, lit("not-a-date"))
        .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("rd"),
      when(col("o_orderkey") % 11 === 0, lit("N/A"))
        .otherwise(col("o_totalprice").cast("string")).as("sa"))
    import org.apache.spark.sql.types.StringType
    raw.agg(
      sum((col("rd").isNotNull &&
        TransformEngine.coerceDate(col("rd"), StringType).isNull).cast("long"))
        .as("date_failures"),
      sum((col("sa").isNotNull && TransformEngine.coerceFloat(col("sa")).isNull).cast("long"))
        .as("numeric_failures"),
      count(lit(1)).as("rows_total"))
  }

  // H9 header diff: expected-vs-actual missing/extra columns
  // (reference: src/api/v1/engine.py:83-110).
  private val h9 = Q("h9_header_diff", Some(
    """SELECT * FROM (VALUES ('o_custkey', 'missing'), ('o_totalprice', 'extra'))
      |AS t(col_name, status) ORDER BY col_name""".stripMargin)) { (s, dir) =>
    val actual = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
    val tpl = Template(columns = List("o_orderkey", "o_custkey"))
    val (missing, extra) = graft.operators.HeaderDiff.diff(actual.columns.toSeq, tpl)
    import s.implicits._
    (missing.map((_, "missing")) ++ extra.map((_, "extra")))
      .toDF("col_name", "status").orderBy("col_name")
  }

  // R1 + H7 + P2 end-to-end: localized month headers ("2020 tammikuu")
  // normalized to period labels, headers replaced, then melted through the
  // engine — the reference's real messy-spreadsheet flow
  // (reference: src/services/schema_candidates.py:145-158 + engine unpivot).
  private val r2 = Q("r2_localized_unpivot", Some {
    val stack = Seq("jan" -> "m1", "feb" -> "m2", "mar" -> "m3").map { case (m, c) =>
      s"SELECT customer_id, '2020-$m' AS period, round(coalesce($c, 0.0), 2) AS sales_amount FROM wide"
    }.mkString(" UNION ALL ")
    s"""WITH wide AS (
       |  SELECT o_custkey AS customer_id,
       |    sum(CASE WHEN month(o_orderdate) = 1 THEN o_totalprice END) AS m1,
       |    sum(CASE WHEN month(o_orderdate) = 2 THEN o_totalprice END) AS m2,
       |    sum(CASE WHEN month(o_orderdate) = 3 THEN o_totalprice END) AS m3
       |  FROM orders GROUP BY 1)
       |SELECT customer_id, period, sales_amount, 'acme' AS provider_id
       |FROM ($stack) ORDER BY customer_id, period""".stripMargin
  }) { (s, dir) =>
    val wide = t(s, dir, "orders").groupBy(col("o_custkey").as("customer_id"))
      .agg(
        sum(when(month(col("o_orderdate")) === 1, col("o_totalprice"))).as("2020 tammikuu"),
        sum(when(month(col("o_orderdate")) === 2, col("o_totalprice"))).as("2020 helmikuu"),
        sum(when(month(col("o_orderdate")) === 3, col("o_totalprice"))).as("2020 maerz"))
    val (normalized, changed) =
      graft.functions.SchemaCandidates.combineYearMonth(wide.columns.toSeq)
    assert(changed && normalized.contains("2020-jan"))
    val renamed = TransformEngine.replaceHeaders(wide, normalized)
    val tpl = Template(columnMappings = Map("customer_id" -> "customer_id"),
      unpivot = true, varName = "period", valueName = "sales_amount",
      providerName = Some("acme"))
    val (out, _) = TransformEngine.transform(renamed, tpl)
    out.select(col("customer_id"), col("period"),
        round(col("sales_amount"), 2).as("sales_amount"), col("provider_id"))
      .orderBy("customer_id", "period")
  }

  // P5 snake_case fallback naming (reference: src/core.py:246-250): messy
  // real-world headers collapse to canonical snake_case identifiers.
  private val p5 = Q("p5_snake_case", Some(
    """SELECT n_nationkey AS nation_key_1, n_name AS the_name_field
      |FROM nation ORDER BY nation_key_1""".stripMargin)) { (s, dir) =>
    val messy = t(s, dir, "nation").select(
      col("n_nationkey").as("  Nation//Key--1 "),
      col("n_name").as("The NAME field!"))
    messy.toDF(messy.columns.map(TransformEngine.snakeCase).toIndexedSeq: _*)
      .orderBy("nation_key_1")
  }

  val qs: Seq[Q] = Seq(p1, p2, p3, p5, r1, r2, a1, d1, f3, f4, c1, c2, c5, a6,
    h9)
}
