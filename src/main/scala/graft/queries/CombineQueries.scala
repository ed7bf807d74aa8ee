package graft.queries

import graft.operators.{Combiner, Profiler, QueryBuilder, TransformEngine}
import graft.operators.QueryBuilder.Filter
import org.apache.spark.sql.functions._

/** Combine / query-builder / sort-limit / profiling queries
  * (SURVEY §2.4 F1-F2, §2.5 J1, §2.6 A4-A5, §2.7 D2-D3, §2.8 O1-O4, U1-U2).
  * Each runs the real operator code path; oracles follow Q's parity rules.
  */
object CombineQueries {
  import Tables.t

  // U1 concat: union by name, missing columns null-filled
  // (reference: src/combine_runner.py:19-30).
  private val u1 = Q("u1_concat_union", Some(
    """SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
      |FROM orders WHERE o_orderstatus = 'O'
      |UNION ALL
      |SELECT o_orderkey, CAST(NULL AS DOUBLE), o_orderpriority
      |FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY o_orderkey""".stripMargin)) { (s, dir) =>
    val orders = t(s, dir, "orders")
    val a = orders.filter(col("o_orderstatus") === "O").select("o_orderkey", "o_totalprice")
    val b = orders.filter(col("o_orderstatus") === "F").select("o_orderkey", "o_orderpriority")
    Combiner.concat(Seq(a, b)).orderBy("o_orderkey")
  }

  // U2 union with manual alignment to the shared column order
  // (reference: src/app.py:1560-1597).
  private val u2 = Q("u2_concat_aligned", Some(
    """SELECT c_custkey AS k, c_name AS name, CAST(NULL AS DOUBLE) AS bal FROM customer
      |UNION ALL
      |SELECT s_suppkey, s_name, s_acctbal FROM supplier
      |ORDER BY k, name""".stripMargin)) { (s, dir) =>
    val a = t(s, dir, "customer").select(col("c_custkey").as("k"), col("c_name").as("name"))
    val b = t(s, dir, "supplier")
      .select(col("s_suppkey").as("k"), col("s_name").as("name"), col("s_acctbal").as("bal"))
    Combiner.concatAligned(Seq(a, b)).orderBy("k", "name")
  }

  // J1 N-way equi-join fold with pandas `_2`/`_3` collision suffixes
  // (reference: src/combine_runner.py:33-46; SURVEY §7.4.5).
  private val j1 = Q("j1_merge_suffixes", Some(
    """SELECT c.c_custkey, s.s_suppkey, c.c_nationkey AS nationkey,
      |  c.c_name AS name, n.n_name AS name_2, s.s_name AS name_3,
      |  c.c_acctbal AS acctbal, s.s_acctbal AS acctbal_3
      |FROM customer c
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN supplier s ON c.c_nationkey = s.s_nationkey
      |ORDER BY c_custkey, s_suppkey""".stripMargin)) { (s, dir) =>
    val c = t(s, dir, "customer").select(col("c_custkey"),
      col("c_nationkey").as("nationkey"), col("c_name").as("name"),
      col("c_acctbal").as("acctbal"))
    val n = t(s, dir, "nation").select(col("n_nationkey").as("nationkey"),
      col("n_name").as("name"))
    val sup = t(s, dir, "supplier").select(col("s_suppkey"),
      col("s_nationkey").as("nationkey"), col("s_name").as("name"),
      col("s_acctbal").as("acctbal"))
    Combiner.merge(Seq(c, n, sup), Seq("nationkey"), "inner")
      .orderBy("c_custkey", "s_suppkey")
  }

  // F1 Query Builder filters: AND-fold, numeric literal coercion, the
  // unparseable-numeric SKIP, unknown-column skip, null-safe contains
  // (reference: webapp/pages/04_Query_Builder.py:46-75).
  private val f1 = Q("f1_query_filters", Some(
    """SELECT p_partkey, p_type, p_size, p_retailprice FROM part
      |WHERE p_size >= 25 AND p_retailprice < 970.5 AND p_type LIKE '%CONO%'
      |ORDER BY p_partkey""".stripMargin)) { (s, dir) =>
    QueryBuilder.applyFilters(
      t(s, dir, "part").select("p_partkey", "p_type", "p_size", "p_retailprice"),
      Seq(
        Filter("p_size", ">=", "25"),
        Filter("p_retailprice", "<", "970.5"),
        Filter("p_type", "contains", "CONO"),
        Filter("p_size", "=", "abc"),     // numeric col, unparseable → skipped
        Filter("no_such_col", "=", "x"),  // unknown column → skipped
        Filter("p_type", "", "")))        // blank value → skipped
      .orderBy("p_partkey")
  }

  // F2 generated SQL text run through spark.sql on a temp view
  // (reference: webapp/pages/04_Query_Builder.py:29-43).
  private val f2 = Q("f2_sql_generation", Some(
    """SELECT p_partkey, p_brand, p_name FROM part
      |WHERE p_brand = 'Brand#13' AND p_name LIKE '%ol%'
      |ORDER BY p_partkey""".stripMargin)) { (s, dir) =>
    QueryBuilder.runSql(t(s, dir, "part"),
        Seq("p_partkey", "p_brand", "p_name"),
        Seq(Filter("p_brand", "=", "Brand#13"), Filter("p_name", "contains", "ol")))
      .orderBy("p_partkey")
  }

  // O1 multi-column sort desc + O2 top-k — Spark plans TakeOrderedAndProject,
  // never a full global sort (reference: src/youtube.py:241; src/cli.py:219).
  private val o1 = Q("o1_o2_sort_topk", Some(
    """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 100""".stripMargin)) { (s, dir) =>
    t(s, dir, "orders").select("o_orderkey", "o_totalprice", "o_orderpriority")
      .orderBy(desc("o_totalprice"), desc("o_orderkey"))
      .limit(100)
  }

  // O3 preview limit: `df.limit(n)` caps the scan via LocalLimit pushdown;
  // the capped count is the observable (reference: src/services/io.py:65-118).
  private val o3 = Q("o3_preview_limit", Some(
    "SELECT CAST(1000 AS BIGINT) AS n_rows")) { (s, dir) =>
    t(s, dir, "orders").limit(1000).agg(count(lit(1)).as("n_rows"))
  }

  // O4 SQL LIMIT injection unless the query already has limit/fetch
  // (reference: src/connectors.py:109-119,139-140).
  private val o4 = Q("o4_sql_limit_injection", Some(
    """SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey LIMIT 10""")) { (s, dir) =>
    val view = "nation_o4"
    t(s, dir, "nation").createOrReplaceTempView(view)
    val sql = QueryBuilder.injectLimit(
      s"SELECT n_nationkey, n_name FROM $view ORDER BY n_nationkey", 10)
    assert(QueryBuilder.injectLimit("SELECT 1 LIMIT 5", 10) == "SELECT 1 LIMIT 5")
    s.sql(sql)
  }

  // D2 dedupe by key after union of overlapping sources
  // (reference: src/cli.py:215-217).
  private val d2 = Q("d2_union_dedupe", Some(
    """SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey""")) { (s, dir) =>
    val o = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
    TransformEngine.dedupe(Combiner.concat(Seq(o, o)), List("o_orderkey"))
      .orderBy("o_orderkey")
  }

  // D3 full-row duplicate count for the manifest (reference: src/exporter.py:26).
  private val d3 = Q("d3_duprow_count", Some(
    """SELECT count(*) - (SELECT count(*) FROM
      |  (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)) AS dup_rows
      |FROM lineitem""".stripMargin)) { (s, dir) =>
    val proj = t(s, dir, "lineitem").select("l_returnflag", "l_linestatus")
    Profiler.profile(proj).select("dup_rows")
  }

  // A4 frequency table: top-25 value counts with deterministic tie-break
  // (reference: webapp/pages/05_Diagnostics.py:110-115).
  private val a4 = Q("a4_frequency_table", Some(
    """SELECT CAST(o_orderpriority AS VARCHAR) AS value, count(*) AS count
      |FROM orders GROUP BY 1 ORDER BY count DESC, value LIMIT 25""".stripMargin)) { (s, dir) =>
    Profiler.frequencyTable(t(s, dir, "orders"), "o_orderpriority", 25)
  }

  // A5 null/dup profiling as ONE fused agg (reference: src/exporter.py:14-33).
  private val a5 = Q("a5_null_profile", Some(
    """SELECT count(*) AS n_rows, 3 AS n_cols,
      |  count(*) - (SELECT count(*) FROM (SELECT DISTINCT o_orderkey,
      |     CASE WHEN o_orderstatus <> 'O' THEN o_orderstatus END,
      |     CASE WHEN o_totalprice > 200000 THEN o_totalprice END FROM orders)) AS dup_rows,
      |  round(100.0 * sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) / count(*), 2)
      |    AS null_pct_k,
      |  round(100.0 * sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) / count(*), 2)
      |    AS null_pct_status,
      |  round(100.0 * sum(CASE WHEN o_totalprice <= 200000 THEN 1 ELSE 0 END) / count(*), 2)
      |    AS null_pct_price
      |FROM orders""".stripMargin)) { (s, dir) =>
    val sparse = t(s, dir, "orders").select(
      col("o_orderkey").as("k"),
      when(col("o_orderstatus") =!= "O", col("o_orderstatus")).as("status"),
      when(col("o_totalprice") > 200000, col("o_totalprice")).as("price"))
    Profiler.profile(sparse)
  }

  val qs: Seq[Q] = Seq(u1, u2, j1, f1, f2, o1, o3, o4, d2, d3, a4, a5)
}
