package graft.queries

import graft.operators.Merge
import org.apache.spark.sql.functions._

/** Warehouse write-side + multidimensional aggregate queries: SCD2 dimension
  * build, MERGE upsert, and CUBE grouping — the table-maintenance shapes a
  * lakehouse engine needs beyond plain SELECTs. Money sums use the decimal
  * trick from AnalyticsQueries (cast each term exact before summing). */
object WarehouseQueries {
  import Tables.t

  // SCD2 dimension from the order history: one version per (custkey,
  // orderdate) state, validity intervals from a per-key lead window. The
  // oracle replays the aggregate and the window identically.
  private val x34 = Q("x34_scd2_dim", Some(
    """WITH hist AS (
      |  SELECT o_custkey, o_orderdate,
      |    round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS order_value
      |  FROM orders GROUP BY o_custkey, o_orderdate)
      |SELECT o_custkey, order_value, o_orderdate AS valid_from,
      |  lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS valid_to,
      |  lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) IS NULL AS is_current
      |FROM hist ORDER BY o_custkey, valid_from""".stripMargin)) { (s, dir) =>
    val hist = t(s, dir, "orders")
      .groupBy("o_custkey", "o_orderdate")
      .agg(round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
        .as("order_value"))
    Merge.scd2FromHistory(hist, "o_custkey", "o_orderdate", Seq("order_value"))
      .orderBy("o_custkey", "valid_from")
  }

  // CUBE over (event_type, year): all four grouping sets in one pass —
  // Spark expands the cube before the single shuffle (Expand + one
  // aggregate), DuckDB's GROUP BY CUBE replays the same lattice.
  private val x35 = Q("x35_grouping_cube", Some(
    """SELECT coalesce(event_type, 'ALL') AS event_type,
      |  CAST(coalesce(year(ts), -1) AS BIGINT) AS yr,
      |  count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS total_value
      |FROM events GROUP BY CUBE (event_type, year(ts))
      |ORDER BY event_type, yr""".stripMargin)) { (s, dir) =>
    Tables.events(s, dir)
      .withColumn("yr", year(col("ts")))
      .cube(col("event_type"), col("yr"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 2)
          .as("total_value"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("yr"), lit(-1)).cast("long").as("yr"),
        col("n_events"), col("total_value"))
      .orderBy("event_type", "yr")
  }

  // MERGE upsert: per-customer order totals upsert into the customer dim;
  // every 10th update key is shifted out of the dim's key space to exercise
  // the insert path. The oracle is the equivalent FULL OUTER JOIN.
  private val x40 = Q("x40_merge_upsert", Some(
    """WITH upd0 AS (
      |  SELECT o_custkey,
      |    round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS c_acctbal
      |  FROM orders GROUP BY o_custkey),
      |upd AS (
      |  SELECT CASE WHEN o_custkey % 10 = 0 THEN o_custkey + 1000000
      |              ELSE o_custkey END AS k, c_acctbal FROM upd0)
      |SELECT coalesce(c.c_custkey, u.k) AS c_custkey, c.c_name,
      |  round(coalesce(u.c_acctbal, c.c_acctbal), 2) AS balance,
      |  CASE WHEN u.k IS NULL THEN 'keep'
      |       WHEN c.c_custkey IS NULL THEN 'insert'
      |       ELSE 'update' END AS action
      |FROM customer c FULL OUTER JOIN upd u ON c.c_custkey = u.k
      |ORDER BY c_custkey""".stripMargin)) { (s, dir) =>
    val target = t(s, dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    val updates = t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
        .as("c_acctbal"))
      .select(when(col("o_custkey") % 10 === 0, col("o_custkey") + 1000000)
        .otherwise(col("o_custkey")).as("c_custkey"), col("c_acctbal"))
    Merge.mergeUpsert(target, updates, "c_custkey")
      .select(col("c_custkey"), col("c_name"),
        round(col("c_acctbal"), 2).as("balance"), col("action"))
      .orderBy("c_custkey")
  }

  val qs: Seq[Q] = Seq(x34, x35, x40)
}
