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

  // Incremental aggregate maintenance: state over the first half of the
  // month merged with the second half's delta state must equal the direct
  // aggregate over everything — the oracle computes the DIRECT aggregate,
  // so the gate proves merge == recompute. Decimal state sums make the
  // merge order irrelevant.
  private val x44 = Q("x44_incremental_agg", Some(
    """SELECT event_type, count(*) AS n_rows,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)) { (s, dir) =>
    val ev = Tables.events(s, dir).select("event_type", "ts", "value")
    val base = graft.operators.Incremental.aggState(
      ev.filter(col("ts") < lit("2024-01-16")), Seq("event_type"), Seq("value"))
    val delta = graft.operators.Incremental.aggState(
      ev.filter(col("ts") >= lit("2024-01-16")), Seq("event_type"), Seq("value"))
    graft.operators.Incremental.mergeStates(Seq(base, delta), Seq("event_type"))
      .select(col("event_type"), col("n_rows"),
        round(col("sum_value").cast("double"), 2).as("sum_value"))
      .orderBy("event_type")
  }

  // Daily gap-filled resample per event_type: sequence()+explode spine,
  // zero-filled counts, last-observation-carried-forward totals. The
  // oracle builds the same spine with generate_series and the same
  // IGNORE NULLS window.
  private val x45 = Q("x45_time_resample", Some(
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n_events,
      |    sum(CAST(value AS DECIMAL(18,6))) AS tv
      |  FROM events GROUP BY event_type, date_trunc('day', ts)),
      |bounds AS (SELECT event_type, min(day) AS d0, max(day) AS d1
      |           FROM daily GROUP BY event_type),
      |spine AS (SELECT event_type, u.day AS day
      |          FROM bounds, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS u(day))
      |SELECT s.event_type, s.day,
      |  CAST(coalesce(d.n_events, 0) AS BIGINT) AS n_events,
      |  round(CAST(d.tv AS DOUBLE), 2) AS total_value,
      |  round(CAST(last_value(d.tv IGNORE NULLS)
      |    OVER (PARTITION BY s.event_type ORDER BY s.day) AS DOUBLE), 2) AS carried_total
      |FROM spine s LEFT JOIN daily d
      |  ON s.event_type = d.event_type AND s.day = d.day
      |ORDER BY s.event_type, s.day""".stripMargin)) { (s, dir) =>
    graft.operators.Resample.dailyResample(Tables.events(s, dir),
        "event_type", "ts", "value")
      .orderBy("event_type", "day")
  }

  // 7-day trailing moving average over the daily series: decimal window
  // sums with an explicit sum/count division so both engines compute
  // identical doubles.
  private val x46 = Q("x46_moving_average", Some(
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS day,
      |    sum(CAST(value AS DECIMAL(18,6))) AS tv
      |  FROM events GROUP BY event_type, date_trunc('day', ts))
      |SELECT event_type, day, round(CAST(tv AS DOUBLE), 2) AS total_value,
      |  floor(CAST(sum(tv) OVER w AS DOUBLE) / count(tv) OVER w * 100 + 0.5) / 100 AS ma7
      |FROM daily
      |WINDOW w AS (PARTITION BY event_type ORDER BY day
      |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY event_type, day""".stripMargin)) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,6)")).as("__tv"))
    graft.operators.Resample.movingAverage(daily, "event_type", "day", "__tv", 7)
      .select(col("event_type"), col("day"),
        round(col("__tv").cast("double"), 2).as("total_value"), col("ma7"))
      .orderBy("event_type", "day")
  }

  // Key-skew diagnostics: top-10 hottest order keys with share-of-total and
  // ratio-to-mean — the pre-flight check before salting a join. Counts are
  // computed once; the 1-row totals ride in via broadcast cross join.
  private val x47 = Q("x47_skew_profile", Some(
    """WITH counts AS (
      |  SELECT o_custkey, count(*) AS n_rows FROM orders GROUP BY o_custkey),
      |tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total, count(*) AS nkeys
      |        FROM counts)
      |SELECT c.o_custkey, c.n_rows,
      |  round(c.n_rows::DOUBLE / t.total * 100, 4) AS pct_of_total,
      |  round(c.n_rows::DOUBLE / (t.total::DOUBLE / t.nkeys), 4) AS ratio_to_avg
      |FROM counts c, tot t
      |ORDER BY c.n_rows DESC, c.o_custkey LIMIT 10""".stripMargin)) { (s, dir) =>
    graft.operators.Profiler.keySkew(t(s, dir, "orders"), "o_custkey", topK = 10)
  }

  // Global row numbering WITHOUT the single-partition window: range
  // repartition + local row_number + broadcast offsets must equal the
  // naive global row_number the oracle computes.
  private val x48 = Q("x48_global_index", Some(
    """SELECT doc_id,
      |  CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS global_idx
      |FROM documents ORDER BY doc_id""".stripMargin)) { (s, dir) =>
    graft.operators.Indexing.globalIndex(
        t(s, dir, "documents").select("doc_id"), "doc_id")
      .select(col("doc_id"), col("global_idx"))
      .orderBy("doc_id")
  }

  // Z-score anomalies vs the trailing-7-day baseline: manual moments from
  // decimal sums (engine stddevs drift in the last ulps; identical
  // formulas on identical bits don't), tie-free floor rounding, and a
  // null z for days without enough history.
  private val x50 = Q("x50_anomaly_zscore", Some(
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS day,
      |    sum(CAST(value AS DECIMAL(18,6))) AS tv
      |  FROM events GROUP BY event_type, date_trunc('day', ts)),
      |m AS (
      |  SELECT event_type, day, tv,
      |    count(tv) OVER w AS n,
      |    CAST(sum(tv) OVER w AS DOUBLE) AS s1,
      |    CAST(sum(tv * tv) OVER w AS DOUBLE) AS s2
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day
      |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      |z AS (
      |  SELECT event_type, day, tv, n,
      |    CASE WHEN n >= 3 AND (s2 - s1 * s1 / n) / (n - 1) > 0
      |         THEN floor((CAST(tv AS DOUBLE) - s1 / n) /
      |                sqrt((s2 - s1 * s1 / n) / (n - 1)) * 10000 + 0.5) / 10000
      |         END AS zv
      |  FROM m)
      |SELECT event_type, day, round(CAST(tv AS DOUBLE), 2) AS total_value,
      |  zv AS z, coalesce(abs(zv) > 2.0, false) AS is_anomaly
      |FROM z ORDER BY event_type, day""".stripMargin)) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,6)")).as("__tv"))
    graft.operators.Resample.anomalyZScore(daily, "event_type", "day", "__tv",
        days = 7, threshold = 2.0)
      .select(col("event_type"), col("day"),
        round(col("__tv").cast("double"), 2).as("total_value"),
        col("z"), col("is_anomaly"))
      .orderBy("event_type", "day")
  }

  // Snapshot diff (CDC derivation): v2 is v1 with deterministic mutations —
  // every 13th key deleted, every 7th balance shifted, every 11th re-keyed
  // into fresh ids (inserts). One full-outer join, null-safe per-column
  // compare, unchanged rows dropped in-plan. The oracle replays the same
  // mutation and the same FULL OUTER JOIN classification.
  private val x51 = Q("x51_snapshot_diff", Some(
    """WITH v1 AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
      |v2 AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 10 ELSE c_acctbal END AS c_acctbal,
      |    c_mktsegment
      |  FROM customer WHERE c_custkey % 13 <> 0
      |  UNION ALL
      |  SELECT c_custkey + 2000000, c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 11 = 0)
      |SELECT coalesce(v1.c_custkey, v2.c_custkey) AS c_custkey,
      |  v1.c_acctbal AS c_acctbal_old, v2.c_acctbal AS c_acctbal_new,
      |  v1.c_mktsegment AS c_mktsegment_old,
      |  v2.c_mktsegment AS c_mktsegment_new,
      |  CASE WHEN v1.c_custkey IS NULL THEN 'insert'
      |       WHEN v2.c_custkey IS NULL THEN 'delete'
      |       WHEN v1.c_acctbal IS NOT DISTINCT FROM v2.c_acctbal
      |        AND v1.c_mktsegment IS NOT DISTINCT FROM v2.c_mktsegment
      |       THEN 'same' ELSE 'update' END AS change_type
      |FROM v1 FULL OUTER JOIN v2 ON v1.c_custkey = v2.c_custkey
      |WHERE NOT (v1.c_custkey IS NOT NULL AND v2.c_custkey IS NOT NULL
      |  AND v1.c_acctbal IS NOT DISTINCT FROM v2.c_acctbal
      |  AND v1.c_mktsegment IS NOT DISTINCT FROM v2.c_mktsegment)
      |ORDER BY c_custkey""".stripMargin)) { (s, dir) =>
    val v1 = t(s, dir, "customer").select("c_custkey", "c_acctbal", "c_mktsegment")
    val v2 = v1.filter(col("c_custkey") % 13 =!= 0)
      .select(col("c_custkey"),
        when(col("c_custkey") % 7 === 0, col("c_acctbal") + 10)
          .otherwise(col("c_acctbal")).as("c_acctbal"),
        col("c_mktsegment"))
      .unionAll(v1.filter(col("c_custkey") % 11 === 0)
        .select((col("c_custkey") + 2000000).as("c_custkey"),
          col("c_acctbal"), col("c_mktsegment")))
    graft.operators.Snapshot.changesOnly(v1, v2, "c_custkey",
        Seq("c_acctbal", "c_mktsegment"))
      .orderBy("c_custkey")
  }

  // Zone-map skipping index over the o_orderkey layout: 500-row blocks,
  // per-block min/max for date and price, plus the pruning verdict for a
  // one-year date predicate — the Delta/Iceberg column-stats shape. The
  // oracle replays block assignment (row_number over the same unique key)
  // and the same [min,max)-overlap test.
  private val x56 = Q("x56_zone_map", Some(
    """WITH idx AS (
      |  SELECT o_orderkey, o_orderdate, o_totalprice,
      |    row_number() OVER (ORDER BY o_orderkey) AS rn
      |  FROM orders),
      |blocks AS (
      |  SELECT (rn - 1) // 500 AS block_id, count(*) AS n_rows,
      |    min(o_orderdate) AS o_orderdate_min,
      |    max(o_orderdate) AS o_orderdate_max,
      |    min(o_totalprice) AS o_totalprice_min,
      |    max(o_totalprice) AS o_totalprice_max
      |  FROM idx GROUP BY 1)
      |SELECT block_id, n_rows, o_orderdate_min, o_orderdate_max,
      |  o_totalprice_min, o_totalprice_max,
      |  NOT (o_orderdate_max < TIMESTAMP '1997-01-01'
      |    OR o_orderdate_min >= TIMESTAMP '1998-01-01') AS would_scan
      |FROM blocks ORDER BY block_id""".stripMargin)) { (s, dir) =>
    val zm = graft.operators.Indexing.zoneMap(
      t(s, dir, "orders").select("o_orderkey", "o_orderdate", "o_totalprice"),
      "o_orderkey", Seq("o_orderdate", "o_totalprice"), blockSize = 500)
    graft.operators.Indexing.pruneBlocks(zm, "o_orderdate",
        lit("1997-01-01").cast("timestamp"), lit("1998-01-01").cast("timestamp"))
      .orderBy("block_id")
  }

  // Incremental view maintenance for a JOIN: V = orders⋈customer is
  // refreshed with insert-deltas on BOTH sides via ΔV = ΔA⋈B ∪ A⋈ΔB ∪
  // ΔA⋈ΔB — the base-base join never recomputes. The oracle computes the
  // view DIRECTLY over the full tables, so the gate proves refresh ==
  // recompute (the x44 merge==recompute guarantee, lifted to joins).
  private val x60 = Q("x60_delta_join_ivm", Some(
    """SELECT c.c_mktsegment, count(*) AS n_orders,
      |  round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin)) { (s, dir) =>
    val orders = t(s, dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    val cust = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
    val cut = lit("2000-01-01")
    val (baseA, deltaA) = (orders.filter(col("o_orderdate") < cut),
      orders.filter(col("o_orderdate") >= cut))
    val (baseB, deltaB) = (cust.filter(col("c_custkey") % 10 =!= 0),
      cust.filter(col("c_custkey") % 10 === 0))
    val view = baseA.join(baseB, col("o_custkey") === col("c_custkey"))
    graft.operators.Incremental.deltaJoinRefresh(view, baseA, deltaA,
        baseB, deltaB, Seq("o_custkey"), Seq("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
          .as("total_value"))
      .orderBy("c_mktsegment")
  }

  // Join-size estimation from two count-min sketches (the optimizer
  // primitive: size a join WITHOUT running it), alongside the exact join
  // count it over-approximates. The oracle replays both sketches
  // cell-for-cell and the min-over-rows inner product — all integer math.
  private val x68 = Q("x68_join_size_estimate", Some(
    """WITH ka AS (SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders),
      |kb AS (SELECT CAST(c_custkey AS VARCHAR) AS k FROM customer),
      |sa AS (
      |  SELECT r, bucket, count(*) AS cnt FROM (
      |    SELECT t.r AS r,
      |      ('0x' || substring(md5(t.r::VARCHAR || ':' || k), 1, 8))::BIGINT % 64 AS bucket
      |    FROM ka, range(4) t(r)) GROUP BY r, bucket),
      |sb AS (
      |  SELECT r, bucket, count(*) AS cnt FROM (
      |    SELECT t.r AS r,
      |      ('0x' || substring(md5(t.r::VARCHAR || ':' || k), 1, 8))::BIGINT % 64 AS bucket
      |    FROM kb, range(4) t(r)) GROUP BY r, bucket),
      |ip AS (
      |  SELECT sa.r, CAST(sum(sa.cnt * sb.cnt) AS BIGINT) AS ip
      |  FROM sa JOIN sb ON sa.r = sb.r AND sa.bucket = sb.bucket
      |  GROUP BY sa.r),
      |est AS (SELECT min(ip) AS join_size_estimate FROM ip),
      |ex AS (SELECT count(*) AS exact_join_size
      |       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
      |SELECT est.join_size_estimate, ex.exact_join_size FROM est, ex""".stripMargin)) { (s, dir) =>
    val ka = t(s, dir, "orders").select(col("o_custkey").cast("string").as("k"))
    val kb = t(s, dir, "customer").select(col("c_custkey").cast("string").as("k"))
    val est = graft.functions.Sketches.cmsJoinSize(ka, kb, "k",
      depth = 4, width = 64)
    val exact = t(s, dir, "orders").select("o_custkey")
      .join(t(s, dir, "customer").select("c_custkey"),
        col("o_custkey") === col("c_custkey"))
      .agg(count(lit(1)).as("exact_join_size"))
    est.crossJoin(exact)
  }

  // Delete cascade (right-to-be-forgotten): erase a subject-key set from
  // every table that references it — N independent broadcast anti joins,
  // never a cross-table join — with the per-table compliance audit. The
  // oracle replays the NOT EXISTS semantics and the same counts.
  private val x70 = Q("x70_delete_cascade", Some(
    """WITH delkeys AS (
      |  SELECT DISTINCT c_custkey AS dk FROM customer WHERE c_custkey % 97 = 0),
      |ca AS (SELECT count(*) AS nb FROM customer),
      |cs AS (SELECT count(*) AS na FROM customer c
      |       WHERE NOT EXISTS (SELECT 1 FROM delkeys WHERE dk = c.c_custkey)),
      |oa AS (SELECT count(*) AS nb FROM orders),
      |os AS (SELECT count(*) AS na FROM orders o
      |       WHERE NOT EXISTS (SELECT 1 FROM delkeys WHERE dk = o.o_custkey))
      |SELECT 'customer' AS table_name, ca.nb AS n_before,
      |  ca.nb - cs.na AS n_deleted, cs.na AS n_after FROM ca, cs
      |UNION ALL
      |SELECT 'orders', oa.nb, oa.nb - os.na, os.na FROM oa, os
      |ORDER BY table_name""".stripMargin)) { (s, dir) =>
    val keys = t(s, dir, "customer")
      .filter(col("c_custkey") % 97 === 0).select("c_custkey")
    Merge.deleteCascadeAudit(
        Map("customer" -> (t(s, dir, "customer"), "c_custkey"),
          "orders" -> (t(s, dir, "orders"), "o_custkey")),
        keys, "c_custkey")
      .orderBy("table_name")
  }

  // Robust (MAD) anomaly flags over the same daily series x50 scores with
  // mean/stddev: median and MAD have breakdown point 1/2, so extreme days
  // cannot mask themselves by inflating the baseline. Medians replay as
  // quantile_cont in the oracle; the signed modified z uses the
  // floor(z·10⁴+0.5) quantization (same negative-safe convention as x50).
  private val x112 = Q("x112_anomaly_mad", Some(
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS day,
      |    sum(CAST(value AS DECIMAL(18,6))) AS tv
      |  FROM events GROUP BY event_type, date_trunc('day', ts)),
      |med AS (
      |  SELECT event_type,
      |    round(quantile_cont(CAST(tv AS DOUBLE), 0.5), 4) AS group_median
      |  FROM daily GROUP BY event_type),
      |dev AS (
      |  SELECT d.event_type, day, tv, group_median,
      |    abs(CAST(tv AS DOUBLE) - group_median) AS adev
      |  FROM daily d JOIN med USING (event_type)),
      |mad AS (
      |  SELECT event_type, round(quantile_cont(adev, 0.5), 4) AS group_mad
      |  FROM dev GROUP BY event_type),
      |z AS (
      |  SELECT dev.event_type, day, tv, group_median, group_mad,
      |    CASE WHEN group_mad > 0
      |         THEN floor(0.6745 * (CAST(tv AS DOUBLE) - group_median)
      |                / group_mad * 10000 + 0.5) / 10000
      |         END AS robust_z
      |  FROM dev JOIN mad USING (event_type))
      |SELECT event_type, day, round(CAST(tv AS DOUBLE), 2) AS total_value,
      |  group_median, group_mad, robust_z,
      |  coalesce(abs(robust_z) > 3.5, false) AS is_anomaly
      |FROM z ORDER BY event_type, day""".stripMargin)) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,6)")).as("__tv"))
    graft.operators.Stats.madOutliers(daily, Seq("event_type"), "__tv")
      .select(col("event_type"), col("day"),
        round(col("__tv").cast("double"), 2).as("total_value"),
        col("group_median"), col("group_mad"), col("robust_z"),
        col("is_anomaly"))
      .orderBy("event_type", "day")
  }

  // Classical additive seasonal decomposition of the daily event series:
  // centered 7-day MA trend, per-phase seasonal means from the INTEGER
  // numerators 7·y − Σwindow (exact until one final division), remainder
  // as what's left. The oracle replays windows, phase assignment, the
  // integer phase sums, and the tie-free floor rounding.
  private val x144 = Q("x144_seasonal_decompose", Some(
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*) AS y
      |  FROM events GROUP BY 1),
      |b AS (
      |  SELECT day, y,
      |    sum(y) OVER w AS s, count(y) OVER w AS c,
      |    (row_number() OVER (ORDER BY day) - 1) % 7 AS ph
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |n AS (SELECT *, CASE WHEN c = 7 THEN 7 * y - s END AS num FROM b),
      |se AS (SELECT ph, sum(num) AS snum, count(num) AS k
      |       FROM n GROUP BY ph)
      |SELECT n.day, CAST(n.y AS BIGINT) AS y,
      |  CASE WHEN n.c = 7 THEN
      |    floor(CAST(n.s AS DOUBLE) / 7.0 * 10000 + 0.5) / 10000 END AS trend,
      |  floor(CAST(se.snum AS DOUBLE) / (7.0 * CAST(se.k AS DOUBLE))
      |    * 10000 + 0.5) / 10000 AS seasonal,
      |  floor((CAST(n.num AS DOUBLE) / 7.0
      |      - CAST(se.snum AS DOUBLE) / (7.0 * CAST(se.k AS DOUBLE)))
      |    * 10000 + 0.5) / 10000 AS remainder
      |FROM n JOIN se ON se.ph = n.ph
      |ORDER BY n.day""".stripMargin)) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    graft.operators.Resample.seasonalDecompose(daily, "day", "y", period = 7)
      .orderBy("day")
  }

  // CUSUM changepoint over the daily event counts: cumulative deviation
  // from a uniform rate kept as the exact integer n·P_t − t·T; the
  // normalized max is a KS-style uniformity distance and the argmax day
  // is the changepoint (ties → earliest). One window pass over |days|.
  private val x145 = Q("x145_cusum_changepoint", Some(
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, count(*) AS y
      |  FROM events GROUP BY 1),
      |sc AS (SELECT d,
      |    sum(y) OVER (ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
      |    row_number() OVER (ORDER BY d) AS t,
      |    sum(y) OVER () AS tt, count(*) OVER () AS n
      |  FROM daily),
      |dev AS (SELECT d, tt, n, abs(n * p - t * tt) AS dv FROM sc)
      |SELECT CAST(n AS BIGINT) AS n_buckets, CAST(tt AS BIGINT) AS total,
      |  d AS changepoint, CAST(dv AS BIGINT) AS max_dev,
      |  round(CAST(dv AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(tt AS DOUBLE)), 6)
      |    AS uniformity_distance
      |FROM dev ORDER BY dv DESC, d LIMIT 1""".stripMargin)) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    graft.operators.Stats.cusumChangepoint(daily, "day", "y")
      .withColumnRenamed("changepoint", "changepoint")
  }

  // Autocorrelation of the daily event counts at lags 1–7 — the period
  // diagnostic behind x144's seasonal decomposition (a weekly rhythm
  // spikes at lag 7). One window pass feeds all lags via an exploded
  // lag-struct array; per-lag Pearson uses x79's exact-moment formula.
  private val x153 = Q("x153_autocorrelation", {
    val blocks = (1 to 7).map(l =>
      s"SELECT $l AS lag, y, lag(y, $l) OVER (ORDER BY day) AS x FROM daily")
      .mkString("\n  UNION ALL\n  ")
    Some(
      s"""WITH daily AS (
         |  SELECT CAST(ts AS DATE) AS day, count(*) AS y
         |  FROM events GROUP BY 1),
         |p AS (SELECT * FROM (
         |  $blocks) WHERE x IS NOT NULL),
         |m AS (SELECT lag, CAST(count(*) AS DOUBLE) AS n,
         |    CAST(sum(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
         |    CAST(sum(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
         |    CAST(sum(CAST(x * x AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
         |    CAST(sum(CAST(y * y AS DECIMAL(28,6))) AS DOUBLE) AS syy,
         |    CAST(sum(CAST(x * y AS DECIMAL(28,6))) AS DOUBLE) AS sxy
         |  FROM p GROUP BY lag)
         |SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
         |  round((n * sxy - sx * sy)
         |    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS acf
         |FROM m ORDER BY lag""".stripMargin)
  }) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    graft.operators.Stats.autocorrelation(daily, "day", "y", maxLag = 7)
  }

  val qs: Seq[Q] = Seq(x34, x35, x40, x44, x45, x46, x47, x48, x50, x51, x56,
    x60, x68, x70, x112, x144, x145, x153)
}
