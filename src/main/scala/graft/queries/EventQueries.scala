package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics queries over the `events` table — the windowed/sessional
  * shapes the reference lacks entirely (SURVEY §2.6 A7 "absent") but a
  * Spark-native engine provides for free: lag-based sessionization,
  * cohort retention, funnel conversion. All single-shuffle window or
  * aggregate plans.
  */
object EventQueries {

  // Distinct-user counts per event type (exact; the approx HLL variant is
  // Profiler.profile(approx=true) — spec'd, engines' sketches differ).
  private val e1 = Q("e1_distinct_users", Some(
    """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
      .orderBy("event_type")
  }

  // Batch sessionization: a new session starts after a >30-minute gap;
  // session index = running sum of boundary flags per user. ONE shuffle
  // (the per-user window); the streaming twin is EventStream.sessionize.
  private val e2 = Q("e2_batch_sessionize", Some(
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
      |         OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS boundary
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts,
      |    sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM flagged)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  count(*) AS n_events, min(ts) AS session_start
      |FROM sessions GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin)) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    // event_id tiebreaks the running sum too, so tied (user_id, ts) rows get
    // a deterministic session assignment on both engines
    val wRun = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("boundary",
        when(unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(w)) > 1800000L
          || lag(col("ts"), 1).over(w).isNull, 1).otherwise(0))
      .withColumn("session_id", sum(col("boundary")).over(wRun))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"))
      .orderBy("user_id", "session_id")
  }

  // Cohort retention: users grouped by first-seen day; how many distinct
  // active days each cohort accumulates.
  private val e3 = Q("e3_cohort_retention", Some(
    """WITH activity AS (
      |  SELECT user_id, date_trunc('day', ts)::TIMESTAMP AS d FROM events),
      |firsts AS (SELECT user_id, min(d) AS cohort_day FROM activity GROUP BY user_id),
      |peruser AS (
      |  SELECT f.cohort_day, a.user_id, count(DISTINCT a.d) AS active_days
      |  FROM activity a JOIN firsts f ON a.user_id = f.user_id
      |  GROUP BY 1, 2)
      |SELECT cohort_day, count(*) AS n_users,
      |  round(avg(active_days), 2) AS avg_active_days
      |FROM peruser GROUP BY cohort_day ORDER BY cohort_day""".stripMargin)) { (s, dir) =>
    val activity = Tables.events(s, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
    val firsts = activity.groupBy("user_id").agg(min("d").as("cohort_day"))
    activity.join(firsts, "user_id")
      .groupBy("cohort_day", "user_id")
      .agg(count_distinct(col("d")).as("active_days"))
      .groupBy("cohort_day")
      .agg(count(lit(1)).as("n_users"), round(avg("active_days"), 2).as("avg_active_days"))
      .orderBy("cohort_day")
  }

  // Funnel conversion: users whose first view precedes their first click
  // precedes their first purchase — one conditional-min aggregate per user
  // (no joins, no multiple scans), then one count.
  private val e4 = Q("e4_funnel", Some(
    """WITH m AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
      |    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
      |  FROM events GROUP BY user_id)
      |SELECT count(*) AS n_users,
      |  CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS saw,
      |  CAST(sum(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after,
      |  CAST(sum(CASE WHEN t_buy > t_click AND t_click > t_view THEN 1 ELSE 0 END)
      |    AS BIGINT) AS full_funnel
      |FROM m""".stripMargin)) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_buy"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("t_view").isNotNull, 1).otherwise(0)).cast("long").as("saw"),
        sum(when(col("t_click") > col("t_view"), 1).otherwise(0)).cast("long")
          .as("clicked_after"),
        sum(when(col("t_buy") > col("t_click") && col("t_click") > col("t_view"), 1)
          .otherwise(0)).cast("long").as("full_funnel"))
  }

  // Semi-structured extraction: the events `props` JSON column parsed with
  // a schema (from_json beats get_json_object: one parse, typed columns).
  private val e5 = Q("e5_json_extract", Some(
    """SELECT event_type,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  count(*) AS n
      |FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
      |GROUP BY event_type ORDER BY event_type""".stripMargin)) { (s, dir) =>
    val parsed = Tables.events(s, dir).withColumn("k",
      from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType)))).getField("k"))
    parsed.filter(col("k") > 50)
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  // R2 pivot (absent in the reference, free in Spark): per-user event-type
  // counts as columns.
  private val e6 = Q("e6_pivot", Some(
    """SELECT user_id,
      |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
      |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
      |FROM events WHERE user_id < 20 GROUP BY user_id ORDER BY user_id""".stripMargin)) {
    (s, dir) =>
      Tables.events(s, dir).filter(col("user_id") < 20)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "purchase", "view"))
        .agg(coalesce(count(lit(1)), lit(0L)))
        .na.fill(0L, Seq("click", "purchase", "view"))
        .orderBy("user_id")
  }

  // U3 intersect/except (absent in the reference, free in Spark).
  private val e7 = Q("e7_set_ops", Some(
    """WITH clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
      |buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      |SELECT
      |  (SELECT count(*) FROM (SELECT * FROM clickers INTERSECT SELECT * FROM buyers)) AS both,
      |  (SELECT count(*) FROM (SELECT * FROM clickers EXCEPT SELECT * FROM buyers)) AS click_only""".stripMargin)) {
    (s, dir) =>
      val ev = Tables.events(s, dir)
      val clickers = ev.filter(col("event_type") === "click").select("user_id").distinct()
      val buyers = ev.filter(col("event_type") === "purchase").select("user_id").distinct()
      // one LAZY plan: cross join of two single-row aggregates — nothing
      // executes at query-construction time, so bench timings are honest
      clickers.intersect(buyers).agg(count(lit(1)).as("both"))
        .crossJoin(clickers.except(buyers).agg(count(lit(1)).as("click_only")))
  }

  // A7 extension: exact DISCRETE percentiles — actual data elements, no
  // interpolation, so Spark percentile_disc and DuckDB quantile_disc agree
  // bit-for-bit (continuous interpolation rounds differently at fp
  // midpoints across engines).
  private val e8 = Q("e8_percentiles", Some(
    """SELECT l_returnflag,
      |  quantile_disc(l_extendedprice, 0.5) AS p50,
      |  quantile_disc(l_extendedprice, 0.95) AS p95,
      |  quantile_disc(l_extendedprice, 0.99) AS p99
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)) {
    (s, dir) =>
      Tables.t(s, dir, "lineitem").createOrReplaceTempView("l_e8")
      s.sql(
        """SELECT l_returnflag,
          |  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS p50,
          |  percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice) AS p95,
          |  percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice) AS p99
          |FROM l_e8 GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  // A7 extension: ROLLUP subtotals + grand total (grouping sets).
  private val e9 = Q("e9_rollup", Some(
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  round(sum(l_quantity), 2) AS qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)) {
    (s, dir) =>
      Tables.t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  }

  // ONE oracle, two Spark formulations (e10 composed, x115 native exec):
  // DuckDB's ASOF LEFT JOIN is the ground truth for both.
  private val AsofOracle =
    """WITH purchases AS (
      |  SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
      |signups AS (
      |  SELECT user_id, ts, round(value, 2) AS signup_value
      |  FROM events WHERE event_type = 'signup')
      |SELECT p.event_id, p.user_id, round(p.value, 2) AS value, s.signup_value
      |FROM purchases p ASOF LEFT JOIN signups s
      |  ON p.user_id = s.user_id AND p.ts >= s.ts
      |ORDER BY p.event_id""".stripMargin

  // As-of join: each purchase matched to the user's latest signup at or
  // before it. Spark side = union+marker+window carry-forward (one shuffle);
  // DuckDB oracle = native ASOF JOIN.
  private val e10 = Q("e10_asof_join", Some(AsofOracle)) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), round(col("value"), 2).as("signup_value"))
    graft.operators.AsofJoin.asofJoin(purchases, signups, "user_id", "ts",
        Seq("signup_value"))
      .select(col("event_id"), col("user_id"), round(col("value"), 2).as("value"),
        col("signup_value"))
      .orderBy("event_id")
  }

  // The NATIVE custom-operator as-of join under e10's exact oracle: a
  // custom LogicalPlan + planner Strategy + physical exec whose
  // distribution/ordering REQUIREMENTS make the engine insert the hash
  // exchanges and (key, time) sorts — the merge itself is one forward
  // pass per partition holding a single carried right row. Same driver
  // hash as e10 ⇒ the exec's merge logic is gated row-for-row.
  private val x115 = Q("x115_native_asof", Some(AsofOracle)) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("su"), col("ts").as("sts"),
        round(col("value"), 2).as("signup_value"))
    graft.plans.AsofJoinNative.join(purchases, signups,
        "user_id", "ts", "su", "sts")
      .select(col("event_id"), col("user_id"),
        round(col("value"), 2).as("value"), col("signup_value"))
      .orderBy("event_id")
  }

  // Range join: purchases falling inside 5-minute incident windows opened
  // by error events of the same user. Spark side = binned equi-join (one
  // shuffle, no cartesian); DuckDB oracle = plain inequality join.
  private val e11 = Q("e11_range_join", Some(
    """WITH incidents AS (
      |  SELECT user_id, event_id AS incident_id, ts AS t_start,
      |    ts + INTERVAL 5 MINUTE AS t_end
      |  FROM events WHERE event_type = 'error'),
      |purchases AS (
      |  SELECT user_id, event_id AS purchase_id, ts FROM events
      |  WHERE event_type = 'purchase')
      |SELECT p.purchase_id, i.incident_id, p.user_id
      |FROM purchases p JOIN incidents i
      |  ON p.user_id = i.user_id AND p.ts >= i.t_start AND p.ts <= i.t_end
      |ORDER BY purchase_id, incident_id""".stripMargin)) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val incidents = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("incident_id"),
        col("ts").as("t_start"),
        (col("ts") + expr("INTERVAL 5 MINUTE")).as("t_end"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts"))
    graft.operators.RangeJoin.binnedRangeJoin(purchases, incidents,
        Seq("user_id"), "ts", "t_start", "t_end", binSeconds = 300L)
      .select("purchase_id", "incident_id", "user_id")
      .orderBy("purchase_id", "incident_id")
  }

  // Rank-window family over per-user totals: ntile deciles, percent_rank,
  // cume_dist — ties broken by user_id so every rank is deterministic in
  // both engines. The global window runs over the AGGREGATED frame (one row
  // per user), not the event stream; at 100 TB rank windows over raw facts
  // would be partitioned (see x38's shard windows) or replaced by approx
  // quantiles (e8).
  private val e12 = Q("e12_rank_windows", Some(
    """WITH agg AS (
      |  SELECT user_id,
      |    round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS total,
      |    count(*) AS n_events
      |  FROM events GROUP BY user_id)
      |SELECT user_id, total, n_events,
      |  CAST(ntile(10) OVER w AS BIGINT) AS decile,
      |  round(percent_rank() OVER w, 4) AS pct_rank,
      |  round(cume_dist() OVER w, 4) AS cume
      |FROM agg WINDOW w AS (ORDER BY total DESC, user_id)
      |ORDER BY user_id""".stripMargin)) { (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("total"), col("user_id"))
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(round(sum(col("value").cast("decimal(18,6)")).cast("double"), 2)
          .as("total"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("total"), col("n_events"),
        ntile(10).over(w).cast("long").as("decile"),
        round(percent_rank().over(w), 4).as("pct_rank"),
        round(cume_dist().over(w), 4).as("cume"))
      .orderBy("user_id")
  }

  // Top-3 days by value per event type: the rank filter sits directly on
  // the window so Spark plans a WindowGroupLimit — map tasks forward at
  // most k rows per group before the shuffle (asserted in
  // PlanRegressionSpec). Decimal day sums keep the rank order exact.
  private val e13 = Q("e13_topk_per_group", Some(
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS day,
      |    count(*) AS n_events, sum(CAST(value AS DECIMAL(18,6))) AS tv
      |  FROM events GROUP BY event_type, date_trunc('day', ts)),
      |rk AS (
      |  SELECT event_type, day, n_events,
      |    round(CAST(tv AS DOUBLE), 2) AS total_value,
      |    CAST(row_number() OVER (PARTITION BY event_type
      |      ORDER BY tv DESC, day) AS BIGINT) AS rn
      |  FROM daily)
      |SELECT event_type, day, n_events, total_value, rn
      |FROM rk WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin)) { (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(desc("__tv"), col("day"))
    Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).as("__tv"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("event_type"), col("day"), col("n_events"),
        round(col("__tv").cast("double"), 2).as("total_value"), col("rn"))
      .orderBy("event_type", "rn")
  }

  // Sliding event-time windows (1 h length, 15 min slide) — completes the
  // window matrix (tumbling x9, session x102/x106, sliding here). Each
  // event lands in exactly 4 windows; the oracle unrolls that fan-out with
  // an explicit k ∈ 0..3 cross join off the 15-minute bucket, which is
  // precisely Spark's epoch-aligned assignment rule.
  private val e14 = Q("e14_sliding_windows", Some(
    """SELECT ws AS window_start, event_type,
      |  count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
      |    AS total_value
      |FROM (SELECT (time_bucket(INTERVAL '15 minutes', ts)
      |               - k.k * INTERVAL '15 minutes')::TIMESTAMP AS ws,
      |        event_type, value
      |      FROM events, range(4) k(k))
      |GROUP BY ws, event_type
      |ORDER BY window_start, event_type""".stripMargin)) { (s, dir) =>
    graft.streaming.EventStream.slidingWindowedCounts(Tables.events(s, dir))
      .orderBy("window_start", "event_type")
  }

  // Purged/embargoed temporal split (70/15/15, 1 h embargo): boundaries
  // are the ACTUAL timestamps at ranks floor(0.7·n)/floor(0.85·n) under
  // (ts, event_id) order — discrete, so no interpolation arithmetic —
  // and the two embargo gaps after each boundary are labeled, not
  // silently dropped. The oracle replays rank selection, boundary
  // lookup, and interval labeling on micro-truncated timestamps (the
  // parquet is TIMESTAMP_NS; Spark reads it truncated to micros).
  private val e15 = Q("e15_temporal_split", Some(
    """WITH k AS (
      |  SELECT event_id, make_timestamp(epoch_us(ts)) AS ts FROM events),
      |r AS (SELECT ts, row_number() OVER (ORDER BY ts, event_id) AS rn,
      |        count(*) OVER () AS n
      |      FROM k),
      |b AS (SELECT min(ts) AS t1, max(ts) AS t2 FROM r
      |      WHERE rn = greatest(1, floor(0.7 * n))
      |         OR rn = greatest(1, floor(0.85 * n)))
      |SELECT split, count(*) AS n_rows,
      |  min(ts) AS min_ts, max(ts) AS max_ts
      |FROM (SELECT CASE
      |        WHEN ts <= t1 THEN 'train'
      |        WHEN ts <= t1 + INTERVAL 1 HOUR THEN 'embargo_train_val'
      |        WHEN ts <= t2 THEN 'val'
      |        WHEN ts <= t2 + INTERVAL 1 HOUR THEN 'embargo_val_test'
      |        ELSE 'test' END AS split, ts
      |      FROM k, b)
      |GROUP BY split ORDER BY split""".stripMargin)) { (s, dir) =>
    graft.functions.Curation.temporalSplit(
        Tables.events(s, dir), "ts", "event_id")
      .groupBy("split")
      .agg(count(lit(1)).as("n_rows"),
        min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
      .orderBy("split")
  }

  // Multi-model marketing attribution in ONE pass over the click-purchase
  // pairs: each purchase's preceding-hour clicks (per-user interval join,
  // x30's batch shape) credit their campaign channel under first-touch,
  // last-touch, and linear models simultaneously. Linear credit 1/n is
  // DECIMAL-quantized per pair so the per-channel sums are order-free;
  // first/last resolve by (ts, click_id) row_number — fully deterministic.
  private val x147 = Q("x147_attribution_models", Some(
    """WITH clicks AS (
      |  SELECT user_id, ts AS cts, event_id AS cid,
      |    'ch' || CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 4
      |      AS VARCHAR) AS channel
      |  FROM events WHERE event_type = 'click'),
      |buys AS (
      |  SELECT user_id, ts AS pts, event_id AS pid
      |  FROM events WHERE event_type = 'purchase'),
      |pairs AS (
      |  SELECT b.pid, c.channel, c.cts, c.cid
      |  FROM buys b JOIN clicks c ON c.user_id = b.user_id
      |  WHERE c.cts >= b.pts - INTERVAL 1 HOUR AND c.cts < b.pts),
      |ranked AS (
      |  SELECT pid, channel,
      |    row_number() OVER (PARTITION BY pid ORDER BY cts, cid) AS rn_a,
      |    row_number() OVER (PARTITION BY pid ORDER BY cts DESC, cid DESC) AS rn_d,
      |    count(*) OVER (PARTITION BY pid) AS n
      |  FROM pairs)
      |SELECT channel,
      |  CAST(sum(CASE WHEN rn_a = 1 THEN 1 ELSE 0 END) AS BIGINT) AS first_touch,
      |  CAST(sum(CASE WHEN rn_d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS last_touch,
      |  round(CAST(sum(CAST(CAST(1 AS DOUBLE) / CAST(n AS DOUBLE)
      |    AS DECIMAL(28,12))) AS DOUBLE), 6) AS linear_credit,
      |  count(*) AS n_pairs
      |FROM ranked GROUP BY channel ORDER BY channel""".stripMargin)) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val kCol = from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))).getField("k")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"), col("event_id").as("cid"),
        concat(lit("ch"), (kCol % 4).cast("string")).as("channel"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"), col("event_id").as("pid"))
    val pairs = buys.join(clicks, "user_id")
      .filter(col("cts") >= col("pts") - expr("INTERVAL 1 HOUR") &&
        col("cts") < col("pts"))
    val byPid = Window.partitionBy("pid")
    val ranked = pairs
      .withColumn("rn_a", row_number().over(byPid.orderBy(col("cts"), col("cid"))))
      .withColumn("rn_d",
        row_number().over(byPid.orderBy(desc("cts"), desc("cid"))))
      .withColumn("n", count(lit(1)).over(byPid))
    ranked.groupBy("channel")
      .agg(sum(when(col("rn_a") === 1, 1L).otherwise(0L)).as("first_touch"),
        sum(when(col("rn_d") === 1, 1L).otherwise(0L)).as("last_touch"),
        round(sum((lit(1.0) / col("n").cast("double")).cast("decimal(28,12)"))
          .cast("double"), 6).as("linear_credit"),
        count(lit(1)).as("n_pairs"))
      .orderBy("channel")
  }

  // Conversion-latency quantiles: per converting user, seconds from first
  // view to first purchase; DISCRETE percentiles (actual data elements —
  // engine-bit-parity, like x81/x110) over the per-user latency frame.
  private val x149 = Q("x149_conversion_latency", Some(
    """WITH m AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN ts END) AS tv,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
      |  FROM events GROUP BY user_id),
      |d AS (
      |  SELECT date_diff('second', tv, tp) AS delta_s
      |  FROM m WHERE tv IS NOT NULL AND tp IS NOT NULL AND tp >= tv)
      |SELECT count(*) AS n_converted,
      |  CAST(quantile_disc(delta_s, 0.25) AS BIGINT) AS p25_s,
      |  CAST(quantile_disc(delta_s, 0.50) AS BIGINT) AS p50_s,
      |  CAST(quantile_disc(delta_s, 0.75) AS BIGINT) AS p75_s,
      |  CAST(quantile_disc(delta_s, 0.90) AS BIGINT) AS p90_s
      |FROM d""".stripMargin)) { (s, dir) =>
    val m = Tables.events(s, dir).groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("ts"))).as("tv"),
        min(when(col("event_type") === "purchase", col("ts"))).as("tp"))
    m.filter(col("tv").isNotNull && col("tp").isNotNull && col("tp") >= col("tv"))
      .select((unix_timestamp(col("tp")) - unix_timestamp(col("tv")))
        .as("delta_s"))
      .agg(count(lit(1)).as("n_converted"),
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY delta_s)")
          .cast("long").as("p25_s"),
        expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY delta_s)")
          .cast("long").as("p50_s"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY delta_s)")
          .cast("long").as("p75_s"),
        expr("percentile_disc(0.90) WITHIN GROUP (ORDER BY delta_s)")
          .cast("long").as("p90_s"))
  }

  // Top user journeys: the 20 most frequent 3-step event-type paths
  // (time-ordered per user, event_id tiebreak) — x95's Markov transitions
  // extended to path mining. Two lead() windows, one grouped count,
  // TakeOrdered top-k with a path tiebreak.
  private val x150 = Q("x150_top_paths", Some(
    """WITH seq AS (
      |  SELECT user_id, event_type AS e1,
      |    lead(event_type, 1) OVER w AS e2,
      |    lead(event_type, 2) OVER w AS e3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |paths AS (
      |  SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS n
      |  FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      |  GROUP BY 1)
      |SELECT path, n FROM paths
      |ORDER BY n DESC, path LIMIT 20""".stripMargin)) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_type").as("e1"),
        lead(col("event_type"), 1).over(w).as("e2"),
        lead(col("event_type"), 2).over(w).as("e3"))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy(concat_ws(">", col("e1"), col("e2"), col("e3")).as("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("path"))
      .limit(20)
  }

  // Two-proportion A/B z-test: click→purchase conversion (a purchase by
  // the same user within the following hour) for campaign ch0 vs ch1.
  // Counts are exact integers from one interval semi-join; the pooled-
  // variance z assembles in ONE fixed double operation order.
  private val x158 = Q("x158_ab_conversion_test", Some(
    """WITH clicks AS (
      |  SELECT user_id, ts AS cts,
      |    'ch' || CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 4
      |      AS VARCHAR) AS channel
      |  FROM events WHERE event_type = 'click'
      |    AND CAST(json_extract_string(props, '$.k') AS BIGINT) % 4 IN (0, 1)),
      |conv AS (
      |  SELECT c.channel,
      |    CASE WHEN EXISTS (SELECT 1 FROM events b
      |      WHERE b.event_type = 'purchase' AND b.user_id = c.user_id
      |        AND b.ts > c.cts AND b.ts <= c.cts + INTERVAL 1 HOUR)
      |      THEN 1 ELSE 0 END AS converted
      |  FROM clicks c),
      |m AS (SELECT
      |  CAST(sum(CASE WHEN channel = 'ch0' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |  CAST(sum(CASE WHEN channel = 'ch0' THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
      |  CAST(sum(CASE WHEN channel = 'ch1' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |  CAST(sum(CASE WHEN channel = 'ch1' THEN converted ELSE 0 END) AS BIGINT) AS conv_b
      |  FROM conv)
      |SELECT n_a, conv_a, n_b, conv_b,
      |  round(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS rate_a,
      |  round(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS rate_b,
      |  round((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
      |      - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
      |    / sqrt(CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)
      |      * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
      |      * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 6) AS z
      |FROM m""".stripMargin)) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val kCol = from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))).getField("k")
    val clicks = ev.filter(col("event_type") === "click")
      .withColumn("__km", kCol % 4)
      .filter(col("__km").isin(0L, 1L))
      .select(col("user_id"), col("ts").as("cts"),
        concat(lit("ch"), col("__km").cast("string")).as("channel"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"))
    val converted = clicks
      .join(buys, clicks("user_id") === buys("user_id") &&
        col("pts") > col("cts") &&
        col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"), "left_semi")
      .groupBy("channel").agg(count(lit(1)).as("__c"))
    val totals = clicks.groupBy("channel").agg(count(lit(1)).as("__n"))
    val m = totals.join(converted, Seq("channel"), "left")
      .select(col("channel"), col("__n"), coalesce(col("__c"), lit(0L)).as("__c"))
      .agg(
        sum(when(col("channel") === "ch0", col("__n")).otherwise(0L)).as("n_a"),
        sum(when(col("channel") === "ch0", col("__c")).otherwise(0L)).as("conv_a"),
        sum(when(col("channel") === "ch1", col("__n")).otherwise(0L)).as("n_b"),
        sum(when(col("channel") === "ch1", col("__c")).otherwise(0L)).as("conv_b"))
    val ra = col("conv_a").cast("double") / col("n_a").cast("double")
    val rb = col("conv_b").cast("double") / col("n_b").cast("double")
    val p = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    m.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      round(ra, 6).as("rate_a"), round(rb, 6).as("rate_b"),
      round((ra - rb) / sqrt(p * (lit(1.0) - p) *
        (lit(1.0) / col("n_a").cast("double") +
          lit(1.0) / col("n_b").cast("double"))), 6).as("z"))
  }

  val qs: Seq[Q] = Seq(e1, e2, e3, e4, e5, e6, e7, e8, e9, e10, e11, e12, e13,
    e14, e15, x115, x147, x149, x150, x158)
}
