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
      |  SELECT user_id, ts,
      |    CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
      |         OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS boundary
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts,
      |    sum(boundary) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM flagged)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  count(*) AS n_events, min(ts) AS session_start
      |FROM sessions GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin)) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wRun = Window.partitionBy("user_id").orderBy("ts")
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

  val qs: Seq[Q] = Seq(e1, e2, e3, e4)
}
