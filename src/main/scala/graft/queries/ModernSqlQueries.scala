package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.Tables.t

/** Spark 4 SQL-surface coverage: the VARIANT semi-structured type, SQL pipe
  * syntax, and collation-aware grouping — each oracle-gated like every other
  * query. These are the engine features a reference user migrating at 100 TB
  * gains for free on Spark, so they are exercised as first-class registry
  * queries, not doc footnotes.
  */
object ModernSqlQueries {

  // VARIANT extraction (SPARK-45891): props parses ONCE to the binary
  // variant encoding, then two typed paths (int64 + string) extract from
  // the same variant column — the open-schema twin of e5's from_json,
  // for payloads whose shape isn't known at plan time. The row filter is
  // folded into the aggregate as conditional sums (plus a HAVING n > 0)
  // instead of a WHERE: a pushed-down predicate on variant_get would sit
  // BELOW the projection and re-parse the JSON per row (no cross-operator
  // CSE); in the fused form both variant_gets land in one Project where
  // codegen subexpression elimination evaluates parse_json exactly once.
  private val x124 = Q("x124_variant_extract", Some(
    """SELECT event_type,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  max(json_extract_string(props, '$.k')) AS max_k_str,
      |  count(*) AS n
      |FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) <= 50
      |GROUP BY event_type ORDER BY event_type""".stripMargin)) { (s, dir) =>
    val withV = Tables.events(s, dir)
      .select(col("event_type"), parse_json(col("props")).as("v"))
      .select(col("event_type"),
        variant_get(col("v"), "$.k", "long").as("k"),
        variant_get(col("v"), "$.k", "string").as("k_str"))
    withV.groupBy("event_type")
      .agg(sum(when(col("k") <= 50, col("k"))).as("sum_k"),
        max(when(col("k") <= 50, col("k_str"))).as("max_k_str"),
        count(when(col("k") <= 50, 1)).as("n"))
      .filter(col("n") > 0)
      .orderBy("event_type")
  }

  // SQL pipe syntax (SPARK-49555): the linear |> form of a filter →
  // aggregate → order chain. Same Catalyst plan as the nested SELECT —
  // the gate proves the new parser path, not new semantics.
  private val x125 = Q("x125_pipe_sql", Some(
    """SELECT l_linestatus,
      |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n
      |FROM lineitem WHERE l_quantity < 10
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)) { (s, dir) =>
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_pipe")
    s.sql(
      """FROM lineitem_pipe
        ||> WHERE l_quantity < 10
        ||> AGGREGATE cast(sum(l_quantity) AS BIGINT) AS sum_qty,
        |     round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |     count(*) AS n
        |   GROUP BY l_linestatus
        ||> ORDER BY l_linestatus""".stripMargin)
      .select("l_linestatus", "sum_qty", "revenue", "n")
  }

  // Collation-aware aggregation (SPARK-46830): langs uppercased on odd
  // doc_ids, then UTF8_LCASE drives case-insensitive DISTINCT counting
  // and equality — inside the aggregate's hash, not via a lower()
  // normalization column the optimizer must carry. The case-sensitive
  // distinct count sits alongside as the contrast.
  private val x126 = Q("x126_collated_group", Some(
    """WITH d AS (
      |  SELECT source,
      |    CASE WHEN doc_id % 2 = 1 THEN upper(lang) ELSE lang END AS lang_mixed
      |  FROM documents)
      |SELECT source,
      |  CAST(count(DISTINCT lower(lang_mixed)) AS BIGINT) AS n_langs_ci,
      |  CAST(count(DISTINCT lang_mixed) AS BIGINT) AS n_langs_cs,
      |  CAST(count(CASE WHEN lower(lang_mixed) = 'en' THEN 1 END) AS BIGINT) AS n_en,
      |  count(*) AS n
      |FROM d GROUP BY source ORDER BY source""".stripMargin)) { (s, dir) =>
    val d = t(s, dir, "documents").select(col("source"),
      when(col("doc_id") % 2 === 1, upper(col("lang")))
        .otherwise(col("lang")).as("lang_mixed"))
    d.groupBy("source")
      .agg(
        countDistinct(collate(col("lang_mixed"), "UTF8_LCASE")).as("n_langs_ci"),
        countDistinct(col("lang_mixed")).as("n_langs_cs"),
        count(when(collate(col("lang_mixed"), "UTF8_LCASE") === lit("en"), 1))
          .as("n_en"),
        count(lit(1)).as("n"))
      .orderBy("source")
  }

  val qs: Seq[Q] = Seq(x124, x125, x126)
}
