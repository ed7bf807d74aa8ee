package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-verifiable query: a Spark plan plus (when SQL-expressible) an
  * equivalent DuckDB oracle over the same parquet tables.
  *
  * Parity rules (see BASELINE.md):
  *  - every output column is aliased identically in Spark and SQL;
  *  - results end with a deterministic ORDER BY (Spark does not preserve row
  *    order, and fp ties must be broken by a unique key) — DuckDB sorts nulls
  *    LAST by default while Spark sorts them FIRST, so nullable sort keys need
  *    an explicit NULLS FIRST in the oracle;
  *  - fp aggregates are rounded so summation order can't flip the hash;
  *  - integer aggregates are CAST(... AS BIGINT) in DuckDB (its sum(int)
  *    widens to INT128, Spark's stays long).
  */
final case class Q(name: String, oracle: Option[String])(
    val run: (SparkSession, String) => DataFrame)

object Tables {
  /** Read one driver testdata table from an sf directory. */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events` with its nanosecond `ts` restored to a real timestamp.
    * The parquet stores TIMESTAMP(NANOS), which Spark only reads via
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in every session
    * builder here); microsecond truncation matches DuckDB's TIMESTAMP. */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // integral div, NOT floor(x / 1000.0): nanosecond epochs exceed 2^53,
        // so a double round-trip corrupts the low microseconds
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // Driver testdata may store TIMESTAMP(MICROS, isAdjustedToUTC=false),
        // which Spark 4 reads natively as TIMESTAMP_NTZ. Streaming watermarks
        // (and window/session_window state) require the instant-carrying
        // TIMESTAMP type; the session timezone is pinned to UTC everywhere
        // here, so the cast reinterprets the same wall clock as the same
        // instant — value-identical to the DuckDB oracle's naive TIMESTAMP.
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
}

/** All driver-checkable queries, one (or more) per SURVEY §2 operator.
  * `SparkEntry.queries` / `oracleSql` derive from this single registry so a
  * query can never ship without its oracle decision. */
object Registry {
  lazy val all: Seq[Q] =
    CoreQueries.qs ++ CombineQueries.qs ++ YoutubeQueries.qs ++ SourceSinkQueries.qs ++ ScaleQueries.qs ++ HeaderQueries.qs ++ ApiSourceQueries.qs ++ LifecycleQueries.qs ++ EventQueries.qs ++ AnalyticsQueries.qs ++ TrainingQueries.qs ++ WarehouseQueries.qs ++ TpchQueries.qs ++ StatsQueries.qs ++ LinkageQueries.qs ++ QualityQueries.qs ++ ModernSqlQueries.qs ++ RetrievalQueries.qs
  lazy val byName: Map[String, Q] = {
    val names = all.map(_.name)
    require(names.distinct.length == names.length,
      s"duplicate query names: ${names.diff(names.distinct).mkString(",")}")
    all.map(q => q.name -> q).toMap
  }
}
