package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global row numbering WITHOUT a single-partition window —
  * the scalable replacement for `row_number() OVER (ORDER BY k)`, whose
  * empty PARTITION BY funnels the entire dataset through one task.
  *
  * Shape: range-repartition on the key (ordered ranges → ascending partition
  * ids) → per-partition local row_number (parallel) → per-partition counts
  * (tiny) → cumulative offsets (a |partitions|-row window) → broadcast the
  * offsets back. The result equals the global row_number for a UNIQUE key
  * regardless of where the sampled range boundaries land. At 100 TB this is
  * one range shuffle + one broadcast, with every heavy step parallel. */
object Indexing {

  /** Add `global_idx` (1-based, ordered by `orderCol`, which must be
    * unique). `partitions` controls the range shuffle width. */
  def globalIndex(df: DataFrame, orderCol: String,
      partitions: Int = 32): DataFrame = {
    val parts = df.repartitionByRange(partitions, col(orderCol))
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy("__pid").orderBy(orderCol)
    val local = parts.withColumn("__rn", row_number().over(wLocal))
    // |partitions| rows: cumulative count of all earlier partitions
    val wOff = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn("global_idx", col("__off") + col("__rn"))
      .drop("__pid", "__rn", "__off")
  }
}
