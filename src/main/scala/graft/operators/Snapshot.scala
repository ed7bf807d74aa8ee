package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot differencing — the CDC feed between two versions of a table
  * (the read-side complement of Merge.mergeUpsert: upsert applies a delta,
  * this derives one).
  *
  * 100 TB design: ONE full-outer equi-join on the key — no global sort, no
  * driver state; AQE broadcasts whichever side is delta-sized. Value
  * comparison is null-safe (`<=>`) per column, so a null→value or
  * value→null transition counts as an update, and rows equal on every
  * compared column are classed 'same' (callers usually filter those out —
  * at scale the unchanged majority never leaves the join stage thanks to
  * the pushed `change_type != 'same'` filter).
  */
object Snapshot {

  /** Diff `v2` (new) against `v1` (old) on `keyCol`. Output: key, one
    * `<col>_old` / `<col>_new` pair per compared column, and `change_type`
    * in {insert, delete, update, same}. */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "need at least one column to compare")
    val old = v1.select(col(keyCol).as("__k1") +:
      compareCols.map(c => col(c).as(s"${c}_old")): _*)
    val neu = v2.select(col(keyCol).as("__k2") +:
      compareCols.map(c => col(c).as(s"${c}_new")): _*)
    val joined = old.join(neu, col("__k1") === col("__k2"), "full_outer")
    val allEqual: Column = compareCols
      .map(c => col(s"${c}_old") <=> col(s"${c}_new"))
      .reduce(_ && _)
    joined.select(
      coalesce(col("__k1"), col("__k2")).as(keyCol) +:
      compareCols.flatMap(c => Seq(col(s"${c}_old"), col(s"${c}_new"))) :+
      when(col("__k1").isNull, lit("insert"))
        .when(col("__k2").isNull, lit("delete"))
        .when(allEqual, lit("same"))
        .otherwise(lit("update")).as("change_type"): _*)
  }

  /** The CDC delta: everything except unchanged rows. */
  def changesOnly(v1: DataFrame, v2: DataFrame, keyCol: String,
      compareCols: Seq[String]): DataFrame =
    snapshotDiff(v1, v2, keyCol, compareCols)
      .filter(col("change_type") =!= "same")
}
