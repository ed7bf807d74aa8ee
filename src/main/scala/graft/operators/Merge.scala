package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse maintenance operators: MERGE-style upsert and SCD2 dimension
  * builds — the write-side half of a lakehouse table (the read side being the
  * layout operators in PartitionLayout/ZOrder/Compaction).
  *
  * 100 TB design: both operators are single equi-joins/windows keyed on the
  * dimension key — no global ordering, no driver-side state. An update feed
  * is delta-sized in practice, so the merge join broadcasts under AQE; the
  * SCD2 window shuffles once on the key.
  */
object Merge {

  /** Build an SCD2 (slowly-changing-dimension type 2) version table from a
    * change history with one row per (key, effective-ts) state: adds
    * `valid_from` / `valid_to` (half-open, null = open) and `is_current`.
    * The caller pre-aggregates the history to one row per key+ts — this
    * operator only derives the validity intervals (one window, one shuffle
    * on the key). */
  def scd2FromHistory(history: DataFrame, keyCol: String, tsCol: String,
      attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol)
    history
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol) +: attrCols.map(col) :+
        col(tsCol).as("valid_from") :+ col("valid_to") :+
        col("valid_to").isNull.as("is_current"): _*)
  }

  /** MERGE-style upsert: full-outer join target and updates on `keyCol`.
    * Columns present in `updates` overwrite the target's values on match
    * ('update'), unmatched update rows become 'insert' (other target
    * columns null), unmatched target rows pass through as 'keep'. The
    * decision is reported in an `action` column so callers can audit the
    * merge before committing it. */
  def mergeUpsert(target: DataFrame, updates: DataFrame,
      keyCol: String): DataFrame = {
    val setCols = updates.columns.filterNot(_ == keyCol).toSeq
    require(setCols.nonEmpty, "updates must carry at least one value column")
    require(setCols.forall(target.columns.contains),
      s"update columns ${setCols.mkString(",")} must exist in the target")
    val u = updates.select(col(keyCol).as("__uk") +:
      setCols.map(c => col(c).as(s"__u_$c")): _*)
    val merged = target.join(u, col(keyCol) === col("__uk"), "full_outer")
    val outCols =
      coalesce(col(keyCol), col("__uk")).as(keyCol) +:
      target.columns.filterNot(_ == keyCol).toSeq.map { c =>
        if (setCols.contains(c)) coalesce(col(s"__u_$c"), col(c)).as(c)
        else col(c)
      } :+
      when(col("__uk").isNull, lit("keep"))
        .when(col(keyCol).isNull, lit("insert"))
        .otherwise(lit("update")).as("action")
    merged.select(outCols: _*)
  }

  /** Delete-cascade (right-to-be-forgotten): given a frame of subject keys
    * to erase, produce each table's surviving rows AND an audit count of
    * what was removed. Every table is one LEFT ANTI hash join against the
    * (small, broadcast) key set — no table ever joins another table, so
    * the cascade over N tables is N independent scans that run in
    * parallel. Returns (tableName → survivors) plus a one-row-per-table
    * audit frame via [[deleteCascadeAudit]]. */
  def deleteCascade(tables: Map[String, (DataFrame, String)],
      keys: DataFrame, keyCol: String): Map[String, DataFrame] = {
    require(tables.nonEmpty, "need at least one table")
    val k = broadcast(keys.select(col(keyCol).as("__delkey")).distinct())
    tables.map { case (name, (df, fk)) =>
      name -> df.join(k, col(fk) === col("__delkey"), "left_anti")
    }
  }

  /** Audit for [[deleteCascade]]: per table, rows before / deleted /
    * after — the compliance evidence. One lazy plan (unioned 1-row
    * aggregates; each table is scanned twice: once for the total, once
    * anti-joined — still no cross-table join). */
  def deleteCascadeAudit(tables: Map[String, (DataFrame, String)],
      keys: DataFrame, keyCol: String): DataFrame = {
    val survivors = deleteCascade(tables, keys, keyCol)
    tables.toSeq.sortBy(_._1).map { case (name, (df, _)) =>
      df.agg(count(lit(1)).as("n_before"))
        .crossJoin(survivors(name).agg(count(lit(1)).as("n_after")))
        .select(lit(name).as("table_name"), col("n_before"),
          (col("n_before") - col("n_after")).as("n_deleted"), col("n_after"))
    }.reduce(_ unionByName _)
  }
}
