package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A5/K6 dataset profiling: the manifest's quality metrics as ONE aggregate
  * job — row count, per-column null percentage, and full-row duplicate count
  * (reference: src/exporter.py:14-33; webapp/pages/05_Diagnostics.py:94).
  *
  * Everything is fused into a single `agg` over one shuffle-free scan: null
  * fractions are `avg(isNull)` and the duplicate count is
  * `count(*) - count_distinct(struct(*))` — never a second read or a
  * per-column job (SURVEY §7.4.8). At 100 TB this is one pass.
  */
object Profiler {

  /** One-row frame: `n_rows`, `n_cols`, `dup_rows`, and `null_pct_<col>`
    * (percentage, rounded to 2 decimals like the reference manifest).
    *
    * `approx = true` swaps the exact full-row distinct (a full-width
    * shuffle) for `approx_count_distinct` (HLL±2.5%, a constant-size
    * sketch per partition) — the right manifest mode at 100 TB, where an
    * exact duplicate count costs more than the export itself. */
  def profile(df: DataFrame, approx: Boolean = false): DataFrame = {
    val cols = df.columns
    val rowStruct = struct(cols.toIndexedSeq.map(c => col(quoted(c))): _*)
    val distinctRows =
      if (approx) approx_count_distinct(rowStruct, 0.025)
      else count_distinct(rowStruct)
    val aggs =
      count(lit(1)).as("n_rows") +:
      lit(cols.length).cast("int").as("n_cols") +:
      greatest(count(lit(1)) - distinctRows, lit(0L)).as("dup_rows") +:
      cols.map(c =>
        round(avg(col(quoted(c)).isNull.cast("double")) * 100, 2).as(s"null_pct_$c")).toSeq
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** A4 frequency table: value counts of one column, top-k by count with a
    * deterministic value tie-break (reference: webapp/pages/05_Diagnostics.py:110-115). */
  def frequencyTable(df: DataFrame, column: String, k: Int = 25): DataFrame =
    df.groupBy(col(quoted(column)).cast("string").as("value"))
      .agg(count(lit(1)).as("count"))
      .orderBy(desc("count"), asc_nulls_first("value"))
      .limit(k)

  private def quoted(name: String): String = s"`${name.replace("`", "``")}`"
}
