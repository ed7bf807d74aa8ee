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

  /** Key-skew diagnostics (beyond reference — the pre-flight check for
    * choosing salting/AQE-skew settings before a big join): per-key counts
    * reduced to the top-k hottest keys, each annotated with its share of
    * all rows and its ratio to the mean key load. One groupBy + a tiny
    * top-k (TakeOrderedAndProject); the global stats ride along via a
    * 1-row broadcast cross join, so the key counts are computed ONCE. */
  def keySkew(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = counts.agg(sum(col("n_rows")).as("__total"),
      count(lit(1)).as("__nkeys"))
    counts.crossJoin(broadcast(totals))
      .select(col(keyCol), col("n_rows"),
        round(col("n_rows").cast("double") / col("__total") * 100, 4)
          .as("pct_of_total"),
        round(col("n_rows").cast("double") /
          (col("__total").cast("double") / col("__nkeys")), 4)
          .as("ratio_to_avg"))
      .orderBy(desc("n_rows"), col(keyCol))
      .limit(topK)
  }

  /** A4 frequency table: value counts of one column, top-k by count with a
    * deterministic value tie-break (reference: webapp/pages/05_Diagnostics.py:110-115). */
  /** Dataset card for a text corpus: the one-row summary a training-data
    * release ships (HF dataset-card "dataset statistics" shape) — corpus
    * size, language spread, length distribution, exact-dup rate — computed
    * in ONE fused aggregate over ONE scan (no per-metric jobs). Length
    * stats stay integral (token counts sum exactly); the dup rate divides
    * two exact longs. */
  def datasetCard(df: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    val words = graft.operators.Dedup.words(col(textCol))
    df.select(col(idCol), col(langCol),
        size(words).cast("long").as("__tok"),
        length(col(textCol)).cast("long").as("__chars"),
        md5(col(textCol)).as("__h"))
      .agg(
        count(lit(1)).as("n_docs"),
        count_distinct(col("__h")).as("n_distinct_texts"),
        count_distinct(col(langCol)).as("n_langs"),
        sum(col("__tok")).as("total_tokens"),
        min(col("__tok")).as("min_tokens"),
        max(col("__tok")).as("max_tokens"),
        sum(col("__chars")).as("total_chars"))
      .select(col("n_docs"), col("n_distinct_texts"), col("n_langs"),
        col("total_tokens"), col("min_tokens"), col("max_tokens"),
        col("total_chars"),
        floor((col("n_docs") - col("n_distinct_texts")).cast("double") /
          col("n_docs").cast("double") * lit(10000) + lit(0.5)).cast("long")
          .as("dup_bps"))
  }

  def frequencyTable(df: DataFrame, column: String, k: Int = 25): DataFrame =
    df.groupBy(col(quoted(column)).cast("string").as("value"))
      .agg(count(lit(1)).as("count"))
      .orderBy(desc("count"), asc_nulls_first("value"))
      .limit(k)

  private def quoted(name: String): String = s"`${name.replace("`", "``")}`"
}
