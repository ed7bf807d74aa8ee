package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record-linkage blocking + scoring: sorted-neighborhood candidate
  * generation and Jaro-Winkler similarity.
  *
  * Sorted neighborhood is the classic alternative to LSH blocking: sort on
  * a linkage key, pair each record with its `window` successors — O(n·w)
  * candidates with NO quadratic risk, robust to typos that keep the sort
  * prefix. The global rank comes from [[Indexing.globalIndex]] (range
  * partition + broadcast offsets — never a SinglePartition window), and the
  * neighbor join is an EQUI-join on exploded rank offsets, so Spark plans a
  * shuffle hash join, not a range nested-loop.
  */
object Linkage {

  /** Jaro-Winkler similarity column (native codegen expression). */
  def jaroWinkler(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.expr.JaroWinkler(
      Bridge.expression(a), Bridge.expression(b)))
  }

  /** Candidate pairs by sorted neighborhood over `keyCol` (must be unique —
    * it is the sort rank). Each record pairs with its `window` successors:
    * the left side explodes into `window` probe ranks (rank+1 … rank+w) and
    * equi-joins the right side's rank. Returns
    * (id_a, key_a, id_b, key_b, rank_distance). */
  def sortedNeighborhood(df: DataFrame, idCol: String, keyCol: String,
      window: Int = 3): DataFrame = {
    require(window >= 1, "window must be ≥ 1")
    val indexed = Indexing.globalIndex(df.select(col(idCol), col(keyCol)), keyCol)
      .persist()
    val probes = indexed
      .withColumn("__d", explode(sequence(lit(1), lit(window))))
      .select(col(idCol).as("id_a"), col(keyCol).as("key_a"),
        (col("global_idx") + col("__d")).as("__probe"),
        col("__d").as("rank_distance"))
    val rhs = indexed.select(col(idCol).as("id_b"), col(keyCol).as("key_b"),
      col("global_idx").as("__probe"))
    probes.join(rhs, "__probe")
      .select("id_a", "key_a", "id_b", "key_b", "rank_distance")
  }

  /** Sorted-neighborhood linkage: candidates + Jaro-Winkler score over the
    * linkage key, thresholded. The score runs ONLY on the O(n·w) candidate
    * frame. */
  def linkBySortedNeighborhood(df: DataFrame, idCol: String, keyCol: String,
      window: Int = 3, minSimilarity: Double = 0.0): DataFrame =
    sortedNeighborhood(df, idCol, keyCol, window)
      .withColumn("jw", jaroWinkler(col("key_a"), col("key_b")))
      .filter(col("jw") >= minSimilarity)
}
