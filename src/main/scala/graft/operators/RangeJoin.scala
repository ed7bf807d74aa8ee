package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join (beyond reference; the brief's other "operator Spark
  * lacks"): match points to intervals containing them.
  *
  * Spark plans a raw `p.ts BETWEEN i.start AND i.end` join as a broadcast
  * nested loop (or cartesian) — O(|P|·|I|) comparisons. Binning makes it an
  * EQUI-join: intervals explode into the fixed-width time bins they cover,
  * points carry their single bin, and the join key becomes
  * (keys…, bin) — hash-partitioned, one shuffle, with the exact
  * containment predicate applied after the bucket match. Each (point,
  * interval) pair meets in exactly one bin (the point's), so no dedup
  * pass is needed.
  *
  * `binSeconds` trades replication for selectivity: ≈ the median interval
  * length is the usual sweet spot (intervals explode into
  * length/binSeconds + 1 rows).
  */
object RangeJoin {

  def binnedRangeJoin(points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String], pointTsCol: String, startCol: String, endCol: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val p = points.withColumn("__bin",
      floor(unix_seconds(col(pointTsCol)) / binSeconds))
    val i = intervals.withColumn("__bin", explode(sequence(
      floor(unix_seconds(col(startCol)) / binSeconds),
      floor(unix_seconds(col(endCol)) / binSeconds))))
    p.join(i, keyCols :+ "__bin")
      .filter(col(pointTsCol) >= col(startCol) && col(pointTsCol) <= col(endCol))
      .drop("__bin")
  }
}
