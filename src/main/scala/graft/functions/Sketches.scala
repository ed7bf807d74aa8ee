package graft.functions

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic streaming-style sketches for 100 TB profiling: count-min
  * (heavy hitters) and KMV (distinct counting). All hashing is md5-derived
  * ([[Dedup.seededHash]]) so every sketch is reproducible across runs AND
  * engines — the DuckDB oracles replay sketch construction cell for cell.
  *
  * 100 TB design: a sketch IS its partial aggregate — `countMin` is one
  * groupBy over (depth × width) cells, so map-side combine collapses each
  * partition to ≤ d·w rows before the shuffle; merging shards = summing
  * cells, which is exactly what the aggregate does. KMV keeps the k smallest
  * distinct hashes per group — a per-group top-k (WindowGroupLimit prunes
  * pre-shuffle), never a global sort.
  */
object Sketches {

  /** Count-min sketch over a token frame (one row per occurrence): returns
    * the (row, bucket, cnt) cell frame, `depth` independent md5-seeded rows
    * of `width` buckets. */
  def countMin(tokens: DataFrame, tokenCol: String,
      depth: Int = 4, width: Int = 32): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    val cells = (0 until depth).map { r =>
      struct(lit(r).as("row"),
        (Dedup.seededHash(r, col(tokenCol)) % width).as("bucket"))
    }
    tokens.select(explode(array(cells: _*)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate counts for `keys` from a count-min cell frame: the
    * classic min over each key's `depth` bucket counters (an overestimate,
    * never an underestimate). The sketch is ≤ d·w rows — broadcast. */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 32): DataFrame = {
    val cells = (0 until depth).map { r =>
      struct(lit(r).as("row"),
        (Dedup.seededHash(r, col(keyCol)) % width).as("bucket"))
    }
    keys.select(col(keyCol), explode(array(cells: _*)).as("rb"))
      .select(col(keyCol), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_estimate"))
  }

  /** KMV (k-minimum-values) distinct-count estimate per group: hash the
    * value space with one seeded md5, keep the k smallest DISTINCT hashes
    * per group, estimate distinct = (k-1) / normalized k-th minimum.
    * Returns (groupCol, kmv_estimate) for groups with ≥ k distinct values.
    * The rank filter sits directly on the window so Spark plans a
    * WindowGroupLimit: each map task forwards at most k rows per group. */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 8, seed: Int = 7): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy("__hv")
    df.select(col(groupCol),
        Dedup.seededHash(seed, col(valueCol).cast("string")).as("__hv"))
      .distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === k)
      .select(col(groupCol),
        round(lit(k - 1) / (col("__hv").cast("double") / lit(4294967296.0)), 2)
          .as("kmv_estimate"))
  }
}
