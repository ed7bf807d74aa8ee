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

  /** Join-cardinality estimation from two count-min sketches — the
    * query-optimizer primitive: |A ⋈ B on k| = Σ_k cntA(k)·cntB(k), whose
    * CMS estimator is min over rows of the bucket-wise inner product
    * Σ_b cntA(r,b)·cntB(r,b) (an overestimate, like every CMS read). Lets
    * a planner size a join from two d·w-cell sketches without touching
    * either table. All integer arithmetic — exact, order-free, replayable.
    * Returns a 1-row frame (join_size_estimate). */
  def cmsJoinSize(a: DataFrame, b: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 64): DataFrame = {
    val sa = countMin(a, keyCol, depth, width)
      .withColumnRenamed("cnt", "cnt_a")
    val sb = countMin(b, keyCol, depth, width)
      .withColumnRenamed("cnt", "cnt_b")
    sa.join(sb, Seq("row", "bucket")) // absent buckets contribute 0
      .groupBy("row")
      .agg(sum(col("cnt_a") * col("cnt_b")).as("__ip"))
      .agg(min(col("__ip")).as("join_size_estimate"))
  }

  /** HyperLogLog distinct-count estimate per group (2^b registers, md5
    * hashing — deterministic and engine-replayable, unlike library HLLs).
    * Register = low b hash bits, rho = leading-zero rank of the remaining
    * 32-b bits; the register table is one groupBy MAX (mergeable across
    * shards by the same max, like every sketch here). Small cardinalities
    * take the standard linear-counting branch. Estimates are rounded to 2
    * decimals so libm 1-ulp drift cannot flip the gate. */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String,
      b: Int = 5, seed: Int = 11): DataFrame = {
    require(b >= 4 && b <= 16, "b must be in [4,16]")
    val m = 1 << b
    val restBits = 32 - b
    // alpha constants from the HLL paper (m>=128 uses the closed form)
    val alpha =
      if (m == 16) 0.673 else if (m == 32) 0.697
      else if (m == 64) 0.709 else 0.7213 / (1 + 1.079 / m)
    val h = Dedup.seededHash(seed, col(valueCol).cast("string"))
    val rest = shiftright(h, b)
    // bit length via bin() string length — identical in DuckDB; rest == 0
    // means all restBits bits are zero → rho = restBits + 1
    val rho = when(rest === 0, lit(restBits + 1))
      .otherwise(lit(restBits + 1) - length(bin(rest)))
    val regs = df
      .select(col(groupCol), (h % m).as("reg"), rho.as("rho"))
      .groupBy(col(groupCol), col("reg")).agg(max(col("rho")).as("mr"))
    val sums = regs.groupBy(col(groupCol))
      .agg(sum(pow(lit(2.0), -col("mr"))).as("s"),
        count(lit(1)).as("npresent"))
    sums
      .withColumn("__v", lit(m) - col("npresent"))
      .withColumn("__raw",
        lit(alpha) * m * m / (col("s") + (lit(m) - col("npresent"))))
      .select(col(groupCol),
        round(when(col("__raw") <= 2.5 * m && col("__v") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("__v")))
          .otherwise(col("__raw")), 2).as("hll_estimate"))
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

  /** Fixed-bin histogram quantile estimates — the one-pass approximate
    * percentile for 100 TB profiling (the shape of t-digest/GK without the
    * mergeable-summary machinery: an equi-width histogram IS mergeable by
    * summing bins). Pass 1: global min/max/count (one tiny agg, broadcast).
    * Pass 2: bin counts (≤ `bins` groups, map-side combine). The estimate
    * for q is the RIGHT EDGE of the first bin whose cumulative count
    * reaches q·n — deterministic, no interpolation ties. Every arithmetic
    * step is the same IEEE op sequence cross-engine; the bins-row window is
    * tiny (≤ `bins` rows), so the single-partition window is free.
    * Returns (q_label, bin, est_value). */
  def histogramQuantiles(df: DataFrame, valueCol: String, bins: Int,
      qs: Seq[(String, Double)]): DataFrame = {
    require(bins > 1, "need at least 2 bins")
    require(qs.nonEmpty, "need at least one quantile")
    val mm = df.agg(min(col(valueCol)).cast("double").as("__lo"),
      max(col(valueCol)).cast("double").as("__hi"),
      count(col(valueCol)).as("__n"))
    val binned = df.select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .crossJoin(broadcast(mm))
      .select(when(col("__hi") === col("__lo"), lit(0L)) // constant column
          .otherwise(least(floor((col("__v") - col("__lo")) /
            (col("__hi") - col("__lo")) * lit(bins)), lit(bins - 1))
            .cast("long")).as("bin"),
        col("__lo"), col("__hi"), col("__n"))
    val hist = binned.groupBy("bin", "__lo", "__hi", "__n")
      .agg(count(lit(1)).as("__c"))
    val wCum = org.apache.spark.sql.expressions.Window.orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = hist.withColumn("__cum", sum(col("__c")).over(wCum))
    val sess = df.sparkSession
    import sess.implicits._
    val qdf = qs.toDF("q_label", "q")
    broadcast(qdf).join(cum,
        col("__cum") >= col("q") * col("__n").cast("double"))
      .groupBy("q_label", "q", "__lo", "__hi")
      .agg(min(col("bin")).as("bin"))
      .select(col("q_label"), col("bin"),
        (col("__lo") + (col("bin") + lit(1)).cast("double") *
          (col("__hi") - col("__lo")) / lit(bins)).as("est_value"))
  }
}
