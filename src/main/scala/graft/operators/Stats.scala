package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical analytics over distributed frames: Pearson correlation
  * matrices, closed-form OLS trend fits, percentile winsorization, and
  * k-anonymity audits.
  *
  * Engine-parity discipline (same as the query registry): every moment is
  * accumulated as an exact DECIMAL sum (per-row double products are
  * bit-identical cross-engine, decimal addition is order-free), and the
  * closed-form double arithmetic happens ONCE at the end in a fixed
  * operation order — so Spark and the DuckDB oracle produce the same bits.
  * Spark's own `corr`/`regr_slope` aggregate doubles in shuffle order and
  * cannot be hash-gated; these can.
  *
  * Cache lifetime (deliberate): the few `persist()`ed intermediates here
  * (chi-square / KS / drift contingency cells) are tiny — O(|distinct
  * categories|) rows, not corpus-sized — and stay cached until Spark's LRU
  * evicts them, so repeated invocations on the same session reuse nothing
  * stale but do hold a few KB each. The operators return LAZY frames, so
  * they cannot unpersist on the caller's behalf; a long-lived service
  * should scope jobs in [[Caches.withCaches]] (unpersists exactly the
  * caches the job created) or, bluntly, `spark.catalog.clearCache()`
  * between unrelated jobs.
  */
object Stats {

  private def dec(c: Column): Column = c.cast("decimal(28,6)")

  /** All pairwise Pearson correlations between `cols` in ONE scan: a single
    * NATIVE aggregate ([[graft.functions.expr.PairMomentsDec6]]) computes
    * every first/second moment (map-side combined) in one primitive loop
    * per row, and the |cols|²/2 result rows are projected lazily from that
    * 1-row frame — no per-pair passes, no shuffle beyond the one partial
    * agg.
    *
    * Each moment is bit-identical to the SQL formulation
    * `CAST(sum(CAST(a*b AS DECIMAL(28,6))) AS DOUBLE)` it replaces (the
    * DuckDB oracles replay exactly that), but the per-row cost is one
    * call into a primitive quantize/accumulate loop instead of
    * 2k + k(k−1)/2 interpreted decimal-sum updates — DECIMAL(38,6) agg
    * buffers are immutable in UnsafeRow, so the old shape planned as
    * non-codegen SortAggregate and scaled at 8× on 10× data (four rounds
    * chronic; the [[graft.functions.expr.DotProductDec18]] lesson,
    * applied to moments). */
  def correlationMatrix(df: DataFrame, cols: Seq[String],
      roundTo: Int = 6): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val k = cols.size
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j }
      yield (i, j)
    // pair (i, j) sits at row-major offset within the p-block
    val pairOffset = pairs.zipWithIndex.toMap
    import org.apache.spark.sql.graftbridge.Bridge
    val momAgg = Bridge.column(graft.functions.expr.PairMomentsDec6(
      Bridge.expression(array(cols.map(c => col(c).cast("double")): _*)),
      k).toAggregateExpression())
    // complete-case: one shared n must match every moment sum, so a row
    // with a null in ANY correlated column is excluded from all of them
    val m = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .agg(momAgg.as("__mom"))
    def el(i: Int) = element_at(col("__mom"), i + 1)
    val n = el(0)
    def s(i: Int) = el(1 + i)
    def q(i: Int) = el(1 + k + i)
    def p(i: Int, j: Int) = el(1 + 2 * k + pairOffset((i, j)))
    // ONE explode of per-pair structs off the single 1-row aggregate — a
    // union of per-pair selects would re-evaluate the aggregate (and
    // re-scan the source) once per pair
    val pairStructs = pairs.map { case (i, j) =>
      val corr = (n * p(i, j) - s(i) * s(j)) /
        sqrt((n * q(i) - s(i) * s(i)) * (n * q(j) - s(j) * s(j)))
      struct(lit(cols(i)).as("col_x"), lit(cols(j)).as("col_y"),
        round(corr, roundTo).as("pearson_r"))
    }
    m.select(explode(array(pairStructs: _*)).as("pr")).select("pr.*")
  }

  /** Closed-form per-group OLS fit y ~ slope·x + intercept, from one
    * grouped aggregate of exact decimal moments. The standard trend query
    * (`regr_slope`) without the engine-specific double-summation drift. */
  def olsTrend(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String, roundTo: Int = 4): DataFrame = {
    val x = col(xCol)
    val y = col(yCol)
    val g = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("double").as("n"),
        sum(dec(x)).cast("double").as("sx"),
        sum(dec(y)).cast("double").as("sy"),
        sum(dec(x * y)).cast("double").as("sxy"),
        sum(dec(x * x)).cast("double").as("sxx"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    g.select(groupCols.map(col) ++ Seq(
      col("n").cast("bigint").as("n_rows"),
      round(slope, roundTo).as("slope"),
      round((col("sy") - slope * col("sx")) / col("n"), roundTo)
        .as("intercept")): _*)
  }

  /** Winsorize `valueCol` at the [pLo, pHi] DISCRETE percentiles per group
    * (percentile_disc picks actual data elements — bit-identical across
    * engines, unlike interpolated percentiles). The two-pass shape is the
    * scalable one: a tiny per-group bounds frame joins back (AQE broadcasts
    * it) instead of a per-row window re-sorting the whole fact table. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    val bounds = df.groupBy(col(groupCol).as("__g"))
      .agg(expr(s"percentile_disc($pLo) WITHIN GROUP (ORDER BY $valueCol)")
          .as("__lo"),
        expr(s"percentile_disc($pHi) WITHIN GROUP (ORDER BY $valueCol)")
          .as("__hi"))
    df.join(bounds, col(groupCol) === col("__g"))
      .withColumn("__w",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .drop("__g")
  }

  /** Exact per-group quantiles with BOUNDED memory. Spark's exact
    * `percentile` aggregate buffers every value of a group in one
    * in-memory map — a group with billions of rows OOMs an executor. This
    * formulation never holds a group: one partition-sorted window pass
    * ranks the values (WindowExec spills), rank arithmetic selects the one
    * or two boundary rows per quantile, and linear interpolation rides in
    * as a weighted sum — `v_lo·(1−frac) + v_hi·frac` with
    * `pos = (n−1)·q`, the same definition DuckDB's `quantile_cont` uses.
    * Adding the zero contributions of non-boundary rows is IEEE-exact, so
    * the sum is deterministic under any aggregation order.
    *
    * Pass quantiles that are exact binary fractions (0.25, 0.5, 0.75) so
    * `pos`/`frac` are bit-identical across engines; output columns are
    * `p25`-style plus `n` (group size). */
  def exactQuantiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles out of [0,1]: ${qs.mkString(",")}")
    val gs = groupCols.map(col)
    val wOrd = Window.partitionBy(gs: _*).orderBy(col(valueCol))
    val wAll = Window.partitionBy(gs: _*)
    val ranked = df
      .withColumn("__v", col(valueCol).cast("double"))
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
    def pos(q: Double) = (col("__n") - 1) * lit(q)
    def lo(q: Double) = floor(pos(q)) + 1
    def frac(q: Double) = pos(q) - floor(pos(q))
    // keep only rows that bound some requested quantile — the aggregate
    // input is ≤ 2·|qs| rows per group, not the group itself
    val isBoundary = qs.map(q =>
      col("__rn") === lo(q) || col("__rn") === lo(q) + 1).reduce(_ || _)
    val aggs = qs.map { q =>
      val contrib =
        when(col("__rn") === lo(q), col("__v") * (lit(1.0) - frac(q)))
          .when(col("__rn") === lo(q) + 1, col("__v") * frac(q))
          .otherwise(lit(0.0))
      round(sum(contrib), 4).as(s"p${math.round(q * 100)}")
    } :+ max(col("__n")).as("n")
    ranked.filter(isBoundary)
      .groupBy(gs: _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Exact GLOBAL quantiles of a corpus-sized column — what
    * [[exactQuantiles]] cannot do ungrouped: its rank window partitioned
    * by nothing would funnel the whole corpus through ONE task (the
    * r8-verdict hazard class), and Spark's exact `percentile` aggregate
    * buffers every value in executor memory. Here the distinct-value
    * frame (worst case corpus-sized, e.g. a continuous score) carries
    * its running count on [[Indexing.globalPrefixSums]]'s
    * range-partitioned path, and each requested quantile picks the
    * FIRST value whose cumulative count reaches its target rank —
    * percentile_disc semantics (an actual data element, bit-identical
    * cross-engine; interpolated quantiles of a continuous column would
    * hash-drift).
    *
    * Quantiles are passed in BASIS POINTS (1..10000) so the target rank
    * `ceil(bps·N / 10⁴)` is computed in exact integer arithmetic —
    * `ceil(q·N)` in doubles turns 0.1·30 into 3.0000000000000004 and
    * silently shifts the rank. Nulls are excluded (SQL percentile
    * convention). The quantile pick is a broadcast theta-join of the
    * ≤|bps| target rows against the cumulative frame + one min — work
    * O(n·|bps|), no sort, no single-partition stage anywhere
    * (plan-pinned). Returns (q, rank, n_values, value) ordered by q. */
  def globalQuantiles(df: DataFrame, valueCol: String,
      quantilesBps: Seq[Int]): DataFrame = {
    require(quantilesBps.nonEmpty &&
      quantilesBps.forall(b => b >= 1 && b <= 10000),
      "quantiles must be basis points in [1, 10000]")
    val vals = df.select(col(valueCol).as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy("__v").agg(count(lit(1)).as("__c"))
    val cum = Indexing.globalPrefixSums(vals, Nil, Seq(col("__v")),
        Seq("__c"))
      .withColumn("__cum", col("__c_excl") + col("__c"))
    val targets = broadcast(vals.agg(sum(col("__c")).as("__n"))
      .select(col("__n"), explode(array(
        quantilesBps.map(b => lit(b.toLong)): _*)).as("__bps"))
      .withColumn("__t",
        expr("CAST((CAST(__bps AS DECIMAL(38,0)) * __n + 9999) " +
          "DIV 10000 AS BIGINT)")))
    cum.join(targets, col("__cum") >= col("__t"))
      .groupBy("__bps", "__t", "__n")
      .agg(min(col("__v")).as("value"))
      .select((col("__bps").cast("double") / lit(10000.0)).as("q"),
        col("__t").as("rank"), col("__n").as("n_values"), col("value"))
      .orderBy("q")
  }

  /** Per-GROUP exact quantiles at corpus scale — [[globalQuantiles]]
    * generalized with a group key, for when BOTH the group count and
    * the per-group cardinality are too big for the in-memory paths
    * ([[exactQuantiles]] window-sorts each group in one task;
    * `percentile_disc` buffers a group's values in executor memory).
    * The per-(group, value) counts carry their running sums on the
    * prefix-sum path PARTITIONED BY GROUP; per-group target ranks come
    * from a ≤|groups|-row counts frame and the pick is one
    * equi-plus-range join (group equality + cum ≥ target — planned as
    * a sort-merge join on the group key) + one min per (group, q).
    * Same percentile_disc semantics, integer basis-point ranks, and
    * null handling as [[globalQuantiles]]. Returns
    * (group, q, rank, n_values, value) ordered by (group, q). */
  /** One-pass exact quantiles for SEVERAL numeric columns — the numeric
    * dataset profile ([[globalQuantiles]] per column would pay one
    * corpus scan each): the columns melt to (col_name, value) rows (a
    * constant ×p explode that partial aggregation collapses map-side)
    * and ride the per-group prefix-sum path with the COLUMN NAME as the
    * group. Values are cast to double (exact for the numeric widths
    * here; quantiles return actual data elements, so the cast is the
    * only representation step). Same rank discipline as the single-
    * column operators: integer basis-point targets, percentile_disc
    * semantics, no single-partition window. Gated by x260. */
  def globalQuantilesMultiCol(df: DataFrame, valueCols: Seq[String],
      quantilesBps: Seq[Int]): DataFrame = {
    require(valueCols.nonEmpty, "need at least one value column")
    val melted = df.select(explode(array(valueCols.map(c =>
        struct(lit(c).as("__col"), col(c).cast("double").as("__mv"))): _*))
        .as("__s"))
      .select(col("__s.__col").as("__col"), col("__s.__mv").as("__mv"))
    globalQuantilesBy(melted, "__col", "__mv", quantilesBps)
      .withColumnRenamed("__col", "col_name")
  }

  def globalQuantilesBy(df: DataFrame, groupCol: String, valueCol: String,
      quantilesBps: Seq[Int]): DataFrame = {
    require(quantilesBps.nonEmpty &&
      quantilesBps.forall(b => b >= 1 && b <= 10000),
      "quantiles must be basis points in [1, 10000]")
    val vals = df.select(col(groupCol).as("__g"), col(valueCol).as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy("__g", "__v").agg(count(lit(1)).as("__c"))
    val cum = Indexing.globalPrefixSums(vals, Seq("__g"),
        Seq(col("__v")), Seq("__c"))
      .withColumn("__cum", col("__c_excl") + col("__c"))
    val targets = vals.groupBy("__g").agg(sum(col("__c")).as("__n"))
      .select(col("__g").as("__tg"), col("__n"), explode(array(
        quantilesBps.map(b => lit(b.toLong)): _*)).as("__bps"))
      .withColumn("__t",
        expr("CAST((CAST(__bps AS DECIMAL(38,0)) * __n + 9999) " +
          "DIV 10000 AS BIGINT)"))
    cum.join(targets,
        col("__g") === col("__tg") && col("__cum") >= col("__t"))
      .groupBy("__g", "__bps", "__t", "__n")
      .agg(min(col("__v")).as("value"))
      .select(col("__g").as(groupCol),
        (col("__bps").cast("double") / lit(10000.0)).as("q"),
        col("__t").as("rank"), col("__n").as("n_values"), col("value"))
      .orderBy(groupCol, "q")
  }

  /** Cross-group quantile alignment table — the batch-effect view of a
    * score column (microarray-style quantile normalization, applied to
    * curation: heuristic quality scores are NOT comparable across
    * sources/ingest batches; mixing on raw thresholds over- or
    * under-selects whole sources). Per group: its own quantiles (via
    * [[exactQuantiles]] — bounded-memory interpolation) next to the
    * REFERENCE quantiles (unweighted mean of the group quantiles, the
    * classic normalization target) and the median shift. A downstream
    * mapper can pin each group's scores onto the reference curve;
    * monitoring reads `delta_p50` as per-source score drift.
    *
    * Scale shape: everything after exactQuantiles runs on the |groups|-row
    * frame; the reference rides an unbounded window THERE, never over
    * data. Group sums are DECIMAL-quantized; one rounded double division
    * per reference column. */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    require(qs.contains(0.5), "qs must include the median (0.5)")
    val gq = exactQuantiles(df, Seq(groupCol), valueCol, qs)
    val wAll = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val names = qs.map(q => s"p${math.round(q * 100)}")
    val withRef = names.foldLeft(gq) { (acc, p) =>
      acc.withColumn(s"ref_$p",
        round(sum(col(p).cast("decimal(28,14)")).over(wAll).cast("double") /
          count(lit(1)).over(wAll).cast("double"), 4))
    }
    withRef
      .withColumn("delta_p50", round(col("p50") - col("ref_p50"), 4))
      .orderBy(groupCol)
  }

  /** Robust outlier flags via the MAD modified z-score (Iglewicz-Hoaglin:
    * `0.6745·(x − median) / MAD`, |z| > threshold) — the mean/stddev
    * z-score's breakdown point is 0 (one extreme day drags the mean toward
    * itself and inflates the stddev, masking itself); median and MAD have
    * breakdown point 1/2, so up to half the group can be corrupt and the
    * flags still hold. Medians come from [[exactQuantiles]] (bounded
    * memory); the two |groups|-row median frames broadcast back. Signed z
    * is quantized `floor(z·10⁴ + 0.5)/10⁴` — the cross-engine-safe
    * rounding for negative values (round() half-up conventions differ).
    * MAD = 0 (over half the group identical) yields null z / no flag. */
  def madOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      threshold: Double = 3.5): DataFrame = {
    val gs = groupCols.map(col)
    val med = exactQuantiles(df, groupCols, valueCol, Seq(0.5))
      .select(gs :+ col("p50").as("group_median"): _*)
    val dev = df.join(broadcast(med), groupCols)
      .withColumn("__adev",
        abs(col(valueCol).cast("double") - col("group_median")))
    val mad = exactQuantiles(dev, groupCols, "__adev", Seq(0.5))
      .select(gs :+ col("p50").as("group_mad"): _*)
    dev.join(broadcast(mad), groupCols)
      .withColumn("robust_z", when(col("group_mad") > 0,
        floor((lit(0.6745) *
          (col(valueCol).cast("double") - col("group_median")) /
          col("group_mad")) * 10000 + 0.5) / 10000))
      .withColumn("is_anomaly",
        coalesce(abs(col("robust_z")) > threshold, lit(false)))
      .drop("__adev")
  }

  /** Per-cluster quality report for a vector clustering: size and inertia
    * (sum of squared L2 distance to the cell centroid). Centroid sums over
    * float-mantissa doubles are exact; every squared-distance term is
    * quantized to DECIMAL before the cell sum, so the aggregate is
    * order-free and cross-engine exact. One explode + two grouped
    * aggregates + a broadcast centroid join — never a pairwise pass. */
  def clusterInertia(df: DataFrame, idCol: String, cellCol: String,
      vecCol: String): DataFrame = {
    val e = df.select(col(idCol).as("__id"), col(cellCol).as("cell"),
      posexplode(expr(s"transform($vecCol, x -> cast(x as double))"))
        .as(Seq("pos", "v")))
    val cents = e.groupBy("cell", "pos").agg(avg(col("v")).as("cv"))
    e.join(broadcast(cents), Seq("cell", "pos"))
      .withColumn("__term",
        ((col("v") - col("cv")) * (col("v") - col("cv")))
          .cast("decimal(28,18)"))
      .groupBy("cell")
      .agg(countDistinct(col("__id")).as("n_vectors"),
        round(sum(col("__term")).cast("double"), 6).as("inertia"),
        round(sum(col("__term")).cast("double") /
          countDistinct(col("__id")), 6).as("avg_inertia"))
  }

  /** Simplified (centroid-based) silhouette per cluster — the
    * cluster-coherence grade [[clusterInertia]] can't give: inertia says
    * how TIGHT a cell is, silhouette says whether its points would rather
    * live in ANOTHER cell. Classic silhouette is O(n²) pairwise; the
    * simplified form (Hruschka et al.) replaces mean intra/inter-point
    * distances with distances to CENTROIDS — s = (b − a)/max(a, b) with
    * a = ‖x − c_own‖, b = min over other cells ‖x − c_other‖ — and is the
    * standard corpus-scale variant: O(n·d·k), no pairwise pass.
    *
    * Determinism: centroids from DECIMAL-quantized per-dim sums; each
    * squared-distance term DECIMAL-quantized before its per-(point, cell)
    * sum; `min` and the a/b comparison run on those exact DECIMALs; the
    * final s is one fixed double op sequence (sqrt is correctly rounded —
    * no libm drift). Mean-s terms are re-quantized before the cell sum.
    *
    * Returns one row per cluster: size, mean simplified silhouette,
    * and n_misassigned (points strictly closer to a foreign centroid —
    * the rows to re-cluster or audit first). A single-cluster input has
    * no foreign centroid: silhouette is undefined → null mean, 0
    * misassigned. Coincident own/other centroids (a = b = 0) score 0. */
  def simplifiedSilhouette(df: DataFrame, idCol: String, cellCol: String,
      vecCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(28,18)")
    val e = df.select(col(idCol).as("__id"), col(cellCol).cast("long").as("__cell"),
      posexplode(expr(s"transform($vecCol, x -> cast(x as double))"))
        .as(Seq("__pos", "__v")))
    val cents = e.groupBy(col("__cell").as("__c2"), col("__pos"))
      .agg((sum(dec(col("__v"))).cast("double") /
        count(lit(1)).cast("double")).as("__cv"))
    // distance of every point to EVERY centroid: d-keyed broadcast join,
    // one (point, cell) aggregate — O(n·d·k), never pairwise
    val d2 = e.join(broadcast(cents), Seq("__pos"))
      .groupBy(col("__id"), col("__cell"), col("__c2"))
      .agg(sum(dec((col("__v") - col("__cv")) * (col("__v") - col("__cv"))))
        .as("__d2"))
    val ab = d2.groupBy(col("__id"), col("__cell"))
      .agg(min(when(col("__c2") === col("__cell"), col("__d2"))).as("__a2"),
        min(when(col("__c2") =!= col("__cell"), col("__d2"))).as("__b2"))
    val s = ab.select(col("__id"), col("__cell"),
      col("__b2") < col("__a2") as "__mis",
      when(col("__b2").isNull, lit(null).cast("double"))
        .otherwise {
          val sa = sqrt(col("__a2").cast("double"))
          val sb = sqrt(col("__b2").cast("double"))
          when(greatest(sa, sb) === 0.0, lit(0.0))
            .otherwise((sb - sa) / greatest(sa, sb))
        }.as("__s"))
    s.groupBy(col("__cell").as("cell"))
      .agg(count(lit(1)).as("n_vectors"),
        round(sum(dec(col("__s"))).cast("double") /
          count(col("__s")).cast("double"), 6).as("mean_silhouette"),
        sum(when(col("__mis"), 1L).otherwise(0L)).as("n_misassigned"))
      .orderBy("cell")
  }

  /** Adjusted Rand Index between two cluster assignments of the same
    * items — the drift/stability grade for any partition-producing
    * operator (did one more LPA iteration actually change the
    * communities? does the cheap hash seeding recover the k-means cells?
    * did re-clustering after ingest move documents?): chance-corrected
    * pair agreement, 1 = identical partitions, ~0 = random relation.
    *
    * Exactness: ARI is pure pair counting — one (a, b) contingency
    * aggregate (the ONLY corpus-sized pass), then Σ C(n_ij,2) and the
    * margin sums over that small frame, every term an exact integer
    * (DECIMAL(38,0) sums — the C(n,2) terms stay integral because
    * n(n−1) is always even), and ONE final fixed double op sequence for
    * the index itself. Degenerate partitions (both all-singleton or both
    * one-cluster: expected = maximum agreement) have a 0 denominator and
    * report null.
    *
    * Returns one row: (n_items, pairs_both, ari). `pairs_both` (pairs
    * co-clustered in BOTH partitions) is reported as BIGINT — exact to
    * ~4.3B co-clustered-pair counts; the internal sums are DECIMAL(38,0)
    * far beyond that.
    *
    * EAGER — the one deliberate exception to the library's lazy-plan
    * contract: the contingency aggregate and its three bounded readers
    * execute AT CONSTRUCTION (one corpus-sized job) so the persisted
    * contingency table can be unpersisted before returning (LEAKCHECK
    * discipline — no cache entry outlives the call). Callers that build
    * plans without running them (dry runs, plan inspection) trigger the
    * job — and surface any failure — here, not at action time; the
    * returned 1-row frame itself is a local, job-free plan. */
  def adjustedRandIndex(df: DataFrame, idCol: String, aCol: String,
      bCol: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val ct = df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nF = ct.agg(sum(d38(col("__n"))).as("__nt"),
      sum(d38(expr("__n * (__n - 1) div 2"))).as("__sij"))
    val saF = ct.groupBy("__a").agg(sum("__n").as("__na"))
      .agg(sum(d38(expr("__na * (__na - 1) div 2"))).as("__sa"))
    val sbF = ct.groupBy("__b").agg(sum("__n").as("__nb"))
      .agg(sum(d38(expr("__nb * (__nb - 1) div 2"))).as("__sb"))
    val d = (c: Column) => c.cast("double")
    // The three aggregates are the only readers of the persisted `ct`;
    // materialize their 1-row cross product eagerly so ct can be
    // unpersisted HERE (no leaked cache entry per call — LEAKCHECK
    // discipline) instead of living until some caller-side action.
    // Rebuilding from the collected row keeps the downstream decimal /
    // double op sequence byte-identical to the lazy form.
    val combined = nF.crossJoin(saF).crossJoin(sbF)
    val row = combined.collect()(0)
    ct.unpersist()
    df.sparkSession
      .createDataFrame(java.util.Arrays.asList(row), combined.schema)
      .withColumn("__cn2", d38(expr("__nt * (__nt - 1) / 2")))
      .withColumn("__e", d(col("__sa")) * d(col("__sb")) / d(col("__cn2")))
      .withColumn("__den",
        (d(col("__sa")) + d(col("__sb"))) / lit(2.0) - col("__e"))
      .select(col("__nt").cast("long").as("n_items"),
        col("__sij").cast("long").as("pairs_both"),
        when(col("__den") === 0.0, lit(null).cast("double"))
          .otherwise(round((d(col("__sij")) - col("__e")) / col("__den"), 6))
          .as("ari"))
  }

  /** k-anonymity audit over quasi-identifier columns: one grouped count of
    * equivalence classes, then a 1-row report — min class size (the
    * dataset's k), violating classes, and rows at re-identification risk.
    * The class frame is |distinct QID combos| rows, never the fact size. */
  def kAnonymity(df: DataFrame, qidCols: Seq[String], k: Long): DataFrame = {
    df.groupBy(qidCols.map(col): _*)
      .agg(count(lit(1)).as("__sz"))
      .agg(min(col("__sz")).as("min_class_size"),
        count(lit(1)).as("n_classes"),
        sum(when(col("__sz") < k, 1L).otherwise(0L)).as("n_violating_classes"),
        sum(when(col("__sz") < k, col("__sz")).otherwise(0L)).as("n_rows_at_risk"))
      .select(lit(k).as("k"), col("min_class_size"), col("n_classes"),
        col("n_violating_classes"), col("n_rows_at_risk"),
        (col("min_class_size") >= k).as("is_k_anonymous"))
  }

  /** ε-differentially-private count release (Laplace mechanism, Dwork et
    * al. 2006, "Calibrating Noise to Sensitivity"): each group's count is
    * released as count + Laplace(1/ε) noise — sensitivity 1 for a
    * per-group counting query — so no individual row's presence shifts any
    * released count's distribution by more than e^ε. The fourth privacy
    * lens after [[kAnonymity]]/[[lDiversity]]/t-closeness: those AUDIT a
    * table for release, this RELEASES aggregate statistics directly.
    *
    * Noise is seeded-deterministic (one release per seed — re-running with
    * the same seed must NOT spend the privacy budget twice, which a fresh
    * random draw silently would): u = md5(seed:group) mapped into
    * (−0.5, 0.5), noise = −(1/ε)·sign(u)·ln(1 − 2|u|), the exact inverse
    * Laplace CDF. The ln output quantizes to DECIMAL(24,12) before the
    * scale multiply (the [[graft.functions.Curation]] DSIR discipline:
    * downstream arithmetic is exact decimal, engine-portable). One grouped
    * count + map-side expressions — |groups| rows, never the fact size.
    *
    * HARD preconditions for the e^ε guarantee (determinism trades them in):
    *  - '''the seed is secret.''' Noise is a public function of
    *    (seed, group); anyone who learns the seed denoises every released
    *    count exactly.
    *  - '''one seed ↔ one dataset version.''' Releasing two ADJACENT
    *    datasets (one row added/removed) under the same seed draws
    *    IDENTICAL noise per group, so the difference of the two releases
    *    reveals the exact count delta — a textbook differencing attack.
    *    Bind the seed to the snapshot it releases: pass the snapshot id
    *    as `datasetVersion` (mixed into the noise input as
    *    "seed:version"), or mint a fresh secret seed per version.
    *  - '''track cumulative ε.''' Distinct seeds over the same data
    *    compose: ε adds up. [[PrivacyLedger]] wraps this primitive with
    *    budget accounting and refuses over-budget releases.
    * (A keyed PRF — HMAC under a secret key — would carry the same
    * structure; md5 here is the engine-portability compromise, which is
    * exactly why the seed must be treated as the key.) */
  def dpCounts(df: DataFrame, groupCol: String, epsilon: Double,
      seed: String, datasetVersion: String = ""): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    // version-bound tag; the empty default keeps pre-versioned releases
    // (and their oracles) byte-stable
    val tag = if (datasetVersion.isEmpty) seed else s"$seed:$datasetVersion"
    // (h + 0.5)/2^24 − 0.5 ∈ (−0.5, 0.5): the half-up offset keeps both
    // endpoints open, so ln(1 − 2|u|) is always finite
    val u = ((conv(substring(md5(concat(lit(tag + ":"),
        col(groupCol).cast("string"))), 1, 6), 16, 10).cast("double") +
      lit(0.5)) / lit(16777216.0)) - lit(0.5)
    // decimal widths chosen so every op is EXACT (no precision-loss
    // adjustment): mag = (20,14)×(10,4) → (31,18); count(14,0) ± mag →
    // (33,18) — all under 38 in Spark and DuckDB alike
    val nDec = col("__n").cast("decimal(14,0)")
    val lnq = log(lit(1.0) - lit(2.0) * abs(col("__u")))
      .cast("decimal(20,14)")
    val mag = (-lnq) * lit(1.0 / epsilon).cast("decimal(10,4)")
    df.groupBy(groupCol)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__u", u)
      .select(col(groupCol),
        round(when(col("__u") >= 0, nDec + mag).otherwise(nDec - mag)
          .cast("double"), 4).as("n_released"),
        lit(epsilon).as("epsilon"))
  }

  /** l-diversity audit — [[kAnonymity]]'s companion: k-anonymity bounds how
    * small an equivalence class can get, l-diversity bounds how HOMOGENEOUS
    * its sensitive attribute can be (a class of 50 rows that all share one
    * diagnosis still leaks). One grouped count-distinct over the QID classes
    * (|classes| rows, never the fact size), then a 1-row report. */
  def lDiversity(df: DataFrame, qidCols: Seq[String], sensitiveCol: String,
      l: Long): DataFrame = {
    df.groupBy(qidCols.map(col): _*)
      .agg(countDistinct(col(sensitiveCol)).as("__nd"),
        count(lit(1)).as("__sz"))
      .agg(min(col("__nd")).as("min_diversity"),
        count(lit(1)).as("n_classes"),
        sum(when(col("__nd") < l, 1L).otherwise(0L)).as("n_violating_classes"),
        sum(when(col("__nd") < l, col("__sz")).otherwise(0L)).as("n_rows_at_risk"))
      .select(lit(l).as("l"), col("min_diversity"), col("n_classes"),
        col("n_violating_classes"), col("n_rows_at_risk"),
        (col("min_diversity") >= l).as("is_l_diverse"))
  }

  /** t-closeness audit — the third privacy lens after [[kAnonymity]] and
    * [[lDiversity]]: a class can be large AND diverse yet still leak if its
    * sensitive-attribute DISTRIBUTION differs sharply from the corpus-wide
    * one. Per equivalence class this reports the total-variation distance
    * TVD(class, global) = ½ Σ_s |n_gs/n_g − N_s/N| and flags classes with
    * TVD > tNum/tDen.
    *
    * Exactness: everything is integer until the very end. Per class,
    * 2·n_g·N·TVD = Σ_{s∈class} |n_gs·N − N_s·n_g| + (N − Σ_{s∈class} N_s)·n_g
    * (the second term folds in every sensitive value ABSENT from the class,
    * so no class × sensitive-domain cross join is needed). Products are
    * DECIMAL so a trillion-row corpus can't overflow a long; the violation
    * test cross-multiplies by the rational threshold (no division); the
    * reported `tvd` is ONE exact-integer-to-double division, bit-identical
    * in any engine.
    *
    * Scale shape: two grouped counts (cells, classes) + a broadcast join of
    * the |sensitive-domain| global frame + the 1-row total — the widest
    * frame is |distinct QID×sensitive combos| rows, never the fact size. */
  def tCloseness(df: DataFrame, qidCols: Seq[String], sensitiveCol: String,
      tNum: Long, tDen: Long): DataFrame = {
    require(tNum >= 0 && tDen > 0, s"threshold $tNum/$tDen out of range")
    val dec = (c: Column) => c.cast("decimal(19,0)")
    val cell = df.groupBy((qidCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__ngs"))
    val cls = cell.groupBy(qidCols.map(col): _*)
      .agg(sum(col("__ngs")).as("__ng"))
    val glob = df.groupBy(col(sensitiveCol))
      .agg(count(lit(1)).as("__ns"))
    val tot = df.agg(count(lit(1)).as("__n"))
    cell.join(cls, qidCols)
      .join(broadcast(glob), Seq(sensitiveCol))
      .crossJoin(broadcast(tot))
      .groupBy(qidCols.map(col): _*)
      .agg(first(col("__ng")).as("class_size"),
        (sum(abs(dec(col("__ngs")) * dec(col("__n")) -
            dec(col("__ns")) * dec(col("__ng")))) +
          (dec(first(col("__n"))) - dec(sum(col("__ns")))) *
            dec(first(col("__ng")))).as("__num"),
        (dec(lit(2L)) * dec(first(col("__ng"))) *
          dec(first(col("__n")))).as("__den"))
      .select(qidCols.map(col) ++ Seq(
        col("class_size"),
        round(col("__num").cast("double") / col("__den").cast("double"), 6)
          .as("tvd"),
        (col("__num") * dec(lit(tDen)) > col("__den") * dec(lit(tNum)))
          .as("violates_t")): _*)
  }

  /** Two-feature ridge regression (plus intercept) via normal equations —
    * the distributed "train a linear scorer" pattern: ONE fused aggregate
    * accumulates every X'X / X'y / y'y moment as an exact DECIMAL sum
    * (map-side combined, order-free, cross-engine identical), then the 3×3
    * system solves in closed form by Cramer's rule — no second data pass,
    * no driver-side matrix library, no iteration. R² comes from the same
    * moments (SSE = y'y − 2w'X'y + w'X'Xw). The identical shape trains any
    * small-k linear quality classifier at corpus scale: k² moments in one
    * pass, a k×k solve that is O(1) regardless of data size.
    *
    * λ is added to the two feature diagonals (not the intercept row), the
    * textbook ridge normalization. Every double operation after the sums
    * happens in ONE fixed written order, so the oracle replays the exact
    * bits. */
  def ridge2(df: DataFrame, x1Col: String, x2Col: String, yCol: String,
      lambda: Double): DataFrame = {
    val x1 = col(x1Col); val x2 = col(x2Col); val y = col(yCol)
    // n must count exactly the rows the moment sums see: a null in ANY
    // input column silently drops that row from sum() but not from
    // count(lit(1)), skewing every moment ratio — so drop such rows first
    val m = df.filter(x1.isNotNull && x2.isNotNull && y.isNotNull).agg(
      count(lit(1)).cast("double").as("n"),
      sum(dec(x1)).cast("double").as("s1"),
      sum(dec(x2)).cast("double").as("s2"),
      sum(dec(y)).cast("double").as("sy"),
      sum(dec(x1 * x1)).cast("double").as("s11"),
      sum(dec(x2 * x2)).cast("double").as("s22"),
      sum(dec(x1 * x2)).cast("double").as("s12"),
      sum(dec(x1 * y)).cast("double").as("s1y"),
      sum(dec(x2 * y)).cast("double").as("s2y"),
      sum(dec(y * y)).cast("double").as("syy"))
    // A = [[a,b,c],[b,d,e],[c,e,f]], rhs = [p,q,r] — written once, reused
    // for every Cramer determinant in the same operation order as the SQL
    val a = col("s11") + lit(lambda); val b = col("s12"); val c = col("s1")
    val d = col("s22") + lit(lambda); val e = col("s2"); val f = col("n")
    val p = col("s1y"); val q = col("s2y"); val r = col("sy")
    val det = a * (d * f - e * e) - b * (b * f - e * c) + c * (b * e - d * c)
    val det1 = p * (d * f - e * e) - b * (q * f - e * r) + c * (q * e - d * r)
    val det2 = a * (q * f - e * r) - p * (b * f - e * c) + c * (b * r - q * c)
    val det3 = a * (d * r - q * e) - b * (b * r - q * c) + p * (b * e - d * c)
    val w1 = det1 / det; val w2 = det2 / det; val w0 = det3 / det
    val sse = col("syy") -
      lit(2.0) * (w1 * col("s1y") + w2 * col("s2y") + w0 * col("sy")) +
      (w1 * w1 * col("s11") + w2 * w2 * col("s22") + w0 * w0 * col("n") +
        lit(2.0) * w1 * w2 * col("s12") + lit(2.0) * w1 * w0 * col("s1") +
        lit(2.0) * w2 * w0 * col("s2"))
    val sst = col("syy") - col("sy") * col("sy") / col("n")
    // CaseWhen evaluates lazily, so a singular system (det = 0: constant
    // feature, empty frame) yields nulls instead of an ANSI divide error
    val guard = (o: Column) => when(det === 0.0, lit(null)).otherwise(o)
    m.select(col("n").cast("long").as("n_rows"),
      guard(round(w1, 6)).as("w_x1"), guard(round(w2, 6)).as("w_x2"),
      guard(round(w0, 6)).as("intercept"),
      when(det === 0.0 || sst === 0.0, lit(null))
        .otherwise(round(lit(1.0) - sse / sst, 6)).as("r2"))
  }

  /** Pearson chi-square test of independence between two categorical
    * columns, with Cramér's V effect size — the distribution-shift /
    * association audit (is `source` independent of `lang`? did the
    * stratification skew?). One grouped count over the fact table, then
    * everything runs on the tiny |R|×|C| contingency frame: margins and
    * totals re-aggregate from the OBSERVED cells (persisted — the corpus
    * is scanned exactly once), the full grid materializes as
    * margins × margins so absent cells contribute their expected mass,
    * and every (O−E)²/E term is DECIMAL-quantized so the statistic is
    * order-free and cross-engine exact. sqrt is IEEE correctly rounded,
    * so Cramér's V replays bit-identically too. */
  def chiSquare(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val obs = df.groupBy(col(rowCol).as("__rk"), col(colCol).as("__ck"))
      .agg(count(lit(1)).as("__o")).persist()
    val rt = obs.groupBy("__rk").agg(sum(col("__o")).as("__rtot"))
    val ct = obs.groupBy("__ck").agg(sum(col("__o")).as("__ctot"))
    val n0 = obs.agg(sum(col("__o")).as("__n"))
    val dims = rt.agg(count(lit(1)).as("__nr"))
      .crossJoin(ct.agg(count(lit(1)).as("__nc")))
    val od = (c: Column) => c.cast("double")
    val cells = rt.crossJoin(broadcast(ct))
      .join(obs, Seq("__rk", "__ck"), "left")
      .crossJoin(broadcast(n0))
      .select(coalesce(col("__o"), lit(0L)).as("__oc"),
        (od(col("__rtot")) * od(col("__ctot")) / od(col("__n"))).as("__e"),
        col("__n"))
    cells
      .agg(first(col("__n")).as("__nl"), count(lit(1)).as("__cells"),
        sum(((od(col("__oc")) - col("__e")) * (od(col("__oc")) - col("__e")) /
          col("__e")).cast("decimal(28,18)")).as("__chi2d"))
      .crossJoin(broadcast(dims))
      .select(col("__nl").cast("long").as("n_rows"),
        col("__cells").cast("long").as("n_cells"),
        ((col("__nr") - 1) * (col("__nc") - 1)).cast("long").as("dof"),
        round(col("__chi2d").cast("double"), 6).as("chi2"),
        // a 1×C or R×1 table has no association to normalize — null V
        when((col("__nr") - 1) * (col("__nc") - 1) === 0, lit(null))
          .otherwise(round(sqrt(col("__chi2d").cast("double") /
            (col("__nl").cast("double") *
              least(col("__nr") - 1, col("__nc") - 1).cast("double"))), 6))
          .as("cramers_v"))
  }

  /** Two-sample Kolmogorov–Smirnov distance — the continuous-column
    * companion to [[chiSquare]] (did `src0`'s length distribution drift
    * from `src1`'s?). KS = max_v |F_A(v) − F_B(v)| computed EXACTLY: the
    * per-value frame holds one row per distinct value with both groups'
    * counts, a cumulative window builds both CDFs in one pass, and the
    * sup-distance compares integer cross-products |c_A·n_B − c_B·n_A|
    * (DECIMAL, overflow-safe) — the only division is the final reported
    * statistic.
    *
    * Scale shape: the per-value frame is |distinct values| rows — which
    * for a CONTINUOUS column is corpus-sized, so the running CDFs ride
    * [[Indexing.globalPrefixSums]] (range shuffle + parallel local sums +
    * broadcast offsets), never a single-partition global-order window.
    * Long counts sum exactly, so the distributed prefix sums equal the
    * old one-task window bit for bit. */
  def ksTest(df: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(19,0)")
    // persisted: both the CDF pass and the 1-row totals read this tiny
    // frame, and without the memo each would rescan the corpus
    val pv = df
      .filter(col(groupCol) === groupA || col(groupCol) === groupB)
      .groupBy(col(valueCol).as("__v"))
      .agg(sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("__ca"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("__cb"))
      .persist()
    val cum = Indexing.globalPrefixSums(pv, Nil, Seq(col("__v")),
        Seq("__ca", "__cb"))
      .select((col("__ca_excl") + col("__ca")).as("__c1"),
        (col("__cb_excl") + col("__cb")).as("__c2"))
    val tot = pv.agg(sum(col("__ca")).as("__n1"), sum(col("__cb")).as("__n2"))
    cum.crossJoin(broadcast(tot))
      .select(abs(dec(col("__c1")) * dec(col("__n2")) -
          dec(col("__c2")) * dec(col("__n1"))).as("__d"),
        col("__n1"), col("__n2"))
      .agg(first(col("__n1")).as("__n1"), first(col("__n2")).as("__n2"),
        max(col("__d")).as("__num"))
      .select(col("__n1").cast("long").as("n_a"),
        col("__n2").cast("long").as("n_b"),
        col("__num").cast("long").as("ks_num"),
        when(col("__n1") === 0 || col("__n2") === 0, lit(null))
          .otherwise(round(col("__num").cast("double") /
            (dec(col("__n1")) * dec(col("__n2"))).cast("double"), 6))
          .as("ks"))
  }

  /** Benford first-digit audit — the classic fabricated-data detector for
    * positive numeric columns spanning several orders of magnitude.
    * Reports, per leading digit, the observed share vs Benford's
    * log10(1 + 1/d) expectation.
    *
    * The leading digit comes from the DECIMAL STRING of floor(value) —
    * integer-to-string is unambiguous in every engine, where
    * floor(log10(x)) can flip by one ulp near powers of ten and
    * double-to-string formats diverge. One grouped count (9 groups); the
    * observed share is one exact-integer division per digit. */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val digit = substring(floor(col(valueCol)).cast("long").cast("string"), 1, 1)
      .cast("int")
    val counts = df.filter(col(valueCol) >= 1.0)
      .groupBy(digit.as("digit"))
      .agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("__t"))
    counts.crossJoin(broadcast(tot))
      .select(col("digit").cast("long").as("digit"), col("n"),
        round(col("n").cast("double") / col("__t").cast("double"), 6)
          .as("observed"),
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6)
          .as("benford"))
  }

  /** Mann–Whitney U rank-sum test with tie correction — the rank-based
    * "did group B's values shift up?" test that pairs with [[ksTest]]
    * (KS sees any shape change; U sees location shift, robust to
    * outliers). Like ksTest, everything collapses to one row per distinct
    * value; average ranks with ties stay EXACT by accumulating 2·R_A =
    * Σ c_A·(2·S_below + c + 1) as integers (DECIMAL, overflow-safe), so
    * the reported U is exact and only the normal-approximation z-score
    * (tie-corrected σ) is double — assembled in one fixed operation
    * order. The below-rank running count rides
    * [[Indexing.globalPrefixSums]] (exact Long sums — bit-identical to a
    * global-order window) because the distinct-value frame of a
    * continuous column is corpus-sized. */
  def mannWhitney(df: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val pv = df
      .filter(col(groupCol) === groupA || col(groupCol) === groupB)
      .groupBy(col(valueCol).as("__v"))
      .agg(sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("__ca"),
        count(lit(1)).as("__c"))
    val cum = Indexing.globalPrefixSums(pv, Nil, Seq(col("__v")),
        Seq("__c"))
      .select(col("__ca"), col("__c"), col("__c_excl").as("__s"))
    val contrib = cum.agg(
      sum(dec(col("__ca")) *
        (dec(lit(2L)) * dec(col("__s")) + dec(col("__c")) + dec(lit(1L))))
        .as("__r2"),
      sum(dec(col("__ca"))).as("__n1"),
      sum(dec(col("__c")) - dec(col("__ca"))).as("__n2"),
      sum(dec(col("__c")) * dec(col("__c")) * dec(col("__c")) -
        dec(col("__c"))).as("__tsum"))
    val n1 = col("__n1").cast("double"); val n2 = col("__n2").cast("double")
    val n = n1 + n2
    val u = col("__u2").cast("double") / lit(2.0)
    val mu = n1 * n2 / lit(2.0)
    val sigma = sqrt(n1 * n2 / lit(12.0) *
      ((n + lit(1.0)) - col("__tsum").cast("double") / (n * (n - lit(1.0)))))
    contrib
      .select(col("__n1"), col("__n2"), col("__tsum"),
        (col("__r2") - col("__n1") * (col("__n1") + dec(lit(1L)))).as("__u2"))
      .select(col("__n1").cast("long").as("n_a"),
        col("__n2").cast("long").as("n_b"),
        col("__u2").cast("long").as("u2"),
        round(u, 6).as("u"),
        // all values tied in one point mass → σ = 0, z undefined
        when(col("__n1") === 0 || col("__n2") === 0 ||
            sigma === 0.0, lit(null))
          .otherwise(round((u - mu) / sigma, 6)).as("z"))
  }

  /** Per-group chi-square goodness-of-fit drift — [[chiSquare]] unrolled
    * into a monitoring TIME SERIES: for every group (a day, a shard, an
    * ingest batch) the chi-square distance between its category mix and
    * the pooled corpus mix. The drift dashboard query: a spike on one day
    * means that day's event/source/language mix shifted.
    *
    * Same scale shape as chiSquare: ONE grouped count over the fact
    * table, margins re-aggregated from the persisted cell frame, the
    * group × category grid materialized so absent categories contribute
    * their expected mass, DECIMAL-quantized (O−E)²/E terms. Output is one
    * row per group. */
  def mixDrift(df: DataFrame, groupCol: String, catCol: String): DataFrame = {
    val obs = df.groupBy(col(groupCol).as("__g"), col(catCol).as("__c"))
      .agg(count(lit(1)).as("__o")).persist()
    val gt = obs.groupBy("__g").agg(sum(col("__o")).as("__gtot"))
    val ctv = obs.groupBy("__c").agg(sum(col("__o")).as("__ctot"))
    val n0 = obs.agg(sum(col("__o")).as("__n"))
    val od = (c: Column) => c.cast("double")
    gt.crossJoin(broadcast(ctv))
      .join(obs, Seq("__g", "__c"), "left")
      .crossJoin(broadcast(n0))
      .select(col("__g"), coalesce(col("__o"), lit(0L)).as("__oc"),
        (od(col("__gtot")) * od(col("__ctot")) / od(col("__n"))).as("__e"))
      .groupBy(col("__g"))
      .agg(sum(col("__oc")).as("__ng"),
        sum(((od(col("__oc")) - col("__e")) * (od(col("__oc")) - col("__e")) /
          col("__e")).cast("decimal(28,18)")).as("__chi2d"))
      .select(col("__g").as(groupCol), col("__ng").cast("long").as("n_rows"),
        round(col("__chi2d").cast("double"), 6).as("chi2"))
  }

  /** CUSUM changepoint scan over an ordered counts series — "WHEN did the
    * rate shift?" (the complement to [[mixDrift]]'s "did the mix shift?").
    * The cumulative deviation from a uniform rate is kept as the exact
    * integer n·P_t − t·T (P_t prefix sum, T total, t row index); its max
    * |·| normalized by n·T is a KS-style uniformity distance in [0,1], and
    * the argmax row is the changepoint (ties → earliest). One window pass
    * over the per-bucket series (|days| rows), one final division.
    * The single-partition window here is BOUNDED BY CONSTRUCTION:
    * callers hand a per-bucket (daily/hourly) series, |buckets| rows,
    * never raw events — the one shape where a global-order window is
    * free (contrast [[ksTest]]/[[giniConcentration]], whose value/key
    * domains are corpus-sized and ride the distributed helpers). */
  def cusumChangepoint(daily: DataFrame, orderCol: String,
      valueCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val wOrd = Window.orderBy(orderCol)
    val wAll = Window.orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val scanned = daily.select(col(orderCol).as("__d"),
        sum(col(valueCol)).over(wOrd.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)).as("__p"),
        row_number().over(wOrd).as("__t"),
        sum(col(valueCol)).over(wAll).as("__tt"),
        count(lit(1)).over(wAll).as("__n"))
      .select(col("__d"), col("__tt"), col("__n"),
        abs(dec(col("__n")) * dec(col("__p")) -
          dec(col("__t")) * dec(col("__tt"))).as("__dev"))
    scanned.orderBy(desc("__dev"), col("__d")).limit(1)
      .select(col("__n").cast("long").as("n_buckets"),
        col("__tt").cast("long").as("total"),
        col("__d").as("changepoint"),
        col("__dev").cast("long").as("max_dev"),
        when(col("__tt") === 0, lit(null))
          .otherwise(round(col("__dev").cast("double") /
            (col("__n").cast("double") * col("__tt").cast("double")), 6))
          .as("uniformity_distance"))
  }

  /** Gini coefficient of a per-key count distribution — the concentration
    * audit (is event volume dominated by a handful of users? is one
    * source 90 % of the corpus?). Exact closed form over the ranked
    * counts: G = (2·Σ t·x_t − (n+1)·Σx) / (n·Σx) with row_number ranks
    * (ties contribute identically under any stable order, so the key
    * tiebreak only pins determinism). Integer/DECIMAL throughout, ONE
    * final division. The per-key frame is corpus-sized for a
    * high-cardinality key (users, urls), so the global rank rides
    * [[Indexing.globalIndexBy]] — the (count, key) tuple is unique, so
    * the distributed index equals the old single-partition row_number
    * exactly. */
  def giniConcentration(df: DataFrame, keyCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val counts = df.groupBy(col(keyCol).as("__k"))
      .agg(count(lit(1)).as("__x"))
    val ranked = Indexing.globalIndexBy(counts, Seq("__x", "__k"))
      .select(col("__x"), col("global_idx").as("__t"))
    ranked.agg(count(lit(1)).as("__n"), sum(col("__x")).as("__sx"),
        sum(dec(col("__t")) * dec(col("__x"))).as("__stx"))
      .select(col("__n").cast("long").as("n_keys"),
        col("__sx").cast("long").as("total"),
        when(col("__n") === 0 || col("__sx") === 0, lit(null))
          .otherwise(round(
            (dec(lit(2L)) * col("__stx") -
              (dec(col("__n")) + dec(lit(1L))) * dec(col("__sx")))
              .cast("double") /
            (dec(col("__n")) * dec(col("__sx"))).cast("double"), 6))
          .as("gini"))
  }

  /** Autocorrelation function over an ordered integer series — the lag
    * diagnostic behind [[graft.operators.Resample.seasonalDecompose]]'s
    * period choice (a weekly rhythm shows as an ACF spike at lag 7). Per
    * lag L, the Pearson correlation of (y_t, y_{t−L}) pairs: all seven
    * lag columns come from ONE window pass (an exploded lag-struct
    * array, no per-lag jobs), moments accumulate as exact decimals per
    * lag group, and the closed-form r uses [[correlationMatrix]]'s exact
    * operation order. */
  def autocorrelation(daily: DataFrame, orderCol: String, valueCol: String,
      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1 && maxLag <= 30, s"maxLag=$maxLag out of [1,30]")
    val w = Window.orderBy(orderCol)
    // window lags in a plain projection first (generators can't host
    // window expressions), then the exploded lag-struct array
    val lagged = daily.select(col(valueCol).as("__y") +:
      (1 to maxLag).map(l => lag(col(valueCol), l).over(w).as(s"__l$l")): _*)
    val lagStructs = (1 to maxLag).map(l =>
      struct(lit(l).as("lag"), col(s"__l$l").as("ylag")))
    val pairs = lagged
      .select(col("__y"), explode(array(lagStructs: _*)).as("__p"))
      .select(col("__p.lag").as("lag"), col("__y"), col("__p.ylag").as("__x"))
      // both sides non-null: n must match what the moment sums include
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val m = pairs.groupBy("lag").agg(
      count(lit(1)).cast("double").as("n"),
      sum(dec(col("__x"))).cast("double").as("sx"),
      sum(dec(col("__y"))).cast("double").as("sy"),
      sum(dec(col("__x") * col("__x"))).cast("double").as("sxx"),
      sum(dec(col("__y") * col("__y"))).cast("double").as("syy"),
      sum(dec(col("__x") * col("__y"))).cast("double").as("sxy"))
    val denom = sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
      (col("n") * col("syy") - col("sy") * col("sy")))
    m.select(col("lag").cast("long").as("lag"),
        col("n").cast("long").as("n_pairs"),
        when(denom === 0.0, lit(null))
          .otherwise(round((col("n") * col("sxy") - col("sx") * col("sy")) /
            denom, 6)).as("acf"))
      .orderBy("lag")
  }

  /** Cohen's kappa — chance-corrected agreement between two binary raters
    * (two quality classifiers, a model vs a heuristic, annotator vs
    * annotator). One fused aggregate builds the 2×2 confusion table; kappa
    * is assembled from the four integer counts in closed form,
    * κ = (N·(a+d) − ((a+b)(a+c) + (c+d)(b+d))) / (N² − (...)), with DECIMAL
    * products (overflow-safe at any corpus size) and ONE final
    * integer-to-double division — bit-identical cross-engine. */
  def cohenKappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(19,0)")
    val one = (p: Column) => coalesce(sum(when(p, 1L).otherwise(0L)), lit(0L))
    df.agg(
        one(raterA && raterB).as("n_both"),
        one(raterA && !raterB).as("n_a_only"),
        one(!raterA && raterB).as("n_b_only"),
        one(!raterA && !raterB).as("n_neither"))
      .select(col("*"),
        (dec(col("n_both") + col("n_a_only") + col("n_b_only") +
          col("n_neither"))).as("__n"),
        (dec(col("n_both") + col("n_a_only")) *
            dec(col("n_both") + col("n_b_only")) +
          dec(col("n_b_only") + col("n_neither")) *
            dec(col("n_a_only") + col("n_neither"))).as("__pe_num"))
      .select(col("n_both"), col("n_a_only"), col("n_b_only"),
        col("n_neither"), col("__n").cast("long").as("n_docs"),
        // pe = 1 (one rater constant over a degenerate corpus) → 0/0:
        // kappa is undefined there, so emit null rather than divide
        when(col("__n") * col("__n") === col("__pe_num"), lit(null))
          .otherwise(round((col("__n") * dec(col("n_both") + col("n_neither")) -
              col("__pe_num")).cast("double") /
            (col("__n") * col("__n") - col("__pe_num")).cast("double"), 6))
          .as("kappa"))
  }

  /** Threshold-free ranking quality of a binary scorer — the evaluation
    * side of the quality-classifier story ([[graft.functions.Curation]]
    * trains and scores; this grades the scores): ROC-AUC, Gini, and the
    * Kolmogorov–Smirnov separation statistic from ONE pass.
    *
    * Everything reduces to the tie-corrected rank-sum ([[mannWhitney]]'s
    * machinery pointed at a score column): AUC = U₁/(n₁n₀) with tied
    * scores contributing their average rank, so the statistic is
    * EXACTLY the probability a random positive outranks a random negative
    * (ties count ½) — no threshold sweep, no trapezoid approximation.
    * KS is evaluated only at score-group boundaries (where the empirical
    * CDFs actually step), as max |TPR − FPR| — integer-exact via
    * |cumPos·n₀ − cumNeg·n₁|.
    *
    * Scale shape: one hash groupBy collapses the corpus to its DISTINCT
    * score values; the running CDFs over that collapsed frame go through
    * [[Indexing.globalPrefixSums]] (range shuffle + local prefix sums +
    * broadcast offsets), so a CONTINUOUS score column — where the
    * distinct-score frame is itself corpus-sized — never funnels through
    * a single-partition window. All rank arithmetic in DECIMAL(38,0) —
    * exact at any corpus size — with ONE final double division per
    * statistic. Degenerate corpora (a single class) emit null metrics
    * rather than 0/0. */
  def binaryAuc(df: DataFrame, scoreCol: String, label: Column): DataFrame =
    binaryAucBy(df.withColumn("__slice", lit(0L)), "__slice", scoreCol,
      label).drop("__slice")

  /** Per-slice [[binaryAuc]] — the scorer-drift view: one AUC/Gini/KS row
    * per group (source, language, ingest day), so a scorer that holds up
    * globally but collapses on one slice is visible. Both variants share
    * the range-partitioned prefix-sum path (the ungrouped one delegates
    * here with a constant slice), so even a single slice holding the
    * whole corpus of distinct continuous scores stays parallel. */
  def binaryAucBy(df: DataFrame, groupCol: String, scoreCol: String,
      label: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val pv = df
      .groupBy(col(groupCol), col(scoreCol).as("__v"))
      .agg(sum(when(label, 1L).otherwise(0L)).as("__cp"),
        count(lit(1)).as("__c"))
    // Running pos/neg CDF counts via the range-partitioned prefix sum —
    // NOT `SUM() OVER (ORDER BY __v)` windows: with a CONTINUOUS score
    // column the distinct-score frame is corpus-sized, and the ungrouped
    // delegate (constant slice) would funnel all of it through one task.
    // Group totals are a hash aggregate + broadcast join, not a window.
    val pre = Indexing.globalPrefixSums(pv, Seq(groupCol),
      Seq(col("__v")), Seq("__cp", "__c"))
    val tot = pre.groupBy(col(groupCol))
      .agg(sum(col("__cp")).as("__n1t"),
        (sum(col("__c")) - sum(col("__cp"))).as("__n0t"))
    val cum = pre.join(broadcast(tot), Seq(groupCol))
      .select(col(groupCol), col("__cp"), col("__c"),
        col("__c_excl").as("__s"),
        (col("__cp_excl") + col("__cp")).as("__p"),
        ((col("__c_excl") + col("__c")) -
          (col("__cp_excl") + col("__cp"))).as("__g"),
        col("__n1t"), col("__n0t"))
    cum.groupBy(col(groupCol))
      .agg(
        sum(dec(col("__cp")) *
          (dec(lit(2L)) * dec(col("__s")) + dec(col("__c")) + dec(lit(1L))))
          .as("__r2"),
        sum(dec(col("__cp"))).as("__n1"),
        sum(dec(col("__c")) - dec(col("__cp"))).as("__n0"),
        max(abs(dec(col("__p")) * dec(col("__n0t")) -
          dec(col("__g")) * dec(col("__n1t")))).as("__ksnum"))
      .select(col(groupCol), col("__n1").cast("long").as("n_pos"),
        col("__n0").cast("long").as("n_neg"),
        (col("__r2") - col("__n1") * (col("__n1") + dec(lit(1L))))
          .cast("long").as("u2"),
        when(col("__n1") === 0 || col("__n0") === 0, lit(null))
          .otherwise(round(
            (col("__r2") - col("__n1") * (col("__n1") + dec(lit(1L))))
              .cast("double") /
              (lit(2.0) * col("__n1").cast("double") *
                col("__n0").cast("double")), 6)).as("auc"),
        when(col("__n1") === 0 || col("__n0") === 0, lit(null))
          .otherwise(round(
            (col("__r2") - col("__n1") * (col("__n1") + dec(lit(1L))))
              .cast("double") /
              (col("__n1").cast("double") * col("__n0").cast("double")) -
              lit(1.0), 6)).as("gini"),
        when(col("__n1") === 0 || col("__n0") === 0, lit(null))
          .otherwise(round(col("__ksnum").cast("double") /
            (col("__n1").cast("double") * col("__n0").cast("double")), 6))
          .as("ks"))
      .orderBy(groupCol)
  }

  /** Step-wise average precision (PR-AUC) — [[binaryAuc]]'s companion for
    * the rare-positive regime where ROC flatters: AP = Σ_t ΔR_t·P_t with
    * thresholds at DISTINCT score values (descending), the tie-robust
    * definition — tied scores move together as one threshold step, so no
    * arbitrary within-tie order can change the result. Also reports the
    * positive base rate (the random-classifier AP) so the number carries
    * its own baseline.
    *
    * Same scale shape as binaryAuc: corpus → one hash groupBy onto the
    * distinct-score frame, cumulative TP/total via the range-partitioned
    * prefix sum over that frame (parallel even when every score is
    * distinct). Each ΔR·P term's products stay ≤ (corpus size)² — exact
    * in double — then DECIMAL-quantized before the final sum. */
  def averagePrecision(df: DataFrame, scoreCol: String,
      label: Column): DataFrame = {
    val pv = df
      .groupBy(col(scoreCol).as("__v"))
      .agg(sum(when(label, 1L).otherwise(0L)).as("__cp"),
        count(lit(1)).as("__c"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // Descending running TP/total via the range-partitioned prefix sum
    // (the ungrouped `OVER (ORDER BY __v DESC)` window is a single-task
    // sort of the whole distinct-score frame — corpus-sized for a
    // continuous scorer); corpus totals via one hash agg, crossJoined.
    val pre = Indexing.globalPrefixSums(pv, Nil,
      Seq(col("__v").desc), Seq("__cp", "__c"))
    val tot = pre.agg(sum(col("__cp")).as("__n1"),
      (sum(col("__c")) - sum(col("__cp"))).as("__n0"))
    val cum = pre.crossJoin(broadcast(tot))
      .select(col("__cp"), col("__c"),
        (col("__cp_excl") + col("__cp")).as("__tp"),
        (col("__c_excl") + col("__c")).as("__n"),
        col("__n1"), col("__n0"))
    cum
      .withColumn("__term",
        // n1 = 0 (no positives) must not 0-div under ANSI; the final
        // select nulls the metrics in that case anyway
        when(col("__n1") === 0L, lit(null)).otherwise(
          (dec(col("__cp")) * dec(col("__tp"))).cast("double") /
            (dec(col("__n1")) * dec(col("__n"))).cast("double"))
          .cast("decimal(28,18)"))
      .agg(max(col("__n1")).as("__n1"), max(col("__n0")).as("__n0"),
        sum(col("__term")).as("__ap"))
      .select(col("__n1").cast("long").as("n_pos"),
        col("__n0").cast("long").as("n_neg"),
        when(col("__n1") === 0 || col("__n0") === 0, lit(null))
          .otherwise(round(col("__ap").cast("double"), 6)).as("ap"),
        when(col("__n1") === 0 || col("__n0") === 0, lit(null))
          .otherwise(round(col("__n1").cast("double") /
            (col("__n1") + col("__n0")).cast("double"), 6))
          .as("base_rate"))
  }

  /** Decile gains/lift table — the campaign-targeting view of a scorer:
    * rank the corpus by score descending, cut into `buckets` rank bands,
    * and report each band's positive rate, cumulative capture (share of
    * all positives found so far), and lift vs the base rate. "The top 10%
    * of docs by model score hold 34% of the known-good labels" is this
    * operator's one-row summary.
    *
    * Buckets are GROUP-ATOMIC: assignment happens on the distinct-score
    * frame (bucket of a score group = floor(rowsBefore·B/N)), so tied
    * scores land in one bucket and the table is deterministic without an
    * arbitrary within-tie order — and NOTHING flows through a
    * single-partition window: rows-before-me comes from the
    * range-partitioned prefix sum, so even an all-distinct continuous
    * score column stays parallel (only the ≤`buckets`-row cumulative
    * frame uses an ungrouped window). Ratios are exact-integer-product
    * doubles rounded once. */
  def gainsTable(df: DataFrame, scoreCol: String, label: Column,
      buckets: Int = 10): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val pv = df
      .groupBy(col(scoreCol).as("__v"))
      .agg(sum(when(label, 1L).otherwise(0L)).as("__cp"),
        count(lit(1)).as("__c"))
    // Rank-band assignment needs rows-before-me in score-desc order —
    // the range-partitioned prefix sum, not an ungrouped window (the
    // distinct-score frame is corpus-sized for a continuous scorer).
    val pre = Indexing.globalPrefixSums(pv, Nil,
      Seq(col("__v").desc), Seq("__c"))
    val tot = pre.agg(sum(col("__c")).as("__nt"),
      sum(col("__cp")).as("__n1"))
    val cum = pre.crossJoin(broadcast(tot))
      .select(col("__cp"), col("__c"), col("__c_excl").as("__s"),
        col("__nt"), col("__n1"))
    val bucketed = cum
      .withColumn("bucket",
        expr(s"CAST((CAST(__s AS DECIMAL(38,0)) * $buckets) DIV __nt " +
          "AS BIGINT)"))
      .groupBy("bucket")
      .agg(sum(col("__c")).as("n"), sum(col("__cp")).as("n_pos"),
        max(col("__nt")).as("__nt"), max(col("__n1")).as("__n1"))
    val wCum = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .select(col("bucket"), col("n"), col("n_pos"),
        sum(col("n")).over(wCum).as("cum_n"),
        sum(col("n_pos")).over(wCum).as("cum_pos"),
        col("__nt"), col("__n1"))
      .select(col("bucket"), col("n"), col("n_pos"), col("cum_n"),
        col("cum_pos"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("rate"),
        when(col("__n1") === 0, lit(null))
          .otherwise(round((dec(col("cum_pos")) * dec(col("__nt")))
            .cast("double") /
            (dec(col("cum_n")) * dec(col("__n1"))).cast("double"), 6))
          .as("cum_lift"),
        when(col("__n1") === 0, lit(null))
          .otherwise(round(col("cum_pos").cast("double") /
            col("__n1").cast("double"), 6)).as("capture"))
      .orderBy("bucket")
  }

  /** Reliability diagram + expected calibration error for a probabilistic
    * scorer: equal-width probability bins, per-bin mean predicted
    * probability (confidence) vs empirical positive rate (accuracy), and
    * the corpus ECE = Σ_b (n_b/N)·|conf_b − acc_b| — which collapses to
    * Σ_b |Σp_b − pos_b| / N, so the whole statistic is assembled from the
    * SAME per-bin sums the diagram needs (no second pass).
    *
    * One hash groupBy on the bin key (map-side combine; ≤ `bins` result
    * rows), per-element probabilities DECIMAL-quantized before summation
    * so the bin means are order-independent, ECE attached via an
    * unbounded window over the ≤`bins`-row frame (driver-free). p = 1.0
    * lands in the top bin (`least`), mirroring the usual [0,1] closed
    * interval. */
  def calibration(df: DataFrame, prob: Column, label: Column,
      bins: Int = 10): DataFrame =
    calibrationBy(df.withColumn("__slice", lit(0L)), "__slice", prob,
      label, bins).drop("__slice")

  /** Per-slice [[calibration]] — the calibration-drift view next to
    * [[binaryAucBy]]'s discrimination drift: one reliability diagram +
    * ECE per group (source, language, ingest day), so a scorer that is
    * calibrated globally but systematically over-confident on one slice
    * is visible. Every window is partitioned by the slice key over that
    * slice's ≤`bins` rows — the ungrouped variant delegates here with a
    * constant slice, and nothing corpus-sized flows through a window
    * either way. */
  def calibrationBy(df: DataFrame, groupCol: String, prob: Column,
      label: Column, bins: Int = 10): DataFrame = {
    require(bins > 0, "bins must be positive")
    val f = df.select(col(groupCol), prob.cast("double").as("__p"),
      when(label, 1L).otherwise(0L).as("__y"))
    val binned = f.withColumn("bin",
      least(floor(col("__p") * bins), lit(bins - 1L)).cast("long"))
    val perBin = binned.groupBy(col(groupCol), col("bin")).agg(
      count(lit(1)).as("n"),
      sum(col("__y")).as("n_pos"),
      sum(col("__p").cast("decimal(28,18)")).as("__sp"))
    val wAll = Window.partitionBy(groupCol).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    perBin.select(col(groupCol), col("bin"), col("n"), col("n_pos"),
        round(col("__sp").cast("double") / col("n").cast("double"), 6)
          .as("conf"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("acc"),
        round(abs(col("__sp").cast("double") / col("n").cast("double") -
          col("n_pos").cast("double") / col("n").cast("double")), 6)
          .as("gap"),
        round(sum(abs(col("__sp") - col("n_pos").cast("decimal(28,18)")))
            .over(wAll).cast("double") /
          sum(col("n")).over(wAll).cast("double"), 6)
          .as("ece"))
      .orderBy(groupCol, "bin")
  }

  /** Operating-point selection for a binary scorer: sweep every distinct
    * score value as a "predict positive when score ≥ v" threshold and
    * return the F1-optimal row with its full confusion matrix and the
    * derived metrics (precision, recall, F1, accuracy, MCC) — the number
    * a curation pipeline actually deploys after [[binaryAuc]] says the
    * ranking is good.
    *
    * Tie-robust by construction: thresholds live on the DISTINCT-score
    * frame (tied scores cross the boundary together), and F1 ties between
    * thresholds break on the larger threshold (the stricter classifier).
    *
    * Scale shape: corpus → one hash groupBy onto the distinct-score
    * frame; cumulative TP via [[Indexing.globalPrefixSums]] (descending —
    * parallel even when every score is distinct); the argmax is a global
    * top-1 (TakeOrderedAndProject — per-partition partial, never a full
    * sort). Every confusion count is exact integer; the metric doubles
    * are single fixed-order divisions of those integers, so the gate is
    * exact. MCC's denominator multiplies four ≤n factors as doubles
    * (sqrt once); the numerator stays DECIMAL(38,0). */
  def bestThreshold(df: DataFrame, scoreCol: String,
      label: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val pv = df
      .groupBy(col(scoreCol).as("__v"))
      .agg(sum(when(label, 1L).otherwise(0L)).as("__cp"),
        count(lit(1)).as("__c"))
    val pre = Indexing.globalPrefixSums(pv, Nil,
      Seq(col("__v").desc), Seq("__cp", "__c"))
    val tot = pre.agg(sum(col("__cp")).as("__n1"),
      (sum(col("__c")) - sum(col("__cp"))).as("__n0"))
    val cm = pre.crossJoin(broadcast(tot))
      .select(col("__v"),
        (col("__cp_excl") + col("__cp")).as("tp"),
        ((col("__c_excl") + col("__c")) -
          (col("__cp_excl") + col("__cp"))).as("fp"),
        col("__n1"), col("__n0"))
      .withColumn("fn", col("__n1") - col("tp"))
      .withColumn("tn", col("__n0") - col("fp"))
      // ≥1 row is predicted positive at every distinct-score threshold,
      // so 2·tp + fp + fn ≥ 1 and F1 is always defined
      .withColumn("f1",
        (lit(2.0) * col("tp").cast("double")) /
          (lit(2.0) * col("tp").cast("double") +
            col("fp").cast("double") + col("fn").cast("double")))
    cm.orderBy(desc("f1"), desc("__v")).limit(1)
      .select(col("__v").as("threshold"), col("tp"), col("fp"),
        col("tn"), col("fn"),
        when(col("tp") + col("fp") === 0, lit(null))
          .otherwise(round(col("tp").cast("double") /
            (col("tp") + col("fp")).cast("double"), 6)).as("precision"),
        when(col("__n1") === 0, lit(null))
          .otherwise(round(col("tp").cast("double") /
            col("__n1").cast("double"), 6)).as("recall"),
        round(col("f1"), 6).as("f1"),
        round((col("tp") + col("tn")).cast("double") /
          (col("__n1") + col("__n0")).cast("double"), 6).as("accuracy"),
        when((col("tp") + col("fp")) === 0 || (col("__n1")) === 0 ||
            (col("tn") + col("fn")) === 0 || (col("__n0")) === 0, lit(null))
          .otherwise(round(
            (dec(col("tp")) * dec(col("tn")) -
              dec(col("fp")) * dec(col("fn"))).cast("double") /
            sqrt((col("tp") + col("fp")).cast("double") *
              col("__n1").cast("double") *
              (col("tn") + col("fn")).cast("double") *
              col("__n0").cast("double")), 6)).as("mcc"))
  }

  /** Subsampling confidence band for [[binaryAuc]] — the "is 0.71 vs 0.69
    * real" question answered without distributional assumptions: B
    * deterministic half-sample replicates (doc kept in replicate b iff
    * md5(id:b) is even — engine-reproducible, no RNG state), AUC per
    * replicate, and the mean/min/max band across replicates. A scorer
    * whose band straddles 0.5 is noise regardless of its point estimate.
    *
    * Scale shape: the explode multiplies the corpus by B (a small
    * constant) but immediately collapses through [[binaryAucBy]]'s
    * distinct-score hash aggregate keyed by (replicate, score) — every
    * running CDF stays on the range-partitioned prefix-sum path, and the
    * band aggregate runs over ≤B rows. Replicates that degenerate to a
    * single class contribute null AUCs — skipped by the band AND by the
    * mean (`auc_mean` divides by `n_valid`, the non-degenerate replicate
    * count, reported next to `n_replicates`; dividing by all replicates
    * would silently bias the mean toward 0). */
  def bootstrapAuc(df: DataFrame, idCol: String, scoreCol: String,
      label: Column, replicates: Int = 8): DataFrame = {
    require(replicates >= 2, "need at least 2 replicates")
    val reps = df
      .select(col(idCol).cast("string").as("__id"),
        col(scoreCol).as("__v"),
        when(label, 1L).otherwise(0L).as("__y"))
      .withColumn("__b",
        explode(sequence(lit(0L), lit(replicates - 1L))))
      .filter(conv(substring(md5(concat_ws(":", col("__id"),
        col("__b").cast("string"))), 1, 8), 16, 10).cast("long") % 2 === 0)
    val per = binaryAucBy(reps, "__b", "__v", col("__y") === 1)
    per.agg(count(lit(1)).as("n_replicates"),
        count(col("auc")).as("n_valid"),
        sum(col("auc").cast("decimal(28,18)")).as("__s"),
        min(col("auc")).as("auc_min"), max(col("auc")).as("auc_max"))
      .select(col("n_replicates"), col("n_valid"),
        when(col("n_valid") === 0, lit(null).cast("double"))
          .otherwise(round(col("__s").cast("double") /
            col("n_valid").cast("double"), 6)).as("auc_mean"),
        col("auc_min"), col("auc_max"))
  }

  /** Histogram-binning recalibration (the "apply" side of
    * [[calibration]]'s diagnosis): learn per-bin empirical positive rates
    * on a held-out CALIBRATION split, map the TARGET split's predicted
    * probabilities to their bin's empirical rate, and report the per-bin
    * mapping next to the corpus-level Brier score before vs after — the
    * one-number answer to "did recalibration help".
    *
    * Bins the target never saw in calibration back off to the global
    * calibration positive rate (the prior) rather than poisoning the
    * sum with nulls.
    *
    * Scale shape: both splits collapse through ONE hash groupBy each
    * (map-side combine, ≤ `bins` result rows); the mapping and the
    * global rate are broadcast back onto the target; Brier terms are
    * per-row doubles DECIMAL-quantized before the order-free sum. The
    * corpus totals ride an unbounded window over the ≤`bins`-row frame. */
  def recalibrate(target: DataFrame, calib: DataFrame, prob: Column,
      label: Column, bins: Int = 10): DataFrame = {
    require(bins > 0, "bins must be positive")
    def binned(df: DataFrame) = df
      .select(prob.cast("double").as("__p"),
        when(label, 1L).otherwise(0L).as("__y"))
      .withColumn("bin",
        least(floor(col("__p") * bins), lit(bins - 1L)).cast("long"))
    val calAgg = binned(calib).groupBy("bin")
      .agg(count(lit(1)).as("n_cal"), sum(col("__y")).as("__pos_cal"))
      .withColumn("rate_cal",
        col("__pos_cal").cast("double") / col("n_cal").cast("double"))
      .select("bin", "n_cal", "rate_cal")
    val calGlobal = binned(calib)
      .agg((sum(col("__y")).cast("double") / count(lit(1)).cast("double"))
        .as("__gr"))
    val sq = (c: Column) => (c * c).cast("decimal(28,18)")
    val tgt = binned(target)
      .join(broadcast(calAgg), Seq("bin"), "left")
      .crossJoin(broadcast(calGlobal))
      .withColumn("__pc", coalesce(col("rate_cal"), col("__gr")))
    val perBin = tgt.groupBy("bin").agg(
      coalesce(max(col("n_cal")), lit(0L)).as("n_cal"),
      max(col("rate_cal")).as("__rc"),
      count(lit(1)).as("n_tgt"),
      sum(col("__y")).as("pos_tgt"),
      sum(sq(col("__p") - col("__y").cast("double"))).as("__sbr"),
      sum(sq(col("__pc") - col("__y").cast("double"))).as("__sbc"))
    val wAll = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    perBin.select(col("bin"), col("n_cal"),
        round(col("__rc"), 6).as("rate_cal"),
        col("n_tgt"), col("pos_tgt"),
        round(col("pos_tgt").cast("double") / col("n_tgt").cast("double"), 6)
          .as("rate_tgt"),
        round(sum(col("__sbr")).over(wAll).cast("double") /
          sum(col("n_tgt")).over(wAll).cast("double"), 6).as("brier_raw"),
        round(sum(col("__sbc")).over(wAll).cast("double") /
          sum(col("n_tgt")).over(wAll).cast("double"), 6).as("brier_cal"))
      .orderBy("bin")
  }

  /** Spearman rank correlation between two scorers over the same corpus —
    * the monotone-agreement check that survives outliers and nonlinear
    * scales (does the cheap heuristic rank documents the way the
    * expensive model does?). Ties get average ranks (the standard
    * tie-corrected form), so the statistic is deterministic without any
    * within-tie order.
    *
    * Exactness: the average rank of a tied group is (2·|smaller| + c + 1)/2
    * — half-integer, so DOUBLED ranks (2s + c + 1) stay exact Longs and
    * Pearson is scale-invariant, so ρ(2Rₐ, 2R_b) = ρ(Rₐ, R_b). All five
    * moments accumulate as exact DECIMAL(38,0) sums; the closed form runs
    * ONCE in double in a fixed operation order (the corr-matrix
    * discipline), so the gate is exact.
    *
    * Scale shape: per-column rank maps come from the distinct-value frame
    * + [[Indexing.globalPrefixSums]] (no single-partition window even
    * for continuous scores); rows join their two rank maps on value
    * (hash equi-joins), then ONE aggregate. */
  def spearmanRho(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = df.select(col(aCol).as("__a"), col(bCol).as("__b"))
    def rank2(c: String, out: String) = {
      val pv = base.groupBy(col(c).as("__v")).agg(count(lit(1)).as("__c"))
      Indexing.globalPrefixSums(pv, Nil, Seq(col("__v")), Seq("__c"))
        .select(col("__v").as(c),
          (lit(2L) * col("__c_excl") + col("__c") + lit(1L)).as(out))
    }
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val ranked = base
      .join(rank2("__a", "__ra"), "__a")
      .join(rank2("__b", "__rb"), "__b")
    ranked.agg(count(lit(1)).as("__n"),
        sum(dec(col("__ra"))).as("__sa"), sum(dec(col("__rb"))).as("__sb"),
        sum(dec(col("__ra")) * dec(col("__ra"))).as("__saa"),
        sum(dec(col("__rb")) * dec(col("__rb"))).as("__sbb"),
        sum(dec(col("__ra")) * dec(col("__rb"))).as("__sab"))
      .select(col("__n").as("n"),
        when(col("__n") === 0, lit(null)).otherwise(round(
          (col("__n").cast("double") * col("__sab").cast("double") -
            col("__sa").cast("double") * col("__sb").cast("double")) /
          (sqrt(col("__n").cast("double") * col("__saa").cast("double") -
              col("__sa").cast("double") * col("__sa").cast("double")) *
            sqrt(col("__n").cast("double") * col("__sbb").cast("double") -
              col("__sb").cast("double") * col("__sb").cast("double"))), 6))
          .as("rho"))
  }

  /** Welch's two-sample t statistic for an A/B metric with unequal
    * variances — the significance companion to [[cupedAdjust]] (which
    * shrinks the variance; this says whether the remaining difference
    * clears it). Reports per-arm n/mean/variance, the mean difference,
    * the t statistic, and the Welch–Satterthwaite degrees of freedom.
    * No p-value on purpose: the t CDF needs special functions whose
    * libm behavior is not bit-stable cross-engine; t and df are the
    * exact part, and any consumer can threshold t directly (|t| > 1.96
    * at df ≫ 30 is the usual read).
    *
    * The LOWER arm value is the control (column suffix 0). Metrics are
    * INTEGER counts by contract (exact Long products, DECIMAL(38,0)
    * sums); sample variances (n−1) computed once in double in a fixed
    * operation order. One per-arm hash aggregate (map-side combine) +
    * a 1×1 join of the two arm rows.
    *
    * Exactly two arms required — ENFORCED, lazily: `n_arms` (counted
    * over the ≤|arms|-row aggregate frame, no extra corpus pass) is
    * reported, and `diff`/`t`/`df_welch` are NULL unless n_arms = 2.
    * One arm would otherwise self-compare (diff = 0 looks like a null
    * result); three-plus arms would silently drop the middle arms. */
  def welchT(df: DataFrame, armCol: String, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("long")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val m = df.groupBy(col(armCol).as("__arm"))
      .agg(count(lit(1)).as("n"), sum(dec(x)).as("__s"),
        sum(dec(x * x)).as("__ss"))
      .withColumn("__narms", count(lit(1)).over(wAll))
      .withColumn("__mean", col("__s").cast("double") / col("n").cast("double"))
      .withColumn("__var",
        when(col("n") <= 1, lit(null)).otherwise(
          (col("__ss").cast("double") -
            col("__s").cast("double") * col("__s").cast("double") /
              col("n").cast("double")) / (col("n").cast("double") - lit(1.0))))
    val lo = m.orderBy("__arm").limit(1)
      .select(col("__arm").as("arm0"), col("n").as("n0"),
        col("__mean").as("__m0"), col("__var").as("__v0"),
        col("__narms"))
    val hi = m.orderBy(desc("__arm")).limit(1)
      .select(col("__arm").as("arm1"), col("n").as("n1"),
        col("__mean").as("__m1"), col("__var").as("__v1"))
    val twoArms = col("__narms") === 2
    lo.crossJoin(hi)
      .withColumn("__se0", col("__v0") / col("n0").cast("double"))
      .withColumn("__se1", col("__v1") / col("n1").cast("double"))
      .select(col("__narms").as("n_arms"),
        col("arm0"), col("arm1"), col("n0"), col("n1"),
        round(col("__m0"), 6).as("mean0"),
        round(col("__m1"), 6).as("mean1"),
        when(twoArms, round(col("__m1") - col("__m0"), 6)).as("diff"),
        when(twoArms, round((col("__m1") - col("__m0")) /
          sqrt(col("__se0") + col("__se1")), 6)).as("t"),
        when(twoArms, round(
          ((col("__se0") + col("__se1")) * (col("__se0") + col("__se1"))) /
          (col("__se0") * col("__se0") / (col("n0").cast("double") - lit(1.0)) +
            col("__se1") * col("__se1") / (col("n1").cast("double") - lit(1.0))),
          6)).as("df_welch"))
  }

  /** CUPED variance reduction for an A/B metric (Deng et al. 2013):
    * adjust each unit's post-period metric y by its pre-period covariate
    * x — y_cv = y − θ(x − E[x]) with θ = Cov(x,y)/Var(x) pooled — and
    * report per-arm adjusted means plus the variance reduction
    * 1 − Var(y_cv)/Var(y). The standard way to make an experiment
    * readable at a fraction of the traffic; reductions of 30–50% are
    * typical when x is the same metric pre-period.
    *
    * Everything is CLOSED-FORM from moments — no second pass: Var(y_cv)
    * = Var(y) − Cov²/Var(x), and the per-arm adjusted mean is
    * E_a[y] − θ(E_a[x] − E[x]). So the whole operator is ONE per-arm
    * hash aggregate of exact DECIMAL moment sums (map-side combine) +
    * pooled totals over the ≤|arms|-row frame; the double arithmetic
    * runs once in a fixed operation order (population variances).
    * Degenerate Var(x) = 0 yields null adjustments rather than 0/0.
    * Metrics are INTEGER counts by contract (per-row products stay
    * exact Longs; sums accumulate as exact DECIMAL(38,0)). */
  def cupedAdjust(df: DataFrame, armCol: String, preCol: String,
      postCol: String): DataFrame = {
    val x = col(preCol).cast("long")
    val y = col(postCol).cast("long")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val perArm = df.groupBy(col(armCol))
      .agg(count(lit(1)).as("n"),
        sum(dec(x)).as("__sx"), sum(dec(y)).as("__sy"),
        sum(dec(x * x)).as("__sxx"),
        sum(dec(x * y)).as("__sxy"),
        sum(dec(y * y)).as("__syy"))
    val wAll = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val tot = perArm
      .withColumn("__tn", sum(col("n")).over(wAll).cast("double"))
      .withColumn("__tx", sum(col("__sx")).over(wAll).cast("double"))
      .withColumn("__ty", sum(col("__sy")).over(wAll).cast("double"))
      .withColumn("__txx", sum(col("__sxx")).over(wAll).cast("double"))
      .withColumn("__txy", sum(col("__sxy")).over(wAll).cast("double"))
      .withColumn("__tyy", sum(col("__syy")).over(wAll).cast("double"))
      .withColumn("__mx", col("__tx") / col("__tn"))
      .withColumn("__varx",
        col("__txx") / col("__tn") - (col("__tx") / col("__tn")) *
          (col("__tx") / col("__tn")))
      .withColumn("__cov",
        col("__txy") / col("__tn") - (col("__tx") / col("__tn")) *
          (col("__ty") / col("__tn")))
      .withColumn("__vary",
        col("__tyy") / col("__tn") - (col("__ty") / col("__tn")) *
          (col("__ty") / col("__tn")))
      .withColumn("__theta",
        when(col("__varx") === 0.0, lit(null))
          .otherwise(col("__cov") / col("__varx")))
    tot.select(col(armCol), col("n"),
        round(col("__sy").cast("double") / col("n").cast("double"), 6)
          .as("mean_post"),
        round(col("__sy").cast("double") / col("n").cast("double") -
          col("__theta") * (col("__sx").cast("double") /
            col("n").cast("double") - col("__mx")), 6).as("mean_adj"),
        round(col("__theta"), 6).as("theta"),
        when(col("__vary") === 0.0, lit(null)).otherwise(
          round((col("__cov") * col("__cov") / col("__varx")) /
            col("__vary"), 6)).as("var_reduction"))
      .orderBy(armCol)
  }

  /** Weight-of-evidence table + information value of a numeric feature
    * against a binary label — the credit-scoring sibling of
    * [[psiByGroup]] (same smoothed-share machinery, but positive-vs-
    * negative within one population instead of group-vs-baseline):
    * WoE_i = ln(pctPos_i / pctNeg_i) per equal-width bin, IV = Σ_i
    * (pctPos_i − pctNeg_i)·WoE_i. The standard reading: IV < 0.02
    * useless, 0.1–0.3 medium, > 0.5 suspicious (leakage-grade) — the
    * one-number triage for "is this metadata column worth a classifier
    * feature".
    *
    * Laplace-smoothed class shares ((n+1)/(N+bins)) keep empty bins
    * finite; the zero-count bin grid is materialized so the table is
    * complete. Scale shape: ONE (bin) hash aggregate with map-side
    * combine collapses the corpus to ≤bins rows; totals and IV ride
    * windows over that bounded frame; ln terms DECIMAL-quantized. */
  def informationValue(df: DataFrame, valueCol: String, label: Column,
      bins: Int, lo: Double, hi: Double): DataFrame = {
    require(bins > 0, "bins must be positive")
    require(hi > lo, "hi must exceed lo")
    val binExpr = least(greatest(
      floor((col(valueCol).cast("double") - lit(lo)) /
        lit((hi - lo)) * bins), lit(0L)), lit(bins - 1L)).cast("long")
    val counts = df.select(binExpr.as("bin"),
        when(label, 1L).otherwise(0L).as("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
      .withColumn("n_neg", col("n") - col("n_pos"))
    val grid = df.sparkSession.range(1)
      .select(explode(sequence(lit(0L), lit(bins - 1L))).as("bin"))
    val full = grid.join(counts, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("n_neg"), lit(0L)).as("n_neg"))
    val wAll = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val shares = full
      .withColumn("__pp", (col("n_pos") + lit(1L)).cast("double") /
        (sum(col("n_pos")).over(wAll) + lit(bins.toLong)).cast("double"))
      .withColumn("__pn", (col("n_neg") + lit(1L)).cast("double") /
        (sum(col("n_neg")).over(wAll) + lit(bins.toLong)).cast("double"))
      .withColumn("__woe", log(col("__pp") / col("__pn")))
      .withColumn("__term",
        ((col("__pp") - col("__pn")) * col("__woe"))
          .cast("decimal(28,18)"))
    shares.select(col("bin"), col("n"), col("n_pos"), col("n_neg"),
        round(col("__woe"), 6).as("woe"),
        round(sum(col("__term")).over(wAll).cast("double"), 6).as("iv"))
      .orderBy("bin")
  }

  /** Population stability index of a score column, every group vs a named
    * baseline group — the drift monitor a scoring pipeline runs per
    * source/day before trusting a model trained on the baseline mix
    * (PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted — the standard
    * credit-scoring reading).
    *
    * PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i) over equal-width bins of
    * [lo, hi) (out-of-range values clamp to the edge bins), with
    * Laplace-smoothed shares (n_i + 1)/(N + bins) so empty bins
    * contribute finite, symmetric mass instead of ±∞.
    *
    * Scale shape: ONE hash groupBy of (group, bin) with map-side combine
    * collapses the corpus to ≤ |groups|·bins rows; the full bin grid is
    * rebuilt by exploding a `bins`-element sequence per group (zero-count
    * bins materialized); the baseline column broadcasts back onto every
    * group. ln terms are per-bin doubles DECIMAL-quantized before the
    * order-free sum (the BM25-idf discipline). */
  def psiByGroup(df: DataFrame, groupCol: String, valueCol: String,
      baseline: String, bins: Int, lo: Double, hi: Double): DataFrame = {
    require(bins > 0, "bins must be positive")
    require(hi > lo, "hi must exceed lo")
    val binExpr = least(greatest(
      floor((col(valueCol).cast("double") - lit(lo)) /
        lit((hi - lo)) * bins), lit(0L)), lit(bins - 1L)).cast("long")
    val counts = df.groupBy(col(groupCol).as("__g"), binExpr.as("bin"))
      .agg(count(lit(1)).as("__c"))
    // full (group, bin) grid so zero-count bins carry their Laplace mass
    val grid = counts.select(col("__g")).distinct()
      .select(col("__g"),
        explode(sequence(lit(0L), lit(bins - 1L))).as("bin"))
    val full = grid.join(counts, Seq("__g", "bin"), "left")
      .select(col("__g"), col("bin"),
        coalesce(col("__c"), lit(0L)).as("__c"))
    val tot = full.groupBy("__g").agg(sum(col("__c")).as("__n"))
    val share = full.join(broadcast(tot), "__g")
      .select(col("__g"), col("bin"), col("__n"),
        ((col("__c") + lit(1L)).cast("double") /
          (col("__n") + lit(bins.toLong)).cast("double")).as("__s"))
    val base = share.filter(col("__g") === baseline)
      .select(col("bin"), col("__s").as("__q"))
    share.filter(col("__g") =!= baseline)
      .join(broadcast(base), "bin")
      .withColumn("__term",
        ((col("__s") - col("__q")) * log(col("__s") / col("__q")))
          .cast("decimal(28,18)"))
      .groupBy(col("__g").as(groupCol))
      .agg(max(col("__n")).as("n"),
        round(sum(col("__term")).cast("double"), 6).as("psi"))
      .orderBy(groupCol)
  }
}
