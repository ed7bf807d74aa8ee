package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream to a fixed daily
  * grid per group, filling gaps with zero counts and carrying the last
  * observed aggregate forward (the dashboard/feature-store prep shape).
  *
  * 100 TB design: the day spine is generated per group with
  * `sequence()+explode` — distributed, one row-group per group, no driver
  * loop and no calendar table to maintain. Everything downstream is hash
  * joins and ONE per-group window (days per group are bounded by the date
  * range, not the data volume). */
object Resample {

  /** Trailing moving average over an ordered per-group series: ROWS window
    * of the last `days` rows. The sum stays DECIMAL (exact, order-free) and
    * the average is an explicit sum/count double division so both engines
    * compute identical bits. The 2-decimal rounding is floor(x·100+0.5)/100
    * rather than round(): engine round() implementations resolve exact .xx5
    * ties differently (Spark HALF_UP on the exact binary expansion, DuckDB
    * scaled-multiply), while this form is the same IEEE ops on the same
    * bits in both engines. */
  def movingAverage(daily: DataFrame, groupCol: String, orderCol: String,
      valueCol: String, days: Int = 7): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(-(days - 1), 0)
    val avgD = sum(col(valueCol)).over(w).cast("double") /
      count(col(valueCol)).over(w)
    daily.withColumn(s"ma$days", floor(avgD * 100 + 0.5) / 100)
  }

  /** Z-score anomaly flags against a TRAILING baseline (the preceding
    * `days` rows, excluding the current one). Mean and variance come from
    * manual moments — decimal sum and sum-of-squares cast to double, then
    * (Σx² − (Σx)²/n)/(n−1) — because engine stddev implementations
    * (Welford vs naive) drift in the last ulps; identical formulas on
    * identical bits keep both engines bit-equal. Rounding uses the
    * tie-free floor form (see [[movingAverage]]). */
  def anomalyZScore(daily: DataFrame, groupCol: String, orderCol: String,
      valueCol: String, days: Int = 7, threshold: Double = 2.0): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(-days, -1)
    val n = count(col(valueCol)).over(w)
    val s1 = sum(col(valueCol)).over(w).cast("double")
    val s2 = sum(col(valueCol) * col(valueCol)).over(w).cast("double")
    val mean = s1 / n
    val variance = (s2 - s1 * s1 / n) / (n - 1)
    val z = (col(valueCol).cast("double") - mean) / sqrt(variance)
    daily
      .withColumn("z",
        when(n >= 3 && variance > 0,
          floor(z * 10000 + 0.5) / 10000).otherwise(lit(null).cast("double")))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > threshold, lit(false)))
  }

  /** Trailing exponentially-weighted moving average with alpha = 1/2 over
    * an ordered per-group DECIMAL series: ewma_t = Σ_k 0.5^k·v_{t−k} /
    * Σ_k 0.5^k over the last `terms` rows. The weights 0.5^k are EXACT
    * decimals (0.5^k has exactly k fractional digits), so numerator and
    * denominator accumulate with zero rounding in any engine; the single
    * double division at the end is the same IEEE op on the same bits, and
    * the 4-decimal quantization is the tie-free floor form (see
    * [[movingAverage]]). One window pass: the k lags share one window spec
    * (alpha is pinned at 1/2 precisely because other alphas are not exactly
    * representable — a general-alpha EWMA cannot be replayed bit-equal).
    *
    * Precision budget (why the bounds are what they are): term k is
    * decimal(18,6) × decimal(k,k) → (19+k, 6+k), 13 integer digits for
    * every k. Spark's left-fold `+` widens the accumulator to
    * (int digits + 1, max scale) per addition, so after term k the
    * accumulator is (20+2k, 6+k); terms = 10 peaks at exactly (38, 15) —
    * the last type that fits Spark's 38-digit cap with ZERO truncation.
    * terms = 11 would silently round (allowPrecisionLoss), breaking the
    * bit-equal replay, hence the hard clamp. */
  def ewmaHalf(daily: DataFrame, groupCol: String, orderCol: String,
      valueCol: String, terms: Int = 10): DataFrame = {
    require(terms >= 1 && terms <= 10, s"terms=$terms out of [1,10]")
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
    val num = (0 until terms).map { k =>
      val wk = java.math.BigDecimal.valueOf(0.5).pow(k)
      coalesce(lag(col(valueCol), k).over(w).cast("decimal(18,6)") * lit(wk),
        lit(java.math.BigDecimal.ZERO))
    }.reduce(_ + _)
    val den = (0 until terms).map { k =>
      val wk = java.math.BigDecimal.valueOf(0.5).pow(k)
      when(lag(col(valueCol), k).over(w).isNotNull, lit(wk))
        .otherwise(lit(java.math.BigDecimal.ZERO))
    }.reduce(_ + _)
    daily.withColumn("ewma",
      floor(num.cast("double") / den.cast("double") * 10000 + 0.5) / 10000)
  }

  /** Daily counts + sums per group over each group's [min-day, max-day]
    * span: gap days appear with n_events = 0, null total_value, and
    * `carried_total` = last observed day's total. */
  def dailyResample(df: DataFrame, groupCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val daily = df
      .groupBy(col(groupCol), date_trunc("DAY", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,6)")).as("__tv"))
    val spine = daily.groupBy(col(groupCol))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
      .select(col(groupCol),
        explode(sequence(col("__d0"), col("__d1"),
          expr("INTERVAL 1 DAY"))).as("day"))
    val w = Window.partitionBy(groupCol).orderBy("day")
    spine.join(daily, Seq(groupCol, "day"), "left")
      .select(col(groupCol), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        round(col("__tv").cast("double"), 2).as("total_value"),
        round(last(col("__tv"), ignoreNulls = true).over(w).cast("double"), 2)
          .as("carried_total"))
  }

  /** Classical additive seasonal decomposition y = trend + seasonal +
    * remainder over an evenly spaced integer series: trend is the centered
    * `period`-row moving average, seasonal is the per-phase mean of the
    * detrended series, remainder is what's left. The workhorse for "is
    * Tuesday always low, or did something break on THIS Tuesday?".
    *
    * Exactness: detrended values are rational with integer numerator
    * period·y − Σ_window (the window sum of longs is exact), so per-phase
    * seasonal means accumulate INTEGER sums and divide once —
    * period·detrended and its phase aggregation never touch accumulated
    * doubles. All three emitted components use the engine-tie-free
    * floor(x·10⁴+0.5)/10⁴ rounding (see [[movingAverage]]).
    *
    * Scale shape: runs on the already-aggregated per-bucket series
    * (|days|, |hours| rows — tiny), so the global-order window is over the
    * series, never the corpus. The first/last half-window rows have no
    * centered trend (standard) and are excluded from the phase means. */
  def seasonalDecompose(daily: DataFrame, orderCol: String, valueCol: String,
      period: Int = 7): DataFrame = {
    require(period >= 3 && period % 2 == 1,
      s"period=$period — need an odd period >= 3 for a centered window")
    val half = period / 2
    val w = Window.orderBy(orderCol).rowsBetween(-half, half)
    val rn = Window.orderBy(orderCol)
    val pd = lit(period.toDouble)
    val q4 = (c: Column) => floor(c * lit(10000) + lit(0.5)) / lit(10000)
    val base = daily
      .withColumn("__s", sum(col(valueCol)).over(w))
      .withColumn("__c", count(col(valueCol)).over(w))
      .withColumn("__ph", (row_number().over(rn) - 1) % period)
      .withColumn("__num", when(col("__c") === period,
        lit(period.toLong) * col(valueCol) - col("__s")))
    val phase = base.groupBy("__ph")
      .agg(sum(col("__num")).as("__snum"), count(col("__num")).as("__k"))
    val seasonal = col("__snum").cast("double") /
      (pd * col("__k").cast("double"))
    base.join(broadcast(phase), Seq("__ph"))
      .select(col(orderCol), col(valueCol).cast("long").as("y"),
        when(col("__c") === period, q4(col("__s").cast("double") / pd))
          .as("trend"),
        q4(seasonal).as("seasonal"),
        q4(col("__num").cast("double") / pd - seasonal).as("remainder"))
  }
}
