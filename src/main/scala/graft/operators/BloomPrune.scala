package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.Bridge

/** Bloom-filter join pruning (100 TB toolkit; beyond reference) — the
  * explicit form of the runtime filters modern engines inject: when a big
  * fact table joins a much smaller (but not broadcast-small) build side,
  * shipping a Bloom filter of the build keys to the fact scan drops most
  * non-matching rows BEFORE the shuffle, which is where a large join spends
  * its time.
  *
  * No false negatives (the pruned join equals the plain join, row for row);
  * false positives only cost wasted shuffle at rate `fpp`.
  *
  * The filter is built and probed ENTIRELY IN-PLAN (r14 verdict #6):
  * [[bloomProbe]] wraps Spark's native `BloomFilterAggregate` /
  * `BloomFilterMightContain` — the exact machinery the optimizer's own
  * `InjectRuntimeFilter` rule uses, reachable through the public
  * Catalyst API though not the SQL registry — as a SCALAR SUBQUERY
  * (might_contain requires constant-or-subquery filter input) probed by
  * a codegen'd xxhash64. The r13-era shape (driver-built
  * `stat.bloomFilter` + a scala UDF over a broadcast variable) paid a
  * driver round-trip and an interpreted per-row probe; the subquery
  * build rides the consuming action and the probe is codegen'd.
  *
  * SIZING IS ON THE CALLER (r15 verdict #2): every partial-aggregate
  * task allocates the FULL `-n·ln(fpp)/ln²2`-bit buffer and ships it to
  * the single merger, so an oversized `estItems` costs
  * buffer-size × |partitions| of allocation + shuffle per build — the
  * fixed 4M default measured as a 1.5× regression on few-hundred-key
  * build sides. Pass a real key-count estimate; an exact count of a
  * small or cached build side is one cheap job and is what
  * [[pruneLarge]] does.
  *
  * An empty build side yields a NULL filter, and `might_contain(NULL,
  * x)` is NULL — callers coalesce to `false`, which reproduces the old
  * empty-side semantics for free. */
object BloomPrune {

  /** In-plan Bloom membership probe: `might_contain(<scalar subquery:
    * bloom_filter_agg(xxhash64(keyCol)) over keys>, xxhash64(v))`.
    * `keyCol` and `v` MUST be the same type — xxhash64 hashes the typed
    * value, so an int build side probed with a long silently loses every
    * match. NULL on either side propagates NULL — wrap in
    * `coalesce(_, lit(false))` when used as a filter. `estItems` above
    * the session's runtime-filter cap (default 4M) is clamped by Spark;
    * `fpp` sizes the bit array as `-n·ln(fpp)/ln²2`. */
  def bloomProbe(keys: DataFrame, keyCol: Column, v: Column,
      estItems: Long = 4000000L, fpp: Double = 0.01): Column = {
    require(estItems > 0L && fpp > 0.0 && fpp < 1.0,
      "need estItems > 0 and fpp in (0, 1)")
    val nBits = math.max(64L,
      math.ceil(-estItems.toDouble * math.log(fpp)
        / (math.log(2.0) * math.log(2.0))).toLong)
    val aggPlan = keys.select(Bridge.column(new BloomFilterAggregate(
        new XxHash64(Seq(Bridge.expression(keyCol))),
        Literal(estItems), Literal(nBits))
      .toAggregateExpression()).as("__bf")).queryExecution.logical
    Bridge.column(BloomFilterMightContain(ScalarSubquery(aggPlan),
      new XxHash64(Seq(Bridge.expression(v)))))
  }

  /** Filter `large` down to rows whose `key` might appear in `small`'s key
    * set. Join the result exactly as before — semantics are unchanged.
    * Long-key contract (both sides cast to long, matching the original
    * `mightContainLong` probe).
    *
    * The filter is SIZED from an exact build-side count (one explicit
    * small-side scan — the documented price of the technique, same as the
    * pre-in-plan shape). Sizing is what makes the in-plan aggregate cheap:
    * the r15 fixed default of 4M items allocated a ~4.8 MB bit buffer PER
    * PARTIAL-AGGREGATE TASK and shuffled every buffer into the single
    * merger (~150 MB of churn for a few hundred actual keys) — measured
    * as the x22/x288/x289 regression. With estItems = |keys| the buffer
    * is ~9.6 bits/key and the build cost scales with the data. */
  def pruneLarge(large: DataFrame, small: DataFrame, key: String,
      fpp: Double = 0.01): DataFrame = {
    val n = small.select(key).count() // explicit build-side scan
    // a null key never joins in an equi-join, so drop it here too
    // (n == 0 keeps the in-plan NULL-filter semantics: probe NULL →
    // coalesce(false) → empty result, the old limit(0) row set)
    large.filter(col(key).isNotNull &&
      coalesce(bloomProbe(small, col(key).cast("long"),
        col(key).cast("long"), math.max(n, 1L), fpp), lit(false)))
  }

  /** Pruned inner equi-join: bloom-prune the large side, then join. */
  def prunedJoin(large: DataFrame, small: DataFrame, key: String,
      fpp: Double = 0.01): DataFrame =
    pruneLarge(large, small, key, fpp).join(small, Seq(key), "inner")
}
