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
  * `stat.bloomFilter` + a scala UDF over a broadcast variable) cost an
  * eager build-side `count()` job plus a driver round-trip per call;
  * now the build rides the consuming action lazily as a subquery job.
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
    * `mightContainLong` probe); fully lazy — no call-time job. */
  def pruneLarge(large: DataFrame, small: DataFrame, key: String,
      fpp: Double = 0.01, estItems: Long = 4000000L): DataFrame = {
    // a null key never joins in an equi-join, so drop it here too
    large.filter(col(key).isNotNull &&
      coalesce(bloomProbe(small, col(key).cast("long"),
        col(key).cast("long"), estItems, fpp), lit(false)))
  }

  /** Pruned inner equi-join: bloom-prune the large side, then join. */
  def prunedJoin(large: DataFrame, small: DataFrame, key: String,
      fpp: Double = 0.01): DataFrame =
    pruneLarge(large, small, key, fpp).join(small, Seq(key), "inner")
}
