package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning (100 TB toolkit; beyond reference) — the
  * explicit form of the runtime filters modern engines inject: when a big
  * fact table joins a much smaller (but not broadcast-small) build side,
  * shipping a Bloom filter of the build keys to the fact scan drops most
  * non-matching rows BEFORE the shuffle, which is where a large join spends
  * its time.
  *
  * No false negatives (the pruned join equals the plain join, row for row);
  * false positives only cost wasted shuffle at rate `fpp`. The filter is a
  * driver-built sketch (~`-n·ln(fpp)/ln²2` bits — a few MB for 10⁷ keys at
  * 1%), broadcast once. Building it scans the small side once — an explicit
  * action, the documented price of the technique.
  */
object BloomPrune {

  /** Filter `large` down to rows whose `key` might appear in `small`'s key
    * set. Join the result exactly as before — semantics are unchanged. */
  def pruneLarge(large: DataFrame, small: DataFrame, key: String,
      fpp: Double = 0.01): DataFrame = {
    val n = small.select(key).count() // explicit build-side scan
    if (n == 0) return large.limit(0)
    val bf = small.stat.bloomFilter(key, math.max(n, 1L), fpp)
    val bc = large.sparkSession.sparkContext.broadcast(bf)
    // a null key never joins in an equi-join, so drop it here too
    val probe = udf((v: java.lang.Long) =>
      v != null && bc.value.mightContainLong(v.longValue()))
    large.filter(probe(col(key).cast("long")))
  }

  /** Pruned inner equi-join: bloom-prune the large side, then join. */
  def prunedJoin(large: DataFrame, small: DataFrame, key: String,
      fpp: Double = 0.01): DataFrame =
    pruneLarge(large, small, key, fpp).join(small, Seq(key), "inner")
}
