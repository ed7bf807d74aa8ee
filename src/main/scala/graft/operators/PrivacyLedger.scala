package graft.operators

import org.apache.spark.sql.DataFrame

/** Cumulative ε accounting over [[Stats.dpCounts]] releases — the piece
  * that turns the seeded Laplace primitive into a usable release
  * pipeline: under sequential composition, every release against the same
  * dataset version ADDS its ε, and a ledger must refuse the release that
  * would cross the budget (publishing it first and noticing later is not
  * privacy).
  *
  * Accounting rules:
  *  - the key is (datasetVersion, seed, ε): replaying an ALREADY-RELEASED
  *    key is free — the noise is deterministic, so the replay reveals
  *    nothing the first release didn't (this is the point of seeding);
  *  - a new seed or a new ε against the same version is a NEW release and
  *    spends ε from that version's budget;
  *  - different dataset versions have independent budgets (they are
  *    different neighboring-database games).
  *
  * Driver-side state (a mutable map guarded by `synchronized`) — budget
  * accounting is a control-plane decision made where releases are
  * ordered, never a distributed computation. A multi-driver deployment
  * would back the same interface with a transactional store. */
final class PrivacyLedger(val budget: Double) {
  require(budget > 0, "privacy budget must be positive")

  private val spentByVersion = scala.collection.mutable.Map[String, Double]()
  private val released = scala.collection.mutable.Set[(String, String, Double)]()

  /** ε already spent against `datasetVersion`. */
  def spent(datasetVersion: String): Double = synchronized {
    spentByVersion.getOrElse(datasetVersion, 0.0)
  }

  def remaining(datasetVersion: String): Double = budget - spent(datasetVersion)

  /** Release DP counts of `df` grouped by `groupCol`, spending `epsilon`
    * of `datasetVersion`'s budget — or throw WITHOUT releasing when the
    * spend would exceed it. Replaying a (version, seed, ε) this ledger
    * has already released is free. */
  def release(df: DataFrame, groupCol: String, epsilon: Double,
      seed: String, datasetVersion: String): DataFrame = synchronized {
    require(epsilon > 0, "epsilon must be positive")
    val key = (datasetVersion, seed, epsilon)
    if (!released.contains(key)) {
      val cur = spent(datasetVersion)
      if (cur + epsilon > budget + 1e-12)
        throw new IllegalStateException(
          f"privacy budget exhausted for dataset '$datasetVersion': " +
            f"spent ε=$cur%.4f of $budget%.4f, refusing a further " +
            f"ε=$epsilon%.4f release (seed '$seed'). Mint a new dataset " +
            "version or raise the budget deliberately.")
      spentByVersion(datasetVersion) = cur + epsilon
      released += key
    }
    Stats.dpCounts(df, groupCol, epsilon, seed, datasetVersion)
  }
}

/** Scoped cache cleanup for the persist()-ing operators ([[Stats]],
  * [[Graph]], [[Dedup]], [[Similarity]]): the operators return LAZY
  * frames, so they cannot unpersist on the caller's behalf — this helper
  * gives a long-lived service the one-call lifecycle the scaladocs
  * promise. `withCaches` snapshots the persisted-RDD set, runs the block
  * (which should MATERIALIZE whatever it returns — an action, a write,
  * a collect), and unpersists every cache the block created, leaving
  * pre-existing caches untouched. */
object Caches {

  /** Run `body` and unpersist every RDD it left persisted that was not
    * persisted before — scoped cleanup that cannot evict a cache someone
    * else is relying on (unlike `spark.catalog.clearCache()`).
    *
    * The returned value must already be MATERIALIZED by the block: a lazy
    * frame computed from an operator's internal cache recomputes from
    * source after that cache is dropped (correct, just slower). */
  def withCaches[T](spark: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    try body
    finally {
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!before.contains(id)) rdd.unpersist(blocking = false)
      }
    }
  }
}
