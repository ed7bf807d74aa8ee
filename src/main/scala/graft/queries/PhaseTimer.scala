package graft.queries

/** Wall-clock sub-timings for the lifecycle-chain queries (build /
  * maintain / serve), accumulated by the query bodies and drained by
  * [[graft.Bench]] into a `phases` map next to `queries` in the bench
  * JSON line. A 40-second chain total hides a serve-path regression —
  * at 100 TB the SERVE rows are the latency-critical signal while the
  * build/maintain rows are amortized background cost, so they must be
  * priced separately (r14 verdict #4). The chain bodies wrap their
  * eager build/maintain blocks in [[time]]; whatever the final count()
  * pays beyond the recorded phases is the lazily-executed serve, which
  * Bench folds into the `serve` entry. Recording costs two nanoTime
  * reads per phase; Verify runs the same bodies and Bench drains
  * per-query either way, so phases can never leak across queries. */
object PhaseTimer {
  private val acc = scala.collection.mutable.LinkedHashMap[
    String, scala.collection.mutable.LinkedHashMap[String, Double]]()

  /** Time `body` under (query, phase); repeated calls accumulate. */
  def time[T](query: String, phase: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally {
      val dt = (System.nanoTime() - t0) / 1e9
      synchronized {
        val m = acc.getOrElseUpdate(query,
          scala.collection.mutable.LinkedHashMap[String, Double]())
        m(phase) = m.getOrElse(phase, 0.0) + dt
      }
    }
  }

  /** Return and clear the recorded phases for one query (insertion
    * order preserved: build before maintain before serve). */
  def drain(query: String): Seq[(String, Double)] = synchronized {
    acc.remove(query).map(_.toSeq).getOrElse(Seq.empty)
  }
}
