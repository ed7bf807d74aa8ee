package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: the partial-aggregation algebra Spark
  * uses inside a shuffle, lifted to table level — compute a per-key state
  * ONCE over the base data, then refresh with delta states by summing,
  * never rescanning the base. This is materialized-view refresh for the
  * algebraic aggregates (count/sum, and avg = sum/count at read time).
  *
  * 100 TB design: the state table is |keys| rows; a refresh costs one scan
  * of the DELTA plus a state-sized merge — the base is never touched again.
  * Sums are carried as DECIMAL so merge order can never drift the result
  * (the same trick AnalyticsQueries uses for money sums). */
object Incremental {

  /** Per-key aggregate state: n_rows plus an exact DECIMAL(28,6) sum per
    * value column (named `sum_<col>`). */
  def aggState(df: DataFrame, keys: Seq[String], sumCols: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sumCols.map(c =>
          sum(col(c).cast("decimal(18,6)")).cast("decimal(28,6)").as(s"sum_$c")): _*)

  /** Merge any number of state frames: union + one sum per state column.
    * Associative and commutative — shards/deltas merge in any order. */
  def mergeStates(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "need at least one state")
    val all = states.reduce(_ unionByName _)
    val stateCols = all.columns.filterNot(keys.contains).toSeq
    all.groupBy(keys.map(col): _*)
      .agg(sum(col(stateCols.head)).cast(all.schema(stateCols.head).dataType)
          .as(stateCols.head),
        stateCols.tail.map(c =>
          sum(col(c)).cast(all.schema(c).dataType).as(c)): _*)
  }

  /** Incremental view maintenance for an inner equi-JOIN view V = A ⋈ B:
    * given base relations and insert-deltas, the view delta is
    * ΔV = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB, so the refreshed view is V ∪ ΔV — the
    * base-base join is NEVER recomputed. Returns the refreshed view.
    *
    * 100 TB design: a delta is small, so the three delta joins broadcast
    * the delta side under AQE; the only full-size work on refresh would be
    * re-reading V (a materialized table in practice — here the caller
    * passes it, keeping the operator pure). Delete/update deltas compose
    * from this plus [[Snapshot.changesOnly]] feeds. */
  def deltaJoinRefresh(view: DataFrame, baseA: DataFrame, deltaA: DataFrame,
      baseB: DataFrame, deltaB: DataFrame,
      joinKeysA: Seq[String], joinKeysB: Seq[String]): DataFrame = {
    require(joinKeysA.length == joinKeysB.length, "key arity mismatch")
    val cond = joinKeysA.zip(joinKeysB)
      .map { case (a, b) => col(a) === col(b) }.reduce(_ && _)
    val dV = deltaA.join(baseB, cond)
      .unionByName(baseA.join(deltaB, cond))
      .unionByName(deltaA.join(deltaB, cond))
    view.unionByName(dV)
  }
}
