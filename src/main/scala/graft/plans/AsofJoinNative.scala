package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The FULL custom-operator ladder for the one operator Spark genuinely
  * lacks: a native as-of join (Pandas `merge_asof` semantics — each left
  * row matches the LATEST right row with the same key and
  * `rightTime <= leftTime`).
  *
  * Logical node → planner strategy → physical exec with distribution +
  * ordering REQUIREMENTS: the engine inserts the hash exchanges and
  * per-partition sorts (and can satisfy them for free if either side is
  * already bucketed/sorted — something the composed union+window
  * formulation in [[graft.operators.AsofJoin]] can never express). The
  * merge itself is one forward pass per partition: O(|L|+|R|), no
  * buffering beyond ONE carried right row, no window state.
  *
  * Registered via `SparkSessionExtensions.injectPlannerStrategy`
  * (GraftExtensions) — the (c) tier of the custom-operator preference
  * order after composition (a) and native expressions (b). */
case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute) extends BinaryNode {

  // right side is outer: every column it contributes may be null
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Physical as-of merge join. Children arrive hash-clustered by key and
  * sorted by (key, time) — declared below, enforced by EnsureRequirements —
  * so each partition holds complete key groups on both sides in time
  * order, and one synchronized forward scan joins them. */
case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) :: Nil

  // output keeps the left ordering the merge consumed
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    import org.apache.spark.sql.catalyst.expressions.Expression
    val lKey = BindReferences.bindReference[Expression](leftKey, left.output)
    val lTime = BindReferences.bindReference[Expression](leftTime, left.output)
    val rKey = BindReferences.bindReference[Expression](rightKey, right.output)
    val rTime = BindReferences.bindReference[Expression](rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val rightWidth = right.output.size

    val outputAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      // downstream operators (exchanges in particular) require UnsafeRow;
      // the identity projection materializes the JoinedRow view
      val toUnsafe = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(outputAttrs, outputAttrs)
      // one-row lookahead into the right side (rows are reused buffers —
      // anything held across next() must be copied)
      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      var lastMatch: InternalRow = null // copy of latest right row ≤ current left
      var lastMatchKey: Any = null
      lIter.map { l =>
        val lk = lKey.eval(l)
        val lt = lTime.eval(l)
        // drop the carried match when the key group changes
        if (lastMatch != null && keyOrd.compare(lastMatchKey, lk) != 0) {
          lastMatch = null; lastMatchKey = null
        }
        // advance right past every row at a smaller key, and through rows
        // of THIS key with time <= left time (the latest one wins)
        var advancing = true
        while (advancing && rHead != null) {
          val rk = rKey.eval(rHead)
          val kc = keyOrd.compare(rk, lk)
          if (kc < 0) {
            rHead = if (rIter.hasNext) rIter.next() else null
          } else if (kc == 0 && timeOrd.compare(rTime.eval(rHead), lt) <= 0) {
            lastMatch = rHead.copy(); lastMatchKey = lk
            rHead = if (rIter.hasNext) rIter.next() else null
          } else advancing = false
        }
        toUnsafe(
          if (lastMatch != null) joined(l, lastMatch) else joined(l, nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: one case, the as-of node. Injected by
  * [[graft.functions.GraftExtensions]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, lt, rk, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

object AsofJoinNative {
  /** Public API: native as-of LEFT join. Column names must be disjoint
    * across the two sides (alias the right side first); keys and times
    * must be non-null (null keys sort into their own group and never
    * match). */
  def join(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      leftKeyCol: String, leftTimeCol: String,
      rightKeyCol: String, rightTimeCol: String)
      : org.apache.spark.sql.DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    require(lp.output.map(_.name).intersect(rp.output.map(_.name)).isEmpty,
      "asof sides must have disjoint column names — alias the right side")
    def att(p: LogicalPlan, n: String) = p.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no column $n"))
    val spark = left.sparkSession
    // idempotent self-registration: the strategy must be visible to THIS
    // session's planner even when GraftExtensions wasn't configured
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        AsofJoinStrategy +: spark.experimental.extraStrategies
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark,
      AsofJoinNode(lp, rp, att(lp, leftKeyCol), att(lp, leftTimeCol),
        att(rp, rightKeyCol), att(rp, rightTimeCol)))
  }
}
