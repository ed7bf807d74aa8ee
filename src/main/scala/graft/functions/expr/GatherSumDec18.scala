package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, NullType}

/** Exact scale-18 decimal sum of GATHERED values — per row,
  * `Σ dec18(values[indices(i)])` over an `array<long>` index column and
  * an `array<double>` value table (typically a broadcast literal):
  * the NATIVE map-only replacement for the join + per-group
  * `sum(CAST(x·w AS DECIMAL(28,18)))` idiom when the value table is
  * driver-bounded (the logistic family's per-document logit z over the
  * (dim+1)-entry weight vector — see
  * [[graft.functions.Curation]] logisticWeights). Each gathered value
  * is quantized exactly like Spark's double→DECIMAL(28,18) cast
  * ([[VecMomentsDec18.quantize18]]; non-finite / precision-28 overflow
  * terms are skipped like the cast's null under `sum`), accumulated
  * exactly ([[Dec18Sums]]), and the exact total converts to double once
  * — value-identical to the join-aggregate formulation for any order.
  * Out-of-range or null-index entries contribute nothing (the inner
  * join's missing-row semantics). Codegen'd: one static call per row,
  * no join, no shuffle, no aggregation. */
case class GatherSumDec18(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _) | NullType,
            ArrayType(DoubleType, _) | NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"gather_sum_dec18 requires (array<bigint>, array<double>), got " +
          s"${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "gather_sum_dec18"

  override protected def nullSafeEval(idx: Any, vals: Any): Any =
    GatherSumDec18.gather(idx.asInstanceOf[ArrayData],
      vals.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expr.GatherSumDec18.gather($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): GatherSumDec18 =
    copy(left = newLeft, right = newRight)
}

object GatherSumDec18 {
  def gather(idx: ArrayData, vals: ArrayData): Double = {
    val acc = new Dec18Sums(1)
    val scratch = new Array[Long](2)
    val n = idx.numElements()
    val m = vals.numElements()
    var i = 0
    while (i < n) {
      if (!idx.isNullAt(i)) {
        val b = idx.getLong(i)
        if (b >= 0L && b < m && !vals.isNullAt(b.toInt))
          acc.addTerm(0, vals.getDouble(b.toInt), scratch)
      }
      i += 1
    }
    acc.total(0).doubleValue
  }

  /** Column form: exact dec18 sum of `values(i)` for i in `indices`. */
  def gatherSumDec18(indices: org.apache.spark.sql.Column,
      values: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(GatherSumDec18(Bridge.expression(indices),
      Bridge.expression(values)))
  }
}
