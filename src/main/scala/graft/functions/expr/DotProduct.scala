package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, NullType}

/** Native Catalyst expression for the dot product of two double arrays.
  *
  * Why a custom expression instead of `aggregate(zip_with(...))`: Catalyst
  * higher-order functions are INTERPRETED — every element evaluates a
  * lambda through the expression interpreter with boxing, and the whole
  * operator falls out of whole-stage codegen. For similarity search the
  * dot product IS the hot loop (pairs × dimensions executions); this
  * expression is a primitive `while` loop over `ArrayData`, emitted as a
  * static call inside generated code.
  *
  * Summation is left-to-right — the same fold order as
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — so results are
  * bit-identical to the HOF formulation (and to DuckDB's
  * `list_dot_product`, which the correctness oracles rely on). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _) | NullType, ArrayType(DoubleType, _) | NullType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_product requires array<double> arguments, got ${l.sql}, ${r.sql}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expr.DotProduct.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Static entry shared by interpreted eval and generated code. Null
    * elements contribute 0 (embeddings carry none; this keeps the loop
    * branch-light instead of poisoning the whole sum). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}
