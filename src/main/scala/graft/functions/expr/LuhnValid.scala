package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Luhn (mod-10) payment-card validation: true iff the input,
  * ignoring single space/dash separators, is 13–19 digits whose Luhn
  * checksum holds. Any other character makes it false (not null — a
  * malformed candidate is a non-card, not missing data).
  *
  * Why a custom expression: the `functions._` formulation needs a
  * regexp_replace + reverse + sequence/transform/aggregate HOF chain —
  * per-row lambda interpretation with array materialization. This is one
  * branch-free-ish byte scan, right to left, with no allocation, and
  * `doGenCode` emits a static call so it stays inside whole-stage codegen.
  */
case class LuhnValid(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"luhn_valid requires a string argument, got ${other.sql}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "luhn_valid"

  override protected def nullSafeEval(input: Any): Any =
    LuhnValid.check(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expr.LuhnValid.check($c)")

  override protected def withNewChildInternal(newChild: Expression): LuhnValid =
    copy(child = newChild)
}

object LuhnValid {
  /** Static check shared by interpreted eval and generated code. */
  def check(s: UTF8String): Boolean = {
    if (s == null) return false
    val bytes = s.getBytes
    var sum = 0
    var nDigits = 0
    var double = false // from the RIGHT, every second digit doubles
    var i = bytes.length - 1
    while (i >= 0) {
      val b = bytes(i)
      if (b >= '0' && b <= '9') {
        var d = b - '0'
        if (double) { d *= 2; if (d > 9) d -= 9 }
        sum += d
        nDigits += 1
        double = !double
      } else if (b != ' ' && b != '-') {
        return false
      }
      i -= 1
    }
    nDigits >= 13 && nDigits <= 19 && sum % 10 == 0
  }
}
