package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import java.util.regex.Pattern

/** Native Catalyst expression for ISO-8601 duration → seconds
  * (reference semantics: src/youtube.py:64-83 — anchored
  * `P(nD)?(T(nH)?(nM)?(nS)?)?`, 0 on any parse failure).
  *
  * Why a custom expression instead of built-ins: the pure-`functions._`
  * formulation needs `rlike` + 4 `regexp_extract`s = up to 9 regex
  * executions per row. This expression compiles ONE static Pattern and
  * matches once; `doGenCode` emits a static call so the whole thing stays
  * inside whole-stage codegen (no UDF boxing, no Row serialization).
  */
case class DurationSeconds(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // NullType: a bare NULL literal — evaluates to null, never reaches parse
    case StringType | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"duration_seconds requires a string argument, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "duration_seconds"

  override protected def nullSafeEval(input: Any): Any =
    DurationSeconds.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expr.DurationSeconds.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): DurationSeconds =
    copy(child = newChild)
}

object DurationSeconds {
  private val pattern: Pattern =
    Pattern.compile("^P(?:(\\d+)D)?(?:T(?:(\\d+)H)?(?:(\\d+)M)?(?:(\\d+)S)?)?$")

  /** Static parse entry shared by interpreted eval and generated code. */
  def parse(s: UTF8String): Long = {
    if (s == null) return 0L
    val m = pattern.matcher(s.toString)
    if (!m.matches()) return 0L
    def g(i: Int): Long = { val v = m.group(i); if (v == null) 0L else v.toLong }
    g(1) * 86400L + g(2) * 3600L + g(3) * 60L + g(4)
  }
}
