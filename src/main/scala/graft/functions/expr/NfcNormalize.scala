package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import java.text.Normalizer

/** Native Catalyst expression for Unicode NFC normalization — the first
  * cleanup step of any multilingual curation pipeline (decomposed accents,
  * compatibility variants, and width forms otherwise make byte-level dedup
  * and hashing miss visually-identical text).
  *
  * Why a custom expression: Spark ships NO unicode normalizer in
  * `functions._`, and a Scala UDF would box every row out of Tungsten.
  * `doGenCode` emits one static call, so normalization stays inside
  * whole-stage codegen. The fast path skips re-encoding entirely when the
  * string is already NFC (`Normalizer.isNormalized` — true for pure ASCII,
  * the overwhelming majority of real corpora).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${other.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expr.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static normalize entry shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
