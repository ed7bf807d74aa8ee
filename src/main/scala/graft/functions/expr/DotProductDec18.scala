package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, NullType}

/** Native Catalyst expression for the GATE-GRADE dot product of two double
  * arrays: every per-term product is quantized to DECIMAL(28,18) before the
  * (exact, decimal) sum, and the exact sum is converted to double at the
  * end — bit-identical to the SQL formulation
  * `CAST(sum(CAST(a[i]*b[i] AS DECIMAL(28,18))) AS DOUBLE)` that the
  * determinism discipline of the PCA family relies on (see
  * [[graft.operators.Similarity.pcaTopComponents]]).
  *
  * Replication notes (why this matches Spark's own cast chain exactly):
  * Spark's double→DecimalType cast goes through
  * `Decimal(d)` = `BigDecimal(java.math.BigDecimal.valueOf(d))` (the
  * `Double.toString` constructor, NOT the exact-binary one) followed by
  * `changePrecision(28, 18)` with HALF_UP rounding; `valueOf(x).setScale(18,
  * HALF_UP)` is that exact sequence. Decimal addition is exact, and
  * Spark's decimal→double cast is `BigDecimal.doubleValue` (correctly
  * rounded) — so a driver- or executor-side replay of this loop is
  * bit-identical to the aggregate it replaces.
  *
  * Why a custom expression instead of `aggregate(zip_with(...))` with
  * decimal casts: same reason as [[DotProduct]] — higher-order functions
  * are interpreted per element and break whole-stage codegen, and this dot
  * runs once per corpus row per power-iteration step. */
case class DotProductDec18(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _) | NullType, ArrayType(DoubleType, _) | NullType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_product_dec18 requires array<double> arguments, got ${l.sql}, ${r.sql}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_dec18"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductDec18.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expr.DotProductDec18.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductDec18 = copy(left = newLeft, right = newRight)
}

object DotProductDec18 {
  /** Quantize a double exactly the way Spark's CAST(x AS DECIMAL(28,18))
    * does (Double.toString-based BigDecimal, HALF_UP at scale 18).
    * Callers must guard non-finite inputs (valueOf throws on NaN/±Inf —
    * Spark's cast nulls them; see [[q18OrNull]]). */
  def d18(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x).setScale(18, java.math.RoundingMode.HALF_UP)

  /** The FULL Spark double→DECIMAL(28,18) cast under non-ANSI semantics:
    * NaN/±Infinity cast to null, and a quantized value whose precision
    * exceeds 28 digits (|x| ≥ ~1e10) overflows `changePrecision` and
    * casts to null too. Returns null in both cases so the term-sum loops
    * below SKIP the term — exactly what the SQL aggregate
    * `sum(CAST(... AS DECIMAL(28,18)))` they replace does (sum ignores
    * null terms). Without this, a single NaN embedding crashed every
    * PCA job, and |x| ≥ 1e10 terms silently diverged from the cast. */
  def q18OrNull(x: Double): java.math.BigDecimal = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x))
      return null
    val q = d18(x)
    if (q.precision > 28) null else q
  }

  /** Static entry shared by interpreted eval, generated code, and the
    * driver-side d-vector arithmetic of the PCA machinery. Null elements
    * are skipped, matching the join-based aggregate (a missing (i) row
    * simply contributed no term) — as are terms the double→decimal cast
    * would null (non-finite, precision-28 overflow; see [[q18OrNull]]).
    *
    * The exact decimal sum runs in the split-long accumulator of
    * [[Dec18Sums]] (each term quantized by
    * [[VecMomentsDec18.quantize18]] — the same shortest-decimal HALF_UP
    * sequence as [[q18OrNull]], exhaustively spec-compared), so the hot
    * per-row path allocates one small accumulator instead of one
    * BigDecimal per element. The exact total is identical, hence so is
    * its double conversion. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    val acc = new Dec18Sums(1)
    val scratch = new Array[Long](2)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i))
        acc.addTerm(0, a.getDouble(i) * b.getDouble(i), scratch)
      i += 1
    }
    acc.total(0).doubleValue
  }

  /** Driver-side twin over plain arrays — the same quantize/sum/convert
    * sequence (including the cast's null-skip of non-finite and
    * precision-overflow terms) for the d-bounded vector frames
    * (deflation dots, norms, Rayleigh quotients) that the PCA rewrite
    * keeps on the driver. */
  def dotArr(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      val q = q18OrNull(a(i) * b(i))
      if (q ne null) acc = acc.add(q)
      i += 1
    }
    acc.doubleValue
  }
}
