package graft.functions

import graft.functions.expr.{DotProduct, DurationSeconds, JaroWinkler, LuhnValid, NfcNormalize}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers graft's native expressions
  * as SQL functions. Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.durationSecondsFn)
    ext.injectFunction(GraftExtensions.dotProductFn)
    ext.injectFunction(GraftExtensions.nfcNormalizeFn)
    ext.injectFunction(GraftExtensions.jaroWinklerFn)
    ext.injectFunction(GraftExtensions.luhnValidFn)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}

object GraftExtensions {
  private val durationSecondsFn = (
    new FunctionIdentifier("duration_seconds"),
    new ExpressionInfo(classOf[DurationSeconds].getName, "duration_seconds"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 1, "duration_seconds takes exactly one argument")
      DurationSeconds(children.head)
    })

  private val dotProductFn = (
    new FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2, "dot_product takes exactly two arguments")
      DotProduct(children.head, children(1))
    })

  private val nfcNormalizeFn = (
    new FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 1, "nfc_normalize takes exactly one argument")
      NfcNormalize(children.head)
    })

  private val jaroWinklerFn = (
    new FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2, "jaro_winkler takes exactly two arguments")
      JaroWinkler(children.head, children(1))
    })

  private val luhnValidFn = (
    new FunctionIdentifier("luhn_valid"),
    new ExpressionInfo(classOf[LuhnValid].getName, "luhn_valid"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 1, "luhn_valid takes exactly one argument")
      LuhnValid(children.head)
    })

  /** Register into an already-running session (the config-based extension
    * only applies to sessions created after it is set). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "duration_seconds", durationSecondsFn._3, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", dotProductFn._3, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", nfcNormalizeFn._3, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", jaroWinklerFn._3, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "luhn_valid", luhnValidFn._3, "scala_udf")
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsofJoinStrategy))
      spark.experimental.extraStrategies =
        graft.plans.AsofJoinStrategy +: spark.experimental.extraStrategies
  }
}
