package graft.operators

import graft.model.Template
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** V1 contract validation, three levels, mirroring the reference's pandera
  * contract (reference: src/api/v1/engine.py:55-80; src/schema.py:12-22):
  *
  *  - `off`     → pass-through;
  *  - `coerce`  → coerce the 4 canonical nullable columns when present
  *                (provider_id: string, article_sku: string,
  *                report_date: timestamp, sales_amount: double), extra
  *                columns allowed (strict=False);
  *  - `contract`→ additionally require `required_fields` present and every
  *                `field_types` coercion to succeed on all non-null values.
  *
  * Failure cases are collected as (column, failure) pairs like pandera's
  * SchemaErrors table; parse-failure counting shares one `agg` pass (A6 —
  * never a second read, SURVEY §7.4.3).
  */
object Contract {

  final case class ValidationResult(
      isValid: Boolean,
      errors: Seq[(String, String)], // (column, failure)
      rowCount: Long,
      data: DataFrame)

  private val canonical: Map[String, DataType] = Map(
    "provider_id" -> StringType,
    "article_sku" -> StringType,
    "report_date" -> TimestampType,
    "sales_amount" -> DoubleType)

  def validate(df: DataFrame, t: Template,
      level: String = "coerce"): ValidationResult = {
    val lv = Option(level).map(_.toLowerCase).getOrElse("coerce")
    if (lv == "off") return ValidationResult(isValid = true, Nil, -1L, df)

    var errors = Vector.empty[(String, String)]

    // contract level: required columns must exist
    if (lv == "contract") {
      val missing = t.requiredFields.filterNot(df.columns.contains)
      errors ++= missing.map(_ -> "missing required column")
      if (errors.nonEmpty)
        return ValidationResult(isValid = false, errors, 0L, df)
    }

    // contract level: field_types must coerce on every non-null value.
    // One fused agg counts failures across all typed columns + total rows.
    if (lv == "contract" && t.fieldTypes.nonEmpty) {
      val typed = t.fieldTypes.filter { case (c, _) => df.columns.contains(c) }
      if (typed.nonEmpty) {
        val failCounts = typed.toSeq.map { case (c, spec) =>
          val src = col(s"`$c`")
          val dt = df.schema(c).dataType
          val coerced = spec.toLowerCase match {
            case "date" | "datetime" => TransformEngine.coerceDate(src, dt)
            case "int" | "integer" => TransformEngine.coerceInt(src, dt)
            case "float" | "number" | "numeric" => TransformEngine.coerceFloat(src, dt)
            case _ => src.cast(StringType)
          }
          sum((src.isNotNull && coerced.isNull).cast("long")).as(c)
        }
        val row = df.agg(count(lit(1)).as("__rows"), failCounts: _*).head()
        val rows = row.getLong(0)
        typed.toSeq.zipWithIndex.foreach { case ((c, spec), i) =>
          val fails = if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1)
          if (fails > 0) errors :+= (c -> s"$fails values not coercible to $spec")
        }
        if (errors.nonEmpty)
          return ValidationResult(isValid = false, errors, rows, df)
      }
    }

    // coerce the canonical contract columns (both levels reach here)
    val out = canonical.foldLeft(df) { case (d, (name, dt)) =>
      if (!d.columns.contains(name) || d.schema(name).dataType == dt) d
      else dt match {
        case TimestampType =>
          d.withColumn(name, TransformEngine.coerceDate(col(s"`$name`"), d.schema(name).dataType))
        case DoubleType =>
          d.withColumn(name, TransformEngine.coerceFloat(col(s"`$name`"), d.schema(name).dataType))
        case _ => d.withColumn(name, col(s"`$name`").cast(dt))
      }
    }
    ValidationResult(isValid = true, errors, -1L, out)
  }

  /** H9 wrapper: expected headers from the template (alias > mappings >
    * columns), diffed against the frame (reference: src/api/v1/engine.py:83-110). */
  def schemaDiff(df: DataFrame, t: Template): (Seq[String], Seq[String]) =
    HeaderDiff.diff(df.columns.toSeq, t)
}
