package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** F1/F2 Query Builder: declarative filters AND-folded onto a frame, plus the
  * equivalent SQL text (reference: webapp/pages/04_Query_Builder.py:29-75).
  */
object QueryBuilder {

  /** One filter row: operator ∈ {=, !=, >, >=, <, <=, contains}. */
  final case class Filter(column: String, operator: String = "=", value: String = "")

  /** F1: apply filters, AND-combined, with the reference's exact semantics
    * (reference: webapp/pages/04_Query_Builder.py:46-75):
    *  - blank column/value or unknown column ⇒ filter skipped;
    *  - numeric columns coerce the literal to double — and SKIP the whole
    *    filter if the literal doesn't parse (the pandas `except: continue`);
    *  - `contains` = substring over the stringified column, null ⇒ false.
    */
  def applyFilters(df: DataFrame, filters: Seq[Filter]): DataFrame =
    filters.foldLeft(df) { (d, f) =>
      val colName = f.column.trim
      val op = Option(f.operator).map(_.trim).filter(_.nonEmpty).getOrElse("=")
      val raw = f.value.trim
      if (colName.isEmpty || raw.isEmpty || !d.columns.contains(colName)) d
      else {
        val c = col(s"`${colName.replace("`", "``")}`")
        val isNumeric = d.schema(colName).dataType.isInstanceOf[NumericType]
        val lit0: Option[Column] =
          if (isNumeric) raw.toDoubleOption.map(lit(_)) else Some(lit(raw))
        lit0 match {
          case None => d // numeric column, unparseable literal: skip filter
          case Some(v) =>
            val pred: Option[Column] = op.toLowerCase match {
              case "=" => Some(c === v)
              case "!=" => Some(c =!= v)
              case ">" => Some(c > v)
              case ">=" => Some(c >= v)
              case "<" => Some(c < v)
              case "<=" => Some(c <= v)
              case "contains" => Some(coalesce(c.cast("string").contains(raw), lit(false)))
              case _ => None // unknown operator: skip filter
            }
            pred.map(d.filter).getOrElse(d)
        }
      }
    }

  /** F2: generate the SQL text the reference shows the user — always
    * string-literal quoting, `contains` → LIKE '%v%'
    * (reference: webapp/pages/04_Query_Builder.py:29-43). */
  def buildSql(selectedCols: Seq[String], filters: Seq[Filter],
      table: String = "data"): String = {
    val select = if (selectedCols.nonEmpty) selectedCols.mkString(", ") else "*"
    val parts = filters.flatMap { f =>
      val colName = f.column.trim
      val op = Option(f.operator).map(_.trim).filter(_.nonEmpty).getOrElse("=")
      val v = f.value.trim
      if (colName.isEmpty || v.isEmpty) None
      else if (op.equalsIgnoreCase("contains")) Some(s"$colName LIKE '%$v%'")
      else Some(s"$colName $op '$v'")
    }
    val where = if (parts.nonEmpty) s" WHERE ${parts.mkString(" AND ")}" else ""
    s"SELECT $select FROM $table$where;"
  }

  /** O4 SQL LIMIT injection: append `LIMIT n` unless the statement already
    * carries a limit/fetch clause (reference: src/connectors.py:109-119).
    * Catalyst pushes the resulting LocalLimit into the scan. */
  def injectLimit(sql: String, n: Int): String = {
    val trimmed = sql.trim.stripSuffix(";")
    // word-boundary match: a LIMIT/FETCH preceded by any whitespace (newline,
    // tab) or ending the statement still counts — a literal " limit " probe
    // would double-append and break the pushed-down preview query
    val hasLimit = "(?is).*\\b(limit|fetch)\\b.*".r.matches(trimmed)
    if (hasLimit) trimmed else s"$trimmed LIMIT $n"
  }

  /** Run generated SQL against a temp view of the frame — the Spark shape of
    * the reference's "SQL preview" path. */
  def runSql(df: DataFrame, selectedCols: Seq[String], filters: Seq[Filter]): DataFrame = {
    val view = s"data_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    df.createOrReplaceTempView(view)
    df.sparkSession.sql(buildSql(selectedCols, filters, view).stripSuffix(";"))
  }
}
