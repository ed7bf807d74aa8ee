package graft.model

/** A header pinned to a physical (row, column) cell of a spreadsheet, with an
  * optional output alias. Mirrors the reference's `HeaderCell`
  * (reference: src/templates.py:63-95).
  */
final case class HeaderCell(
    name: String,
    column: Int,
    row: Int,
    alias: Option[String] = None,
    isMetadata: Boolean = false,
    metadataType: String = "header",
) {
  def toMap: Map[String, Any] = Map(
    "name" -> name,
    "column" -> column,
    "row" -> row,
    "alias" -> alias.orNull,
    "is_metadata" -> isMetadata,
    "metadata_type" -> metadataType,
  )
}

object HeaderCell {
  def fromMap(m: Map[String, Any]): HeaderCell = HeaderCell(
    name = m.getOrElse("name", "").toString,
    column = Template.asInt(m.getOrElse("column", 0)),
    row = Template.asInt(m.getOrElse("row", 0)),
    alias = Option(m.getOrElse("alias", null)).map(_.toString),
    isMetadata = Template.asBool(m.getOrElse("is_metadata", false)),
    metadataType = m.getOrElse("metadata_type", "header").toString,
  )
}

/** Declarative recipe describing how to read a source and which transforms to
  * apply — the engine's logical plan. Field set and defaults mirror the
  * reference's `Template` dataclass (reference: src/templates.py:98-296),
  * including the `from_dict` back-compat aliases (`sheet_name`, `header`,
  * `selected_headers`, `header_mapping`, `excel_file`).
  */
final case class Template(
    sheet: Option[String] = None,
    sheets: List[String] = Nil,
    headerRow: Int = 0,
    columns: List[String] = Nil,
    columnMappings: Map[String, String] = Map.empty,
    headers: List[HeaderCell] = Nil,
    skiprows: List[Int] = Nil,
    delimiter: String = ",",
    encoding: String = "utf-8",
    sourceType: String = "excel",
    sourceFile: Option[String] = None,
    outputDir: Option[String] = None,
    providerName: Option[String] = None,
    combineSheets: Boolean = false,
    combineOn: List[String] = Nil,
    connectionName: Option[String] = None,
    sqlTable: Option[String] = None,
    sqlQuery: Option[String] = None,
    trimStrings: Boolean = true,
    dropEmptyRows: Boolean = false,
    dropNullColumnsThreshold: Option[Double] = None,
    dedupeOn: List[String] = Nil,
    stripThousands: Boolean = false,
    unpivot: Boolean = false,
    idColumns: List[String] = Nil,
    varName: String = "report_date",
    valueName: String = "sales_amount",
    requiredFields: List[String] = Nil,
    fieldTypes: Map[String, String] = Map.empty,
    templateVersion: Int = 3,
) {

  /** Serialization shape matches the reference's `Template.to_dict`
    * (reference: src/templates.py:133-166).
    */
  def toMap: Map[String, Any] = Map(
    "template_version" -> templateVersion,
    "source_type" -> sourceType,
    "sheet" -> sheet.orNull,
    "sheets" -> sheets,
    "header_row" -> headerRow,
    "skiprows" -> skiprows,
    "delimiter" -> delimiter,
    "encoding" -> encoding,
    "columns" -> columns,
    "column_mappings" -> columnMappings,
    "headers" -> headers.map(_.toMap),
    "source_file" -> sourceFile.orNull,
    "output_dir" -> outputDir.orNull,
    "provider_name" -> providerName.orNull,
    "combine_sheets" -> combineSheets,
    "combine_on" -> combineOn,
    "connection_name" -> connectionName.orNull,
    "trim_strings" -> trimStrings,
    "drop_empty_rows" -> dropEmptyRows,
    "drop_null_columns_threshold" -> dropNullColumnsThreshold
      .map(Double.box)
      .orNull,
    "dedupe_on" -> dedupeOn,
    "strip_thousands" -> stripThousands,
    "sql_table" -> sqlTable.orNull,
    "sql_query" -> sqlQuery.orNull,
    "unpivot" -> unpivot,
    "id_columns" -> idColumns,
    "var_name" -> varName,
    "value_name" -> valueName,
    "required_fields" -> requiredFields,
    "field_types" -> fieldTypes,
  )
}

object Template {

  private[model] def asInt(v: Any): Int = v match {
    case null => 0
    case i: Int => i
    case l: Long => l.toInt
    case d: Double => d.toInt
    case n: Number => n.intValue()
    case s: String if s.trim.nonEmpty => s.trim.toDouble.toInt
    case _ => 0
  }

  private[model] def asBool(v: Any): Boolean = v match {
    case null => false
    case b: Boolean => b
    case n: Number => n.doubleValue() != 0.0
    case s: String => s.equalsIgnoreCase("true") || s == "1"
    case _ => false
  }

  private def strList(v: Any): List[String] = v match {
    case l: Seq[_] => l.collect { case x if x != null => x.toString }.toList
    case l: java.util.List[_] =>
      import scala.jdk.CollectionConverters._
      l.asScala.collect { case x if x != null => x.toString }.toList
    case _ => Nil
  }

  private def strMap(v: Any): Map[String, String] = v match {
    case m: Map[_, _] =>
      m.collect { case (k, x) if k != null && x != null => k.toString -> x.toString }.toMap
    case m: java.util.Map[_, _] =>
      import scala.jdk.CollectionConverters._
      m.asScala.collect { case (k, x) if k != null && x != null => k.toString -> x.toString }.toMap
    case _ => Map.empty
  }

  private def anyList(v: Any): List[Any] = v match {
    case l: Seq[_] => l.toList
    case l: java.util.List[_] =>
      import scala.jdk.CollectionConverters._
      l.asScala.toList
    case _ => Nil
  }

  private def anyMap(v: Any): Map[String, Any] = v match {
    case m: Map[_, _] => m.map { case (k, x) => k.toString -> (x: Any) }.toMap
    case m: java.util.Map[_, _] =>
      import scala.jdk.CollectionConverters._
      m.asScala.map { case (k, x) => k.toString -> (x: Any) }.toMap
    case _ => Map.empty
  }

  private def opt(m: Map[String, Any], key: String): Option[String] =
    m.get(key).flatMap(Option(_)).map(_.toString)

  /** Versioned, alias-tolerant parse; semantics of the reference's
    * `Template.from_dict` (reference: src/templates.py:167-296):
    *  - `sheet_name` → `sheet`, `header` → `header_row`,
    *    `selected_headers` → `columns`, `header_mapping` → `column_mappings`,
    *    `excel_file` → `source_file`;
    *  - comma-split string forms accepted for `combine_on` / `dedupe_on`;
    *  - single `sheet` promoted into `sheets`; >1 sheets ⇒ `combine_sheets`;
    *  - `headers` back-fill `columns`; `column_mappings` keys back-fill too.
    */
  def fromMap(payload: Map[String, Any]): Template = {
    val sheet = opt(payload, "sheet").orElse(opt(payload, "sheet_name"))
    var sheets = strList(payload.getOrElse("sheets", Nil))
    val headerRow =
      payload.get("header_row").orElse(payload.get("header")).flatMap(Option(_)).map(asInt).getOrElse(0)
    var columns = strList(
      payload.get("columns").orElse(payload.get("selected_headers")).getOrElse(Nil))
    val columnMappings = strMap(
      payload.get("column_mappings").orElse(payload.get("header_mapping")).getOrElse(Map.empty))
    val headers = anyList(payload.getOrElse("headers", Nil)).map(h => HeaderCell.fromMap(anyMap(h)))
    val skiprows = anyList(payload.getOrElse("skiprows", Nil)).map(asInt)

    def listOrCommaSplit(key: String): List[String] = payload.get(key) match {
      case Some(s: String) => s.split(",").map(_.trim).filter(_.nonEmpty).toList
      case Some(other) => strList(other).filter(_.nonEmpty)
      case None => Nil
    }

    var combineSheets = asBool(payload.getOrElse("combine_sheets", false))
    if (sheets.isEmpty && sheet.isDefined) sheets = List(sheet.get)
    if (!combineSheets && sheets.length > 1) combineSheets = true

    if (headers.nonEmpty && columns.isEmpty) columns = headers.map(_.name)
    if (columns.isEmpty && columnMappings.nonEmpty) columns = columnMappings.keys.toList

    val threshold = payload.get("drop_null_columns_threshold").flatMap(Option(_)).flatMap {
      case n: Number => Some(n.doubleValue())
      case s: String => scala.util.Try(s.toDouble).toOption
      case _ => None
    }

    Template(
      sheet = sheet,
      sheets = sheets,
      headerRow = headerRow,
      columns = columns,
      columnMappings = columnMappings,
      headers = headers,
      skiprows = skiprows,
      delimiter = opt(payload, "delimiter").getOrElse(","),
      encoding = opt(payload, "encoding").getOrElse("utf-8"),
      sourceType = opt(payload, "source_type").getOrElse("excel"),
      sourceFile = opt(payload, "source_file").orElse(opt(payload, "excel_file")),
      outputDir = opt(payload, "output_dir"),
      providerName = opt(payload, "provider_name"),
      combineSheets = combineSheets,
      combineOn = listOrCommaSplit("combine_on"),
      connectionName = opt(payload, "connection_name"),
      sqlTable = opt(payload, "sql_table"),
      sqlQuery = opt(payload, "sql_query"),
      trimStrings = asBool(payload.getOrElse("trim_strings", true)),
      dropEmptyRows = asBool(payload.getOrElse("drop_empty_rows", false)),
      dropNullColumnsThreshold = threshold,
      dedupeOn = listOrCommaSplit("dedupe_on"),
      stripThousands = asBool(payload.getOrElse("strip_thousands", false)),
      unpivot = asBool(payload.getOrElse("unpivot", false)),
      idColumns = strList(payload.getOrElse("id_columns", Nil)),
      varName = opt(payload, "var_name").getOrElse("report_date"),
      valueName = opt(payload, "value_name").getOrElse("sales_amount"),
      requiredFields = listOrCommaSplit("required_fields"),
      fieldTypes = strMap(payload.getOrElse("field_types", Map.empty)),
      templateVersion = asInt(payload.getOrElse("template_version", 3)),
    )
  }
}
