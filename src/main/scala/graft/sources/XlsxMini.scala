package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable

/** Minimal XLSX codec (SURVEY §7.3): an .xlsx file is a zip of XML parts.
  * The container has no POI/spark-excel (offline build), so this implements
  * just enough OOXML for the reference's Excel surface: cell values
  * (inline/shared strings, numbers, booleans), sheet listing, and merged
  * ranges — S1/S3/S6 reads and K1/K5 writes
  * (reference: src/templates.py:406-465,515-588; src/exporter.py:36-58).
  *
  * Strictly driver-side: spreadsheets are template/summary-scale artifacts.
  * Bulk data flows through the parquet/csv/json sources instead (the 100 TB
  * path); this codec never touches an executor.
  */
object XlsxMini {

  /** One worksheet: a dense row-major grid (null = empty cell; values are
    * String | Double | Boolean) plus merged ranges as (r1, c1, r2, c2),
    * all 0-indexed inclusive. Presentation extras mirror the reference
    * summary workbook (src/exporter.py:44-57): `freezeAt` freezes panes
    * above/left of the given cell (e.g. "B2" = header row + first column),
    * `autoFilterRef` puts a filter over the given range (e.g. "A1:C10"). */
  final case class Sheet(name: String, grid: Vector[Vector[Any]],
      merged: Seq[(Int, Int, Int, Int)] = Nil,
      freezeAt: Option[String] = None,
      autoFilterRef: Option[String] = None,
      colWidths: Map[Int, Double] = Map.empty,
      colFormats: Map[Int, CellFormat] = Map.empty)

  /** Number formats a column can opt into (beyond the default General and
    * the datetime style every Timestamp cell gets): builtin numFmt ids 4
    * (thousands + 2 decimals) and 10 (percent). */
  sealed abstract class CellFormat(val xfIndex: Int)
  case object NumberFormat extends CellFormat(2)  // #,##0.00
  case object PercentFormat extends CellFormat(3) // 0.00%

  /** openpyxl-recipe auto column widths: max rendered length + 2 padding,
    * clamped to [6, 60] characters. */
  def autoWidths(grid: Vector[Vector[Any]]): Map[Int, Double] = {
    if (grid.isEmpty) return Map.empty
    val nCols = grid.map(_.length).max
    (0 until nCols).map { c =>
      val w = grid.iterator.map { row =>
        if (c < row.length && row(c) != null) row(c).toString.length else 0
      }.max
      c -> math.min(60.0, math.max(6.0, w + 2.0))
    }.toMap
  }

  // ---------------------------------------------------------------- write

  /** Write a workbook. Strings are emitted inline (no sharedStrings part —
    * valid OOXML, and what our reader + pandas/openpyxl both accept). */
  def write(path: Path, sheets: Seq[Sheet]): Unit = {
    require(sheets.nonEmpty, "workbook needs at least one sheet")
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path.toFile)))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    val n = sheets.length
    put("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""" +
      (1 to n).map(i =>
        s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
        .mkString + "</Types>")
    put("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
      """</Relationships>""")
    put("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
      sheets.zipWithIndex.map { case (s, i) =>
        s"""<sheet name="${xmlEscape(s.name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString + "</sheets></workbook>")
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      (1 to n).map(i =>
        s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
        .mkString +
      s"""<Relationship Id="rId${n + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>""" +
      "</Relationships>")
    // minimal styles part: xf 0 = general, xf 1 = builtin datetime (numFmt 22)
    put("xl/styles.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
      """<fonts count="1"><font/></fonts><fills count="1"><fill/></fills>""" +
      """<borders count="1"><border/></borders>""" +
      """<cellStyleXfs count="1"><xf/></cellStyleXfs>""" +
      """<cellXfs count="4"><xf numFmtId="0"/>""" +
      """<xf numFmtId="22" applyNumberFormat="1"/>""" +
      """<xf numFmtId="4" applyNumberFormat="1"/>""" +
      """<xf numFmtId="10" applyNumberFormat="1"/></cellXfs></styleSheet>""")
    sheets.zipWithIndex.foreach { case (s, i) =>
      put(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(s))
    }
    zos.close()
  }

  private def sheetXml(s: Sheet): String = {
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    sb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">"""
    s.freezeAt.foreach { cell =>
      val (row, colIdx) = parseRef(cell) // 0-indexed → splits ARE the counts
      val active =
        if (row > 0 && colIdx > 0) "bottomRight"
        else if (row > 0) "bottomLeft" else "topRight"
      sb ++= s"""<sheetViews><sheetView workbookViewId="0">""" +
        s"""<pane xSplit="$colIdx" ySplit="$row" topLeftCell="$cell"""" +
        s""" activePane="$active" state="frozen"/></sheetView></sheetViews>"""
    }
    if (s.colWidths.nonEmpty) {
      // schema order: cols must precede sheetData
      sb ++= "<cols>"
      s.colWidths.toSeq.sortBy(_._1).foreach { case (c, w) =>
        sb ++= s"""<col min="${c + 1}" max="${c + 1}" width="$w" customWidth="1"/>"""
      }
      sb ++= "</cols>"
    }
    // numeric cells in a formatted column carry that column's style index
    def numStyle(c: Int): String =
      s.colFormats.get(c).map(f => s""" s="${f.xfIndex}"""").getOrElse("")
    sb ++= "<sheetData>"
    s.grid.zipWithIndex.foreach { case (row, r) =>
      sb ++= s"""<row r="${r + 1}">"""
      row.zipWithIndex.foreach { case (v, c) =>
        val ref = s"${colLetter(c)}${r + 1}"
        v match {
          case null | None | "" => // empty cell omitted
          case b: Boolean => sb ++= s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
          case d: Double =>
            val num = if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
                      else d.toString
            sb ++= s"""<c r="$ref"${numStyle(c)}><v>$num</v></c>"""
          case i: Int => sb ++= s"""<c r="$ref"${numStyle(c)}><v>$i</v></c>"""
          case l: Long => sb ++= s"""<c r="$ref"${numStyle(c)}><v>$l</v></c>"""
          case ts: java.sql.Timestamp => // Excel serial, date-styled (xf 1)
            sb ++= s"""<c r="$ref" s="1"><v>${tsToSerial(ts)}</v></c>"""
          case other =>
            sb ++= s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(other.toString)}</t></is></c>"""
        }
      }
      sb ++= "</row>"
    }
    sb ++= "</sheetData>"
    // schema order: autoFilter precedes mergeCells
    s.autoFilterRef.foreach(ref => sb ++= s"""<autoFilter ref="$ref"/>""")
    if (s.merged.nonEmpty) {
      sb ++= s"""<mergeCells count="${s.merged.length}">"""
      s.merged.foreach { case (r1, c1, r2, c2) =>
        sb ++= s"""<mergeCell ref="${colLetter(c1)}${r1 + 1}:${colLetter(c2)}${r2 + 1}"/>"""
      }
      sb ++= "</mergeCells>"
    }
    sb ++= "</worksheet>"
    sb.toString
  }

  // ----------------------------------------------------------------- read

  /** S6 sheet-name listing; `Nil` on failure like the reference
    * (reference: src/services/io.py:121-133). */
  def sheetNames(path: Path): Seq[String] =
    try readWorkbookIndex(path).map(_._1)
    catch { case _: Exception => Nil }

  /** Hard bound on the COMPRESSED workbook size the driver-side parser
    * accepts. XLSX is a config/template format here, not a data format: the
    * reference's workbooks are hand-authored sheets of at most a few
    * thousand rows, parsed on the driver (SURVEY §7.3 — a DataSource V2
    * XlsxMini is the designed fallback if a fixture ever outgrows this).
    * 64 MiB compressed is ~30× the largest reference fixture and still far
    * below driver-heap risk; corpus-scale data flows parquet/csv/jsonl. */
  val MaxWorkbookBytes: Long = 64L * 1024 * 1024

  /** Read every sheet (or one by name/index). */
  def read(path: Path, maxBytes: Long = MaxWorkbookBytes): Seq[Sheet] = {
    val size = Files.size(path)
    require(size <= maxBytes,
      s"$path is $size bytes — over the $maxBytes-byte driver-side " +
        "XLSX bound. Workbooks parse on the driver by design (template " +
        "scale); convert corpus-scale data to parquet/csv/jsonl instead.")
    val zf = new ZipFile(path.toFile)
    try {
      val shared = readSharedStrings(zf)
      val dateStyles = readDateStyles(zf)
      readWorkbookIndex(path).flatMap { case (name, target) =>
        Option(zf.getEntry(s"xl/$target"))
          .map(e => readSheet(zf, e, name, shared, dateStyles))
      }
    } finally zf.close()
  }

  def readSheet(path: Path, sheet: Option[Either[Int, String]]): Option[Sheet] = {
    val all = read(path)
    sheet match {
      case None => all.headOption
      case Some(Left(idx)) => all.lift(idx).orElse(all.headOption)
      case Some(Right(name)) => all.find(_.name == name).orElse(all.headOption)
    }
  }

  /** Workbook sheet list as (name, worksheet-part target) in workbook order. */
  private def readWorkbookIndex(path: Path): Seq[(String, String)] = {
    val zf = new ZipFile(path.toFile)
    try {
      def bytes(name: String): Option[Array[Byte]] =
        Option(zf.getEntry(name)).map(e => zf.getInputStream(e).readAllBytes())
      sheetIndexFromParts(bytes("xl/workbook.xml"),
        bytes("xl/_rels/workbook.xml.rels"))
    } finally zf.close()
  }

  /** Sheet list parsed from already-extracted workbook XML parts — the
    * entry point for the DSv2 source's central-directory read path, which
    * fetches ONLY these two small parts over a seekable remote stream
    * instead of copying the whole archive. */
  def sheetIndexFromParts(workbookXml: Option[Array[Byte]],
      relsXml: Option[Array[Byte]]): Seq[(String, String)] = {
    val rels = mutable.Map[String, String]()
    relsXml.foreach { b =>
      val r = xmlReader(b)
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship")
          rels(attr(r, "Id")) = attr(r, "Target").stripPrefix("/xl/")
      }
      r.close()
    }
    val sheets = mutable.ArrayBuffer[(String, String)]()
    workbookXml.foreach { b =>
      val r = xmlReader(b)
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          val name = attr(r, "name")
          val rid = attr(r, "id")
          sheets += name -> rels.getOrElse(rid, s"worksheets/sheet${sheets.length + 1}.xml")
        }
      }
      r.close()
    }
    sheets.toSeq
  }

  private def readSharedStrings(zf: ZipFile): Vector[String] = {
    Option(zf.getEntry("xl/sharedStrings.xml")) match {
      case None => Vector.empty
      case Some(e) =>
        val r = xmlReader(zf, e)
        val out = mutable.ArrayBuffer[String]()
        var cur: StringBuilder = null
        var inT = false
        while (r.hasNext) r.next() match {
          case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" => cur = new StringBuilder
          case XMLStreamConstants.START_ELEMENT if r.getLocalName == "t" => inT = true
          case XMLStreamConstants.CHARACTERS if inT && cur != null => cur ++= r.getText
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "t" => inT = false
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
            out += cur.toString; cur = null
          case _ =>
        }
        r.close()
        out.toVector
    }
  }

  /** Builtin OOXML date/time number formats (ECMA-376 §18.8.30) plus any
    * custom numFmt whose code carries date tokens outside brackets/quotes. */
  private def readDateStyles(zf: ZipFile): IndexedSeq[Boolean] = {
    val builtinDates = (14 to 22).toSet ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)
    Option(zf.getEntry("xl/styles.xml")) match {
      case None => Vector.empty
      case Some(e) =>
        val r = xmlReader(zf, e)
        val customDate = mutable.Set[Int]()
        val xfDates = mutable.ArrayBuffer[Boolean]()
        var inCellXfs = false
        while (r.hasNext) r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "numFmt" =>
              val code = Option(attrOrNull(r, "formatCode")).getOrElse("")
              val stripped = code.replaceAll("\\[[^\\]]*\\]", "")
                .replaceAll("\"[^\"]*\"", "")
              if (stripped.exists("ymdhs".contains(_)))
                customDate += attr(r, "numFmtId").toInt
            case "cellXfs" => inCellXfs = true
            case "xf" if inCellXfs =>
              val fmt = Option(attrOrNull(r, "numFmtId")).map(_.toInt).getOrElse(0)
              xfDates += (builtinDates.contains(fmt) || customDate.contains(fmt))
            case _ =>
          }
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
            inCellXfs = false
          case _ =>
        }
        r.close()
        xfDates.toVector
    }
  }

  private def readSheet(zf: ZipFile, entry: ZipEntry, name: String,
      shared: Vector[String], dateStyles: IndexedSeq[Boolean]): Sheet = {
    val r = xmlReader(zf, entry)
    val cells = mutable.Map[(Int, Int), Any]()
    val merged = mutable.ArrayBuffer[(Int, Int, Int, Int)]()
    var rowIdx = -1
    var colIdx = -1
    var cellRef: Option[(Int, Int)] = None
    var cellType = ""
    var styleIdx = 0
    var inV = false
    var inIsT = false
    val text = new StringBuilder
    while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "row" =>
          rowIdx = Option(attrOrNull(r, "r")).map(_.toInt - 1).getOrElse(rowIdx + 1)
          colIdx = -1
        case "c" =>
          cellRef = Option(attrOrNull(r, "r")).map(parseRef)
          colIdx = cellRef.map(_._2).getOrElse(colIdx + 1)
          cellType = Option(attrOrNull(r, "t")).getOrElse("")
          styleIdx = Option(attrOrNull(r, "s")).map(_.toInt).getOrElse(0)
          text.clear()
        case "v" => inV = true; text.clear()
        case "is" => text.clear() // runs accumulate across the whole <is>
        case "t" => inIsT = true // do NOT clear: multi-run rich text appends
        case "mergeCell" =>
          val Array(a, b) = attr(r, "ref").split(":")
          val (r1, c1) = parseRef(a); val (r2, c2) = parseRef(b)
          merged += ((r1, c1, r2, c2))
        case _ =>
      }
      case XMLStreamConstants.CHARACTERS if inV || inIsT => text ++= r.getText
      case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
        case "v" =>
          inV = false
          val v: Any = cellType match {
            case "s" => shared.lift(text.toString.trim.toInt).orNull
            case "b" => text.toString.trim == "1"
            case "str" => text.toString
            case _ => text.toString.toDoubleOption.map { d =>
              if (dateStyles.lift(styleIdx).getOrElse(false)) serialToTs(d): Any
              else d: Any
            }.getOrElse(text.toString)
          }
          if (v != null) cells((rowIdx, colIdx)) = v
        case "t" => inIsT = false
        case "is" => // cell written ONCE with all runs concatenated
          if (cellType == "inlineStr") cells((rowIdx, colIdx)) = text.toString
        case _ =>
      }
      case _ =>
    }
    r.close()
    val grid =
      if (cells.isEmpty) Vector.empty[Vector[Any]]
      else {
        val maxR = cells.keys.map(_._1).max
        val maxC = cells.keys.map(_._2).max
        Vector.tabulate(maxR + 1)(r0 => Vector.tabulate(maxC + 1)(c0 =>
          cells.getOrElse((r0, c0), null)))
      }
    Sheet(name, grid, merged.toSeq)
  }

  // ---------------------------------------------------------------- utils

  /** Excel 1900-system serial ↔ epoch, day 25569 = 1970-01-01, treated as
    * UTC for determinism (Excel serials carry no zone). Round-trips to the
    * millisecond. */
  private val EpochSerialDays = 25569.0
  def tsToSerial(ts: java.sql.Timestamp): Double =
    ts.getTime / 86400000.0 + EpochSerialDays
  def serialToTs(serial: Double): java.sql.Timestamp =
    new java.sql.Timestamp(math.round((serial - EpochSerialDays) * 86400000.0))

  def colLetter(idx: Int): String = {
    var i = idx
    val sb = new StringBuilder
    while (i >= 0) { sb.insert(0, ('A' + i % 26).toChar); i = i / 26 - 1 }
    sb.toString
  }

  /** "BC12" → (11, 54), 0-indexed. */
  def parseRef(ref: String): (Int, Int) = {
    val letters = ref.takeWhile(_.isLetter)
    val digits = ref.drop(letters.length)
    val col = letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
    (digits.toInt - 1, col)
  }

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '<' => "&lt;"; case '>' => "&gt;"; case '&' => "&amp;"
      case '"' => "&quot;"; case c => c.toString
    }

  private def xmlReader(zf: ZipFile, e: ZipEntry) = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(zf.getInputStream(e), "UTF-8")
  }

  private def xmlReader(bytes: Array[Byte]) = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes), "UTF-8")
  }

  private def attr(r: javax.xml.stream.XMLStreamReader, name: String): String = {
    val v = attrOrNull(r, name)
    if (v == null) throw new IllegalStateException(s"missing attribute $name")
    v
  }

  private def attrOrNull(r: javax.xml.stream.XMLStreamReader, name: String): String = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == name) return r.getAttributeValue(i)
      i += 1
    }
    null
  }
}
