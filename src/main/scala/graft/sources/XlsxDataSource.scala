package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.{Map => JMap, Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Distributed XLSX scan — the DataSource V2 fallback SURVEY §7.3 names for
  * when a workbook corpus outgrows the driver-side [[TemplateReader]] path
  * (reference read surface: src/templates.py:515-588; the reference itself
  * is single-process pandas, so distribution is a beyond-reference design).
  *
  * Usage: `spark.read.format("graft-xlsx").option("headerRow", 0)
  * .load(dirOrFile)` — reads every `*.xlsx` under the path.
  *
  * Scale shape: the unit of distribution is the WORKSHEET — one
  * `InputPartition` per (file, sheet), so a directory of thousands of
  * workbooks scans with full cluster parallelism, and each task's memory
  * is bounded by [[XlsxMini.MaxWorkbookBytes]] per workbook (enforced
  * before any parse). Executors fetch their workbook through the Hadoop
  * filesystem API (local paths open in place; remote files copy to a
  * task-local temp file, because a zip central directory needs random
  * access). Column pruning pushes into the reader
  * (`SupportsPushDownRequiredColumns`): pruned columns are never
  * converted, and `.explain` shows the pruned ReadSchema.
  *
  * Schema: inferred on the driver from the FIRST file's first selected
  * sheet ([[TemplateReader.sheetToFrame]]'s pandas rules — all-Double →
  * double, all-Boolean → boolean, date-styled → timestamp, else string;
  * duplicate headers dedupe as `x`, `x.1`), plus `source_file` /
  * `source_sheet` lineage columns (the P4 semantics, scan-time literals).
  * Every other sheet maps its columns BY HEADER NAME; a name absent from
  * a sheet reads as null, and a cell whose runtime type contradicts the
  * inferred column type reads as null rather than failing the task
  * (heterogeneous directories should pass an explicit `.schema(...)` —
  * `supportsExternalMetadata` is on).
  */
class XlsxDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-xlsx"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    XlsxDataSource.inferSchema(XlsxDataSource.Opts(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new XlsxTable(schema,
      XlsxDataSource.Opts(new CaseInsensitiveStringMap(properties)))
}

object XlsxDataSource {

  /** Parsed reader options; serializable (rides inside partitions). */
  final case class Opts(path: String, sheet: Option[String], headerRow: Int)

  object Opts {
    def apply(o: CaseInsensitiveStringMap): Opts = {
      val path = Option(o.get("path")).getOrElse(
        throw new IllegalArgumentException(
          "graft-xlsx: a single load(path) is required"))
      Opts(path, Option(o.get("sheet")),
        Option(o.get("headerrow")).map(_.toInt).getOrElse(0))
    }
  }

  /** All `*.xlsx` files under `path` (or `path` itself), via the Hadoop
    * filesystem API so directories on any supported store enumerate the
    * same way. Driver-side (partition planning). */
  def listXlsx(pathStr: String): Seq[String] = {
    val hp = new org.apache.hadoop.fs.Path(pathStr)
    val fs = hp.getFileSystem(SparkSession.active.sessionState.newHadoopConf())
    val st = fs.getFileStatus(hp)
    if (st.isDirectory)
      fs.listStatus(hp).toSeq
        .filter(s => s.isFile && s.getPath.getName.toLowerCase.endsWith(".xlsx"))
        .map(_.getPath.toString).sorted
    else Seq(hp.toString)
  }

  /** Run `f` over a locally-readable copy of the workbook. Local paths open
    * in place; anything else streams through Hadoop to a task-local temp
    * file first (zip needs random access), bounded by
    * [[XlsxMini.MaxWorkbookBytes]] BEFORE the copy. */
  def withLocal[T](pathStr: String)(f: Path => T): T = {
    val uri = java.net.URI.create(
      pathStr.replace(" ", "%20"))
    if (uri.getScheme == null) f(Paths.get(pathStr))
    else if (uri.getScheme == "file") f(Paths.get(uri.getPath))
    else {
      val hp = new org.apache.hadoop.fs.Path(pathStr)
      val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
      val len = fs.getFileStatus(hp).getLen
      require(len <= XlsxMini.MaxWorkbookBytes,
        s"$pathStr is $len bytes — over the per-workbook " +
          s"${XlsxMini.MaxWorkbookBytes}-byte bound")
      val tmp = Files.createTempFile("graft_xlsx_ds", ".xlsx")
      try {
        val in = fs.open(hp)
        try Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
        finally in.close()
        f(tmp)
      } finally Files.deleteIfExists(tmp)
    }
  }

  /** Header names of a grid row, with [[TemplateReader]]'s pandas rules:
    * null → `Unnamed: i`, integral doubles render without `.0`, duplicate
    * names dedupe as `x`, `x.1`, `x.2`. */
  def headerNames(grid: Vector[Vector[Any]], headerRow: Int): Vector[String] = {
    if (grid.length <= headerRow) return Vector.empty
    val width = grid.map(_.length).max
    val raw = grid(headerRow).padTo(width, null).zipWithIndex.map {
      case (null, i) => s"Unnamed: $i"
      case (d: Double, _) if d == d.floor && math.abs(d) < 1e15 =>
        d.toLong.toString
      case (v, _) => v.toString
    }
    val seen = scala.collection.mutable.Map[String, Int]()
    raw.map { n =>
      val k = seen.getOrElse(n, 0)
      seen(n) = k + 1
      if (k == 0) n else s"$n.$k"
    }
  }

  /** Infer the table schema from the first file's first selected sheet
    * (driver-side, one bounded workbook parse), appending the
    * `source_file` / `source_sheet` lineage columns. */
  def inferSchema(opts: Opts): StructType = {
    val files = listXlsx(opts.path)
    require(files.nonEmpty, s"graft-xlsx: no .xlsx files under ${opts.path}")
    val fields = withLocal(files.head) { p =>
      val sheets = XlsxMini.read(p)
      val sheet = opts.sheet match {
        case Some(name) => sheets.find(_.name == name).getOrElse(
          throw new IllegalArgumentException(
            s"graft-xlsx: sheet '$name' not in ${files.head}"))
        case None => sheets.headOption.getOrElse(
          throw new IllegalArgumentException(
            s"graft-xlsx: ${files.head} has no sheets"))
      }
      val names = headerNames(sheet.grid, opts.headerRow)
      val data = sheet.grid.drop(opts.headerRow + 1)
      names.zipWithIndex.map { case (n, i) =>
        val vals = data.flatMap(r => Option(if (i < r.length) r(i) else null))
        val dt: DataType =
          if (vals.nonEmpty && vals.forall(_.isInstanceOf[Double])) DoubleType
          else if (vals.nonEmpty && vals.forall(_.isInstanceOf[Boolean]))
            BooleanType
          else if (vals.nonEmpty &&
            vals.forall(_.isInstanceOf[java.sql.Timestamp])) TimestampType
          else StringType
        StructField(n, dt, nullable = true)
      }
    }
    StructType(fields :+ StructField("source_file", StringType, false)
      :+ StructField("source_sheet", StringType, false))
  }
}

private[sources] class XlsxTable(tableSchema: StructType,
    opts: XlsxDataSource.Opts) extends Table with SupportsRead {
  override def name(): String = s"graft-xlsx:${opts.path}"
  override def schema(): StructType = tableSchema
  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new XlsxScanBuilder(tableSchema, opts)
}

private[sources] class XlsxScanBuilder(full: StructType,
    opts: XlsxDataSource.Opts)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(req: StructType): Unit = required = req
  override def build(): Scan = new XlsxScan(required, opts)
}

private[sources] case class XlsxInputPartition(file: String, sheet: String)
  extends InputPartition

private[sources] class XlsxScan(required: StructType,
    opts: XlsxDataSource.Opts) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-xlsx ${opts.path} sheet=${opts.sheet.getOrElse("*")}"

  /** One partition per (file, sheet): workbook enumeration and per-file
    * sheet listing are driver-side (central-directory reads only — cheap);
    * full sheet parsing happens on executors. */
  override def planInputPartitions(): Array[InputPartition] =
    XlsxDataSource.listXlsx(opts.path).flatMap { f =>
      val names = XlsxDataSource.withLocal(f)(XlsxMini.sheetNames)
      val selected = opts.sheet match {
        case Some(s) => names.filter(_ == s)
        case None => names
      }
      selected.map(s => XlsxInputPartition(f, s): InputPartition)
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new XlsxReaderFactory(required, opts.headerRow)
}

private[sources] class XlsxReaderFactory(required: StructType, headerRow: Int)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[XlsxInputPartition]
    new XlsxPartitionReader(part, required, headerRow)
  }
}

/** Executor-side reader for one worksheet: parses the workbook once (task
  * memory bounded by the workbook cap), maps required columns to sheet
  * columns BY HEADER NAME, and converts cells with
  * [[TemplateReader.sheetToFrame]]'s rules (type-contradicting cells →
  * null; integral doubles render without `.0` into string columns). */
private[sources] class XlsxPartitionReader(part: XlsxInputPartition,
    required: StructType, headerRow: Int)
  extends PartitionReader[InternalRow] {

  private val fileName =
    new org.apache.hadoop.fs.Path(part.file).getName

  private val (colIdx: Array[Int], rows: Iterator[Vector[Any]]) =
    XlsxDataSource.withLocal(part.file) { p =>
      XlsxMini.read(p).find(_.name == part.sheet) match {
        case None => (Array.fill(required.length)(-1), Iterator.empty)
        case Some(sheet) =>
          val names = XlsxDataSource.headerNames(sheet.grid, headerRow)
          val byName = names.zipWithIndex.toMap
          val idx = required.fields.map {
            case f if f.name == "source_file" => -2
            case f if f.name == "source_sheet" => -3
            case f => byName.getOrElse(f.name, -1)
          }
          // grid already materialized by the bounded parse; drop header
          (idx, sheet.grid.drop(headerRow + 1).iterator)
      }
    }

  private var current: InternalRow = _

  override def next(): Boolean = {
    if (!rows.hasNext) return false
    val row = rows.next()
    val vals = new Array[Any](required.length)
    var i = 0
    while (i < required.length) {
      val j = colIdx(i)
      vals(i) =
        if (j == -2) UTF8String.fromString(fileName)
        else if (j == -3) UTF8String.fromString(part.sheet)
        else if (j < 0 || j >= row.length) null
        else convert(row(j), required.fields(i).dataType)
      i += 1
    }
    current = new GenericInternalRow(vals)
    true
  }

  private def convert(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (d: Double, DoubleType) => d
    case (b: Boolean, BooleanType) => b
    case (t: java.sql.Timestamp, TimestampType) =>
      DateTimeUtils.fromJavaTimestamp(t)
    case (d: Double, StringType) if d == d.floor && math.abs(d) < 1e15 =>
      UTF8String.fromString(d.toLong.toString)
    case (x, StringType) => UTF8String.fromString(x.toString)
    case _ => null // type contradicts the inferred schema
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
