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
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
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
  * filesystem API — with the SESSION Hadoop configuration captured at
  * scan build time and serialized into the reader factory, so
  * `spark.hadoop.*` settings (object-store credentials, endpoints) apply
  * on executors exactly as on the driver. Local paths open in place;
  * remote files copy to a task-local temp file (a zip needs random
  * access). Planning never copies whole remote workbooks: sheet names
  * come from ranged central-directory reads ([[ZipCentral]] — the two
  * ~KB workbook-index XML parts only).
  *
  * Pushdown: column pruning reaches the reader
  * (`SupportsPushDownRequiredColumns` — pruned columns are never
  * converted) and lineage-column filters PRUNE PARTITIONS — an
  * `EqualTo`/`In` filter on `source_file` / `source_sheet` drops
  * non-matching (file, sheet) partitions at planning, so a one-sheet
  * query over a large directory schedules one task per matching file
  * instead of one per worksheet (Spark still re-applies the filters
  * after the scan; pruning is an optimization, not the correctness
  * gate).
  *
  * Schema: inferred on the driver from the FIRST file's first selected
  * sheet ([[TemplateReader.sheetToFrame]]'s pandas rules — all-Double →
  * double, all-Boolean → boolean, date-styled → timestamp, else string;
  * duplicate headers dedupe as `x`, `x.1`), plus `source_file` /
  * `source_sheet` lineage columns (the P4 semantics, scan-time
  * literals). `.option("inferAll", true)` infers the UNION of headers
  * across EVERY file and selected sheet instead (a column missing from
  * the first workbook no longer silently disappears; same-name columns
  * with conflicting types widen to string) — at the cost of one
  * driver-side parse per workbook, so reserve it for heterogeneous
  * directories or pass an explicit `.schema(...)`
  * (`supportsExternalMetadata` is on). Every sheet maps its columns BY
  * HEADER NAME; a name absent from a sheet reads as null. A cell whose
  * runtime type contradicts the column type reads as null by default;
  * `.option("mode", "failfast")` errors on it instead — the switch that
  * turns silent data bugs in a supposedly-homogeneous directory into
  * task failures. */
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
  final case class Opts(path: String, sheet: Option[String], headerRow: Int,
      failFast: Boolean = false, inferAll: Boolean = false)

  object Opts {
    def apply(o: CaseInsensitiveStringMap): Opts = {
      val path = Option(o.get("path")).getOrElse(
        throw new IllegalArgumentException(
          "graft-xlsx: a single load(path) is required"))
      val mode = Option(o.get("mode")).getOrElse("permissive").toLowerCase
      require(mode == "permissive" || mode == "failfast",
        s"graft-xlsx: mode must be permissive|failfast, got '$mode'")
      Opts(path, Option(o.get("sheet")),
        Option(o.get("headerrow")).map(_.toInt).getOrElse(0),
        failFast = mode == "failfast",
        inferAll = Option(o.get("inferall")).exists(_.toBoolean))
    }
  }

  /** Hadoop `Configuration` is not `Serializable`; this wrapper ships the
    * session conf (with its `spark.hadoop.*` overlays) to executors via
    * its own write/readFields codec — the standard Spark pattern. */
  final class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** The session Hadoop conf — driver-side capture point. */
  def sessionConf(): org.apache.hadoop.conf.Configuration =
    SparkSession.active.sessionState.newHadoopConf()

  /** All `*.xlsx` files under `path` (or `path` itself), via the Hadoop
    * filesystem API so directories on any supported store enumerate the
    * same way. Driver-side (partition planning). */
  def listXlsx(pathStr: String,
      conf: org.apache.hadoop.conf.Configuration): Seq[String] = {
    val hp = new org.apache.hadoop.fs.Path(pathStr)
    val fs = hp.getFileSystem(conf)
    val st = fs.getFileStatus(hp)
    if (st.isDirectory)
      fs.listStatus(hp).toSeq
        .filter(s => s.isFile && s.getPath.getName.toLowerCase.endsWith(".xlsx"))
        .map(_.getPath.toString).sorted
    else Seq(hp.toString)
  }

  private def localPath(pathStr: String): Option[Path] = {
    val uri = java.net.URI.create(pathStr.replace(" ", "%20"))
    if (uri.getScheme == null) Some(Paths.get(pathStr))
    else if (uri.getScheme == "file") Some(Paths.get(uri.getPath))
    else None
  }

  /** Run `f` over a locally-readable copy of the workbook. Local paths
    * open in place; anything else streams through Hadoop — under the
    * supplied (session) conf, so object-store credentials resolve — to a
    * task-local temp file first (full-sheet parsing needs random access),
    * bounded by [[XlsxMini.MaxWorkbookBytes]] BEFORE the copy. */
  def withLocal[T](pathStr: String,
      conf: org.apache.hadoop.conf.Configuration)(f: Path => T): T =
    localPath(pathStr) match {
      case Some(p) => f(p)
      case None =>
        val hp = new org.apache.hadoop.fs.Path(pathStr)
        val fs = hp.getFileSystem(conf)
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

  /** Sheet names of one workbook for PLANNING: local files read their zip
    * index in place; remote files fetch ONLY the two workbook-index XML
    * parts via ranged central-directory reads — never a full-archive copy
    * through the planner. `Nil` on an unreadable workbook (the S6
    * contract). */
  def sheetNamesFor(pathStr: String,
      conf: org.apache.hadoop.conf.Configuration): Seq[String] =
    localPath(pathStr) match {
      case Some(p) => XlsxMini.sheetNames(p)
      case None =>
        try {
          val hp = new org.apache.hadoop.fs.Path(pathStr)
          val fs = hp.getFileSystem(conf)
          val parts = ZipCentral.readEntriesHadoop(fs, hp,
            Set("xl/workbook.xml", "xl/_rels/workbook.xml.rels"))
          XlsxMini.sheetIndexFromParts(parts.get("xl/workbook.xml"),
            parts.get("xl/_rels/workbook.xml.rels")).map(_._1)
        } catch { case _: Exception => Nil }
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

  private def sheetFields(sheet: XlsxMini.Sheet,
      headerRow: Int): Seq[StructField] = {
    val names = headerNames(sheet.grid, headerRow)
    val data = sheet.grid.drop(headerRow + 1)
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

  /** Infer the table schema: by default from the first file's first
    * selected sheet (one bounded driver-side parse); with `inferAll`,
    * the header-name UNION over every file and selected sheet — columns
    * keep first-seen order, a name inferred with conflicting types
    * widens to string. Lineage columns append last either way. */
  def inferSchema(opts: Opts): StructType = {
    val conf = sessionConf()
    val files = listXlsx(opts.path, conf)
    require(files.nonEmpty, s"graft-xlsx: no .xlsx files under ${opts.path}")
    def selected(file: String, sheets: Seq[XlsxMini.Sheet]): Seq[XlsxMini.Sheet] =
      opts.sheet match {
        case Some(name) =>
          val hit = sheets.filter(_.name == name)
          if (hit.isEmpty && file == files.head)
            throw new IllegalArgumentException(
              s"graft-xlsx: sheet '$name' not in $file")
          hit
        case None =>
          if (sheets.isEmpty)
            throw new IllegalArgumentException(
              s"graft-xlsx: $file has no sheets")
          if (opts.inferAll) sheets else sheets.take(1)
      }
    val scanFiles = if (opts.inferAll) files else files.take(1)
    val merged = scala.collection.mutable.LinkedHashMap[String, DataType]()
    scanFiles.foreach { f =>
      withLocal(f, conf) { p =>
        selected(f, XlsxMini.read(p)).foreach { sheet =>
          sheetFields(sheet, opts.headerRow).foreach { field =>
            merged.get(field.name) match {
              case None => merged(field.name) = field.dataType
              case Some(dt) if dt == field.dataType => ()
              case Some(_) => merged(field.name) = StringType
            }
          }
        }
      }
    }
    val fields = merged.map { case (n, dt) =>
      StructField(n, dt, nullable = true)
    }.toSeq
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
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = full
  private var pruning: Array[Filter] = Array.empty
  override def pruneColumns(req: StructType): Unit = required = req

  /** Lineage-column equality/membership filters prune partitions; all
    * filters stay residual (Spark re-applies them post-scan), so pruning
    * can only drop work, never rows it shouldn't. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pruning = filters.filter {
      case EqualTo(a, _) => a == "source_file" || a == "source_sheet"
      case In(a, _) => a == "source_file" || a == "source_sheet"
      case _ => false
    }
    filters // everything is re-evaluated by Spark after the scan
  }
  override def pushedFilters(): Array[Filter] = pruning

  override def build(): Scan = new XlsxScan(required, opts, pruning,
    new XlsxDataSource.SerializableHadoopConf(XlsxDataSource.sessionConf()))
}

private[sources] case class XlsxInputPartition(file: String, sheet: String)
  extends InputPartition

private[sources] class XlsxScan(required: StructType,
    opts: XlsxDataSource.Opts, pruning: Array[Filter],
    conf: XlsxDataSource.SerializableHadoopConf) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-xlsx ${opts.path} sheet=${opts.sheet.getOrElse("*")}" +
      (if (pruning.nonEmpty)
        s" pruned=[${pruning.mkString(", ")}]" else "")

  private def keepSet(attr: String): Option[Set[String]] = {
    val sets = pruning.collect {
      case EqualTo(a, v: String) if a == attr => Set(v)
      case In(a, vs) if a == attr =>
        vs.collect { case s: String => s }.toSet
    }
    if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
  }

  /** One partition per (file, sheet) surviving lineage pruning: workbook
    * enumeration and per-file sheet listing are driver-side — remote
    * listings are ranged central-directory reads (two ~KB XML parts per
    * workbook, see [[ZipCentral]]), never full-archive copies; full sheet
    * parsing happens on executors. A `source_file` filter skips even the
    * sheet listing of non-matching files. */
  override def planInputPartitions(): Array[InputPartition] = {
    val fileKeep = keepSet("source_file")
    val sheetKeep = keepSet("source_sheet")
    XlsxDataSource.listXlsx(opts.path, conf.value)
      .filter(f => fileKeep.forall(_.contains(
        new org.apache.hadoop.fs.Path(f).getName)))
      .flatMap { f =>
        val names = XlsxDataSource.sheetNamesFor(f, conf.value)
        val selected = opts.sheet match {
          case Some(s) => names.filter(_ == s)
          case None => names
        }
        selected.filter(s => sheetKeep.forall(_.contains(s)))
          .map(s => XlsxInputPartition(f, s): InputPartition)
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new XlsxReaderFactory(required, opts.headerRow, opts.failFast, conf)
}

private[sources] class XlsxReaderFactory(required: StructType,
    headerRow: Int, failFast: Boolean,
    conf: XlsxDataSource.SerializableHadoopConf)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[XlsxInputPartition]
    new XlsxPartitionReader(part, required, headerRow, failFast, conf)
  }
}

/** Executor-side reader for one worksheet: parses the workbook once (task
  * memory bounded by the workbook cap), maps required columns to sheet
  * columns BY HEADER NAME, and converts cells with
  * [[TemplateReader.sheetToFrame]]'s rules (type-contradicting cells →
  * null, or a task failure under failfast mode; integral doubles render
  * without `.0` into string columns). */
private[sources] class XlsxPartitionReader(part: XlsxInputPartition,
    required: StructType, headerRow: Int, failFast: Boolean,
    conf: XlsxDataSource.SerializableHadoopConf)
  extends PartitionReader[InternalRow] {

  private val fileName =
    new org.apache.hadoop.fs.Path(part.file).getName

  private val (colIdx: Array[Int], rows: Iterator[Vector[Any]]) =
    XlsxDataSource.withLocal(part.file, conf.value) { p =>
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
        else convert(row(j), required.fields(i))
      i += 1
    }
    current = new GenericInternalRow(vals)
    true
  }

  private def convert(v: Any, field: StructField): Any = (v, field.dataType) match {
    case (null, _) => null
    case (d: Double, DoubleType) => d
    case (b: Boolean, BooleanType) => b
    case (t: java.sql.Timestamp, TimestampType) =>
      DateTimeUtils.fromJavaTimestamp(t)
    case (d: Double, StringType) if d == d.floor && math.abs(d) < 1e15 =>
      UTF8String.fromString(d.toLong.toString)
    case (x, StringType) => UTF8String.fromString(x.toString)
    case (x, dt) if failFast =>
      throw new IllegalStateException(
        s"graft-xlsx [failfast]: $fileName!${part.sheet} column " +
          s"'${field.name}' expects $dt but a cell holds " +
          s"${x.getClass.getSimpleName} value '$x'")
    case _ => null // type contradicts the inferred schema (permissive)
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
