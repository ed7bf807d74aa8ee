package graft.plans

import graft.model.Template
import graft.operators.{Contract, Exporter, HeaderDiff, TransformEngine}
import graft.sources.TemplateReader
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.Path

/** The reference's two orchestration entry points, Spark-shaped:
  *
  *  - `runFullProcess` ≡ `DataEngine.run_full_process` (reference:
  *    src/api/v1/engine.py:249-290): read → normalize (no-op; renames happen
  *    in filter_and_rename at read) → transform → validate. Every stage emits
  *    lazy transformations on ONE DataFrame; actions happen only at the sink
  *    and the fused metric aggregations.
  *  - `runPipeline` ≡ `run_pipeline` (reference: src/pipeline.py:120-184):
  *    adds the drift gate, sink, K7 validation-report sidecar, and K8
  *    archive/quarantine control flow (V3).
  */
object Pipeline {

  final case class ProcessResult(
      success: Boolean,
      message: String,
      outputPath: Option[String],
      rowCount: Long,
      metrics: Map[String, Any])

  def runFullProcess(spark: SparkSession, sourcePath: Path, t: Template,
      validationLevel: String = "coerce"): (ProcessResult, Option[DataFrame]) = {
    try {
      val raw = TemplateReader.read(spark, sourcePath, t)
      val (clean, metricsHandle) = TransformEngine.transform(raw, t)
      val validation = Contract.validate(clean, t, validationLevel)
      val metrics = metricsHandle.compute()
      if (!validation.isValid)
        (ProcessResult(success = false, "Validation failed.", None,
          validation.rowCount, metrics ++ Map(
            "validation_errors" -> validation.errors)), Some(clean))
      else {
        val out = validation.data
        (ProcessResult(success = true, "Processing successful.", None,
          out.count(), metrics), Some(out))
      }
    } catch {
      case e: Exception =>
        (ProcessResult(success = false, Option(e.getMessage).getOrElse(e.toString),
          None, 0L, Map.empty), None)
    }
  }

  /** Full file pipeline with V3 quarantine-on-failure control flow. Writes
    * `<out>.parquet` (bulk) or `.xlsx` (summary) + the K7 sidecar, then moves
    * the source to archive/ on success or copies to quarantine/ on failure.
    *
    * Enforces the reference's documented-but-unenforced quarantine threshold
    * (reference: src/config.yaml:124-127 `quarantine_threshold: 0.1` — "If
    * >10% of rows fail, reject the whole file"): parse failures (A6's
    * date + numeric counts, already computed in the fused metrics pass — no
    * extra job) over the post-unpivot row count; exceeding the ratio
    * quarantines the file even though each bad row alone would only be
    * coerced to null. Pass `quarantineThreshold = 1.0` to disable. */
  def runPipeline(spark: SparkSession, sourcePath: Path, t: Template,
      outputPath: Path, archiveDir: Path, quarantineDir: Path,
      validationLevel: String = "coerce",
      failOnMissing: Boolean = false, failOnExtra: Boolean = false,
      quarantineThreshold: Double = 0.1): ProcessResult = {
    val (result0, dfOpt) = runFullProcess(spark, sourcePath, t, validationLevel)
    val result = if (!result0.success) result0 else {
      val failed =
        result0.metrics.get("date_parse_failures").collect { case n: Long => n }.getOrElse(0L) +
        result0.metrics.get("numeric_parse_failures").collect { case n: Long => n }.getOrElse(0L)
      val total = result0.metrics.get("unpivot_after")
        .collect { case (n: Long, _) => n }.getOrElse(0L)
      if (total > 0 && failed.toDouble / total > quarantineThreshold)
        result0.copy(success = false, message =
          s"Quarantine threshold exceeded: $failed of $total rows " +
          f"(${failed.toDouble / total * 100}%.1f%%) failed to parse " +
          f"(threshold ${quarantineThreshold * 100}%.0f%%).")
      else result0
    }
    dfOpt match {
      case Some(df) if result.success =>
        try {
          val (missing, extra) =
            HeaderDiff.check(df.columns.toSeq, t, failOnMissing, failOnExtra)
          val outName = outputPath.getFileName.toString.toLowerCase
          if (outName.endsWith(".xlsx")) Exporter.writeXlsx(df, outputPath)
          else Exporter.writeParquet(df, outputPath)
          Exporter.writeValidationReport(
            outputPath.resolveSibling(outputPath.getFileName.toString + ".validation.txt"),
            result.metrics ++ Map(
              "missing_vs_template" -> missing.mkString(","),
              "extra_vs_template" -> extra.mkString(","),
              "rows_out" -> result.rowCount))
          Exporter.archive(sourcePath, archiveDir)
          result.copy(outputPath = Some(outputPath.toString))
        } catch {
          case e: Exception =>
            Exporter.quarantine(sourcePath, Option(e.getMessage).getOrElse(e.toString),
              quarantineDir)
            ProcessResult(success = false, e.getMessage, None, 0L, result.metrics)
        }
      case _ =>
        Exporter.quarantine(sourcePath, result.message, quarantineDir)
        result
    }
  }
}
