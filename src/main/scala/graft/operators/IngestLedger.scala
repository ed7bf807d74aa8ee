package graft.operators

import org.apache.spark.sql.functions.lit

/** The applied-batch LEDGER of a streaming file ingest, shared by the
  * sparse ([[Retrieval.fileStreamIndexIngest]]) and dense
  * ([[Similarity.fileStreamIvfIngest]]) index families. It lives UNDER
  * the stream's checkpoint directory — batch ids are only meaningful
  * relative to one checkpoint (a fresh checkpoint restarts them at 0,
  * so a table-level ledger would wrongly skip a second feed's first
  * batches). One tiny parquet row per committed batch; reading it back
  * per micro-batch is the same cost class as the `_gen` counter read
  * the append path already pays.
  *
  * The exactly-once protocol this supports: foreachBatch is
  * at-least-once, so (a) a batch whose id is recorded here is a replay
  * of a FULLY committed batch — skip it; (b) the first unrecorded batch
  * after a (re)start may be a replay of a CRASHED attempt — run the
  * family's partial-append repair before appending. Batches after that
  * first one committed synchronously in this process and need neither. */
private[graft] object IngestLedger {
  private def path(ckpt: String): String = s"$ckpt/graft_applied"

  def appliedBatchIds(spark: org.apache.spark.sql.SparkSession,
      ckpt: String): Set[Long] = {
    val p = new org.apache.hadoop.fs.Path(path(ckpt))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else spark.read.parquet(p.toString).collect().map(_.getLong(0)).toSet
  }

  def recordAppliedBatch(spark: org.apache.spark.sql.SparkSession,
      ckpt: String, batchId: Long): Unit =
    spark.range(1).select(lit(batchId).as("batch_id")).coalesce(1)
      .write.mode("append").parquet(path(ckpt))
}
