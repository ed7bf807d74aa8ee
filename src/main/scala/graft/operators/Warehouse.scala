package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared warehouse-table plumbing for the index-lifecycle operators
  * (postings + IVF): small-companion replacement via STAGING WRITE +
  * catalog rename.
  *
  * Why staging (r15): the drop-then-overwrite shape either loses the old
  * incarnation while the replacement plan still reads it (FILE_NOT_EXIST)
  * or forces callers to pin the replacement with an eager
  * `localCheckpoint` first — one whole Spark job per companion per ingest
  * micro-batch, measured pure overhead. Writing to `<name>__stg` keeps
  * the old table readable until the data is durable, then a catalog
  * rename (the in-memory catalog moves the managed directory) swaps it
  * in. The post-swap refreshTable evicts any cached relation/file
  * listing of the previous incarnation (the x241 relation-cache lesson). */
private[operators] object Warehouse {

  def replaceSmallTable(df: DataFrame, name: String): Unit = {
    val spark = df.sparkSession
    val stg = s"${name}__stg"
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (spark.catalog.tableExists(stg)) spark.sql(s"DROP TABLE `$stg`")
    val stgLoc = new org.apache.hadoop.fs.Path(wh, stg.toLowerCase)
    if (fs.exists(stgLoc)) fs.delete(stgLoc, true)
    df.write.mode("overwrite").format("parquet").saveAsTable(stg)
    if (spark.catalog.tableExists(name)) spark.sql(s"DROP TABLE `$name`")
    val loc = new org.apache.hadoop.fs.Path(wh, name.toLowerCase)
    if (fs.exists(loc)) fs.delete(loc, true)
    spark.sql(s"ALTER TABLE `$stg` RENAME TO `$name`")
    spark.catalog.refreshTable(name)
  }
}
