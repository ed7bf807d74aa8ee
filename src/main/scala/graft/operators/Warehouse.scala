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

  /** Bucketed twin of [[replaceSmallTable]]: staging write with the
    * given bucket spec, then the same drop + rename swap (the catalog
    * entry carries the bucket spec through the rename). Callers whose
    * replacement frame READS the table being replaced need no eager
    * pin. */
  def replaceBucketedTable(df: DataFrame, name: String, buckets: Int,
      keys: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val stg = s"${name}__stg"
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (spark.catalog.tableExists(stg)) spark.sql(s"DROP TABLE `$stg`")
    val stgLoc = new org.apache.hadoop.fs.Path(wh, stg.toLowerCase)
    if (fs.exists(stgLoc)) fs.delete(stgLoc, true)
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
    val sorted =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
      else w
    sorted.format("parquet").saveAsTable(stg)
    if (spark.catalog.tableExists(name)) spark.sql(s"DROP TABLE `$name`")
    val loc = new org.apache.hadoop.fs.Path(wh, name.toLowerCase)
    if (fs.exists(loc)) fs.delete(loc, true)
    spark.sql(s"ALTER TABLE `$stg` RENAME TO `$name`")
    spark.catalog.refreshTable(name)
  }

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
