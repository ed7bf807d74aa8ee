package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: `runMain graft.Explain <query> [sfDir]` prints the
  * formatted physical plan — the loop used to keep scans pruned, filters
  * pushed, and joins broadcast where they should be. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("f1_query_filters")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.Registry.byName(name).run(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
