package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
/** Dev-only: print the formatted physical plan of a registry query.
  * `runMain graft.DebugPlan <sfDir> <queryName>` */
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = queries.Registry.byName(name).run(spark, sfDir)
    println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
  }
}
