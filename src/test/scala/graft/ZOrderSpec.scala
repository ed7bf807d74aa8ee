package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

/** Z-order layout: clustering quality is what makes file/row-group
  * statistics skip IO — a narrow range filter on EITHER z-column must touch
  * a small fraction of the files, where a single-column sort leaves the
  * other column scattered across all of them. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave spreads bits: distinct inputs, distinct z; order preserved on one axis") {
    val df = Seq((0, 0), (1, 0), (0, 1), (65535, 65535)).toDF("a", "b")
    val z = df.select(ZOrder.interleave(Seq(col("a"), col("b"))).as("z"))
      .collect().map(_.getLong(0))
    assert(z.distinct.length == 4)
    assert(z(0) == 0L)
    assert(z(3) == (1L << 32) - 1) // all 32 low bits set
  }

  test("narrow filters on both z-columns each touch few files") {
    val n = 1 << 14
    // two independent uniform columns (deterministic hash spread)
    val df = spark.range(n).select(
      (hash(col("id")).cast("long").bitwiseAND(0xffff)).as("a"),
      (hash(col("id"), lit(1)).cast("long").bitwiseAND(0xffff)).as("b"))
    val numFiles = 16
    val dir = java.nio.file.Files.createTempDirectory("zorder").resolve("t")
    ZOrder.writeZOrdered(df, Seq("a", "b"), numFiles, dir.toString)

    val back = spark.read.parquet(dir.toString)
    def filesTouched(c: String): Long = back
      .filter(col(c).between(1000, 1999)) // ~1/16 of the value space
      .select(input_file_name()).distinct().count()
    val fa = filesTouched("a")
    val fb = filesTouched("b")
    // a plain sort by a would give fb ≈ numFiles; z-order keeps BOTH small
    assert(fa <= numFiles / 2, s"a-filter touched $fa of $numFiles files")
    assert(fb <= numFiles / 2, s"b-filter touched $fb of $numFiles files")
    // no rows lost by the layout
    assert(back.count() == n)
  }
}
