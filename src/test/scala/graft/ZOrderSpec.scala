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

  test("quantile quantizer clusters SKEWED columns where equal-width cannot") {
    val n = 1 << 14
    // a: heavily skewed (squared uniform → mass near 0); b: uniform
    val df = spark.range(n).select(
      (pow(hash(col("id")).cast("long").bitwiseAND(0xffff), 2.0) / 65535.0).as("a"),
      hash(col("id"), lit(1)).cast("long").bitwiseAND(0xffff).cast("double").as("b"))
    val numFiles = 16
    val dir = java.nio.file.Files.createTempDirectory("zorderq").resolve("t")
    ZOrder.writeZOrderedQuantile(df, Seq("a", "b"), numFiles, dir.toString)
    val back = spark.read.parquet(dir.toString)
    // 10%-mass slice of the skewed column (by mass, not width; placed off
    // the rank midpoint so the slice doesn't straddle the top z-bit)
    val (m1, m2) = {
      val q = df.stat.approxQuantile("a", Array(0.30, 0.40), 0.001)
      (q(0), q(1))
    }
    val fa = back.filter(col("a").between(m1, m2))
      .select(input_file_name()).distinct().count()
    val fb = back.filter(col("b").between(1000, 1999))
      .select(input_file_name()).distinct().count()
    assert(fa <= numFiles / 2, s"skewed-column filter touched $fa of $numFiles files")
    assert(fb <= numFiles / 2, s"uniform-column filter touched $fb of $numFiles files")
    assert(back.count() == n)
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
