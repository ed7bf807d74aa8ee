package graft

import graft.functions.Curation
import graft.operators.Merge
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("scd2FromHistory builds half-open validity intervals per key") {
    val hist = Seq(
      (1L, "2020-01-01", 10.0), (1L, "2020-06-01", 20.0), (1L, "2021-01-01", 30.0),
      (2L, "2020-03-01", 5.0)).toDF("k", "ts", "v")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = Merge.scd2FromHistory(hist, "k", "ts", Seq("v"))
      .orderBy("k", "valid_from").collect()
    assert(out.length == 4)
    // key 1: first two closed, third open; key 2: single open row
    assert(!out(0).getAs[Boolean]("is_current") && !out(1).getAs[Boolean]("is_current"))
    assert(out(2).getAs[Boolean]("is_current") && out(2).isNullAt(out(2).fieldIndex("valid_to")))
    assert(out(1).getAs[java.sql.Timestamp]("valid_to") ==
      out(2).getAs[java.sql.Timestamp]("valid_from"))
    assert(out(3).getAs[Boolean]("is_current"))
  }

  test("mergeUpsert classifies keep/update/insert and applies set columns") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val updates = Seq((2L, 99.0), (9L, 50.0)).toDF("k", "bal")
    val out = Merge.mergeUpsert(target, updates, "k")
      .orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), Option(r.getAs[String]("name")),
        r.getAs[Double]("bal"), r.getAs[String]("action")))
    assert(out.toSeq == Seq(
      (1L, Some("a"), 10.0, "keep"),
      (2L, Some("b"), 99.0, "update"),
      (3L, Some("c"), 30.0, "keep"),
      (9L, None, 50.0, "insert")))
  }

  test("mergeUpsert rejects update columns missing from the target") {
    val target = Seq((1L, 1.0)).toDF("k", "bal")
    val updates = Seq((1L, 2.0)).toDF("k", "other")
    intercept[IllegalArgumentException] {
      Merge.mergeUpsert(target, updates, "k")
    }
  }

  test("domainMix keep-rates track target weights and cap at 1") {
    val df = (1 to 400).map(i => (i.toLong, s"src${i % 4}")).toDF("id", "dom")
    // budget 100: src0 weight 0.8 → 80 target over 100 rows (rate .8);
    // src1 weight 2.0 → rate capped at 1.0 (all 100 kept); others default 0
    val out = Curation.domainMix(df, "id", "dom",
        Map("src0" -> 0.8, "src1" -> 2.0), totalTarget = 100)
      .groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("src1") == 100L)           // capped rate keeps everything
    assert(out("src0") > 50 && out("src0") < 100) // ~80% kept, hash-dependent
    assert(!out.contains("src2") && !out.contains("src3")) // default 0 drops
  }

  test("domainMix is deterministic across runs") {
    val df = (1 to 200).map(i => (i.toLong, "d")).toDF("id", "dom")
    def run() = Curation.domainMix(df, "id", "dom", Map("d" -> 0.5),
      totalTarget = 100).collect().map(_.getLong(1)).toSet
    assert(run() == run())
  }

  test("deleteCascade erases matching rows everywhere; audit counts agree") {
    val cust = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("ck", "name")
    val ords = Seq((10L, 1L), (11L, 1L), (12L, 2L), (13L, 3L))
      .toDF("ok", "cust_fk")
    val keys = Seq(Tuple1(1L)).toDF("ck")
    val tables = Map("cust" -> (cust, "ck"), "ords" -> (ords, "cust_fk"))
    val survivors = Merge.deleteCascade(tables, keys, "ck")
    assert(survivors("cust").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    assert(survivors("ords").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(12L, 13L))
    val audit = Merge.deleteCascadeAudit(tables, keys, "ck")
      .orderBy("table_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(audit.toSeq == Seq(("cust", 3L, 1L, 2L), ("ords", 4L, 2L, 2L)))
  }
}
