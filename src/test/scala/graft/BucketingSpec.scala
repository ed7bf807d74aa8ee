package graft

import graft.operators.Bucketing
import org.apache.spark.sql.execution.ExplainMode

/** Bucketed co-located join: the whole point is NO Exchange in the plan. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("joining two same-bucketed tables plans zero shuffles") {
    val left = (1 to 1000).map(k => (k.toLong, s"l$k")).toDF("k", "lv")
    val right = (1 to 1000).map(k => (k.toLong, k * 2.0)).toDF("k", "rv")
    Bucketing.writeBucketed(left, "bkt_left", 4, Seq("k"), Seq("k"))
    Bucketing.writeBucketed(right, "bkt_right", 4, Seq("k"), Seq("k"))
    try {
      val joined = Bucketing.bucketedJoin(spark, "bkt_left", "bkt_right", Seq("k"))
      // disable auto-broadcast so the test exercises the bucketed path
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = try {
        val j2 = Bucketing.bucketedJoin(spark, "bkt_left", "bkt_right", Seq("k"))
        val s = j2.queryExecution.explainString(ExplainMode.fromString("formatted"))
        assert(j2.count() == 1000)
        s
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p.take(400))
      assert(!p.contains("Exchange"), "bucketed join must not shuffle:\n" + p.take(800))
      assert(joined.count() == 1000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
