package graft

import graft.operators.SkewJoin
import graft.streaming.EventStream
import java.nio.file.Files

/** Salted skew join equivalence + the file-source streaming runner. */
class SkewStreamSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join result") {
    // one hot key (90% of rows) + a long tail
    val left = ((1 to 900).map(_ => (1, "hot")) ++ (2 to 100).map(k => (k, s"t$k")))
      .toDF("k", "lv")
    val right = (1 to 100).map(k => (k, k * 10)).toDF("k", "rv")
    val plain = left.join(right, Seq("k"), "inner")
    val salted = SkewJoin.saltedJoin(left, right, Seq("k"), "inner", salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.columns.toSeq == plain.columns.toSeq)
    // exact multiset equality via exceptAll both ways
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("left join keeps unmatched left rows exactly once per salt") {
    val left = Seq((1, "a"), (99, "nomatch")).toDF("k", "lv")
    val right = Seq((1, 10)).toDF("k", "rv")
    val out = SkewJoin.saltedJoin(left, right, Seq("k"), "left", salts = 4)
      .orderBy("k").collect()
    assert(out.length == 2)
    assert(out(1).isNullAt(2)) // unmatched row survives with null right side
  }

  test("file-source streaming runner processes the events table end-to-end") {
    val dir = Files.createTempDirectory("stream_run")
    val in = dir.resolve("in"); val out = dir.resolve("out"); val ck = dir.resolve("ck")
    // stage a real slice of events as the stream input
    graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .limit(500).write.parquet(in.toString)
    val q = EventStream.run(spark, in.toString, ck.toString, out.toString)
    try q.processAllAvailable() finally q.stop()
    val results = spark.read.parquet(out.toString)
    assert(results.columns.toSeq ==
      Seq("window_start", "event_type", "n_events", "total_value"))
    // append mode only emits windows the watermark has passed; the final
    // (open) windows stay in state — so emitted ≤ batch-twin windows
    val batchWindows = EventStream.windowedCounts(
      spark.read.parquet(in.toString)).count()
    assert(results.count() <= batchWindows)
  }
}
