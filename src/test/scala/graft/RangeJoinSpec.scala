package graft

import graft.operators.RangeJoin
import java.sql.Timestamp

/** Binned range join: containment correctness incl. bin-boundary spans,
  * and multiset equality with the naive inequality join. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int, sec: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:$sec%02d")

  test("points match exactly the intervals containing them (bin spans included)") {
    val points = Seq((1L, "p1", ts(1)), (1L, "p2", ts(9, 59)), (1L, "p3", ts(30)),
      (2L, "p4", ts(5)))
      .toDF("k", "pid", "ts")
    // interval crossing a 5-minute bin boundary + a disjoint one
    val intervals = Seq((1L, "i1", ts(0), ts(12)), (1L, "i2", ts(40), ts(50)),
      (2L, "i3", ts(4), ts(6)))
      .toDF("k", "iid", "t_start", "t_end")
    val out = RangeJoin.binnedRangeJoin(points, intervals, Seq("k"), "ts",
        "t_start", "t_end", binSeconds = 300L)
      .select("pid", "iid").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("p1", "i1"), ("p2", "i1"), ("p4", "i3")))
  }

  test("binned result is multiset-equal to the naive inequality join") {
    val points = (1 to 200).map(i => (i.toLong % 5, s"p$i", ts(i % 60, i % 60)))
      .toDF("k", "pid", "ts")
    val intervals = (1 to 50).map(i => (i.toLong % 5, s"i$i", ts(i % 40), ts(i % 40 + 7)))
      .toDF("k", "iid", "t_start", "t_end")
    val binned = RangeJoin.binnedRangeJoin(points, intervals, Seq("k"), "ts",
      "t_start", "t_end", binSeconds = 120L).select("pid", "iid")
    val naive = points.join(intervals, Seq("k"))
      .filter($"ts" >= $"t_start" && $"ts" <= $"t_end").select("pid", "iid")
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
    assert(binned.count() == naive.count())
  }
}
