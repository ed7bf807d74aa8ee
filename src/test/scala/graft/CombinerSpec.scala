package graft

import graft.operators.{Combiner, QueryBuilder}
import graft.operators.QueryBuilder.Filter

/** Combiner (U1/U2/J1/V2) and QueryBuilder (F1/F2/O4) semantics
  * (reference: src/combine_runner.py:19-46; webapp/pages/04_Query_Builder.py:29-75). */
class CombinerSpec extends SparkSpec {
  import spark.implicits._

  test("concat unions by name and null-fills missing columns") {
    val a = Seq((1, "x")).toDF("k", "a_only")
    val b = Seq((2, 9.5)).toDF("k", "b_only")
    val out = Combiner.concat(Seq(a, b)).orderBy("k").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("a_only") == "x" && out(0).isNullAt(2))
    assert(out(1).isNullAt(1) && out(1).getAs[Double]("b_only") == 9.5)
  }

  test("strict schema concat raises on column mismatch (V2)") {
    val a = Seq((1, "x")).toDF("k", "v")
    val b = Seq((2, "y")).toDF("k", "w")
    intercept[IllegalArgumentException] {
      Combiner.concat(Seq(a, b), strictSchema = true)
    }
    // identical schemas pass
    assert(Combiner.concat(Seq(a, a), strictSchema = true).count() == 2)
  }

  test("merge fold suffixes colliding non-key columns _2, _3") {
    val f1 = Seq((1, "a1", 10.0)).toDF("k", "name", "v")
    val f2 = Seq((1, "b1")).toDF("k", "name")
    val f3 = Seq((1, "c1", 7.0)).toDF("k", "name", "v")
    val out = Combiner.merge(Seq(f1, f2, f3), Seq("k"))
    assert(out.columns.toSeq == Seq("k", "name", "v", "name_2", "name_3", "v_3"))
    val r = out.head()
    assert(r.getAs[String]("name") == "a1" && r.getAs[String]("name_2") == "b1" &&
      r.getAs[String]("name_3") == "c1")
  }

  test("merge raises on missing keys, mirroring the reference pre-check") {
    val a = Seq((1, "x")).toDF("k", "v")
    val b = Seq((1, "y")).toDF("other", "v")
    val e = intercept[IllegalArgumentException] { Combiner.merge(Seq(a, b), Seq("k")) }
    assert(e.getMessage.contains("Missing merge keys"))
  }

  test("filters: numeric coercion + skip semantics") {
    val df = Seq((1, "aa", 10.0), (2, "ab", 20.0), (3, "bb", 30.0)).toDF("k", "s", "v")
    // numeric col with unparseable literal → whole filter skipped
    assert(QueryBuilder.applyFilters(df, Seq(Filter("v", ">", "abc"))).count() == 3)
    assert(QueryBuilder.applyFilters(df, Seq(Filter("v", ">=", "20"))).count() == 2)
    assert(QueryBuilder.applyFilters(df, Seq(Filter("s", "contains", "a"))).count() == 2)
    // unknown column and blank value → skipped
    assert(QueryBuilder.applyFilters(df, Seq(Filter("zz", "=", "1"), Filter("s", "=", ""))).count() == 3)
    // AND-fold
    assert(QueryBuilder.applyFilters(df,
      Seq(Filter("v", "<", "25"), Filter("s", "contains", "a"))).count() == 2)
  }

  test("contains is null-safe (null ⇒ false, not dropped as unknown)") {
    val df = Seq(Some("xa"), None, Some("b")).toDF("s")
    assert(QueryBuilder.applyFilters(df, Seq(Filter("s", "contains", "a"))).count() == 1)
  }

  test("buildSql renders the reference's SQL text shape") {
    assert(QueryBuilder.buildSql(Seq("a", "b"),
      Seq(Filter("a", "=", "x"), Filter("b", "contains", "y"))) ==
      "SELECT a, b FROM data WHERE a = 'x' AND b LIKE '%y%';")
    assert(QueryBuilder.buildSql(Nil, Nil) == "SELECT * FROM data;")
  }

  test("injectLimit appends LIMIT unless one exists") {
    assert(QueryBuilder.injectLimit("SELECT * FROM t", 5) == "SELECT * FROM t LIMIT 5")
    assert(QueryBuilder.injectLimit("SELECT * FROM t LIMIT 3;", 5) == "SELECT * FROM t LIMIT 3")
    // whitespace-insensitive detection: newline/tab-separated and trailing
    // limits, FETCH FIRST, and mixed case all count as existing limits
    assert(QueryBuilder.injectLimit("SELECT *\nFROM t\nLIMIT 3", 5) == "SELECT *\nFROM t\nLIMIT 3")
    assert(QueryBuilder.injectLimit("SELECT * FROM t\tlimit 3", 5) == "SELECT * FROM t\tlimit 3")
    assert(QueryBuilder.injectLimit("SELECT * FROM t FETCH FIRST 3 ROWS ONLY", 5)
      == "SELECT * FROM t FETCH FIRST 3 ROWS ONLY")
    // a column merely CONTAINING 'limit' must not suppress injection
    assert(QueryBuilder.injectLimit("SELECT limitless FROM t", 5)
      == "SELECT limitless FROM t LIMIT 5")
  }
}
