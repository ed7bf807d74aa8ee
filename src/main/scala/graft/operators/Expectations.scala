package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (deequ/dbt-test style, headless):
  * a suite of checks compiles to ONE fused aggregate over the fact table —
  * every completeness/uniqueness/range/set check shares a single scan — plus
  * one broadcast anti join per referential-integrity check. The report is
  * (check_name, n_violations, passed), all-integer, assembled lazily (no
  * builder-time action; the per-check rows are exploded from the 1-row
  * aggregate).
  *
  * 100 TB design: the audit costs one pass over the fact regardless of how
  * many column checks the suite holds (they are all conditional sums in the
  * same aggregate). Uniqueness uses count − count(distinct …); Catalyst
  * plans the distinct with a partial expand, still one scan. RI checks are
  * `left_anti` joins that broadcast the dimension's key column — the probe
  * never shuffles the fact.
  */
object Expectations {

  /** One column-level expectation: a display name plus the violation
    * predicate counted in the fused aggregate. */
  sealed trait Check { def name: String }
  /** Column must be non-null. */
  final case class NotNull(column: String) extends Check {
    def name = s"not_null:$column"
  }
  /** Column combination must be unique across rows. */
  final case class Unique(columns: Seq[String]) extends Check {
    def name = s"unique:${columns.mkString("+")}"
  }
  /** Numeric column must fall in [lo, hi]; nulls do not violate (pair with
    * [[NotNull]] when they should). */
  final case class Between(column: String, lo: Double, hi: Double) extends Check {
    def name = s"between:$column"
  }
  /** Column value must be one of `values`; nulls do not violate. */
  final case class InSet(column: String, values: Seq[String]) extends Check {
    def name = s"in_set:$column"
  }

  private def violations(c: Check): Column = c match {
    case NotNull(column) =>
      sum(when(col(column).isNull, 1L).otherwise(0L))
    case Unique(columns) =>
      // Distinct over a struct, not the raw columns: countDistinct(c1, c2)
      // drops rows where ANY argument is NULL, misreporting every NULL-keyed
      // row as a duplicate. A struct of the key columns is itself never NULL,
      // so NULL keys participate in the distinct like any other value.
      count(lit(1)) - countDistinct(struct(columns.map(col): _*))
    case Between(column, lo, hi) =>
      sum(when(col(column).isNotNull &&
        (col(column) < lo || col(column) > hi), 1L).otherwise(0L))
    case InSet(column, values) =>
      sum(when(col(column).isNotNull &&
        !col(column).isin(values: _*), 1L).otherwise(0L))
  }

  /** Run the column checks in one fused aggregate; returns
    * (check_name, n_violations, passed) — |checks| rows from one scan. */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty expectation suite")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      violations(c).cast("long").as(s"__v$i")
    }
    val packed = array(checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"), col(s"__v$i").as("n_violations"))
    }: _*)
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(packed).as("c"))
      .select(col("c.check_name"), col("c.n_violations"),
        (col("c.n_violations") === 0L).as("passed"))
  }

  /** Referential integrity: count fact rows whose `keyCol` has no match in
    * `dim.dimKeyCol` (a broadcast left_anti probe — the fact never
    * shuffles). Returns one report row in the [[audit]] shape. */
  def refIntegrity(fact: DataFrame, keyCol: String, dim: DataFrame,
      dimKeyCol: String, checkName: String): DataFrame =
    fact.join(broadcast(dim.select(col(dimKeyCol).as("__k")).distinct()),
        col(keyCol) === col("__k"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(checkName).as("check_name"),
        col("n_violations").cast("long").as("n_violations"),
        (col("n_violations") === 0L).as("passed"))
}
