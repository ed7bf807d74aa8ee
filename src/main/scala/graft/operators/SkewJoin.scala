package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe equi-join via key salting (100 TB toolkit; beyond reference —
  * the reference never joins at scale).
  *
  * AQE's skew-join handling (on by default, split-on-size) covers most
  * cases; explicit salting is for the pathological ones AQE can't fix —
  * e.g. one key holding >50% of a table joined against a non-broadcastable
  * right side. The left (skewed) side gets a random salt in [0, salts);
  * the right side is replicated `salts`× with every salt value, so each
  * hot key fans out over `salts` reducers instead of one.
  *
  * Cost model: right side shuffles salts× its size — use only when
  * right ≪ left and the broadcast threshold is exceeded.
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      how: String = "inner", salts: Int = 16): DataFrame = {
    require(salts > 1, "salts must be > 1")
    require(Set("inner", "left", "left_outer").contains(how),
      "salting replicates the right side — only inner/left joins are sound")
    val salted = left.withColumn("__salt", (rand(seed = 42) * salts).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, keys :+ "__salt", how).drop("__salt")
  }
}
