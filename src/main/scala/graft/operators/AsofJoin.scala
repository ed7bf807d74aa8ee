package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (beyond reference; the brief's canonical "operator Spark
  * lacks"): match each left row to the LATEST right row with the same key
  * and `rightTime <= leftTime`.
  *
  * Spark has no AsofJoin operator, and the naive formulation — an
  * inequality join + groupBy-max — shuffles O(|L|·matches) and skews on hot
  * keys. This implementation is the scale-correct one: UNION the two sides
  * with a marker, then one window per key ordered by (time, marker) carrying
  * the last seen right-side payload forward (`last(..., ignoreNulls)` over
  * UNBOUNDED PRECEDING). ONE shuffle, O(|L|+|R|) rows, naturally
  * skew-resistant (a hot key is still a single sorted partition stream).
  */
object AsofJoin {

  /** Columns: left keeps all its columns; right contributes `payloadCols`
    * (renamed as given). Right rows sort BEFORE left rows at equal
    * timestamps, so an exact-tie state row is visible to the left row.
    *
    * All payload columns are carried as ONE struct: a right row's struct is
    * non-null even when individual fields are null, so every left row takes
    * ALL its payload values from the single latest right row — a null field
    * in the matched row stays null instead of leaking a stale value from an
    * older right row, and multi-column payloads can never mix rows. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.forall(!left.columns.contains(_)),
      "payload columns must not collide with left columns — alias them first")
    val rightTagged = right
      .select((keyCol +: timeCol +: payloadCols).map(col): _*)
      .withColumn("__asof_payload", struct(payloadCols.map(col): _*))
      .drop(payloadCols: _*)
      .withColumn("__is_left", lit(0))
    val payloadType = rightTagged.schema("__asof_payload").dataType
    val leftTagged = left
      .withColumn("__is_left", lit(1))
      .withColumn("__asof_payload", lit(null).cast(payloadType))
    val unioned = Combiner.concat(Seq(leftTagged, rightTagged))

    val w = Window.partitionBy(keyCol)
      .orderBy(col(timeCol), col("__is_left")) // state row wins ties
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__asof_payload",
      last(col("__asof_payload"), ignoreNulls = true).over(w))
    val unpacked = payloadCols.foldLeft(carried) { (df, c) =>
      df.withColumn(c, col("__asof_payload").getField(c))
    }
    unpacked.filter(col("__is_left") === 1).drop("__is_left", "__asof_payload")
  }
}
