package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Dataset combination: U1/U2 union-by-name concat and J1 N-way equi-join
  * fold (reference: src/combine_runner.py:19-46).
  */
object Combiner {

  /** U1 concat: union by column name, missing columns null-filled — the
    * `pd.concat(ignore_index=True, sort=False)` shape. `strictSchema` (V2)
    * raises on any exact column-list mismatch BEFORE executing
    * (reference: src/combine_runner.py:19-30). */
  def concat(frames: Seq[DataFrame], strictSchema: Boolean = false): DataFrame = {
    require(frames.nonEmpty, "concat requires at least one frame")
    if (strictSchema) {
      val base = frames.head.columns.toSeq
      frames.zipWithIndex.drop(1).foreach { case (f, i) =>
        if (f.columns.toSeq != base)
          throw new IllegalArgumentException(s"Schema mismatch in frame $i")
      }
    }
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** U2 union with manual alignment: null-fill to the union of all column
    * sets, then project every frame onto one shared column order
    * (reference: src/app.py:1560-1597). Same result as `concat`; kept as the
    * explicit-alignment API. */
  def concatAligned(frames: Seq[DataFrame]): DataFrame = {
    require(frames.nonEmpty, "concat requires at least one frame")
    val shared = frames.flatMap(_.columns).distinct
    frames.map { f =>
      val have = f.columns.toSet
      f.select(shared.map(c =>
        if (have(c)) col(quote(c))
        else org.apache.spark.sql.functions.lit(null).as(c)): _*)
    }.reduce(_.union(_))
  }

  /** J1 left-fold equi-join across N frames. pandas suffixes colliding
    * non-key columns with `_2`, `_3`, … (left side keeps its name); Spark
    * errors on ambiguity instead, so colliding right-side columns are
    * pre-renamed to `name_i` before each fold step (SURVEY §7.4.5). Missing
    * keys on either side raise, mirroring the reference's pre-check
    * (reference: src/combine_runner.py:33-46). Equi-join only; Catalyst
    * picks broadcast vs sort-merge (AQE re-plans at runtime). */
  def merge(frames: Seq[DataFrame], keys: Seq[String], how: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "Merge mode requires at least one key.")
    require(frames.nonEmpty, "merge requires at least one frame")
    frames.zipWithIndex.drop(1).foldLeft(frames.head) { case (merged, (df, i0)) =>
      val idx = i0 + 1 // pandas enumerate(start=2)
      val missingLeft = keys.filterNot(merged.columns.contains)
      val missingRight = keys.filterNot(df.columns.contains)
      if (missingLeft.nonEmpty || missingRight.nonEmpty)
        throw new IllegalArgumentException(
          s"Missing merge keys. Left missing ${missingLeft.mkString("[", ", ", "]")}, " +
            s"right missing ${missingRight.mkString("[", ", ", "]")}.")
      val collisions = df.columns.filter(c => !keys.contains(c) && merged.columns.contains(c))
      val right = collisions.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"${c}_$idx"))
      merged.join(right, keys, how)
    }
  }

  private def quote(name: String): String = s"`${name.replace("`", "``")}`"
}
