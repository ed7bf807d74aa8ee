package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (beyond-reference north star):
  * brute-force cosine top-k as the exact baseline, IVF (inverted-file,
  * centroid-probed) as the scale path.
  *
  * 100 TB design:
  *  - the query vector is a one-row broadcast (never a shuffle);
  *  - brute force is a single scan + TakeOrderedAndProject — exact, O(n·d),
  *    the right tool up to ~10⁸ vectors per query batch;
  *  - IVF prunes the scan to `nprobe` cells: centroids are a tiny aggregate
  *    (numCells×d), cell assignment co-partitions the candidate scan, and
  *    only ~nprobe/numCells of the data is read when the table is
  *    partitioned/bucketed by cell id;
  *  - all vector math is `zip_with`/`aggregate` over array columns —
  *    codegen'd, no UDFs, no driver collects of data rows.
  */
object Similarity {

  /** Elementwise dot product of two double-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cast a float-array column to double for stable math. */
  def asDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Exact brute-force cosine top-k against a single query vector (taken
    * from `queryDf`, one row). The join is a broadcast of that one row. */
  def bruteForceTopK(data: DataFrame, idCol: String, vecCol: String,
      queryDf: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queryDf.select(asDouble(col(vecCol)).as("__qv")))
    data.select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .crossJoin(q)
      .select(col(idCol), cosine(col("__v"), col("__qv")).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /** Per-cell centroids: mean vector per `cellCol` (e.g. a cluster label or
    * a hash bucket). One explode + one groupBy on (cell, dim) — numCells×d
    * output rows, small enough to broadcast. */
  def centroids(data: DataFrame, cellCol: String, vecCol: String): DataFrame =
    data.select(col(cellCol).as("cell"), posexplode(asDouble(col(vecCol))))
      .groupBy("cell", "pos").agg(avg("col").as("v"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("v")))).as("pv"))
      .select(col("cell"), transform(col("pv"), p => p.getField("v")).as("centroid"))

  /** IVF search: probe the `nprobe` cells whose centroids are closest to the
    * query (by cosine), then brute-force only within those cells. */
  def ivfTopK(data: DataFrame, idCol: String, cellCol: String, vecCol: String,
      queryDf: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val cents = centroids(data, cellCol, vecCol)
    val q = broadcast(queryDf.select(asDouble(col(vecCol)).as("__qv")))
    val probed = cents.crossJoin(q)
      .select(col("cell"), cosine(col("centroid"), col("__qv")).as("cs"))
      .orderBy(desc("cs"), col("cell"))
      .limit(nprobe)
    // cell list is tiny: broadcast the probe set into the candidate filter
    val candidates = data.join(broadcast(probed.select("cell")),
      data(cellCol) === col("cell"))
    bruteForceTopK(candidates, idCol, vecCol, queryDf, k)
  }
}
