package graft.queries

import graft.functions.Curation
import graft.operators.Linkage
import org.apache.spark.sql.functions._

/** Record-linkage + vectorization queries: sorted-neighborhood blocking
  * scored with the native Jaro-Winkler expression, and hashing-trick
  * feature vectors. */
object LinkageQueries {
  import Tables.t

  // Sorted-neighborhood linkage over customer names: each record pairs
  // with its 3 sort-successors (O(n·w) candidates — no quadratic path),
  // scored with native Jaro-Winkler. The oracle replays the rank window
  // with row_number and DuckDB's jaro_winkler_similarity — gating our
  // expression's semantics (match window, transpositions, 0.7 boost
  // threshold) against an independent implementation.
  private val x83 = Q("x83_sorted_neighborhood", Some(
    """WITH idx AS (
      |  SELECT c_custkey AS id, c_name AS key,
      |    row_number() OVER (ORDER BY c_name) AS rn
      |  FROM customer)
      |SELECT a.id AS id_a, b.id AS id_b,
      |  CAST(b.rn - a.rn AS BIGINT) AS rank_distance,
      |  round(jaro_winkler_similarity(a.key, b.key), 4) AS jw
      |FROM idx a JOIN idx b ON b.rn BETWEEN a.rn + 1 AND a.rn + 3
      |ORDER BY id_a, id_b""".stripMargin)) { (s, dir) =>
    Linkage.linkBySortedNeighborhood(
        t(s, dir, "customer").select("c_custkey", "c_name"),
        "c_custkey", "c_name", window = 3)
      .select(col("id_a"), col("id_b"),
        col("rank_distance").cast("bigint").as("rank_distance"),
        round(col("jw"), 4).as("jw"))
      .orderBy("id_a", "id_b")
  }

  // Hashing-trick bag-of-words (dim 32): fixed dimensionality with no
  // vocabulary pass. The oracle replays tokenization, the md5 bucket hash,
  // and the sorted sparse-vector serialization byte-for-byte.
  private val x84 = Q("x84_feature_hashing", Some(
    """WITH w AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(
      |    regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
      |    x -> x <> '')) AS wd
      |  FROM documents),
      |b AS (
      |  SELECT doc_id,
      |    ('0x' || substring(md5(wd), 1, 8))::BIGINT % 32 AS bucket,
      |    count(*) AS cnt
      |  FROM w GROUP BY doc_id, bucket)
      |SELECT doc_id, count(*) AS nnz, CAST(sum(cnt) AS BIGINT) AS l1,
      |  CAST(sum((bucket + 1) * cnt) AS BIGINT) AS checksum,
      |  md5(string_agg(bucket::VARCHAR || ':' || cnt::VARCHAR, ','
      |    ORDER BY bucket)) AS vec_md5
      |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin)) { (s, dir) =>
    Curation.featureHash(t(s, dir, "documents"), "doc_id", "text", dim = 32)
      .select("doc_id", "nnz", "l1", "checksum", "vec_md5")
      .orderBy("doc_id")
  }

  val qs: Seq[Q] = Seq(x83, x84)
}
