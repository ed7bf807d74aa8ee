package graft.queries

import graft.functions.{AutoMapper, SchemaCandidates}
import org.apache.spark.sql.functions._

/** Header-intelligence queries (SURVEY §2.10 H1-H8). The heuristics are
  * driver-side over previews; data-dependent stats are oracle-replayed with
  * the same formulas, fixed-input paths use VALUES oracles.
  */
object HeaderQueries {
  import Tables.t

  // H1 synonym auto-mapping + H2 fuzzy best-target on a fixed header list
  // (reference: src/core.py:253-282; webapp/pages/02_Mapping.py:29-47).
  private val h1 = Q("h1_h2_auto_mapping", Some(
    """SELECT * FROM (VALUES
      |  ('Vendor Name', 'provider_id', 'provider_id'),
      |  ('Item SKU', 'article_sku', 'article_sku'),
      |  ('Total Amount', 'sales_amount', 'sales_amount'),
      |  ('Second Vendor', 'second_vendor', 'provider_id'),
      |  ('Unit-Price!', 'unit_price', 'unit_price'),
      |  ('Random Header', 'random_header', NULL))
      |AS t(header, h1_mapped, h2_best) ORDER BY header""".stripMargin)) { (s, dir) =>
    val headers = Seq("Vendor Name", "Item SKU", "Total Amount", "Second Vendor",
      "Unit-Price!", "Random Header")
    val h1m = AutoMapper.autoMapColumns(headers)
    import s.implicits._
    headers.map(h => (h, h1m(h), AutoMapper.bestTarget(h).orNull))
      .toDF("header", "h1_mapped", "h2_best").orderBy("header")
  }

  // H5 column classifiers over a documents-derived preview: stats formulas
  // replayed in the oracle (reference: src/services/schema_candidates.py:10-33).
  private val h5 = Q("h5_column_classifiers", Some(
    """WITH p AS (
      |  SELECT lang, CAST(n_chars AS VARCHAR) AS n_chars_s,
      |    CAST(1900 + doc_id % 150 AS VARCHAR) AS yr_s, text
      |  FROM documents),
      |s AS (SELECT
      |  avg(CASE WHEN try_cast(lang AS DOUBLE) IS NOT NULL THEN 1.0 ELSE 0.0 END) AS nr_lang,
      |  avg(length(lang)) AS ml_lang,
      |  avg(CASE WHEN try_cast(n_chars_s AS DOUBLE) IS NOT NULL THEN 1.0 ELSE 0.0 END) AS nr_n,
      |  avg(CASE WHEN try_cast(yr_s AS DOUBLE) BETWEEN 1900 AND 2100 THEN 1.0 ELSE 0.0 END) AS yr_y,
      |  avg(CASE WHEN try_cast(text AS DOUBLE) IS NOT NULL THEN 1.0 ELSE 0.0 END) AS nr_t,
      |  avg(length(text)) AS ml_t
      |  FROM p)
      |SELECT col_name, round(numeric_ratio, 4) AS numeric_ratio, is_numeric, is_texty, is_year
      |FROM (
      |  SELECT 'lang' AS col_name, nr_lang AS numeric_ratio, false AS is_numeric,
      |    (ml_lang > 12 AND nr_lang < 0.3) AS is_texty, false AS is_year FROM s
      |  UNION ALL SELECT 'n_chars', nr_n, true, false, false FROM s
      |  UNION ALL SELECT 'yr', 1.0, false, false, yr_y > 0.6 FROM s
      |  UNION ALL SELECT 'text', nr_t, false, (ml_t > 12 AND nr_t < 0.3), false FROM s)
      |ORDER BY col_name""".stripMargin)) { (s, dir) =>
    val preview = t(s, dir, "documents").select(
      col("lang"), col("n_chars").cast("string").as("n_chars"),
      (lit(1900) + col("doc_id") % 150).cast("string").as("yr"), col("text"))
    val stats = SchemaCandidates.columnStats(preview)
    import s.implicits._
    stats.map(st => (st.name, BigDecimal(st.numericRatio)
        .setScale(4, BigDecimal.RoundingMode.HALF_EVEN).toDouble,
        st.isNumericCol, st.isTextyCol, st.isYearLike))
      .toDF("col_name", "numeric_ratio", "is_numeric", "is_texty", "is_year")
      .orderBy("col_name")
  }

  // H6 numeric blocks on the same preview: [n_chars] and [yr] split by the
  // year-like column → a single block (reference: src/services/schema_candidates.py:36-68).
  private val h6 = Q("h6_numeric_blocks", Some(
    """SELECT * FROM (VALUES (0, 1, 1, 'n_chars')) AS t(block, start_idx, end_idx, cols)
      |ORDER BY block""".stripMargin)) { (s, dir) =>
    val preview = t(s, dir, "documents").select(
      col("lang"), col("n_chars").cast("string").as("n_chars"),
      (lit(1900) + col("doc_id") % 150).cast("string").as("yr"), col("text"))
    val blocks = SchemaCandidates.findNumericBlocks(SchemaCandidates.columnStats(preview))
    import s.implicits._
    blocks.zipWithIndex
      .map { case (b, i) => (i, b.startIdx, b.endIdx, b.columns.mkString(",")) }
      .toDF("block", "start_idx", "end_idx", "cols").orderBy("block")
  }

  // H7 multi-language month normalization (reference: src/services/schema_candidates.py:71-117).
  private val h7 = Q("h7_month_normalization", Some(
    """SELECT * FROM (VALUES
      |  ('tammikuu', 'jan'), ('Dezember', 'dec'), ('OCTOBER', 'oct'),
      |  ('maj', 'may'), ('mars', 'mar'), ('kesäkuu', 'jun'),
      |  ('SEPtember', 'sep'), ('notamonth', NULL))
      |AS t(token, normalized) ORDER BY token""".stripMargin)) { (s, dir) =>
    val tokens = Seq("tammikuu", "Dezember", "OCTOBER", "maj", "mars", "kesäkuu",
      "SEPtember", "notamonth")
    import s.implicits._
    tokens.map(tk => (tk, SchemaCandidates.normalizeMonth(tk).orNull))
      .toDF("token", "normalized").orderBy("token")
  }

  // H8 ranked schema candidates on a fixed preview; scores/diffs hand-checked
  // (reference: src/services/schema_candidates.py:128-236).
  private val h8 = Q("h8_ranked_candidates", Some(
    """SELECT * FROM (VALUES
      |  ('As detected', 'desc,2020 Jan,year,price,code', 0.20, 'qty', '2020 Jan,code,price,year'),
      |  ('Combined year+month headers', 'desc,2020-jan,year,price,code', 0.35, 'qty', '2020-jan,code,price,year'),
      |  ('Numeric block ordering', 'desc,qty', 0.65, '', ''),
      |  ('Numeric block ordering', 'price', 0.55, 'desc,qty', 'price'))
      |AS t(label, headers, score, missing, extra) ORDER BY label, headers""".stripMargin)) {
    (s, dir) =>
      import s.implicits._
      val preview = Seq(
        ("a very long descriptive product name 1", "10", "1999", "5.5", "x"),
        ("another quite long product description", "20", "2001", "6.5", "y"),
        ("third long text value for the key field", "30", "2020", "7.5", "z"))
        .toDF("desc", "qty", "year", "price", "code")
      val cands = SchemaCandidates.buildCandidates(preview,
        Seq("desc", "2020 Jan", "year", "price", "code"),
        targetFields = Seq("desc", "qty"))
      cands.map(c => (c.label, c.headers.mkString(","),
          BigDecimal(c.score).setScale(2, BigDecimal.RoundingMode.HALF_EVEN).toDouble,
          c.missing.mkString(","), c.extra.mkString(",")))
        .toDF("label", "headers", "score", "missing", "extra")
        .orderBy("label", "headers")
  }

  // H3 synonym config load/merge/learn (reference: src/core.py:222-243):
  // a learn cycle writes the user overlay, loadConfig merges base + user
  // (user lists EXTEND base lists, deduped), and the merged mapping is
  // emitted row-wise. Fixed-input path → VALUES oracle (the h1 pattern).
  private val h3 = Q("h3_synonym_learn", Some(
    """SELECT * FROM (VALUES
      |  ('qty', 'quantity'),
      |  ('report_date', 'date'),
      |  ('report_date', 'pvm'),
      |  ('report_date', 'raportointi pvm'),
      |  ('sales_amount', 'sales'))
      |AS t(field, synonym) ORDER BY field, synonym""".stripMargin)) { (s, dir) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft_h3")
    val base = tmp.resolve("base.yaml")
    val user = tmp.resolve("user.yaml")
    java.nio.file.Files.writeString(base,
      "synonyms:\n  report_date:\n    - date\n    - pvm\n  sales_amount:\n    - sales\n")
    AutoMapper.learnMapping(user, "report_date", " Raportointi PVM ")
    AutoMapper.learnMapping(user, "qty", "Quantity")
    val merged = AutoMapper.loadConfig(base, user)
    import s.implicits._
    merged.synonyms.toSeq
      .flatMap { case (f, syns) => syns.map(f -> _) }
      .toDF("field", "synonym").orderBy("field", "synonym")
  }

  val qs: Seq[Q] = Seq(h1, h3, h5, h6, h7, h8)
}
