package graft.queries

import graft.functions.{Curation, Sketches, TextAnalysis}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Round-4 training-data pipeline operators (beyond-reference north star):
  * benchmark decontamination, quality-rule gating, sequence packing, and
  * sketch-based profiling. Oracles replay the exact same deterministic
  * (md5-derived where hashed) pipeline in DuckDB, step for step.
  */
object TrainingQueries {
  import Tables.t

  /** DuckDB twin of Dedup.words (lowercased alphanumeric tokens). */
  private val WORDS =
    """list_filter(string_split_regex(regexp_replace(lower(text),
      |  '[^a-z0-9]+', ' ', 'g'), ' '), x -> x <> '')""".stripMargin

  /** DuckDB twin of Dedup.shingles(words, 3) over documents. */
  private val SETS3_CTE =
    s"""sets AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(ws)-1),
       |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shs
       |  FROM (SELECT doc_id, $WORDS AS ws FROM documents))""".stripMargin

  // Benchmark n-gram decontamination: docs with doc_id % 37 = 0 act as the
  // held-out eval set; every remaining (train) doc reports how many distinct
  // word 3-grams it shares with the benchmark. The oracle replays shingling,
  // the distinct-gram join, and the per-doc count identically. (Production
  // n≈13; 3 here because the synthetic docs are 10-99 tokens.)
  private val x32 = Q("x32_decontamination", Some(
    s"""WITH $SETS3_CTE,
       |ben AS (SELECT DISTINCT u.g AS g
       |        FROM sets b, unnest(b.shs) AS u(g) WHERE b.doc_id % 37 = 0),
       |hits AS (
       |  SELECT tr.doc_id, count(*) AS n_overlap
       |  FROM (SELECT doc_id, u.g FROM sets, unnest(shs) AS u(g)
       |        WHERE doc_id % 37 <> 0) tr
       |  JOIN ben USING (g) GROUP BY tr.doc_id)
       |SELECT d.doc_id, CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       |       coalesce(h.n_overlap, 0) > 0 AS contaminated
       |FROM documents d LEFT JOIN hits h USING (doc_id)
       |WHERE d.doc_id % 37 <> 0 ORDER BY d.doc_id""".stripMargin)) { (s, dir) =>
    val docs = t(s, dir, "documents")
    Curation.decontaminate(
        docs.filter(col("doc_id") % 37 =!= 0),
        docs.filter(col("doc_id") % 37 === 0),
        "doc_id", "text", n = 3)
      .orderBy("doc_id")
  }

  // Gopher-style quality-rule gate: per-document booleans for each rule plus
  // the conjunction — the per-rule rejection accounting a curation stack
  // reports. Pure expressions; the oracle replays every formula.
  private val x37 = Q("x37_quality_rules", Some(
    s"""WITH w AS (SELECT doc_id, $WORDS AS ws FROM documents),
       |m AS (SELECT doc_id, len(ws) AS n,
       |  CASE WHEN len(ws) = 0 THEN 0.0
       |       ELSE len(array_to_string(ws, ''))::DOUBLE / len(ws) END AS mwl,
       |  len(list_filter(ws, x -> x IN ('the','a','of','and','to','in','is','that'))) AS stops,
       |  CASE WHEN len(ws) = 0 THEN 1.0
       |       ELSE len(list_filter(ws, x -> regexp_matches(x, '^[0-9]+$$')))::DOUBLE / len(ws) END AS numr
       | FROM w)
       |SELECT doc_id,
       |  n BETWEEN 20 AND 80 AS r_word_count,
       |  mwl BETWEEN 2.0 AND 8.0 AS r_mean_word_len,
       |  stops >= 2 AS r_stopwords,
       |  numr <= 0.3 AS r_numeric_ratio,
       |  (n BETWEEN 20 AND 80) AND (mwl BETWEEN 2.0 AND 8.0)
       |    AND stops >= 2 AND numr <= 0.3 AS passes
       |FROM m ORDER BY doc_id""".stripMargin)) { (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.qualityRules(col("text")).as("q"))
      .select(col("doc_id"), col("q.r_word_count").as("r_word_count"),
        col("q.r_mean_word_len").as("r_mean_word_len"),
        col("q.r_stopwords").as("r_stopwords"),
        col("q.r_numeric_ratio").as("r_numeric_ratio"),
        col("q.passes").as("passes"))
      .orderBy("doc_id")
  }

  // GPT-style sequence packing at capacity 64, sharded by source: the oracle
  // replays the running token sum and the integer pack arithmetic.
  private val x38 = Q("x38_sequence_packing", Some(
    s"""WITH toks AS (
       |  SELECT doc_id, source, len($WORDS) AS n_tokens FROM documents),
       |w AS (
       |  SELECT doc_id, source, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM toks WHERE n_tokens > 0)
       |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST((cum - n_tokens) // 64 AS BIGINT) AS pack_id,
       |  CAST((cum - n_tokens) % 64 AS BIGINT) AS pack_offset,
       |  CAST((cum - 1) // 64 - (cum - n_tokens) // 64 + 1 AS BIGINT) AS n_packs
       |FROM w ORDER BY doc_id""".stripMargin)) { (s, dir) =>
    Curation.packSequences(t(s, dir, "documents"), "doc_id", "text",
        capacity = 64, shardCol = "source")
      .orderBy("doc_id")
  }

  // Count-min heavy hitters: 4×32 md5-seeded sketch over the token stream,
  // top-20 words with exact count AND sketch estimate side by side (the
  // estimate is ≥ exact by construction; with 32 buckets collisions are
  // visible, which is the point). The oracle replays sketch construction
  // cell for cell and the min-of-buckets estimate.
  private val x33 = Q("x33_heavy_hitters", Some(
    s"""WITH toks AS (
       |  SELECT u.tok FROM (SELECT $WORDS AS ws FROM documents),
       |    unnest(ws) AS u(tok)),
       |exact AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
       |cells AS (
       |  SELECT t.r AS r,
       |    ('0x' || substring(md5(t.r::VARCHAR || ':' || tok), 1, 8))::BIGINT % 32 AS bucket
       |  FROM toks, range(4) t(r)),
       |sketch AS (SELECT r, bucket, count(*) AS cnt FROM cells GROUP BY r, bucket),
       |keycells AS (
       |  SELECT e.tok, t.r AS r,
       |    ('0x' || substring(md5(t.r::VARCHAR || ':' || e.tok), 1, 8))::BIGINT % 32 AS bucket
       |  FROM exact e, range(4) t(r)),
       |est AS (
       |  SELECT k.tok, min(coalesce(s.cnt, 0)) AS est
       |  FROM keycells k LEFT JOIN sketch s ON k.r = s.r AND k.bucket = s.bucket
       |  GROUP BY k.tok)
       |SELECT e.tok AS word, CAST(e.c AS BIGINT) AS exact_count,
       |       CAST(est.est AS BIGINT) AS cms_estimate
       |FROM exact e JOIN est ON e.tok = est.tok
       |ORDER BY exact_count DESC, word LIMIT 20""".stripMargin)) { (s, dir) =>
    val toks = t(s, dir, "documents")
      .select(explode(Dedup.words(col("text"))).as("tok"))
    val sketch = Sketches.countMin(toks, "tok", depth = 4, width = 32)
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact_count"))
    val est = Sketches.cmsEstimate(sketch, exact.select("tok"), "tok",
      depth = 4, width = 32)
    exact.join(est, "tok")
      .select(col("tok").as("word"), col("exact_count"), col("cms_estimate"))
      .orderBy(desc("exact_count"), col("word")).limit(20)
  }

  // KMV distinct-count sketch per event_type (k=8, exact alongside the
  // estimate); the oracle replays the distinct-hash ranking and the
  // (k-1)/kth-minimum estimator bit for bit.
  private val x39 = Q("x39_kmv_distinct", Some(
    """WITH d AS (
      |  SELECT DISTINCT event_type,
      |    ('0x' || substring(md5('7:' || user_id::VARCHAR), 1, 8))::BIGINT AS hv
      |  FROM events),
      |rk AS (SELECT event_type, hv,
      |         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
      |       FROM d),
      |kth AS (SELECT event_type, hv FROM rk WHERE rn = 8),
      |ex AS (SELECT event_type,
      |         CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
      |       FROM events GROUP BY event_type)
      |SELECT ex.event_type, ex.exact_distinct,
      |       round(7 / (kth.hv::DOUBLE / 4294967296.0), 2) AS kmv_estimate
      |FROM ex JOIN kth ON ex.event_type = kth.event_type
      |ORDER BY ex.event_type""".stripMargin)) { (s, dir) =>
    val ev = t(s, dir, "events").select("event_type", "user_id")
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    val est = Sketches.kmvDistinct(ev, "event_type", "user_id", k = 8, seed = 7)
    exact.join(est, "event_type")
      .select(col("event_type"), col("exact_distinct"), col("kmv_estimate"))
      .orderBy("event_type")
  }

  // Data-driven domain rebalancing: keep-rates derived from per-source
  // counts to hit a 40-row target mix (src0 half, src1/src2 a quarter,
  // long tail 5%), rows kept by the deterministic seeded-hash filter. The
  // oracle replays the rate computation and the md5 filter; every float op
  // is forced to DOUBLE in both engines so the floor() boundaries agree.
  private val x36 = Q("x36_domain_mix", Some(
    """WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
      |rates AS (
      |  SELECT source,
      |    CAST(floor(least(CAST(1.0 AS DOUBLE),
      |      CAST(40.0 AS DOUBLE) * CAST(CASE source
      |        WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.25
      |        WHEN 'src2' THEN 0.25 ELSE 0.05 END AS DOUBLE) / n) * 10000)
      |      AS BIGINT) AS cut
      |  FROM counts),
      |kept AS (
      |  SELECT d.source, d.doc_id FROM documents d JOIN rates r ON d.source = r.source
      |  WHERE ('0x' || substring(md5('0:mix:' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000 < r.cut)
      |SELECT source, count(*) AS n_kept FROM kept
      |GROUP BY source ORDER BY source""".stripMargin)) { (s, dir) =>
    Curation.domainMix(t(s, dir, "documents"), "doc_id", "source",
        Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25),
        totalTarget = 40, defaultWeight = 0.05)
      .groupBy("source").agg(count(lit(1)).as("n_kept"))
      .orderBy("source")
  }

  // Edit-distance verify primitive over an explicit candidate frame (here:
  // adjacent doc ids — any LSH/simhash bucket output plugs in the same way).
  // Both engines run the identical Levenshtein DP and the same normalized
  // similarity, so the hash gate covers the whole verify path.
  private val x41 = Q("x41_edit_distance", Some(
    """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_distance,
      |  round(1.0 - levenshtein(a.text, b.text)::DOUBLE /
      |    greatest(len(a.text), len(b.text), 1), 4) AS similarity
      |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |ORDER BY id_a""".stripMargin)) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val cand = docs.select(col("doc_id").as("id_a"),
      (col("doc_id") + 1).as("id_b"))
    Dedup.editDistanceVerify(docs, "doc_id", "text", cand)
      .orderBy("id_a")
  }

  // HLL distinct sketch per event_type (m=32 registers, md5-derived), exact
  // count alongside. The oracle replays register assignment (low 5 bits),
  // rho ranks via bin()-length, the max-per-register table, and the
  // harmonic/linear-counting estimator. Register sums are sums of powers of
  // two spanning < 53 bits — exact in double, so no summation-order risk;
  // the final round(2) absorbs libm ulp drift in ln().
  private val x43 = Q("x43_hll_distinct", Some(
    """WITH h AS (
      |  SELECT event_type,
      |    ('0x' || substring(md5('11:' || user_id::VARCHAR), 1, 8))::BIGINT AS hv
      |  FROM events),
      |r AS (SELECT event_type, hv % 32 AS reg,
      |        CASE WHEN hv // 32 = 0 THEN 28
      |             ELSE 28 - length(bin(hv // 32)) END AS rho
      |      FROM h),
      |regs AS (SELECT event_type, reg, max(rho) AS mr
      |         FROM r GROUP BY event_type, reg),
      |sums AS (SELECT event_type, sum(power(2.0, -mr)) AS s, count(*) AS np
      |         FROM regs GROUP BY event_type),
      |est AS (SELECT event_type,
      |          CAST(0.697 AS DOUBLE) * 32 * 32 / (s + (32 - np)) AS raw,
      |          32 - np AS v
      |        FROM sums),
      |ex AS (SELECT event_type,
      |         CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
      |       FROM events GROUP BY event_type)
      |SELECT ex.event_type, ex.exact_distinct,
      |  round(CASE WHEN raw <= CAST(80 AS DOUBLE) AND v > 0
      |             THEN CAST(32 AS DOUBLE) * ln(CAST(32 AS DOUBLE) / v)
      |             ELSE raw END, 2) AS hll_estimate
      |FROM ex JOIN est ON ex.event_type = est.event_type
      |ORDER BY ex.event_type""".stripMargin)) { (s, dir) =>
    val ev = t(s, dir, "events").select("event_type", "user_id")
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    val est = Sketches.hllDistinct(ev, "event_type", "user_id", b = 5, seed = 11)
    exact.join(est, "event_type")
      .select(col("event_type"), col("exact_distinct"), col("hll_estimate"))
      .orderBy("event_type")
  }

  // Vocabulary token-id encoding: top-50 frequency-ranked vocab (count
  // desc, token asc), every doc re-emitted as its id sequence with OOV=0.
  // The oracle rebuilds the vocab ranking, replays the join, and
  // re-assembles the position-ordered id string.
  private val x49 = Q("x49_vocab_encode", Some(
    s"""WITH w AS (SELECT doc_id, $WORDS AS ws FROM documents),
       |tok AS (
       |  SELECT doc_id, t.i AS pos, ws[t.i] AS tokw
       |  FROM w, unnest(range(1, len(ws) + 1)) AS t(i)),
       |counts AS (
       |  SELECT tokw, count(*) AS c FROM tok GROUP BY tokw
       |  ORDER BY c DESC, tokw LIMIT 50),
       |vocab AS (
       |  SELECT tokw, row_number() OVER (ORDER BY c DESC, tokw) AS token_id
       |  FROM counts),
       |enc AS (
       |  SELECT tok.doc_id, tok.pos, coalesce(v.token_id, 0) AS tid
       |  FROM tok LEFT JOIN vocab v ON tok.tokw = v.tokw)
       |SELECT doc_id, count(*) AS n_tokens,
       |  array_to_string(array_agg(tid ORDER BY pos), ',') AS token_ids
       |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin)) { (s, dir) =>
    Curation.vocabEncode(t(s, dir, "documents"), "doc_id", "text", vocabSize = 50)
      .orderBy("doc_id")
  }

  // URL canonicalization + crawl dedup: deterministic synthetic URLs (case
  // noise, tracking params, default ports, fragments, trailing slashes)
  // derived from doc fields IDENTICALLY in both engines; the oracle replays
  // the same regexp chain and the same min-id winner per canonical URL.
  private val x52 = Q("x52_url_dedup", Some(
    """WITH urls AS (
      |  SELECT doc_id,
      |    (CASE doc_id % 3 WHEN 0 THEN 'HTTPS' WHEN 1 THEN 'https' ELSE 'http' END)
      |    || '://' || (CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END)
      |    || '.Example.COM' || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
      |    || '/Page/' || (doc_id % 40)::VARCHAR
      |    || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&ref=' ELSE '?ref=' END)
      |    || (doc_id % 7)::VARCHAR
      |    || (CASE WHEN doc_id % 4 = 0 THEN '#sec' ELSE '' END)
      |    AS url
      |  FROM documents),
      |canon AS (
      |  SELECT doc_id,
      |    regexp_replace(
      |      lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || '://' ||
      |      regexp_replace(lower(regexp_extract(regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '^([^/?#]*)', 1)), ':(80|443)$', '') ||
      |      regexp_replace(regexp_replace(regexp_replace(
      |        regexp_replace(regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '^[^/?#]*', ''),
      |        '#.*', ''), '(utm_[a-z]+|fbclid|gclid)=[^&#]*&?', '', 'g'), '[?&]$', ''),
      |      '/$', '') AS canonical_url
      |  FROM urls)
      |SELECT w.canonical_url, w.doc_id, w.n_dups
      |FROM (SELECT canonical_url, min(doc_id) AS doc_id,
      |        count(*) AS n_dups
      |      FROM canon GROUP BY canonical_url) w
      |ORDER BY w.canonical_url""".stripMargin)) { (s, dir) =>
    val urls = t(s, dir, "documents").select(col("doc_id"),
      concat(
        when(col("doc_id") % 3 === 0, lit("HTTPS"))
          .when(col("doc_id") % 3 === 1, lit("https")).otherwise(lit("http")),
        lit("://"),
        when(col("doc_id") % 2 === 0, upper(col("source"))).otherwise(col("source")),
        lit(".Example.COM"),
        when(col("doc_id") % 5 === 0, lit(":443")).otherwise(lit("")),
        lit("/Page/"), (col("doc_id") % 40).cast("string"),
        when(col("doc_id") % 3 === 0, lit("?utm_source=feed&ref="))
          .otherwise(lit("?ref=")),
        (col("doc_id") % 7).cast("string"),
        when(col("doc_id") % 4 === 0, lit("#sec")).otherwise(lit(""))
      ).as("url"))
    Curation.urlDedup(urls, "doc_id", "url")
      .select("canonical_url", "doc_id", "n_dups")
      .orderBy("canonical_url")
  }

  // Exactly-n-per-group sampling: 5 docs per language, ranked by a seeded
  // md5 of the id (lexicographic hex compare — identical cross-engine).
  // The rank filter plans a WindowGroupLimit, so map tasks forward ≤ 5
  // rows per group.
  private val x53 = Q("x53_group_sample", Some(
    """SELECT lang, doc_id, source
      |FROM (SELECT lang, doc_id, source,
      |        row_number() OVER (PARTITION BY lang
      |          ORDER BY md5('gs:' || doc_id::VARCHAR), doc_id) AS rk
      |      FROM documents)
      |WHERE rk <= 5 ORDER BY lang, doc_id""".stripMargin)) { (s, dir) =>
    Curation.groupSample(t(s, dir, "documents"), "doc_id", "lang", n = 5)
      .select("lang", "doc_id", "source")
      .orderBy("lang", "doc_id")
  }

  // Corpus bigram-model fluency score: top-100 bigram model, per-doc
  // coverage ratio. The oracle rebuilds the same model (count desc, bigram
  // tie-break) and replays the coverage join; the score re-quantizes with
  // the engine-portable floor(x·1e4 + 0.5) (NOT round — 1/32 = 0.03125 is
  // binary-exact and round() tie-breaks differ).
  private val x54 = Q("x54_bigram_lm_score", Some(
    s"""WITH w AS (SELECT doc_id, $WORDS AS ws FROM documents),
       |bgs AS (
       |  SELECT doc_id, u.bg FROM (
       |    SELECT doc_id, list_transform(range(1, len(ws)),
       |      i -> ws[i] || ' ' || ws[i+1]) AS bgl
       |    FROM w WHERE len(ws) >= 2), unnest(bgl) AS u(bg)),
       |model AS (
       |  SELECT bg FROM (SELECT bg, count(*) AS c FROM bgs GROUP BY bg
       |                  ORDER BY c DESC, bg LIMIT 100)),
       |per AS (
       |  SELECT b.doc_id, count(*) AS n_bigrams,
       |    CAST(sum(CASE WHEN m.bg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
       |  FROM bgs b LEFT JOIN model m ON b.bg = m.bg
       |  GROUP BY b.doc_id)
       |SELECT doc_id, n_bigrams, n_covered,
       |  floor(CAST(n_covered AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
       |    * 10000 + 0.5) / 10000 AS lm_score
       |FROM per ORDER BY doc_id""".stripMargin)) { (s, dir) =>
    TextAnalysis.bigramModelScore(t(s, dir, "documents"), "doc_id", "text",
        modelSize = 100)
      .orderBy("doc_id")
  }

  // One-pass histogram quantiles (the mergeable approximate-percentile
  // sketch): 200 equi-width bins over l_extendedprice, estimates = right
  // edge of the first bin reaching q·n. The oracle replays binning, the
  // cumulative walk, and the same edge arithmetic.
  private val x57 = Q("x57_hist_quantiles", Some(
    """WITH mm AS (
      |  SELECT CAST(min(l_extendedprice) AS DOUBLE) AS lo,
      |    CAST(max(l_extendedprice) AS DOUBLE) AS hi,
      |    count(l_extendedprice) AS n
      |  FROM lineitem),
      |b AS (
      |  SELECT CAST(least(floor((CAST(l_extendedprice AS DOUBLE) - mm.lo)
      |      / (mm.hi - mm.lo) * 200), 199) AS BIGINT) AS bin,
      |    count(*) AS c
      |  FROM lineitem, mm GROUP BY 1),
      |cum AS (SELECT bin, sum(c) OVER (ORDER BY bin) AS cumc FROM b),
      |qs AS (SELECT * FROM (VALUES ('p50', CAST(0.5 AS DOUBLE)),
      |  ('p90', CAST(0.9 AS DOUBLE)), ('p99', CAST(0.99 AS DOUBLE)))
      |  AS t(q_label, q)),
      |sel AS (
      |  SELECT qs.q_label, min(cum.bin) AS bin
      |  FROM qs, cum, mm WHERE cum.cumc >= qs.q * CAST(mm.n AS DOUBLE)
      |  GROUP BY qs.q_label)
      |SELECT s.q_label, s.bin,
      |  mm.lo + CAST(s.bin + 1 AS DOUBLE) * (mm.hi - mm.lo) / 200 AS est_value
      |FROM sel s, mm ORDER BY s.q_label""".stripMargin)) { (s, dir) =>
    Sketches.histogramQuantiles(t(s, dir, "lineitem"), "l_extendedprice",
        bins = 200,
        qs = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
      .orderBy("q_label")
  }

  // Weight-proportional sampling with exact integer tickets: min over
  // `weight` md5 tickets per doc, global top-k by that priority. No
  // pow()/ln() keys whose last-ulp drift could flip a selection — every
  // comparison is an integer compare, replayed ticket-for-ticket.
  private val x62 = Q("x62_weighted_sample", Some(
    """WITH w AS (
      |  SELECT doc_id,
      |    least(greatest(CAST(1 + n_chars // 200 AS INT), 1), 64) AS wt
      |  FROM documents),
      |tix AS (
      |  SELECT w.doc_id, w.wt,
      |    ('0x' || substring(md5('0:ws:' || CAST(w.doc_id AS VARCHAR) || ':'
      |      || CAST(t.i AS VARCHAR)), 1, 8))::BIGINT AS ticket
      |  FROM w, unnest(range(1, w.wt + 1)) AS t(i)),
      |pri AS (SELECT doc_id, min(ticket) AS priority, min(wt) AS eff_weight
      |        FROM tix GROUP BY doc_id)
      |SELECT doc_id, priority, CAST(eff_weight AS INT) AS eff_weight
      |FROM pri ORDER BY priority, doc_id LIMIT 40""".stripMargin)) { (s, dir) =>
    Curation.weightedSample(
        t(s, dir, "documents")
          .withColumn("wt", (lit(1) + expr("n_chars div 200")).cast("int")),
        "doc_id", "wt", k = 40)
      .select("doc_id", "priority", "eff_weight")
  }

  // Inverted index: token → sorted posting list with a 50-id cap (the
  // long-posting skew guard) + doc frequency. The oracle rebuilds the same
  // per-doc-distinct explode, the same sorted slice, and the same
  // truncation flag.
  private val x63 = Q("x63_inverted_index", Some(
    s"""WITH w AS (SELECT doc_id, $WORDS AS ws FROM documents),
       |tok AS (SELECT doc_id, u.tok FROM w, unnest(list_distinct(ws)) AS u(tok)),
       |idx AS (
       |  SELECT tok AS token, count(*) AS doc_freq,
       |    array_to_string(list_slice(list_sort(array_agg(doc_id)), 1, 50), ',') AS postings,
       |    count(*) > 50 AS truncated
       |  FROM tok GROUP BY tok)
       |SELECT token, doc_freq, postings, truncated
       |FROM idx WHERE doc_freq >= 5 ORDER BY token""".stripMargin)) { (s, dir) =>
    TextAnalysis.invertedIndex(t(s, dir, "documents"), "doc_id", "text",
        maxPostings = 50)
      .filter(col("doc_freq") >= 5)
      .orderBy("token")
  }

  // Token co-occurrence lift (exact-integer PMI) over the top-100 vocab:
  // which word pairs co-occur above chance. Pairing happens AFTER the
  // broadcast vocab filter, so the pair space is vocab², not corpus².
  private val x65 = Q("x65_pmi_pairs", Some(
    s"""WITH w AS (SELECT doc_id, $WORDS AS ws FROM documents),
       |tok AS (SELECT doc_id, u.tok FROM w, unnest(list_distinct(ws)) AS u(tok)),
       |vocab AS (SELECT tok, count(*) AS n_tok FROM tok GROUP BY tok
       |          ORDER BY n_tok DESC, tok LIMIT 100),
       |vt AS (SELECT t.doc_id, t.tok, v.n_tok
       |       FROM tok t JOIN vocab v ON t.tok = v.tok),
       |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
       |pairs AS (
       |  SELECT a.tok AS tok_a, b.tok AS tok_b, a.n_tok AS n_a,
       |    b.n_tok AS n_b, count(*) AS n_ab
       |  FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.tok < b.tok
       |  GROUP BY 1, 2, 3, 4)
       |SELECT tok_a, tok_b, n_ab,
       |  CAST(n_ab * nd.n_docs * 1000000 // (n_a * n_b) AS BIGINT) AS lift_ppm
       |FROM pairs, nd WHERE n_ab >= 5
       |ORDER BY lift_ppm DESC, tok_a, tok_b LIMIT 30""".stripMargin)) { (s, dir) =>
    TextAnalysis.pmiPairs(t(s, dir, "documents"), "doc_id", "text",
        vocabSize = 100, minPairCount = 5)
      .orderBy(desc("lift_ppm"), col("tok_a"), col("tok_b"))
      .limit(30)
  }

  // One-pass dataset card: the release-statistics row of a training corpus
  // (docs, languages, token/char totals, exact-dup basis points) from ONE
  // fused aggregate.
  private val x66 = Q("x66_dataset_card", Some(
    s"""WITH s AS (
       |  SELECT doc_id, lang, md5(text) AS h, length(text) AS chars,
       |    len($WORDS) AS toks
       |  FROM documents)
       |SELECT count(*) AS n_docs,
       |  count(DISTINCT h) AS n_distinct_texts,
       |  count(DISTINCT lang) AS n_langs,
       |  CAST(sum(toks) AS BIGINT) AS total_tokens,
       |  CAST(min(toks) AS BIGINT) AS min_tokens,
       |  CAST(max(toks) AS BIGINT) AS max_tokens,
       |  CAST(sum(chars) AS BIGINT) AS total_chars,
       |  CAST(floor(CAST(count(*) - count(DISTINCT h) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS dup_bps
       |FROM s""".stripMargin)) { (s, dir) =>
    graft.operators.Profiler.datasetCard(t(s, dir, "documents"),
      "doc_id", "text", "lang")
  }

  // Content-defined chunking: rolling-hash boundaries (8-char window,
  // 1-in-32 mask). The oracle replays every window hash, the boundary
  // set, the lag-gap chunk sizes, and the no-boundary fallback.
  private val x72 = Q("x72_cdc_chunks", Some(
    """WITH d AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len
      |           FROM documents),
      |b AS (
      |  SELECT d.doc_id, d.len, u.i
      |  FROM d, unnest(range(8, d.len + 1)) AS u(i)
      |  WHERE ('0x' || substring(md5('1:' || substring(d.text, u.i - 7, 8)), 1, 8))::BIGINT % 32 = 0),
      |g AS (
      |  SELECT doc_id, len, i,
      |    i - coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0) AS gap
      |  FROM b),
      |agg AS (
      |  SELECT doc_id, count(*) AS nb, CAST(sum(i) AS BIGINT) AS boundary_sum,
      |    max(gap) AS max_gap, max(i) AS last_b, max(len) AS blen
      |  FROM g GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(CASE WHEN a.doc_id IS NULL THEN 1
      |       ELSE a.nb + CASE WHEN a.blen > a.last_b THEN 1 ELSE 0 END
      |       END AS BIGINT) AS n_chunks,
      |  CAST(CASE WHEN a.doc_id IS NULL THEN d.len
      |       ELSE greatest(a.max_gap, a.blen - a.last_b) END AS BIGINT) AS max_chunk,
      |  coalesce(a.boundary_sum, 0) AS boundary_sum
      |FROM d LEFT JOIN agg a ON d.doc_id = a.doc_id
      |ORDER BY d.doc_id""".stripMargin)) { (s, dir) =>
    Curation.cdcChunks(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")
  }

  // Gopher-style repetition gate: duplicate word-4-gram fraction per doc
  // (templated/spammy text scores high). The oracle rebuilds the same
  // positional gram list and the same integer-bps fraction.
  private val x73 = Q("x73_repetition_score", Some(
    s"""WITH w AS (SELECT doc_id, $WORDS AS ws FROM documents),
       |g AS (SELECT doc_id, list_transform(range(1, len(ws) - 2),
       |        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) AS gl
       |      FROM w)
       |SELECT doc_id,
       |  CAST(len(gl) AS BIGINT) AS n_grams,
       |  CAST(len(list_distinct(gl)) AS BIGINT) AS n_distinct,
       |  CASE WHEN len(gl) = 0 THEN 0
       |       ELSE CAST(floor(CAST(len(gl) - len(list_distinct(gl)) AS DOUBLE)
       |              / CAST(len(gl) AS DOUBLE) * 10000 + 0.5) AS BIGINT)
       |  END AS repeat_bps,
       |  CASE WHEN len(gl) = 0 THEN 0
       |       ELSE CAST(floor(CAST(len(gl) - len(list_distinct(gl)) AS DOUBLE)
       |              / CAST(len(gl) AS DOUBLE) * 10000 + 0.5) AS BIGINT)
       |  END <= 2000 AS passes_gate
       |FROM g ORDER BY doc_id""".stripMargin)) { (s, dir) =>
    TextAnalysis.repetitionProfile(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")
  }

  // Per-language quality dashboard: gate pass-counts and pass rate per
  // corpus slice, all integer counts/bps. The oracle replays every gate
  // and the same per-stratum sums.
  private val x74 = Q("x74_quality_report", Some(
    s"""WITH w AS (SELECT lang, $WORDS AS ws FROM documents),
       |m AS (SELECT lang, len(ws) AS n,
       |  CASE WHEN len(ws) = 0 THEN 0.0
       |       ELSE len(array_to_string(ws, ''))::DOUBLE / len(ws) END AS mwl,
       |  len(list_filter(ws, x -> x IN ('the','a','of','and','to','in','is','that'))) AS stops,
       |  CASE WHEN len(ws) = 0 THEN 1.0
       |       ELSE len(list_filter(ws, x -> regexp_matches(x, '^[0-9]+$$')))::DOUBLE / len(ws) END AS numr
       | FROM w),
       |r AS (SELECT lang,
       |  n BETWEEN 20 AND 80 AS rw,
       |  mwl BETWEEN 2.0 AND 8.0 AS rm,
       |  stops >= 2 AS rs,
       |  numr <= 0.3 AS rn
       | FROM m)
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN rw THEN 1 ELSE 0 END) AS BIGINT) AS n_word_count,
       |  CAST(sum(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT) AS n_mean_word_len,
       |  CAST(sum(CASE WHEN rs THEN 1 ELSE 0 END) AS BIGINT) AS n_stopwords,
       |  CAST(sum(CASE WHEN rn THEN 1 ELSE 0 END) AS BIGINT) AS n_numeric_ratio,
       |  CAST(sum(CASE WHEN rw AND rm AND rs AND rn THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       |  CAST(sum(CASE WHEN rw AND rm AND rs AND rn THEN 1 ELSE 0 END) * 10000
       |    // count(*) AS BIGINT) AS pass_bps
       |FROM r GROUP BY lang ORDER BY lang""".stripMargin)) { (s, dir) =>
    TextAnalysis.qualityReport(t(s, dir, "documents"), "text", "lang")
      .orderBy("lang")
  }

  // cycle 100..500 so neighboring sources get different epoch counts
  private val MixtureWeights: Map[String, Long] =
    (0 until 20).map(i => s"src$i" -> ((i % 5) + 1) * 100L).toMap
  private val MixtureBudget = 1000000L

  // Training-mixture token allocator: integer-exact "data recipe" — per
  // source, full epochs of the corpus plus a basis-point tail fraction to
  // hit budget·w/Σw tokens. Weights are deliberately non-uniform (cycle
  // 100..500 bps over the 20 sources) so epochs and tails differ by row;
  // every div/mod replays exactly in DuckDB (no fp mixture drift).
  private val x111 = Q("x111_mixture_plan", Some {
    val values = MixtureWeights.toSeq.sortBy(_._1)
      .map { case (s, w) => s"('$s', ${w})" }.mkString(", ")
    val sumW = MixtureWeights.values.sum
    s"""WITH w(source, wt) AS (VALUES $values),
       |a AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(len($WORDS)) AS BIGINT) AS available_tokens
       |  FROM documents GROUP BY source)
       |SELECT a.source, a.n_docs, a.available_tokens,
       |  CAST($MixtureBudget * wt // $sumW AS BIGINT) AS target_tokens,
       |  CAST(($MixtureBudget * wt // $sumW) // available_tokens AS BIGINT)
       |    AS n_full_epochs,
       |  CAST((($MixtureBudget * wt // $sumW) % available_tokens) * 10000
       |    // available_tokens AS BIGINT) AS tail_sample_bps,
       |  ($MixtureBudget * wt // $sumW) > available_tokens AS oversampled
       |FROM a JOIN w USING (source)
       |ORDER BY source""".stripMargin
  }) { (s, dir) =>
    Curation.mixturePlan(t(s, dir, "documents"), "source", "text",
        MixtureWeights, MixtureBudget)
      .orderBy("source")
  }

  // Perplexity under the corpus unigram LM — the CCNet-style quality
  // filter: repetitive junk scores low, off-distribution noise high. The
  // oracle rebuilds the same model and replays every −ln p(w) term with
  // the identical DECIMAL(28,18) per-term quantization, so the per-doc
  // sums are order-free and cross-engine comparable at round-4.
  private val x113 = Q("x113_unigram_perplexity", Some(
    s"""WITH w AS (
       |  SELECT doc_id, u.w FROM (
       |    SELECT doc_id, $WORDS AS ws FROM documents), unnest(ws) AS u(w)),
       |f AS (SELECT w, count(*) AS c FROM w GROUP BY w),
       |t AS (SELECT count(*) AS tot FROM w),
       |terms AS (
       |  SELECT doc_id,
       |    CAST(-ln(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))
       |      AS DECIMAL(28,18)) AS term
       |  FROM w JOIN f USING (w), t)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |  round(CAST(sum(term) AS DOUBLE), 4) AS nll,
       |  round(exp(CAST(sum(term) AS DOUBLE) / count(*)), 4) AS perplexity
       |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin)) { (s, dir) =>
    TextAnalysis.unigramPerplexity(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")
  }

  // DSIR importance selection: treat src0-src3 as the "high-quality
  // target domain" and pick the 100 raw docs (target docs score too —
  // they ARE in-domain) whose hashed-unigram features look most like it.
  // The oracle replays hashing, both smoothed bucket models, the
  // per-bucket DECIMAL(24,14) log-ratio quantization, the order-free
  // decimal doc sums, and the id-tiebroken top-k boundary.
  private val x116 = Q("x116_dsir_selection", Some(
    s"""WITH toks AS (
       |  SELECT doc_id, t,
       |    ('0x' || substring(md5(u.w), 1, 8))::BIGINT % 64 AS bucket
       |  FROM (SELECT doc_id, source IN ('src0','src1','src2','src3') AS t,
       |          $WORDS AS ws FROM documents), unnest(ws) AS u(w)),
       |counts AS (
       |  SELECT doc_id, t, bucket, count(*) AS n FROM toks GROUP BY 1, 2, 3),
       |model AS (
       |  SELECT bucket,
       |    sum(CASE WHEN t THEN n ELSE 0 END) AS tn,
       |    sum(CASE WHEN NOT t THEN n ELSE 0 END) AS rn
       |  FROM counts GROUP BY bucket),
       |tot AS (SELECT sum(tn) AS tt, sum(rn) AS rt FROM model),
       |ratio AS (
       |  SELECT bucket,
       |    CAST(ln((tn + 1)::DOUBLE / (tt + 64)::DOUBLE) AS DECIMAL(24,14))
       |    - CAST(ln((rn + 1)::DOUBLE / (rt + 64)::DOUBLE) AS DECIMAL(24,14))
       |      AS lr
       |  FROM model, tot),
       |scored AS (
       |  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
       |    sum(CAST(n AS DECIMAL(10,0)) * lr) AS s
       |  FROM counts JOIN ratio USING (bucket) GROUP BY doc_id),
       |top AS (SELECT * FROM scored ORDER BY s DESC, doc_id LIMIT 100)
       |SELECT doc_id, n_tokens, round(CAST(s AS DOUBLE), 4) AS log_ratio
       |FROM top ORDER BY doc_id""".stripMargin)) { (s, dir) =>
    Curation.dsirSelect(t(s, dir, "documents"), "doc_id", "text",
        col("source").isin("src0", "src1", "src2", "src3"))
      .orderBy("doc_id")
  }

  // Distinct-n diversity per source (Li et al. 2016): distinct n-gram
  // fraction for n=1..3 — repetitive/templated sources sink toward 0.
  private val x118 = Q("x118_distinct_ngrams", Some(
    s"""WITH w AS (SELECT source, $WORDS AS ws FROM documents),
       |grams AS (
       |  SELECT source, n.n,
       |    unnest(list_transform(range(1, len(ws) - n.n + 2),
       |      i -> array_to_string(ws[i : i + n.n - 1], ' '))) AS g
       |  FROM w, (VALUES (1), (2), (3)) n(n)
       |  WHERE len(ws) >= n.n)
       |SELECT source, n, CAST(count(*) AS BIGINT) AS n_total,
       |  CAST(count(DISTINCT g) AS BIGINT) AS n_distinct,
       |  round(count(DISTINCT g)::DOUBLE / count(*), 4) AS distinct_ratio
       |FROM grams GROUP BY source, n
       |ORDER BY source, n""".stripMargin)) { (s, dir) =>
    TextAnalysis.distinctNgrams(t(s, dir, "documents"), "source", "text")
      .orderBy("source", "n")
  }

  // Domain shift per source: KL(source ‖ corpus) over word unigrams.
  // The oracle replays counts, totals, and the DECIMAL(28,18)-quantized
  // KL terms; sums are order-free in both engines.
  private val x119 = Q("x119_source_kl", Some(
    s"""WITH w AS (
       |  SELECT source, u.w FROM (
       |    SELECT source, $WORDS AS ws FROM documents), unnest(ws) AS u(w)),
       |gw AS (SELECT source, w, count(*) AS c FROM w GROUP BY source, w),
       |corpus AS (SELECT w, sum(c) AS cc FROM gw GROUP BY w),
       |gtot AS (SELECT source, sum(c) AS gt FROM gw GROUP BY source),
       |ctot AS (SELECT sum(cc) AS ct FROM corpus),
       |terms AS (
       |  SELECT source, c,
       |    CAST((c::DOUBLE / gt::DOUBLE) *
       |      ln((c::DOUBLE * ct::DOUBLE) / (gt::DOUBLE * cc::DOUBLE))
       |      AS DECIMAL(28,18)) AS term
       |  FROM gw JOIN corpus USING (w) JOIN gtot USING (source), ctot)
       |SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
       |  CAST(count(*) AS BIGINT) AS vocab,
       |  round(CAST(sum(term) AS DOUBLE), 4) AS kl_nats
       |FROM terms GROUP BY source ORDER BY source""".stripMargin)) { (s, dir) =>
    TextAnalysis.sourceKlDivergence(t(s, dir, "documents"), "source", "text")
      .orderBy("source")
  }

  // Zipf slope per source: ln(freq) ~ ln(rank) OLS over the top-100
  // words. The oracle replays ranking (word tiebreak), the ln points,
  // and olsTrend's DECIMAL(28,6) moment quantization.
  private val x120 = Q("x120_zipf_slope", Some(
    s"""WITH w AS (
       |  SELECT source, u.w FROM (
       |    SELECT source, $WORDS AS ws FROM documents), unnest(ws) AS u(w)),
       |gw AS (SELECT source, w, count(*) AS c FROM w GROUP BY source, w),
       |rk AS (
       |  SELECT source, c, row_number() OVER (
       |    PARTITION BY source ORDER BY c DESC, w) AS r
       |  FROM gw),
       |pts AS (
       |  SELECT source, ln(r::DOUBLE) AS x, ln(c::DOUBLE) AS y
       |  FROM rk WHERE r <= 100),
       |m AS (
       |  SELECT source, CAST(count(*) AS DOUBLE) AS n,
       |    CAST(sum(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
       |    CAST(sum(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
       |    CAST(sum(CAST(x * y AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
       |    CAST(sum(CAST(x * x AS DECIMAL(28,6))) AS DOUBLE) AS sxx
       |  FROM pts GROUP BY source)
       |SELECT source, CAST(n AS BIGINT) AS n_rows,
       |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
       |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4)
       |    AS intercept
       |FROM m ORDER BY source""".stripMargin)) { (s, dir) =>
    TextAnalysis.zipfSlope(t(s, dir, "documents"), "source", "text")
      .orderBy("source")
  }

  // Embedding column health: per-dimension count/mean/variance/min/max —
  // the drift monitor in front of the ANN indexes. DECIMAL(28,6) moment
  // quantization; min/max of float values are exact.
  private val x121 = Q("x121_embedding_dim_stats", Some(
    """WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |d AS (SELECT r.i AS dim, v[r.i] AS x FROM e CROSS JOIN range(1, 65) r(i)),
      |m AS (
      |  SELECT dim, count(*) AS n,
      |    CAST(sum(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(x * x AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
      |    round(min(x), 4) AS min_v, round(max(x), 4) AS max_v
      |  FROM d GROUP BY dim)
      |SELECT CAST(dim AS BIGINT) AS dim, CAST(n AS BIGINT) AS n_vals,
      |  round(sx / n, 4) AS mean,
      |  round((sxx - sx * sx / n) / n, 4) AS variance, min_v, max_v
      |FROM m ORDER BY dim""".stripMargin)) { (s, dir) =>
    graft.operators.Similarity.embeddingDimStats(
        t(s, dir, "embeddings"), "embedding")
      .orderBy("dim")
  }

  // Embedding-space effective dimensionality (participation ratio
  // trace(C)²/‖C‖_F²) — the embedding-collapse monitor companion to x121's
  // per-dim stats: covariance trace + Frobenius norm from decimal-exact
  // moment sums, no eigendecomposition. The oracle replays the full
  // pipeline — per-term DECIMAL(28,12) moments, the fixed-order covariance
  // assembly, DECIMAL(28,18) re-quantization of every cv² term — so all
  // three reported metrics are bit-gated, not approximated.
  private val x137 = Q("x137_effective_rank", Some(
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |x AS (SELECT vec_id, r.i AS i, v[r.i] AS xi
      |      FROM e CROSS JOIN range(1, 65) r(i)),
      |p AS (SELECT a.i AS i, b.i AS j,
      |        sum(CAST(a.xi * b.xi AS DECIMAL(28,12))) AS s
      |      FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
      |      GROUP BY a.i, b.i),
      |m AS (SELECT i, sum(CAST(xi AS DECIMAL(28,12))) AS sx FROM x GROUP BY i),
      |n0 AS (SELECT count(*) AS nl, CAST(count(*) AS DOUBLE) AS n FROM e),
      |c AS (SELECT p.i, p.j, n0.nl AS nl,
      |        (CAST(p.s AS DOUBLE)
      |          - CAST(mi.sx AS DOUBLE) * CAST(mj.sx AS DOUBLE) / n0.n)
      |          / n0.n AS cv
      |      FROM p JOIN m mi ON mi.i = p.i JOIN m mj ON mj.i = p.j, n0)
      |SELECT CAST(max(nl) AS BIGINT) AS n_vectors,
      |  round(CAST(sum(CAST(CASE WHEN i = j THEN cv ELSE 0.0 END
      |    AS DECIMAL(28,18))) AS DOUBLE), 6) AS trace,
      |  round(CAST(sum(CAST(cv * cv * (CASE WHEN i = j THEN 1.0 ELSE 2.0 END)
      |    AS DECIMAL(28,18))) AS DOUBLE), 9) AS fro_sq,
      |  round(CAST(sum(CAST(CASE WHEN i = j THEN cv ELSE 0.0 END
      |      AS DECIMAL(28,18))) AS DOUBLE)
      |    * CAST(sum(CAST(CASE WHEN i = j THEN cv ELSE 0.0 END
      |      AS DECIMAL(28,18))) AS DOUBLE)
      |    / CAST(sum(CAST(cv * cv * (CASE WHEN i = j THEN 1.0 ELSE 2.0 END)
      |      AS DECIMAL(28,18))) AS DOUBLE), 6) AS participation_ratio
      |FROM c""".stripMargin)) { (s, dir) =>
    graft.operators.Similarity.effectiveRank(
      t(s, dir, "embeddings"), "vec_id", "embedding")
  }

  /** Oracle twin of Curation.logisticTrain's iteration chain: hashed
    * unigram PRESENCE features (+bias bucket `dim`), then `iters`
    * unrolled class-balanced full-batch GD steps — ends at
    * `w_<iters>(bucket, weight)`. Every
    * order-sensitive sum (per-doc z, per-bucket gradient) is quantized to
    * DECIMAL(28,18) exactly like the Spark side; σ/residual/update are
    * the same fixed double op sequence. */
  private def logisticCte(dim: Int, iters: Int, lr: Double,
      where: String = "", bigrams: Boolean = false,
      labelSql: String = "list_contains(ws, 'dup')",
      prefix: String = ""): String = {
    val P = prefix
    // with bigrams, hashed word-pair features join the unigram bucket
    // space (the fastText shape); the label stays unigram-derived
    val featList =
      if (!bigrams) "ws"
      else "ws || CASE WHEN len(ws) >= 2 THEN list_transform(" +
        "range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1]) " +
        "ELSE []::VARCHAR[] END"
    val steps = (1 to iters).map { t =>
      val p = t - 1
      s"""${P}z_$t AS MATERIALIZED (
         |  SELECT f.id, max(f.y) AS y,
         |    sum(CAST(CAST(f.x AS DOUBLE) * ${P}w_$p.weight AS DECIMAL(28,18)))
         |      AS z
         |  FROM ${P}f f JOIN ${P}w_$p USING (bucket) GROUP BY f.id),
         |${P}r_$t AS MATERIALIZED (
         |  SELECT id, (1.0::DOUBLE / (1.0::DOUBLE + exp(-CAST(z AS DOUBLE)))
         |    - CAST(y AS DOUBLE))
         |    * (CASE WHEN y = 1 THEN cw.wpos ELSE cw.wneg END) AS resid
         |  FROM ${P}z_$t, ${P}cw cw),
         |${P}g_$t AS MATERIALIZED (
         |  SELECT f.bucket,
         |    CAST(sum(CAST(r.resid * CAST(f.x AS DOUBLE) AS DECIMAL(28,18)))
         |      AS DOUBLE) AS gs
         |  FROM ${P}f f JOIN ${P}r_$t r USING (id) GROUP BY f.bucket),
         |${P}w_$t AS MATERIALIZED (
         |  SELECT w.bucket, w.weight - $lr::DOUBLE * (g.gs / n.n) AS weight
         |  FROM ${P}w_$p w JOIN ${P}g_$t g USING (bucket), ${P}n n)""".stripMargin
    }.mkString(",\n")
    s"""${P}f0 AS MATERIALIZED (
       |  SELECT doc_id AS id,
       |    CASE WHEN $labelSql THEN 1 ELSE 0 END AS y,
       |    ('0x' || substring(md5(u.w), 1, 8))::BIGINT % $dim AS bucket
       |  FROM (SELECT doc_id, text, $WORDS AS ws FROM documents$where),
       |    unnest($featList) AS u(w)),
       |${P}fc AS MATERIALIZED (SELECT DISTINCT id, y, bucket, 1::BIGINT AS x FROM ${P}f0),
       |${P}f AS MATERIALIZED (SELECT * FROM ${P}fc
       |      UNION ALL
       |      SELECT DISTINCT id, y, $dim::BIGINT AS bucket, 1::BIGINT AS x
       |      FROM ${P}fc),
       |${P}n AS MATERIALIZED (SELECT CAST(count(DISTINCT id) AS DOUBLE) AS n FROM ${P}f),
       |${P}cw AS MATERIALIZED (
       |  SELECT n.n / (2.0::DOUBLE * greatest(CAST(sum(CASE WHEN y = 1
       |      THEN 1 ELSE 0 END) AS DOUBLE), 1.0::DOUBLE)) AS wpos,
       |    n.n / (2.0::DOUBLE * greatest(CAST(sum(CASE WHEN y = 0
       |      THEN 1 ELSE 0 END) AS DOUBLE), 1.0::DOUBLE)) AS wneg
       |  FROM (SELECT DISTINCT id, y FROM ${P}f), ${P}n n GROUP BY n.n),
       |${P}w_0 AS MATERIALIZED (SELECT DISTINCT bucket, 0.0::DOUBLE AS weight FROM ${P}f),
       |$steps""".stripMargin
  }

  // Model-based quality filtering, training side: logistic regression
  // over hashed unigram presence features (+bias), 8 unrolled
  // class-balanced full-batch GD steps, label = the planted 'dup'
  // duplication marker (the one learnable signal in the synthetic vocab;
  // hash collisions at dim=32 provide the realistic noise; the 5%
  // positive rate is why the gradients are class-balanced — unweighted
  // GD measurably stalls at all-negative). The oracle replays features,
  // the class weights, every iteration's decimal-quantized z/gradient
  // sums, and the weight updates. x177 confirms the model separates the
  // corpus perfectly at this config.
  private val x176 = Q("x176_classifier_train", Some(
    s"""WITH ${logisticCte(dim = 32, iters = 8, lr = 0.5)}
       |SELECT bucket, round(weight, 6) AS weight
       |FROM w_8 ORDER BY bucket""".stripMargin)) { (s, dir) =>
    Curation.logisticTrain(t(s, dir, "documents"), "doc_id", "text",
        array_contains(graft.operators.Dedup.words(col("text")), "dup"),
        dim = 32, iters = 8, lr = 0.5)
      .orderBy("bucket")
  }

  // Scoring side: apply the trained weights to the corpus; the decision
  // is integer-exact (σ(z) ≥ 0.5 ⇔ z ≥ 0 on the exact DECIMAL z), so the
  // confusion matrix and basis-point accuracy are drift-free integers.
  private val x177 = Q("x177_classifier_score", Some(
    s"""WITH ${logisticCte(dim = 32, iters = 8, lr = 0.5)},
       |zf AS (
       |  SELECT f.id, max(f.y) AS y,
       |    sum(CAST(CAST(f.x AS DOUBLE) * w_8.weight AS DECIMAL(28,18)))
       |      AS z
       |  FROM f JOIN w_8 USING (bucket) GROUP BY f.id),
       |pr AS (SELECT id, y, CASE WHEN z >= 0 THEN 1 ELSE 0 END AS pred
       |       FROM zf)
       |SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS tp,
       |  CAST(sum(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS fp,
       |  CAST(sum(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS tn,
       |  CAST(sum(CASE WHEN y = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS fn,
       |  CAST((sum(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END)
       |      + sum(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END)) * 10000
       |    // count(*) AS BIGINT) AS accuracy_bps
       |FROM pr""".stripMargin)) { (s, dir) =>
    Curation.logisticScore(t(s, dir, "documents"), "doc_id", "text",
        array_contains(graft.operators.Dedup.words(col("text")), "dup"),
        dim = 32, iters = 8, lr = 0.5)
  }

  // Scoring DECOUPLED from training — the production curation shape:
  // train once on a labeled 75% sample (doc_id % 4 != 0), then score the
  // FULL corpus with the trained-and-rounded weight frame in ONE pass
  // (broadcast weights, zero GD iterations — plan-asserted in
  // TrainingOpsSpec). The oracle replays the sample-side training chain,
  // the round-6 weight publication, and the full-corpus feature join +
  // integer-exact confusion matrix.
  private val x179 = Q("x179_classifier_apply", Some(
    s"""WITH ${logisticCte(dim = 32, iters = 8, lr = 0.5,
          where = " WHERE doc_id % 4 != 0")},
       |wr AS MATERIALIZED (SELECT bucket, round(weight, 6) AS weight
       |                    FROM w_8),
       |sf0 AS MATERIALIZED (
       |  SELECT doc_id AS id,
       |    CASE WHEN list_contains(ws, 'dup') THEN 1 ELSE 0 END AS y,
       |    ('0x' || substring(md5(u.w), 1, 8))::BIGINT % 32 AS bucket
       |  FROM (SELECT doc_id, $WORDS AS ws FROM documents),
       |    unnest(ws) AS u(w)),
       |sfc AS MATERIALIZED (
       |  SELECT DISTINCT id, y, bucket, 1::BIGINT AS x FROM sf0),
       |sf AS MATERIALIZED (SELECT * FROM sfc
       |      UNION ALL
       |      SELECT DISTINCT id, y, 32::BIGINT AS bucket, 1::BIGINT AS x
       |      FROM sfc),
       |zf AS (
       |  SELECT f.id, max(f.y) AS y,
       |    sum(CAST(CAST(f.x AS DOUBLE) * wr.weight AS DECIMAL(28,18)))
       |      AS z
       |  FROM sf f JOIN wr USING (bucket) GROUP BY f.id),
       |pr AS (SELECT id, y, CASE WHEN z >= 0 THEN 1 ELSE 0 END AS pred
       |       FROM zf)
       |SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS tp,
       |  CAST(sum(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS fp,
       |  CAST(sum(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS tn,
       |  CAST(sum(CASE WHEN y = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS fn,
       |  CAST((sum(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END)
       |      + sum(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END)) * 10000
       |    // count(*) AS BIGINT) AS accuracy_bps
       |FROM pr""".stripMargin)) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val label = array_contains(graft.operators.Dedup.words(col("text")), "dup")
    val w = Curation.logisticTrain(docs.filter(col("doc_id") % 4 =!= 0),
      "doc_id", "text", label, dim = 32, iters = 8, lr = 0.5)
    Curation.logisticScoreWith(docs, "doc_id", "text", label, w, dim = 32)
  }

  // Training-loss trajectory: per GD iteration the class-weighted
  // logistic loss (at the step's incoming weights) and the gradient L2
  // norm — the "why does accuracy plateau" diagnostics for x176's
  // classifier. The oracle reuses x176's unrolled training CTE verbatim
  // and reads each step's loss off z_t and the norm off g_t: the same
  // replay, graded on a different projection of the same chain. Loss
  // terms pass through ln/exp on both engines — per-row
  // DECIMAL-quantized before the sum (the BM25-idf discipline), rounded
  // at 6.
  private val x212 = Q("x212_training_loss_curve", Some {
    val steps = (1 to 8).map { t =>
      s"""SELECT $t::BIGINT AS iter,
         |  (SELECT round(CAST(sum(CAST(CASE WHEN z.y = 1
         |       THEN cw.wpos * ln(1.0::DOUBLE + exp(-CAST(z.z AS DOUBLE)))
         |       ELSE cw.wneg * ln(1.0::DOUBLE + exp(CAST(z.z AS DOUBLE)))
         |       END AS DECIMAL(28,18))) AS DOUBLE) / any_value(n.n), 6)
         |   FROM z_$t z, cw cw, n n) AS loss,
         |  (SELECT round(sqrt(CAST(sum(CAST((g.gs / n2.n) * (g.gs / n2.n)
         |       AS DECIMAL(28,18))) AS DOUBLE)), 6)
         |   FROM g_$t g, n n2) AS grad_norm""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${logisticCte(dim = 32, iters = 8, lr = 0.5)}
       |SELECT * FROM ($steps) ORDER BY iter""".stripMargin
  }) { (s, dir) =>
    Curation.logisticTrainCurve(t(s, dir, "documents"), "doc_id", "text",
      array_contains(graft.operators.Dedup.words(col("text")), "dup"),
      dim = 32, iters = 8, lr = 0.5)
  }

  // Threshold-free grade of the decoupled scorer on its CONTINUOUS
  // output: train on the labeled 75% (4 GD steps — AUC is rank-based,
  // meaningful well before convergence), publish rounded weights, then
  // rank the FULL corpus by the exact-DECIMAL logit z and grade it with
  // binaryAuc. z is distinct per document (a per-doc subset-sum of
  // weights), so the distinct-score frame is corpus-sized — this query
  // exists to drive the evaluators' range-partitioned prefix-sum path
  // in its worst regime (PlanRegressionSpec pins the no-single-task-sort
  // plan). Grading z, not σ(z): AUC is invariant under the monotone σ,
  // and exp() libm ULPs are not identical cross-engine while the
  // DECIMAL(28,18) z is. The oracle replays training, the round-6
  // weight publication, the full-corpus logit join, and the
  // tie-corrected rank sums over the distinct-z frame.
  private val x208 = Q("x208_continuous_auc", Some(
    s"""WITH ${logisticCte(dim = 32, iters = 4, lr = 0.5,
          where = " WHERE doc_id % 4 != 0")},
       |wr AS MATERIALIZED (SELECT bucket, round(weight, 6) AS weight
       |                    FROM w_4),
       |sf0 AS MATERIALIZED (
       |  SELECT doc_id AS id,
       |    CASE WHEN list_contains(ws, 'dup') THEN 1 ELSE 0 END AS y,
       |    ('0x' || substring(md5(u.w), 1, 8))::BIGINT % 32 AS bucket
       |  FROM (SELECT doc_id, $WORDS AS ws FROM documents),
       |    unnest(ws) AS u(w)),
       |sfc AS MATERIALIZED (
       |  SELECT DISTINCT id, y, bucket, 1::BIGINT AS x FROM sf0),
       |sf AS MATERIALIZED (SELECT * FROM sfc
       |      UNION ALL
       |      SELECT DISTINCT id, y, 32::BIGINT AS bucket, 1::BIGINT AS x
       |      FROM sfc),
       |zf AS (
       |  SELECT f.id, max(f.y) AS y,
       |    sum(CAST(CAST(f.x AS DOUBLE) * wr.weight AS DECIMAL(28,18)))
       |      AS z
       |  FROM sf f JOIN wr USING (bucket) GROUP BY f.id),
       |pv AS (SELECT z AS v, sum(y) AS cp, count(*) AS c FROM zf
       |       GROUP BY z),
       |cum AS (SELECT cp, c,
       |    coalesce(sum(c) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s,
       |    sum(cp) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
       |    sum(c - cp) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g,
       |    sum(cp) OVER () AS n1t,
       |    sum(c - cp) OVER () AS n0t
       |  FROM pv),
       |m AS (SELECT sum(cp * (2 * s + c + 1)) AS r2, sum(cp) AS n1,
       |        sum(c - cp) AS n0,
       |        max(abs(p * n0t - g * n1t)) AS ksnum
       |      FROM cum)
       |SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(n0 AS BIGINT) AS n_neg,
       |  CAST(r2 - n1 * (n1 + 1) AS BIGINT) AS u2,
       |  round(CAST(r2 - n1 * (n1 + 1) AS DOUBLE)
       |    / (2.0 * CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)), 6) AS auc,
       |  round(CAST(r2 - n1 * (n1 + 1) AS DOUBLE)
       |    / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)) - 1.0, 6) AS gini,
       |  round(CAST(ksnum AS DOUBLE)
       |    / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)), 6) AS ks
       |FROM m""".stripMargin)) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val label = array_contains(graft.operators.Dedup.words(col("text")), "dup")
    val w = Curation.logisticTrain(docs.filter(col("doc_id") % 4 =!= 0),
      "doc_id", "text", label, dim = 32, iters = 4, lr = 0.5)
    val z = Curation.logisticLogitsWith(docs, "doc_id", "text", label, w,
      dim = 32)
    graft.operators.Stats.binaryAuc(z, "z", col("y") === 1)
  }

  // fastText-shaped training with hashed word-BIGRAM features joining the
  // unigram bucket space — gated on a label only WORD ORDER can separate:
  // y = "the adjacent pair 'table hash' occurs" (~9% of docs; the
  // unigrams 'table' and 'hash' each appear in nearly every doc, so a
  // unigram model is blind to it — spec-contrasted in TrainingOpsSpec).
  // dim=4096 keeps the ~900-bigram vocabulary collision-sparse (at 1024,
  // colliding bigrams put the signal bucket in 26 negatives and at 8
  // iterations the bias was uncalibrated — measured all-negative; 16
  // steps at 4096 separate the corpus perfectly). The oracle replays the
  // bigram construction, the regex label, the shared bucket hashing, and
  // all 16 class-balanced GD steps.
  private val x185 = Q("x185_classifier_bigrams", Some(
    s"""WITH ${logisticCte(dim = 4096, iters = 16, lr = 0.5, bigrams = true,
          labelSql = "regexp_matches(lower(text), " +
            "'(^|[^a-z0-9])table[^a-z0-9]+hash([^a-z0-9]|$$)')")},
       |zf AS (
       |  SELECT f.id, max(f.y) AS y,
       |    sum(CAST(CAST(f.x AS DOUBLE) * w_16.weight AS DECIMAL(28,18)))
       |      AS z
       |  FROM f JOIN w_16 USING (bucket) GROUP BY f.id),
       |pr AS (SELECT id, y, CASE WHEN z >= 0 THEN 1 ELSE 0 END AS pred
       |       FROM zf)
       |SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS tp,
       |  CAST(sum(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS fp,
       |  CAST(sum(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS tn,
       |  CAST(sum(CASE WHEN y = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS fn,
       |  CAST((sum(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END)
       |      + sum(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END)) * 10000
       |    // count(*) AS BIGINT) AS accuracy_bps
       |FROM pr""".stripMargin)) { (s, dir) =>
    Curation.logisticScore(t(s, dir, "documents"), "doc_id", "text",
        lower(col("text"))
          .rlike("(^|[^a-z0-9])table[^a-z0-9]+hash([^a-z0-9]|$)"),
        dim = 4096, iters = 16, lr = 0.5, bigrams = true)
  }

  // k-fold cross-validated AUC of the quality classifier — the estimate a
  // curation team reports BEFORE spending the corpus-scale scoring run:
  // md5-fold the corpus (k=3, the registry's deterministic-seeding
  // convention, stable under repartitioning), train on the other two
  // folds (4 GD steps at dim=32 — AUC is rank-based, so it is meaningful
  // well before full convergence), publish ROUNDED weights (the x179
  // train-once contract), and grade each held-out fold threshold-free
  // with the tie-robust rank AUC on the exact-DECIMAL logit z (AUC is
  // invariant under the monotone σ, so exp() never enters the gate). The
  // oracle replays all three prefixed training chains, the held-out
  // feature joins, and x186's integer rank-sum machinery per fold.
  private val x201 = Q("x201_classifier_crossval", Some {
    val k = 3
    def foldSql(i: Int): String = {
      val P = s"cv${i}_"
      val foldOf = "('0x' || substring(md5(CAST(doc_id AS VARCHAR)), " +
        s"1, 8))::BIGINT % $k"
      s"""${logisticCte(dim = 32, iters = 4, lr = 0.5,
            where = s" WHERE $foldOf != $i", prefix = P)},
         |${P}wr AS MATERIALIZED (
         |  SELECT bucket, round(weight, 6) AS weight FROM ${P}w_4),
         |${P}h0 AS MATERIALIZED (
         |  SELECT doc_id AS id,
         |    CASE WHEN list_contains(ws, 'dup') THEN 1 ELSE 0 END AS y,
         |    ('0x' || substring(md5(u.w), 1, 8))::BIGINT % 32 AS bucket
         |  FROM (SELECT doc_id, $WORDS AS ws FROM documents
         |        WHERE $foldOf = $i),
         |    unnest(ws) AS u(w)),
         |${P}hc AS MATERIALIZED (
         |  SELECT DISTINCT id, y, bucket, 1::BIGINT AS x FROM ${P}h0),
         |${P}h AS MATERIALIZED (SELECT * FROM ${P}hc
         |      UNION ALL
         |      SELECT DISTINCT id, y, 32::BIGINT AS bucket, 1::BIGINT AS x
         |      FROM ${P}hc),
         |${P}z AS MATERIALIZED (
         |  SELECT f.id, max(f.y) AS y,
         |    sum(CAST(CAST(f.x AS DOUBLE) * w.weight AS DECIMAL(28,18))) AS v
         |  FROM ${P}h f JOIN ${P}wr w USING (bucket) GROUP BY f.id),
         |${P}pv AS (SELECT v, sum(y) AS cp, count(*) AS c
         |           FROM ${P}z GROUP BY v),
         |${P}cum AS (SELECT cp, c,
         |    coalesce(sum(c) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s,
         |    sum(cp) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
         |    sum(c - cp) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g,
         |    sum(cp) OVER () AS n1t, sum(c - cp) OVER () AS n0t
         |  FROM ${P}pv),
         |${P}m AS (SELECT sum(cp * (2 * s + c + 1)) AS r2, sum(cp) AS n1,
         |        sum(c - cp) AS n0, max(abs(p * n0t - g * n1t)) AS ksnum
         |      FROM ${P}cum)""".stripMargin
    }
    def foldRow(i: Int): String =
      s"""SELECT $i::BIGINT AS fold, CAST(n1 AS BIGINT) AS n_pos,
         |  CAST(n0 AS BIGINT) AS n_neg,
         |  CAST(r2 - n1 * (n1 + 1) AS BIGINT) AS u2,
         |  CASE WHEN n1 = 0 OR n0 = 0 THEN NULL ELSE
         |    round(CAST(r2 - n1 * (n1 + 1) AS DOUBLE)
         |      / (2.0 * CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)), 6) END
         |    AS auc,
         |  CASE WHEN n1 = 0 OR n0 = 0 THEN NULL ELSE
         |    round(CAST(r2 - n1 * (n1 + 1) AS DOUBLE)
         |      / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)) - 1.0, 6) END
         |    AS gini,
         |  CASE WHEN n1 = 0 OR n0 = 0 THEN NULL ELSE
         |    round(CAST(ksnum AS DOUBLE)
         |      / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)), 6) END AS ks
         |FROM cv${i}_m""".stripMargin
    s"""WITH ${(0 until k).map(foldSql).mkString(",\n")}
       |SELECT * FROM (
       |${(0 until k).map(foldRow).mkString("\nUNION ALL\n")}
       |) u ORDER BY fold""".stripMargin
  }) { (s, dir) =>
    Curation.logisticCrossVal(t(s, dir, "documents"), "doc_id", "text",
      array_contains(Dedup.words(col("text")), "dup"),
      k = 3, dim = 32, iters = 4, lr = 0.5)
  }

  // Learning curve: hold out a fixed md5 20% eval slice, train on NESTED
  // md5 fractions (25% ⊂ 50% ⊂ 100%) of the remaining pool (4 GD steps,
  // dim=32, published rounded weights), score the SAME eval slice each
  // time — integer-exact confusion per fraction. The oracle replays all
  // three prefixed training chains and the shared eval-side scoring.
  private val x204 = Q("x204_learning_curve", Some {
    val evalSql = "('0x' || substring(md5('lc-eval:' || " +
      "CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 5 = 0"
    val fracSql = "('0x' || substring(md5('lc-frac:' || " +
      "CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100"
    def chain(p: Int): String = {
      val P = s"lc${p}_"
      s"""${logisticCte(dim = 32, iters = 4, lr = 0.5,
            where = s" WHERE NOT ($evalSql) AND $fracSql < $p",
            prefix = P)},
         |${P}wr AS MATERIALIZED (
         |  SELECT bucket, round(weight, 6) AS weight FROM ${P}w_4),
         |${P}z AS MATERIALIZED (
         |  SELECT f.id, max(f.y) AS y,
         |    sum(CAST(CAST(f.x AS DOUBLE) * w.weight AS DECIMAL(28,18))) AS z
         |  FROM ev f JOIN ${P}wr w USING (bucket) GROUP BY f.id),
         |${P}pr AS (SELECT id, y, CASE WHEN z >= 0 THEN 1 ELSE 0 END AS pred
         |           FROM ${P}z)""".stripMargin
    }
    def row(p: Int): String =
      s"""SELECT $p::BIGINT AS train_pct, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS tp,
         |  CAST(sum(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS fp,
         |  CAST(sum(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS tn,
         |  CAST(sum(CASE WHEN y = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS fn,
         |  CAST((sum(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END)
         |      + sum(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END)) * 10000
         |    // count(*) AS BIGINT) AS accuracy_bps
         |FROM lc${p}_pr""".stripMargin
    val evCte =
      s"""ev0 AS MATERIALIZED (
         |  SELECT doc_id AS id,
         |    CASE WHEN list_contains(ws, 'dup') THEN 1 ELSE 0 END AS y,
         |    ('0x' || substring(md5(u.w), 1, 8))::BIGINT % 32 AS bucket
         |  FROM (SELECT doc_id, $WORDS AS ws FROM documents
         |        WHERE $evalSql),
         |    unnest(ws) AS u(w)),
         |evc AS MATERIALIZED (
         |  SELECT DISTINCT id, y, bucket, 1::BIGINT AS x FROM ev0),
         |ev AS MATERIALIZED (SELECT * FROM evc
         |      UNION ALL
         |      SELECT DISTINCT id, y, 32::BIGINT AS bucket, 1::BIGINT AS x
         |      FROM evc)""".stripMargin
    s"""WITH $evCte,
       |${Seq(25, 50, 100).map(chain).mkString(",\n")}
       |SELECT * FROM (
       |${Seq(25, 50, 100).map(row).mkString("\nUNION ALL\n")}
       |) u ORDER BY train_pct""".stripMargin
  }) { (s, dir) =>
    Curation.learningCurve(t(s, dir, "documents"), "doc_id", "text",
      array_contains(Dedup.words(col("text")), "dup"),
      fractionsPct = Seq(25, 50, 100), dim = 32, iters = 4, lr = 0.5)
  }

  // χ² token–label feature selection — the interpretable companion to the
  // hashed classifier: per-token 2×2 document-presence contingency vs the
  // 'dup' label, χ² from exact integer counts via ONE fixed IEEE op
  // sequence (pure arithmetic, no libm — bit-reproducible at any corpus
  // size), ranked by the UNROUNDED statistic. The top token must be the
  // label's own marker; the rest is the collision noise a dim=32 hash
  // space folds together. Oracle replays tokenize → presence-distinct →
  // contingency → the same double op sequence → top-50.
  private val x203 = Q("x203_chi2_token_select", Some(
    s"""WITH bse AS MATERIALIZED (
       |  SELECT doc_id AS id,
       |    CASE WHEN list_contains(ws, 'dup') THEN 1 ELSE 0 END AS y, ws
       |  FROM (SELECT doc_id, $WORDS AS ws FROM documents)),
       |tot AS (SELECT sum(y) AS p, sum(1 - y) AS ng FROM bse),
       |pres AS (SELECT DISTINCT id, y, u.w AS token
       |         FROM bse, unnest(ws) AS u(w)),
       |pt AS (SELECT token, sum(y) AS a, sum(1 - y) AS b
       |       FROM pres GROUP BY token),
       |sc AS (
       |  SELECT token, a, b,
       |    CAST(a AS DOUBLE) * CAST(tot.ng - b AS DOUBLE)
       |      - CAST(b AS DOUBLE) * CAST(tot.p - a AS DOUBLE) AS det,
       |    CAST(a + b AS DOUBLE) * CAST((tot.p - a) + (tot.ng - b) AS DOUBLE)
       |      * CAST(tot.p AS DOUBLE) * CAST(tot.ng AS DOUBLE) AS den,
       |    tot.p + tot.ng AS n
       |  FROM pt, tot WHERE a + b >= 5),
       |ch AS (SELECT token, a + b AS df_docs, a AS pos_docs,
       |    CASE WHEN den = 0.0 THEN 0.0
       |         ELSE CAST(n AS DOUBLE) * (det * det) / den END AS chi2u
       |  FROM sc)
       |SELECT token, CAST(df_docs AS BIGINT) AS df_docs,
       |  CAST(pos_docs AS BIGINT) AS pos_docs, round(chi2u, 6) AS chi2
       |FROM ch ORDER BY chi2u DESC, token LIMIT 50""".stripMargin)) {
    (s, dir) =>
    Curation.chi2TokenSelect(t(s, dir, "documents"), "doc_id", "text",
      array_contains(Dedup.words(col("text")), "dup"), topK = 50, minDf = 5)
  }

  /** Oracle twin of Similarity.pcaTopComponent over the embeddings table
    * (dimension derived from `len(embedding)` in the `dims` CTE, so a
    * fixture-width change errors loudly instead of silently NULL-padding):
    * `iters` unrolled power-iteration steps, each applying C·v
    * straight to the data ((C·v)_i = (Σx·u − μ_i·Σu)/n, u = x·v − μ·v).
    * Ends at `v_<iters>`, `v_<iters-1>` and `t_<iters>`. MATERIALIZED
    * throughout — each v_k is referenced by two downstream CTEs, and
    * DuckDB's default inlining doubles the plan per step. */
  private def pcaCte(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      val p = k - 1
      s"""muv_$k AS MATERIALIZED (
         |  SELECT CAST(sum(CAST(mu.mu * v.v AS DECIMAL(28,18))) AS DOUBLE)
         |    AS muv FROM mu JOIN v_$p v USING (i)),
         |s_$k AS MATERIALIZED (
         |  SELECT ex.id,
         |    CAST(sum(CAST(ex.x * v.v AS DECIMAL(28,18))) AS DOUBLE) - m.muv
         |      AS u
         |  FROM ex JOIN v_$p v USING (i), muv_$k m GROUP BY ex.id, m.muv),
         |b_$k AS MATERIALIZED (
         |  SELECT CAST(sum(CAST(u AS DECIMAL(28,18))) AS DOUBLE) AS b
         |  FROM s_$k),
         |t_$k AS MATERIALIZED (
         |  SELECT ex.i,
         |    (CAST(sum(CAST(ex.x * s.u AS DECIMAL(28,18))) AS DOUBLE)
         |      - mu.mu * b.b) / n.n AS t
         |  FROM ex JOIN s_$k s USING (id) JOIN mu ON ex.i = mu.i, b_$k b, n
         |  GROUP BY ex.i, mu.mu, b.b, n.n),
         |q_$k AS MATERIALIZED (
         |  SELECT CAST(sum(CAST(t * t AS DECIMAL(28,18))) AS DOUBLE) AS q
         |  FROM t_$k),
         |v_$k AS MATERIALIZED (
         |  SELECT i, t / sqrt(q.q) AS v FROM t_$k, q_$k q)""".stripMargin
    }.mkString(",\n")
    s"""$pcaBaseCte,
       |$steps""".stripMargin
  }

  /** Shared base of the PCA oracles: exploded (id, i, x), corpus count,
    * per-dim moments/means, and the deterministic v₀ = 1/√d start. */
  private val pcaBaseCte: String =
    """dims AS MATERIALIZED (
      |  SELECT max(len(embedding)) AS d FROM embeddings),
      |ex AS MATERIALIZED (
      |  SELECT vec_id AS id, r.i::BIGINT AS i, embedding[r.i]::DOUBLE AS x
      |  FROM embeddings CROSS JOIN dims
      |    CROSS JOIN unnest(range(1, d + 1)) AS r(i)),
      |n AS MATERIALIZED (
      |  SELECT CAST(count(*) AS DOUBLE) AS n FROM ex WHERE i = 1),
      |mom AS MATERIALIZED (
      |  SELECT i, sum(CAST(x AS DECIMAL(28,18))) AS sx,
      |    sum(CAST(x * x AS DECIMAL(28,18))) AS sxx
      |  FROM ex GROUP BY i),
      |mu AS MATERIALIZED (
      |  SELECT i, CAST(sx AS DOUBLE) / n.n AS mu FROM mom, n),
      |dd AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS d FROM mu),
      |v_0 AS MATERIALIZED (
      |  SELECT i, 1.0::DOUBLE / sqrt(dd.d) AS v FROM mu, dd)""".stripMargin

  /** Oracle twin of Similarity.pcaTopComponents: `m` components, each an
    * `iters`-step power loop with projection (Gram–Schmidt) deflation —
    * every iteration's image t = C·v is re-orthogonalized against the
    * found components before normalizing. The deflation replays exactly
    * as the engine computes it: per prior component j, a
    * DECIMAL-quantized dot pj = v_j·t, then the fixed left-associated
    * chain ((t − p₁·v₁) − p₂·v₂)… in one expression. Ends at vf_c
    * (final vector) and lam_c (projected-operator Rayleigh eigenvalue)
    * per component. */
  private def pcaDeflCte(m: Int, iters: Int): String = {
    def vname(c: Int, k: Int) = if (k == 0) "v_0" else s"v_${c}_$k"
    val comps = (1 to m).map { c =>
      val steps = (1 to iters).map { k =>
        val vp = vname(c, k - 1)
        val priors = 1 until c
        val pjCtes = priors.map { j =>
          s"""pj_${c}_${k}_$j AS MATERIALIZED (
             |  SELECT CAST(sum(CAST(w.v * t.t AS DECIMAL(28,18))) AS DOUBLE)
             |    AS pj
             |  FROM vf_$j w JOIN traw_${c}_$k t USING (i)),""".stripMargin
        }.mkString("\n")
        val tExpr = priors.foldLeft("tr0.t") { (acc, j) =>
          s"($acc - p$j.pj * w$j.v)"
        }
        val tJoins =
          if (priors.isEmpty) ""
          else " " + priors.map(j => s"JOIN vf_$j w$j USING (i)")
            .mkString(" ") + ", " +
            priors.map(j => s"pj_${c}_${k}_$j p$j").mkString(", ")
        s"""muv_${c}_$k AS MATERIALIZED (
           |  SELECT CAST(sum(CAST(mu.mu * v.v AS DECIMAL(28,18))) AS DOUBLE)
           |    AS muv FROM mu JOIN $vp v USING (i)),
           |s_${c}_$k AS MATERIALIZED (
           |  SELECT ex.id,
           |    CAST(sum(CAST(ex.x * v.v AS DECIMAL(28,18))) AS DOUBLE) - m.muv
           |      AS u
           |  FROM ex JOIN $vp v USING (i), muv_${c}_$k m
           |  GROUP BY ex.id, m.muv),
           |b_${c}_$k AS MATERIALIZED (
           |  SELECT CAST(sum(CAST(u AS DECIMAL(28,18))) AS DOUBLE) AS b
           |  FROM s_${c}_$k),
           |traw_${c}_$k AS MATERIALIZED (
           |  SELECT ex.i,
           |    (CAST(sum(CAST(ex.x * s.u AS DECIMAL(28,18))) AS DOUBLE)
           |      - mu.mu * b.b) / n.n AS t
           |  FROM ex JOIN s_${c}_$k s USING (id) JOIN mu ON ex.i = mu.i,
           |    b_${c}_$k b, n
           |  GROUP BY ex.i, mu.mu, b.b, n.n),
           |$pjCtes
           |t_${c}_$k AS MATERIALIZED (
           |  SELECT tr0.i, $tExpr AS t
           |  FROM traw_${c}_$k tr0$tJoins),
           |q_${c}_$k AS MATERIALIZED (
           |  SELECT CAST(sum(CAST(t * t AS DECIMAL(28,18))) AS DOUBLE) AS q
           |  FROM t_${c}_$k),
           |v_${c}_$k AS MATERIALIZED (
           |  SELECT i, t / sqrt(q.q) AS v FROM t_${c}_$k, q_${c}_$k q)"""
          .stripMargin
      }.mkString(",\n")
      s"""$steps,
         |vf_$c AS MATERIALIZED (SELECT * FROM ${vname(c, iters)}),
         |lam_$c AS MATERIALIZED (
         |  SELECT CAST(sum(CAST(v.v * t.t AS DECIMAL(28,18))) AS DOUBLE)
         |    AS lam
         |  FROM ${vname(c, iters - 1)} v JOIN t_${c}_$iters t USING (i))"""
        .stripMargin
    }.mkString(",\n")
    s"""$pcaBaseCte,
       |$comps""".stripMargin
  }

  // Top-2 principal components by power iteration + projection deflation —
  // the decorrelation completion of x178: component 2 runs the identical
  // power loop with each image re-orthogonalized against v₁ as d-row
  // broadcast arithmetic ((v₁·t)·v₁), never touching the data passes, so
  // v₂ ⊥ v₁ by construction (spec-asserted). The oracle replays both
  // components end to end, including every deflation dot and the
  // fixed-order correction chain; component 1 is bit-identical to x178
  // by construction (same CTE arithmetic).
  private val x180 = Q("x180_pca_deflation", Some(
    s"""WITH ${pcaDeflCte(m = 2, iters = 5)},
       |tr AS MATERIALIZED (
       |  SELECT CAST(sum(CAST(
       |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
       |      / n.n) / n.n AS DECIMAL(28,18))) AS DOUBLE) AS tr
       |  FROM mom, n)
       |SELECT 1 AS component, v.i AS dim, round(v.v, 6) AS loading,
       |  round(l1.lam, 6) AS eigenvalue,
       |  round(l1.lam / tr.tr, 4) AS explained,
       |  round(l1.lam / tr.tr, 4) AS cum_explained
       |FROM vf_1 v, lam_1 l1, tr
       |UNION ALL
       |SELECT 2, v.i, round(v.v, 6), round(l2.lam, 6),
       |  round(l2.lam / tr.tr, 4),
       |  round((l1.lam + l2.lam) / tr.tr, 4)
       |FROM vf_2 v, lam_1 l1, lam_2 l2, tr
       |ORDER BY component, dim""".stripMargin)) { (s, dir) =>
    graft.operators.Similarity.pcaTopComponents(
        t(s, dir, "embeddings"), "vec_id", "embedding", m = 2, iters = 5)
      .orderBy("component", "dim")
  }

  // Top principal component by 5 unrolled power-iteration steps — the
  // covariance is never materialized (C·v applied straight to the data:
  // two O(n·d) passes per step). The oracle replays v0 = 1/√d, every
  // step's decimal-quantized dot/aggregate/norm sums, the Rayleigh
  // eigenvalue, and the explained-variance share of the trace.
  private val x178 = Q("x178_pca_power", Some(
    s"""WITH ${pcaCte(iters = 5)},
       |lam AS MATERIALIZED (
       |  SELECT CAST(sum(CAST(v.v * t.t AS DECIMAL(28,18))) AS DOUBLE)
       |    AS lam FROM v_4 v JOIN t_5 t USING (i)),
       |tr AS MATERIALIZED (
       |  SELECT CAST(sum(CAST(
       |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
       |      / n.n) / n.n AS DECIMAL(28,18))) AS DOUBLE) AS tr
       |  FROM mom, n)
       |SELECT v.i AS dim, round(v.v, 6) AS loading,
       |  round(lam.lam, 6) AS eigenvalue,
       |  round(lam.lam / tr.tr, 4) AS explained
       |FROM v_5 v, lam, tr ORDER BY dim""".stripMargin)) { (s, dir) =>
    graft.operators.Similarity.pcaTopComponent(
        t(s, dir, "embeddings"), "vec_id", "embedding", iters = 5)
      .orderBy("dim")
  }

  // PCA whitening projection — the decorrelation step the component
  // extraction exists for: every vector's top-2 coordinates
  // y_c = ((x − μ)·v_c)/√λ_c, computed as x·v − μ·v against broadcast
  // component frames (centered vectors never materialized). The oracle
  // replays the full two-component training AND the per-vector
  // projection arithmetic, so coordinates are gated per vector.
  private val x182 = Q("x182_pca_whiten", Some(
    s"""WITH ${pcaDeflCte(m = 2, iters = 5)},
       |muvp_1 AS MATERIALIZED (
       |  SELECT CAST(sum(CAST(mu.mu * v.v AS DECIMAL(28,18))) AS DOUBLE)
       |    AS muv FROM mu JOIN vf_1 v USING (i)),
       |muvp_2 AS MATERIALIZED (
       |  SELECT CAST(sum(CAST(mu.mu * v.v AS DECIMAL(28,18))) AS DOUBLE)
       |    AS muv FROM mu JOIN vf_2 v USING (i)),
       |y_1 AS (
       |  SELECT ex.id,
       |    (CAST(sum(CAST(ex.x * v.v AS DECIMAL(28,18))) AS DOUBLE) - m.muv)
       |      / sqrt(l.lam) AS coord
       |  FROM ex JOIN vf_1 v USING (i), muvp_1 m, lam_1 l
       |  GROUP BY ex.id, m.muv, l.lam),
       |y_2 AS (
       |  SELECT ex.id,
       |    (CAST(sum(CAST(ex.x * v.v AS DECIMAL(28,18))) AS DOUBLE) - m.muv)
       |      / sqrt(l.lam) AS coord
       |  FROM ex JOIN vf_2 v USING (i), muvp_2 m, lam_2 l
       |  GROUP BY ex.id, m.muv, l.lam)
       |SELECT id, 1 AS component, round(coord, 6) AS coord FROM y_1
       |UNION ALL
       |SELECT id, 2, round(coord, 6) FROM y_2
       |ORDER BY id, component""".stripMargin)) { (s, dir) =>
    graft.operators.Similarity.pcaProject(
        t(s, dir, "embeddings"), "vec_id", "embedding", m = 2, iters = 5,
        whiten = true)
      .orderBy("id", "component")
  }

  /** Oracle twin of Similarity.pcaTopComponentsBlock: block
    * (simultaneous/orthogonal) power iteration. Per step, ONE operator
    * application per component against the step-(k−1) block, then
    * classical Gram–Schmidt against the CURRENT step's already-normalized
    * vectors — p_j computed on the RAW image with the left-associated
    * subtraction chain, the pcaDeflCte op pattern re-pointed from vf_j
    * (final earlier components) to bv_j_k (this step's). Starts from
    * interleaved indicator vectors: component c takes dims ≡ c−1 (mod m),
    * normalized by the size of its dim class. */
  private def pcaBlockCte(m: Int, iters: Int): String = {
    def vname(c: Int, k: Int) = s"bv_${c}_$k"
    val starts = (1 to m).map { c =>
      s"""cntb_$c AS MATERIALIZED (
         |  SELECT CAST(count(*) AS DOUBLE) AS cnt FROM mu
         |  WHERE (i - 1) % $m = ${c - 1}),
         |${vname(c, 0)} AS MATERIALIZED (
         |  SELECT i, CASE WHEN (i - 1) % $m = ${c - 1}
         |    THEN 1.0::DOUBLE / sqrt(cnt.cnt) ELSE 0.0::DOUBLE END AS v
         |  FROM mu, cntb_$c cnt)""".stripMargin
    }.mkString(",\n")
    val steps = (1 to iters).map { k =>
      (1 to m).map { c =>
        val vp = vname(c, k - 1)
        val priors = 1 until c
        val pjCtes = priors.map { j =>
          s"""pjb_${c}_${k}_$j AS MATERIALIZED (
             |  SELECT CAST(sum(CAST(w.v * t.t AS DECIMAL(28,18))) AS DOUBLE)
             |    AS pj
             |  FROM ${vname(j, k)} w JOIN trawb_${c}_$k t USING (i)),""".stripMargin
        }.mkString("\n")
        val tExpr = priors.foldLeft("tr0.t") { (acc, j) =>
          s"($acc - p$j.pj * w$j.v)"
        }
        val tJoins =
          if (priors.isEmpty) ""
          else " " + priors.map(j => s"JOIN ${vname(j, k)} w$j USING (i)")
            .mkString(" ") + ", " +
            priors.map(j => s"pjb_${c}_${k}_$j p$j").mkString(", ")
        s"""muvb_${c}_$k AS MATERIALIZED (
           |  SELECT CAST(sum(CAST(mu.mu * v.v AS DECIMAL(28,18))) AS DOUBLE)
           |    AS muv FROM mu JOIN $vp v USING (i)),
           |sb_${c}_$k AS MATERIALIZED (
           |  SELECT ex.id,
           |    CAST(sum(CAST(ex.x * v.v AS DECIMAL(28,18))) AS DOUBLE) - m.muv
           |      AS u
           |  FROM ex JOIN $vp v USING (i), muvb_${c}_$k m
           |  GROUP BY ex.id, m.muv),
           |bb_${c}_$k AS MATERIALIZED (
           |  SELECT CAST(sum(CAST(u AS DECIMAL(28,18))) AS DOUBLE) AS b
           |  FROM sb_${c}_$k),
           |trawb_${c}_$k AS MATERIALIZED (
           |  SELECT ex.i,
           |    (CAST(sum(CAST(ex.x * s.u AS DECIMAL(28,18))) AS DOUBLE)
           |      - mu.mu * b.b) / n.n AS t
           |  FROM ex JOIN sb_${c}_$k s USING (id) JOIN mu ON ex.i = mu.i,
           |    bb_${c}_$k b, n
           |  GROUP BY ex.i, mu.mu, b.b, n.n),
           |$pjCtes
           |tb_${c}_$k AS MATERIALIZED (
           |  SELECT tr0.i, $tExpr AS t
           |  FROM trawb_${c}_$k tr0$tJoins),
           |qb_${c}_$k AS MATERIALIZED (
           |  SELECT CAST(sum(CAST(t * t AS DECIMAL(28,18))) AS DOUBLE) AS q
           |  FROM tb_${c}_$k),
           |${vname(c, k)} AS MATERIALIZED (
           |  SELECT i, t / sqrt(q.q) AS v FROM tb_${c}_$k, qb_${c}_$k q)"""
          .stripMargin
      }.mkString(",\n")
    }.mkString(",\n")
    val lams = (1 to m).map { c =>
      s"""lamb_$c AS MATERIALIZED (
         |  SELECT CAST(sum(CAST(v.v * t.t AS DECIMAL(28,18))) AS DOUBLE)
         |    AS lam
         |  FROM ${vname(c, iters - 1)} v JOIN tb_${c}_$iters t USING (i))"""
        .stripMargin
    }.mkString(",\n")
    s"""$pcaBaseCte,
       |$starts,
       |$steps,
       |$lams""".stripMargin
  }

  // Top-2 principal components by BLOCK (simultaneous) power iteration —
  // the one-data-pass-per-step completion of x180: both components'
  // operator applications share each step's single corpus pass, then a
  // driver-side Gram–Schmidt re-orthonormalizes the image block (m² dots
  // of d-vectors — the data is never touched). The oracle replays every
  // step: interleaved-indicator starts, per-component C·v at the previous
  // block, the GS projections against THIS step's new vectors, and the
  // projected-operator Rayleigh eigenvalues.
  private val x249 = Q("x249_pca_block", Some(
    s"""WITH ${pcaBlockCte(m = 2, iters = 5)},
       |tr AS MATERIALIZED (
       |  SELECT CAST(sum(CAST(
       |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
       |      / n.n) / n.n AS DECIMAL(28,18))) AS DOUBLE) AS tr
       |  FROM mom, n)
       |SELECT 1 AS component, v.i AS dim, round(v.v, 6) AS loading,
       |  round(l1.lam, 6) AS eigenvalue,
       |  round(l1.lam / tr.tr, 4) AS explained,
       |  round(l1.lam / tr.tr, 4) AS cum_explained
       |FROM bv_1_5 v, lamb_1 l1, tr
       |UNION ALL
       |SELECT 2, v.i, round(v.v, 6), round(l2.lam, 6),
       |  round(l2.lam / tr.tr, 4),
       |  round((l1.lam + l2.lam) / tr.tr, 4)
       |FROM bv_2_5 v, lamb_1 l1, lamb_2 l2, tr
       |ORDER BY component, dim""".stripMargin)) { (s, dir) =>
    graft.operators.Similarity.pcaTopComponentsBlock(
        t(s, dir, "embeddings"), "vec_id", "embedding", m = 2, iters = 5)
      .orderBy("component", "dim")
  }

  // Whitening projection on the BLOCK-iterated components (x182's
  // contract on x249's training loop): y_c = ((x − μ)·v_c)/√λ_c per
  // vector, one map-only pass for both coordinates. The oracle replays
  // the full block training AND the per-vector projection arithmetic.
  private val x250 = Q("x250_pca_block_whiten", Some(
    s"""WITH ${pcaBlockCte(m = 2, iters = 5)},
       |muvpb_1 AS MATERIALIZED (
       |  SELECT CAST(sum(CAST(mu.mu * v.v AS DECIMAL(28,18))) AS DOUBLE)
       |    AS muv FROM mu JOIN bv_1_5 v USING (i)),
       |muvpb_2 AS MATERIALIZED (
       |  SELECT CAST(sum(CAST(mu.mu * v.v AS DECIMAL(28,18))) AS DOUBLE)
       |    AS muv FROM mu JOIN bv_2_5 v USING (i)),
       |yb_1 AS (
       |  SELECT ex.id,
       |    (CAST(sum(CAST(ex.x * v.v AS DECIMAL(28,18))) AS DOUBLE) - m.muv)
       |      / sqrt(l.lam) AS coord
       |  FROM ex JOIN bv_1_5 v USING (i), muvpb_1 m, lamb_1 l
       |  GROUP BY ex.id, m.muv, l.lam),
       |yb_2 AS (
       |  SELECT ex.id,
       |    (CAST(sum(CAST(ex.x * v.v AS DECIMAL(28,18))) AS DOUBLE) - m.muv)
       |      / sqrt(l.lam) AS coord
       |  FROM ex JOIN bv_2_5 v USING (i), muvpb_2 m, lamb_2 l
       |  GROUP BY ex.id, m.muv, l.lam)
       |SELECT id, 1 AS component, round(coord, 6) AS coord FROM yb_1
       |UNION ALL
       |SELECT id, 2, round(coord, 6) FROM yb_2
       |ORDER BY id, component""".stripMargin)) { (s, dir) =>
    graft.operators.Similarity.pcaProjectBlock(
        t(s, dir, "embeddings"), "vec_id", "embedding", m = 2, iters = 5,
        whiten = true)
      .orderBy("id", "component")
  }

  // Apriori-depth-2 association rules over document tokens: distinct
  // (doc, item), infrequent items pruned BEFORE the pair self-join
  // (the Apriori invariant), then integer-exact confidence/lift. Every
  // metric is bps/ppm via exact decimal integer division, so the top-100
  // rule table gates bit-exactly.
  private val x189 = Q("x189_association_rules", Some(
    s"""WITH w AS (
       |  SELECT DISTINCT doc_id AS id, u.w AS item
       |  FROM (SELECT doc_id, $WORDS AS ws FROM documents),
       |    unnest(ws) AS u(w)),
       |supp AS (SELECT item, count(*) AS s FROM w GROUP BY item),
       |freq AS (SELECT item, s FROM supp WHERE s >= 50),
       |n AS (SELECT count(*) AS n FROM documents),
       |wf AS (SELECT w.id, w.item FROM w SEMI JOIN freq USING (item)),
       |pairs AS (
       |  SELECT a.item AS item_a, b.item AS item_b, count(*) AS ps
       |  FROM wf a JOIN wf b ON a.id = b.id AND a.item < b.item
       |  GROUP BY a.item, b.item
       |  HAVING count(*) >= 50)
       |SELECT item_a, item_b, CAST(ps AS BIGINT) AS pair_support,
       |  CAST(fa.s AS BIGINT) AS supp_a, CAST(fb.s AS BIGINT) AS supp_b,
       |  CAST(n.n AS BIGINT) AS n_docs,
       |  CAST((CAST(ps AS HUGEINT) * 10000) // fa.s AS BIGINT)
       |    AS conf_ab_bps,
       |  CAST((CAST(ps AS HUGEINT) * 10000) // fb.s AS BIGINT)
       |    AS conf_ba_bps,
       |  CAST((CAST(ps AS HUGEINT) * n.n * 1000000)
       |    // (CAST(fa.s AS HUGEINT) * fb.s) AS BIGINT) AS lift_ppm
       |FROM pairs
       |  JOIN freq fa ON pairs.item_a = fa.item
       |  JOIN freq fb ON pairs.item_b = fb.item, n
       |ORDER BY pair_support DESC, item_a, item_b
       |LIMIT 100""".stripMargin)) { (s, dir) =>
    graft.functions.TextAnalysis.associationRules(
      t(s, dir, "documents"), "doc_id", "text", minSupport = 50, topK = 100)
  }

  // Jelinek–Mercer interpolated trigram perplexity (λ = 0.6/0.3/0.1),
  // self-trained — the CCNet-style LM filter completing x113 (unigram)
  // and x54 (bigram coverage). The oracle rebuilds all three count
  // tables, replays the five joins and the λ-interpolation in the same
  // operation order, and quantizes each −ln p to DECIMAL(28,18) before
  // the per-doc sum.
  private val x190 = Q("x190_trigram_perplexity", Some(
    s"""WITH base AS (
       |  SELECT doc_id, $WORDS AS ws, len($WORDS) AS n
       |  FROM documents),
       |uni AS (
       |  SELECT u.w AS w, count(*) AS cu
       |  FROM base, unnest(ws) AS u(w) GROUP BY u.w),
       |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM base),
       |bi AS (
       |  SELECT ws[i] || ' ' || ws[i + 1] AS bg, count(*) AS cb
       |  FROM base, unnest(range(1, n)) AS r(i)
       |  WHERE n >= 2 GROUP BY 1),
       |tris AS (
       |  SELECT doc_id,
       |    ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS tg,
       |    ws[i] || ' ' || ws[i + 1] AS ctx12,
       |    ws[i + 1] || ' ' || ws[i + 2] AS bg23,
       |    ws[i + 1] AS w2, ws[i + 2] AS w3
       |  FROM base, unnest(range(1, n - 1)) AS r(i)
       |  WHERE n >= 3),
       |tri AS (SELECT tg, count(*) AS ct FROM tris GROUP BY tg)
       |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
       |  round(CAST(sum(CAST(-ln(
       |      0.6 * (CAST(tri.ct AS DOUBLE) / CAST(b12.cb AS DOUBLE))
       |      + 0.3 * (CAST(b23.cb AS DOUBLE) / CAST(u2.cu AS DOUBLE))
       |      + 0.1 * (CAST(u3.cu AS DOUBLE) / tot.tot))
       |    AS DECIMAL(28,18))) AS DOUBLE), 4) AS nll,
       |  round(exp(CAST(sum(CAST(-ln(
       |      0.6 * (CAST(tri.ct AS DOUBLE) / CAST(b12.cb AS DOUBLE))
       |      + 0.3 * (CAST(b23.cb AS DOUBLE) / CAST(u2.cu AS DOUBLE))
       |      + 0.1 * (CAST(u3.cu AS DOUBLE) / tot.tot))
       |    AS DECIMAL(28,18))) AS DOUBLE) / count(*)), 4) AS perplexity
       |FROM tris t
       |  JOIN tri ON t.tg = tri.tg
       |  JOIN bi b12 ON t.ctx12 = b12.bg
       |  JOIN bi b23 ON t.bg23 = b23.bg
       |  JOIN uni u2 ON t.w2 = u2.w
       |  JOIN uni u3 ON t.w3 = u3.w, tot
       |GROUP BY t.doc_id, tot.tot
       |ORDER BY t.doc_id""".stripMargin)) { (s, dir) =>
    graft.functions.TextAnalysis.jmTrigramPerplexity(
        t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")
  }

  // Exact-quota mixture sampling: exactly 97 documents with per-language
  // shares apportioned by Hamilton's largest-remainder method (97 is
  // coprime to the counts, so the remainder ranking genuinely decides
  // two leftovers), each language contributing its md5-ranked top-quota
  // docs. All-integer quotas + a deterministic draw — the oracle replays
  // the div/mod apportionment, the remainder ranking, and the draw.
  private val x233 = Q("x233_quota_sample", Some(
    """WITH cnt AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
      |             FROM documents GROUP BY lang),
      |q AS (SELECT lang, n,
      |        CAST((CAST(n AS HUGEINT) * 97) // (SELECT sum(n) FROM cnt)
      |          AS BIGINT) AS base,
      |        (CAST(n AS HUGEINT) * 97) % (SELECT sum(n) FROM cnt) AS rem
      |      FROM cnt),
      |q2 AS (SELECT lang, base, rem,
      |        97 - (SELECT sum(base) FROM q) AS leftover,
      |        row_number() OVER (ORDER BY rem DESC, lang) AS rr
      |       FROM q),
      |quota AS (SELECT lang,
      |        CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
      |          AS BIGINT) AS quota
      |       FROM q2),
      |drawn AS (
      |  SELECT d.lang, d.doc_id, qu.quota,
      |    row_number() OVER (PARTITION BY d.lang
      |      ORDER BY ('0x' || substring(md5('0:q:' || d.doc_id::VARCHAR),
      |        1, 8))::BIGINT, d.doc_id) AS rk
      |  FROM documents d JOIN quota qu USING (lang))
      |SELECT lang, doc_id, quota FROM drawn WHERE rk <= quota
      |ORDER BY lang, doc_id""".stripMargin)) { (s, dir) =>
    Curation.quotaSample(t(s, dir, "documents"), "doc_id", "lang",
        total = 97)
      .orderBy("lang", "doc_id")
  }

  // Temperature-flattened mixture (α = 0.5): quotas ∝ √n_g — the
  // multilingual rebalancing next to x233's proportional quotas, same
  // exact-integer Hamilton apportionment but over floor(1e6·√n + 0.5)
  // weights (IEEE sqrt is correctly rounded; floor(x+0.5) is
  // engine-stable where round()'s tie rule is not). The oracle replays
  // the weights, the largest-remainder split, and the md5 draw; the
  // low-resource langs visibly oversample vs x233 on the same budget.
  private val x243 = Q("x243_temperature_mix", Some(
    """WITH cnt AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
      |             FROM documents GROUP BY lang),
      |w AS (SELECT lang, n,
      |        CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000.0 + 0.5)
      |          AS BIGINT) AS w
      |      FROM cnt),
      |q AS (SELECT lang, n, w,
      |        CAST((CAST(w AS HUGEINT) * 97) // (SELECT sum(w) FROM w)
      |          AS BIGINT) AS base,
      |        (CAST(w AS HUGEINT) * 97) % (SELECT sum(w) FROM w) AS rem
      |      FROM w),
      |q2 AS (SELECT lang, base, rem,
      |        97 - (SELECT sum(base) FROM q) AS leftover,
      |        row_number() OVER (ORDER BY rem DESC, lang) AS rr
      |       FROM q),
      |quota AS (SELECT lang,
      |        CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
      |          AS BIGINT) AS quota
      |       FROM q2),
      |drawn AS (
      |  SELECT d.lang, d.doc_id, qu.quota,
      |    row_number() OVER (PARTITION BY d.lang
      |      ORDER BY ('0x' || substring(md5('0:tq:' || d.doc_id::VARCHAR),
      |        1, 8))::BIGINT, d.doc_id) AS rk
      |  FROM documents d JOIN quota qu USING (lang))
      |SELECT lang, doc_id, quota FROM drawn WHERE rk <= quota
      |ORDER BY lang, doc_id""".stripMargin)) { (s, dir) =>
    Curation.temperatureQuotaSample(t(s, dir, "documents"), "doc_id",
        "lang", total = 97)
      .orderBy("lang", "doc_id")
  }

  val qs: Seq[Q] = Seq(x32, x33, x36, x37, x38, x39, x41, x43, x49, x52,
    x53, x54, x57, x62, x63, x65, x66, x72, x73, x74, x111, x113, x116,
    x118, x119, x120, x121, x137, x176, x177, x178, x179, x180, x182,
    x249, x250, x185,
    x189, x190, x201, x203, x204, x208, x212, x233, x243)
}
