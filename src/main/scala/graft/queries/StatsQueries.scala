package graft.queries

import graft.functions.Curation
import graft.operators.Stats
import org.apache.spark.sql.functions._

/** Statistical analytics + text-normalization queries: boilerplate removal,
  * NFC unicode normalization (native expression), one-pass correlation
  * matrix, closed-form OLS trends, winsorization, k-anonymity audit.
  *
  * Moments accumulate as exact decimal sums; the closed-form double math
  * happens once, in the same operation order as the oracle (see Stats).
  */
object StatsQueries {
  import Tables.t

  // CCNet-style boilerplate removal: 2-word segments recurring in ≥150
  // distinct docs are dropped everywhere, survivors reassemble in order.
  // The oracle replays segmentation, the distinct-count threshold, the
  // anti join, and the ordered reassembly — gate on counts + md5 of the
  // cleaned text.
  private val x77 = Q("x77_boilerplate_removal", Some(
    """WITH base AS (
      |  SELECT doc_id, list_filter(string_split(
      |    regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
      |    x -> x <> '') AS ws
      |  FROM documents),
      |w AS (SELECT doc_id, unnest(ws) AS wd, generate_subscripts(ws, 1) AS i
      |      FROM base),
      |segs AS (
      |  SELECT doc_id, CAST((i - 1) // 2 AS BIGINT) AS seg_idx,
      |    string_agg(wd, ' ' ORDER BY i) AS seg
      |  FROM w GROUP BY doc_id, (i - 1) // 2),
      |bp AS (SELECT seg FROM segs GROUP BY seg
      |       HAVING count(DISTINCT doc_id) >= 150),
      |kept AS (
      |  SELECT s.doc_id, count(*) AS n_kept,
      |    string_agg(s.seg, ' ' ORDER BY s.seg_idx) AS clean_text
      |  FROM segs s ANTI JOIN bp ON s.seg = bp.seg
      |  GROUP BY s.doc_id),
      |tot AS (SELECT doc_id, count(*) AS n_total FROM segs GROUP BY doc_id)
      |SELECT t.doc_id, CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
      |  CAST(t.n_total - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed,
      |  md5(coalesce(k.clean_text, '')) AS clean_md5
      |FROM tot t LEFT JOIN kept k ON t.doc_id = k.doc_id
      |ORDER BY t.doc_id""".stripMargin)) { (s, dir) =>
    Curation.removeBoilerplate(t(s, dir, "documents"), "doc_id", "text",
        segWords = 2, minDocs = 150)
      .select(col("doc_id"), col("n_kept"), col("n_removed"),
        md5(col("clean_text")).as("clean_md5"))
      .orderBy("doc_id")
  }

  // NFC normalization via the native codegen expression. Each doc gets a
  // DECOMPOSED "café" (e + U+0301) appended; normalization must compose it
  // (length shrinks by exactly one codepoint) and the md5 gates the full
  // normalized bytes against DuckDB's nfc_normalize.
  private val x78 = Q("x78_nfc_normalize", Some(
    s"""SELECT doc_id, length(text || ' café') AS n_raw,
      |  length(nfc_normalize(text || ' café')) AS n_norm,
      |  md5(nfc_normalize(text || ' café')) AS norm_md5
      |FROM documents ORDER BY doc_id""".stripMargin)) { (s, dir) =>
    graft.functions.GraftExtensions.register(s)
    t(s, dir, "documents").createOrReplaceTempView("docs_x78")
    s.sql(
      s"""SELECT doc_id, length(text || ' café') AS n_raw,
        |  length(nfc_normalize(text || ' café')) AS n_norm,
        |  md5(nfc_normalize(text || ' café')) AS norm_md5
        |FROM docs_x78 ORDER BY doc_id""".stripMargin)
  }

  // One-pass Pearson correlation matrix over the lineitem measures: every
  // moment in a single aggregate, pair rows projected lazily from the
  // 1-row frame. The oracle replays the identical moment sums and the
  // identical double formula.
  private val x79 = Q("x79_corr_matrix", Some(
    """WITH m AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS s_q,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS s_e,
      |    CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) AS s_d,
      |    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS q_q,
      |    CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS q_e,
      |    CAST(sum(CAST(l_discount * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS q_d,
      |    CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS p_qe,
      |    CAST(sum(CAST(l_quantity * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS p_qd,
      |    CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS p_ed
      |  FROM lineitem)
      |SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
      |  round((n * p_qe - s_q * s_e) /
      |    sqrt((n * q_q - s_q * s_q) * (n * q_e - s_e * s_e)), 6) AS pearson_r
      |FROM m
      |UNION ALL
      |SELECT 'l_quantity', 'l_discount',
      |  round((n * p_qd - s_q * s_d) /
      |    sqrt((n * q_q - s_q * s_q) * (n * q_d - s_d * s_d)), 6) FROM m
      |UNION ALL
      |SELECT 'l_extendedprice', 'l_discount',
      |  round((n * p_ed - s_e * s_d) /
      |    sqrt((n * q_e - s_e * s_e) * (n * q_d - s_d * s_d)), 6) FROM m
      |ORDER BY col_x, col_y""".stripMargin)) { (s, dir) =>
    Stats.correlationMatrix(
        t(s, dir, "lineitem").select("l_quantity", "l_extendedprice", "l_discount"),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
      .orderBy("col_x", "col_y")
  }

  // Per-event-type OLS trend of value over the day index — closed-form
  // slope/intercept from exact decimal moments, one grouped aggregate.
  private val x80 = Q("x80_ols_trend", Some(
    """WITH pts AS (
      |  SELECT event_type,
      |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS INT) AS day_x,
      |    value FROM events),
      |m AS (
      |  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(day_x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(day_x * value AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
      |    CAST(sum(CAST(day_x * day_x AS DECIMAL(28,6))) AS DOUBLE) AS sxx
      |  FROM pts GROUP BY event_type)
      |SELECT event_type, CAST(n AS BIGINT) AS n_rows,
      |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
      |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4) AS intercept
      |FROM m ORDER BY event_type""".stripMargin)) { (s, dir) =>
    Stats.olsTrend(
        Tables.events(s, dir).select(col("event_type"),
          datediff(col("ts"), lit("2024-01-01")).as("day_x"), col("value")),
        Seq("event_type"), "day_x", "value")
      .orderBy("event_type")
  }

  // Winsorized per-flag revenue: clamp l_extendedprice to its per-group
  // [p5, p95] DISCRETE percentiles (actual data elements — cross-engine
  // bit-parity), then compare clamped vs raw totals and clamp counts.
  private val x81 = Q("x81_winsorize", Some(
    """WITH b AS (
      |  SELECT l_returnflag AS g,
      |    quantile_disc(l_extendedprice, 0.05) AS lo,
      |    quantile_disc(l_extendedprice, 0.95) AS hi
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l.l_returnflag, count(*) AS n_rows,
      |  CAST(sum(CASE WHEN l.l_extendedprice < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_lo,
      |  CAST(sum(CASE WHEN l.l_extendedprice > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_hi,
      |  round(CAST(sum(CAST(least(greatest(l.l_extendedprice, b.lo), b.hi) AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_winsorized,
      |  round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_raw
      |FROM lineitem l JOIN b ON l.l_returnflag = b.g
      |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin)) { (s, dir) =>
    val w = Stats.winsorize(t(s, dir, "lineitem")
        .select("l_returnflag", "l_extendedprice"),
      "l_returnflag", "l_extendedprice", 0.05, 0.95)
    w.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("l_extendedprice") < col("__lo"), 1).otherwise(0))
          .cast("bigint").as("n_clamped_lo"),
        sum(when(col("l_extendedprice") > col("__hi"), 1).otherwise(0))
          .cast("bigint").as("n_clamped_hi"),
        round(sum(col("__w").cast("decimal(18,2)")).cast("double"), 2)
          .as("sum_winsorized"),
        round(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 2)
          .as("sum_raw"))
      .orderBy("l_returnflag")
  }

  // k-anonymity audit over customer quasi-identifiers (nation × segment):
  // the class frame is |QID combos| rows, the report one row. The oracle
  // replays the class sizes and the risk sums.
  private val x82 = Q("x82_k_anonymity", Some(
    """WITH cls AS (
      |  SELECT c_nationkey, c_mktsegment, count(*) AS sz
      |  FROM customer GROUP BY c_nationkey, c_mktsegment)
      |SELECT CAST(10 AS BIGINT) AS k,
      |  min(sz) AS min_class_size,
      |  count(*) AS n_classes,
      |  CAST(sum(CASE WHEN sz < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_classes,
      |  CAST(sum(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
      |  min(sz) >= 10 AS is_k_anonymous
      |FROM cls""".stripMargin)) { (s, dir) =>
    Stats.kAnonymity(t(s, dir, "customer"),
      Seq("c_nationkey", "c_mktsegment"), 10L)
  }

  // Arbitrary GROUPING SETS (the general grouping-lattice form beyond
  // x35's CUBE / e9's ROLLUP): three explicit sets in ONE Expand +
  // aggregate, with grouping() flags disambiguating the null lattice.
  private val x86 = Q("x86_grouping_sets", Some(
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
      |  count(*) AS n_rows,
      |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
      |                        (l_returnflag, l_linestatus))
      |ORDER BY gid, rf, ls""".stripMargin)) { (s, dir) =>
    t(s, dir, "lineitem").createOrReplaceTempView("li_x86")
    s.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n_rows,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM li_x86
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
        |                        (l_returnflag, l_linestatus))
        |ORDER BY gid, rf, ls""".stripMargin)
  }

  // RANGE-frame window over event time: per-customer trailing-30-day order
  // revenue — the frame bound is an INTERVAL over the ORDER BY timestamp,
  // so peers (same-day orders) aggregate identically in both engines.
  private val x87 = Q("x87_range_frame_window", Some(
    """SELECT o_orderkey, o_custkey, o_orderdate,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE), 2) AS rev30,
      |  count(*) OVER w AS n30
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
      |             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderkey""".stripMargin)) { (s, dir) =>
    t(s, dir, "orders").createOrReplaceTempView("ord_x87")
    s.sql(
      """SELECT o_orderkey, o_custkey, o_orderdate,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE), 2) AS rev30,
        |  count(*) OVER w AS n30
        |FROM ord_x87
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin)
  }

  // BPE merge learning (tokenizer training): first 3 merges over the doc
  // corpus. The oracle unrolls ALL THREE iterations — pair counts, argmax
  // with the same total order, and the space-delimited replace — so each
  // iteration's fixed point is hash-checked, not just the final table.
  private val x88 = Q("x88_bpe_learn", Some {
    def iter(prev: String, p: String, b: String) =
      s"""$p AS (
         |  SELECT u.pr AS pair, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM $prev, unnest(list_transform(range(1, len(string_split(tok, ' '))),
         |    i -> string_split(tok, ' ')[i] || ' ' || string_split(tok, ' ')[i+1])) AS u(pr)
         |  GROUP BY u.pr),
         |$b AS (SELECT pair, cnt FROM $p ORDER BY cnt DESC, pair LIMIT 1)""".stripMargin
    def apply(prev: String, b: String, name: String) =
      s"""$name AS (
         |  SELECT trim(replace(' ' || tok || ' ',
         |    ' ' || (SELECT pair FROM $b) || ' ',
         |    ' ' || replace((SELECT pair FROM $b), ' ', '') || ' ')) AS tok, freq
         |  FROM $prev)""".stripMargin
    s"""WITH w AS (
       |  SELECT unnest(list_filter(string_split_regex(
       |    regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
       |    x -> x <> '')) AS wd
       |  FROM documents),
       |vf AS (SELECT wd, count(*) AS freq FROM w GROUP BY wd),
       |v0 AS (SELECT array_to_string(list_transform(range(1, length(wd) + 1),
       |         i -> substring(wd, i, 1)), ' ') AS tok, freq FROM vf),
       |${iter("v0", "p1", "b1")},
       |${apply("v0", "b1", "v1")},
       |${iter("v1", "p2", "b2")},
       |${apply("v1", "b2", "v2")},
       |${iter("v2", "p3", "b3")}
       |SELECT 1 AS iter, pair AS merge_pair, cnt AS weighted_count FROM b1
       |UNION ALL SELECT 2, pair, cnt FROM b2
       |UNION ALL SELECT 3, pair, cnt FROM b3
       |ORDER BY iter""".stripMargin
  }) { (s, dir) =>
    graft.functions.TextAnalysis
      .bpeLearnMerges(t(s, dir, "documents"), "text", iters = 3)
      .orderBy("iter")
  }

  // File-source streaming pipeline, end to end: parquet directory →
  // watermarked windowed aggregate → parquet SINK, run with AvailableNow;
  // a far-future sentinel file flushes every real window out of state. The
  // streamed sink must equal the batch aggregate (decimal sums make the
  // cross-micro-batch state merge order-free).
  private val x89 = Q("x89_stream_file_pipeline", Some(
    """SELECT time_bucket(INTERVAL '1 hour', ts)::TIMESTAMP AS window_start,
      |  event_type, count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)) {
    (s, dir) =>
      graft.streaming.EventStream
        .fileSourceReplay(s, Tables.events(s, dir)
          .select("ts", "event_type", "value"))
        .orderBy("window_start", "event_type")
  }

  // Deterministic epoch shuffle into 8 training shards: md5 tickets decide
  // shard and in-shard position (seeded permutation, no global sort). The
  // checksum sums doc_id·position, so the gate pins BOTH membership and
  // the exact within-shard order.
  private val x91 = Q("x91_epoch_shuffle", Some(
    """WITH a AS (
      |  SELECT doc_id, md5('epoch1:' || doc_id::VARCHAR) AS r FROM documents),
      |s AS (
      |  SELECT doc_id,
      |    ('0x' || substring(r, 1, 8))::BIGINT % 8 AS shard,
      |    row_number() OVER (
      |      PARTITION BY ('0x' || substring(r, 1, 8))::BIGINT % 8
      |      ORDER BY r, doc_id) AS pos_in_shard
      |  FROM a)
      |SELECT shard, count(*) AS n_rows,
      |  CAST(sum(doc_id * pos_in_shard) AS BIGINT) AS order_checksum
      |FROM s GROUP BY shard ORDER BY shard""".stripMargin)) { (s, dir) =>
    Curation.epochShuffle(t(s, dir, "documents").select("doc_id"),
        "doc_id", "epoch1", nShards = 8)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("doc_id") * col("pos_in_shard")).cast("bigint")
          .as("order_checksum"))
      .orderBy("shard")
  }

  // Cluster-quality report over the embedding labels: per-cell size and
  // inertia. Centroid sums are float-exact; each squared-distance term is
  // decimal-quantized before the cell sum — order-free, hash-gateable.
  private val x92 = Q("x92_cluster_inertia", Some(
    """WITH e AS (
      |  SELECT vec_id, label, u.i - 1 AS pos, CAST(embedding[u.i] AS DOUBLE) AS v
      |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
      |c AS (SELECT label, pos, avg(v) AS cv FROM e GROUP BY 1, 2),
      |t AS (
      |  SELECT e.vec_id, e.label,
      |    CAST((e.v - c.cv) * (e.v - c.cv) AS DECIMAL(28,18)) AS term
      |  FROM e JOIN c ON e.label = c.label AND e.pos = c.pos)
      |SELECT label AS cell, count(DISTINCT vec_id) AS n_vectors,
      |  round(CAST(sum(term) AS DOUBLE), 6) AS inertia,
      |  round(CAST(sum(term) AS DOUBLE) / count(DISTINCT vec_id), 6) AS avg_inertia
      |FROM t GROUP BY label ORDER BY cell""".stripMargin)) { (s, dir) =>
    graft.operators.Stats.clusterInertia(t(s, dir, "embeddings"),
        "vec_id", "label", "embedding")
      .orderBy("cell")
  }

  // BPE ENCODE with the merges learned in x88: word occurrences join the
  // trained vocabulary; per-doc char vs subword counts show the
  // compression the merges buy. The oracle replays training AND encoding.
  private val x93 = Q("x93_bpe_encode", Some {
    def iter(prev: String, p: String, b: String) =
      s"""$p AS (
         |  SELECT u.pr AS pair, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM $prev, unnest(list_transform(range(1, len(string_split(tok, ' '))),
         |    i -> string_split(tok, ' ')[i] || ' ' || string_split(tok, ' ')[i+1])) AS u(pr)
         |  GROUP BY u.pr),
         |$b AS (SELECT pair, cnt FROM $p ORDER BY cnt DESC, pair LIMIT 1)""".stripMargin
    def apply(prev: String, b: String, name: String) =
      s"""$name AS (
         |  SELECT wd, trim(replace(' ' || tok || ' ',
         |    ' ' || (SELECT pair FROM $b) || ' ',
         |    ' ' || replace((SELECT pair FROM $b), ' ', '') || ' ')) AS tok, freq
         |  FROM $prev)""".stripMargin
    s"""WITH occ AS (
       |  SELECT doc_id, unnest(list_filter(string_split_regex(
       |    regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
       |    x -> x <> '')) AS wd
       |  FROM documents),
       |vf AS (SELECT wd, count(*) AS freq FROM occ GROUP BY wd),
       |v0 AS (SELECT wd, array_to_string(list_transform(range(1, length(wd) + 1),
       |         i -> substring(wd, i, 1)), ' ') AS tok, freq FROM vf),
       |${iter("v0", "p1", "b1")},
       |${apply("v0", "b1", "v1")},
       |${iter("v1", "p2", "b2")},
       |${apply("v1", "b2", "v2")},
       |${iter("v2", "p3", "b3")},
       |${apply("v2", "b3", "v3")}
       |SELECT o.doc_id, count(*) AS n_words,
       |  CAST(sum(length(o.wd)) AS BIGINT) AS n_chars,
       |  CAST(sum(len(string_split(v.tok, ' '))) AS BIGINT) AS n_subwords
       |FROM occ o JOIN v3 v ON o.wd = v.wd
       |GROUP BY o.doc_id ORDER BY o.doc_id""".stripMargin
  }) { (s, dir) =>
    graft.functions.TextAnalysis
      .bpeEncode(t(s, dir, "documents"), "doc_id", "text", iters = 3)
      .orderBy("doc_id")
  }

  // SCD2 temporal lookup: each order joined to the customer-dimension
  // VERSION valid the day before it (state-before-the-event — the classic
  // warehouse fact↔dim-at-time join). Composes Merge.scd2FromHistory with
  // the as-of join (union+marker+window — ONE shuffle, no range join).
  // The oracle builds the same dim and uses DuckDB's native ASOF JOIN.
  private val x94 = Q("x94_scd2_lookup", Some(
    """WITH hist AS (
      |  SELECT o_custkey, o_orderdate,
      |    round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS order_value
      |  FROM orders GROUP BY o_custkey, o_orderdate),
      |dim AS (
      |  SELECT o_custkey AS d_custkey, order_value, o_orderdate AS valid_from
      |  FROM hist),
      |f AS (
      |  SELECT o_orderkey, o_custkey, o_orderdate,
      |    o_orderdate - INTERVAL 1 DAY AS asof_ts
      |  FROM orders)
      |SELECT f.o_orderkey, f.o_custkey, f.o_orderdate,
      |  d.order_value AS prev_value
      |FROM f ASOF LEFT JOIN dim d
      |  ON f.o_custkey = d.d_custkey AND f.asof_ts >= d.valid_from
      |ORDER BY f.o_orderkey""".stripMargin)) { (s, dir) =>
    val orders = t(s, dir, "orders")
    val hist = orders.groupBy("o_custkey", "o_orderdate")
      .agg(round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
        .as("order_value"))
    val dim = hist.select(col("o_custkey"), col("o_orderdate").as("__ts"),
      col("order_value").as("prev_value"))
    val facts = orders.select(col("o_orderkey"), col("o_custkey"),
      col("o_orderdate"),
      (col("o_orderdate") - expr("INTERVAL 1 DAY")).as("__ts"))
    graft.operators.AsofJoin.asofJoin(facts, dim, "o_custkey", "__ts",
        Seq("prev_value"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "prev_value")
      .orderBy("o_orderkey")
  }

  // Event transition matrix: per-user consecutive event-type bigrams (one
  // lag window), transition shares in integer ppm — the Markov-chain view
  // of user behavior, all-integer gate.
  private val x95 = Q("x95_event_transitions", Some(
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev_type
      |  FROM events),
      |tr AS (
      |  SELECT prev_type AS from_type, event_type AS to_type, count(*) AS n
      |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT from_type, sum(n) AS tn FROM tr GROUP BY from_type)
      |SELECT tr.from_type, tr.to_type, CAST(tr.n AS BIGINT) AS n,
      |  CAST(tr.n * 1000000 // tot.tn AS BIGINT) AS ppm
      |FROM tr JOIN tot ON tr.from_type = tot.from_type
      |ORDER BY tr.from_type, tr.to_type""".stripMargin)) { (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val tr = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = tr.groupBy(col("from_type").as("__ft"))
      .agg(sum(col("n")).as("tn"))
    tr.join(tot, col("from_type") === col("__ft"))
      .select(col("from_type"), col("to_type"), col("n").cast("bigint").as("n"),
        expr("n * 1000000 div tn").cast("bigint").as("ppm"))
      .orderBy("from_type", "to_type")
  }

  // Exact per-group quartiles with bounded memory: Spark's own exact
  // percentile aggregate buffers whole groups in executor memory (OOM at
  // billion-row groups); Stats.exactQuantiles ranks in one spill-safe
  // window pass and interpolates via a weighted sum over the ≤2 boundary
  // rows per quantile. The oracle is DuckDB's quantile_cont — the same
  // (n−1)·q interpolation definition — so the arithmetic itself is gated.
  private val x110 = Q("x110_exact_quantiles", Some(
    """SELECT o_orderpriority,
      |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
      |  round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
      |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM orders GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin)) { (s, dir) =>
    Stats.exactQuantiles(t(s, dir, "orders"), Seq("o_orderpriority"),
        "o_totalprice", Seq(0.25, 0.5, 0.75))
      .orderBy("o_orderpriority")
  }

  // t-closeness audit — completes the privacy trio (x82 k-anonymity, x103
  // l-diversity): per QID class, the total-variation distance between the
  // class's sensitive-attribute distribution and the global one. Integer
  // arithmetic end-to-end (the absent-values term folds in sensitive
  // values the class never saw, so there is no class × domain cross
  // join); `tvd` is one exact-int-to-double division, and the t=1/5
  // violation test cross-multiplies — the oracle replays the identical
  // closed form in HUGEINT.
  private val x134 = Q("x134_t_closeness", Some(
    """WITH tot AS (SELECT count(*) AS n FROM customer),
      |gdist AS (SELECT c_mktsegment AS s, count(*) AS ns
      |         FROM customer GROUP BY 1),
      |cell AS (SELECT c_nationkey, c_mktsegment AS s, count(*) AS ngs
      |         FROM customer GROUP BY 1, 2),
      |cls AS (SELECT c_nationkey, sum(ngs) AS ng FROM cell GROUP BY 1),
      |per AS (
      |  SELECT cell.c_nationkey,
      |    max(cls.ng) AS class_size,
      |    sum(abs(cell.ngs * tot.n - gdist.ns * cls.ng))
      |      + (max(tot.n) - sum(gdist.ns)) * max(cls.ng) AS num,
      |    2 * max(cls.ng) * max(tot.n) AS den
      |  FROM cell
      |  JOIN cls ON cls.c_nationkey = cell.c_nationkey
      |  JOIN gdist ON gdist.s = cell.s, tot
      |  GROUP BY cell.c_nationkey)
      |SELECT c_nationkey, CAST(class_size AS BIGINT) AS class_size,
      |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS tvd,
      |  num * 5 > den AS violates_t
      |FROM per ORDER BY c_nationkey""".stripMargin)) { (s, dir) =>
    Stats.tCloseness(t(s, dir, "customer"), Seq("c_nationkey"),
        "c_mktsegment", tNum = 1L, tDen = 5L)
      .orderBy("c_nationkey")
  }

  // Cohen's kappa between two heuristic quality raters (length gate vs
  // whitespace-density gate) — the standard chance-corrected agreement
  // score for auditing classifier/annotator consistency at corpus scale.
  // One fused aggregate builds the 2×2 table; kappa is four-integer
  // closed form with a single final division, replayed exactly in SQL.
  private val x135 = Q("x135_rater_kappa", Some(
    """WITH r AS (
      |  SELECT (n_chars >= 200) AS ra,
      |    (length(text) - length(replace(text, ' ', '')) >= 40) AS rb
      |  FROM documents),
      |c AS (SELECT
      |  CAST(sum(CASE WHEN ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
      |  CAST(sum(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS n_a_only,
      |  CAST(sum(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS n_b_only,
      |  CAST(sum(CASE WHEN NOT ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
      |  FROM r),
      |k AS (SELECT *, n_both + n_a_only + n_b_only + n_neither AS n,
      |  (n_both + n_a_only) * (n_both + n_b_only)
      |    + (n_b_only + n_neither) * (n_a_only + n_neither) AS pe_num
      |  FROM c)
      |SELECT n_both, n_a_only, n_b_only, n_neither,
      |  CAST(n AS BIGINT) AS n_docs,
      |  round(CAST(n * (n_both + n_neither) - pe_num AS DOUBLE)
      |    / CAST(n * n - pe_num AS DOUBLE), 6) AS kappa
      |FROM k""".stripMargin)) { (s, dir) =>
    val docs = t(s, dir, "documents")
    Stats.cohenKappa(docs,
      col("n_chars") >= 200,
      length(col("text")) - length(replace(col("text"), lit(" "), lit(""))) >= 40)
  }

  // Distributed ridge regression by normal equations — the "train a
  // linear scorer without leaving the engine" pattern: ONE fused
  // aggregate accumulates all ten X'X/X'y/y'y moments as exact decimals,
  // the 3×3 system solves in closed form by Cramer's rule (no driver
  // matrix code, no iteration, no second pass; R² from the same
  // moments). The oracle replays moments, determinants, and the weight
  // and R² assembly in the identical operation order.
  private val x138 = Q("x138_ridge_regression", Some(
    """WITH m AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS s1,
      |    CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) AS s2,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS s11,
      |    CAST(sum(CAST(l_discount * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS s22,
      |    CAST(sum(CAST(l_quantity * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS s12,
      |    CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS s1y,
      |    CAST(sum(CAST(l_discount * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS s2y,
      |    CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS syy
      |  FROM lineitem),
      |k AS (
      |  SELECT *, s11 + 100.0 AS a, s12 AS b, s1 AS c,
      |    s22 + 100.0 AS d, s2 AS e, n AS f,
      |    s1y AS p, s2y AS q, sy AS r
      |  FROM m),
      |dets AS (
      |  SELECT *,
      |    a * (d * f - e * e) - b * (b * f - e * c) + c * (b * e - d * c) AS det,
      |    p * (d * f - e * e) - b * (q * f - e * r) + c * (q * e - d * r) AS det1,
      |    a * (q * f - e * r) - p * (b * f - e * c) + c * (b * r - q * c) AS det2,
      |    a * (d * r - q * e) - b * (b * r - q * c) + p * (b * e - d * c) AS det3
      |  FROM k),
      |w AS (SELECT *, det1 / det AS w1, det2 / det AS w2, det3 / det AS w0
      |      FROM dets)
      |SELECT CAST(n AS BIGINT) AS n_rows,
      |  round(w1, 6) AS w_x1, round(w2, 6) AS w_x2, round(w0, 6) AS intercept,
      |  round(1.0 - (syy - 2.0 * (w1 * s1y + w2 * s2y + w0 * sy)
      |      + (w1 * w1 * s11 + w2 * w2 * s22 + w0 * w0 * n
      |        + 2.0 * w1 * w2 * s12 + 2.0 * w1 * w0 * s1
      |        + 2.0 * w2 * w0 * s2))
      |    / (syy - sy * sy / n), 6) AS r2
      |FROM w""".stripMargin)) { (s, dir) =>
    Stats.ridge2(t(s, dir, "lineitem"), "l_quantity", "l_discount",
      "l_extendedprice", lambda = 100.0)
  }

  // Chi-square independence test (lang × source) with Cramér's V — the
  // distribution-shift audit for a stratified corpus: is language mix
  // independent of the ingest source? Absent grid cells contribute their
  // expected mass (the margins × margins grid, not just observed cells);
  // every (O−E)²/E term is DECIMAL-quantized so the statistic is
  // order-free, and sqrt is IEEE-exact in both engines.
  private val x139 = Q("x139_chi_square", Some(
    """WITH obs AS (SELECT lang AS rk, source AS ck, count(*) AS o
      |             FROM documents GROUP BY 1, 2),
      |rt AS (SELECT rk, sum(o) AS rtot FROM obs GROUP BY 1),
      |ct AS (SELECT ck, sum(o) AS ctot FROM obs GROUP BY 1),
      |n0 AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
      |cells AS (
      |  SELECT coalesce(o.o, 0) AS oc,
      |    CAST(rt.rtot AS DOUBLE) * CAST(ct.ctot AS DOUBLE)
      |      / CAST(n0.n AS DOUBLE) AS e
      |  FROM rt CROSS JOIN ct
      |  LEFT JOIN obs o ON o.rk = rt.rk AND o.ck = ct.ck, n0),
      |s AS (SELECT count(*) AS n_cells,
      |        sum(CAST((CAST(oc AS DOUBLE) - e) * (CAST(oc AS DOUBLE) - e)
      |          / e AS DECIMAL(28,18))) AS chi2d
      |      FROM cells),
      |d AS (SELECT (SELECT count(*) FROM rt) AS nr,
      |             (SELECT count(*) FROM ct) AS nc)
      |SELECT n0.n AS n_rows, CAST(s.n_cells AS BIGINT) AS n_cells,
      |  CAST((d.nr - 1) * (d.nc - 1) AS BIGINT) AS dof,
      |  round(CAST(s.chi2d AS DOUBLE), 6) AS chi2,
      |  round(sqrt(CAST(s.chi2d AS DOUBLE)
      |    / (CAST(n0.n AS DOUBLE) * CAST(least(d.nr - 1, d.nc - 1) AS DOUBLE))), 6)
      |    AS cramers_v
      |FROM s, d, n0""".stripMargin)) { (s, dir) =>
    Stats.chiSquare(t(s, dir, "documents"), "lang", "source")
  }

  // Two-sample Kolmogorov–Smirnov distance between two sources' document
  // length distributions — exact sup-distance over integer cross-product
  // CDFs (|c_A·n_B − c_B·n_A|, no per-step division); the cumulative
  // window runs over distinct lengths, never the corpus. The oracle
  // replays the per-value counts, both running CDFs, and the integer
  // maximization.
  private val x140 = Q("x140_ks_test", Some(
    """WITH f AS (
      |  SELECT n_chars AS v,
      |    CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS a,
      |    CASE WHEN source = 'src1' THEN 1 ELSE 0 END AS b
      |  FROM documents WHERE source IN ('src0', 'src1')),
      |pv AS (SELECT v, sum(a) AS ca, sum(b) AS cb FROM f GROUP BY v),
      |cum AS (SELECT
      |    sum(ca) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
      |    sum(cb) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
      |  FROM pv),
      |tot AS (SELECT sum(ca) AS n1, sum(cb) AS n2 FROM pv)
      |SELECT CAST(tot.n1 AS BIGINT) AS n_a, CAST(tot.n2 AS BIGINT) AS n_b,
      |  CAST(max(abs(c1 * tot.n2 - c2 * tot.n1)) AS BIGINT) AS ks_num,
      |  round(CAST(max(abs(c1 * tot.n2 - c2 * tot.n1)) AS DOUBLE)
      |    / CAST(tot.n1 * tot.n2 AS DOUBLE), 6) AS ks
      |FROM cum, tot GROUP BY tot.n1, tot.n2""".stripMargin)) { (s, dir) =>
    Stats.ksTest(t(s, dir, "documents"), "n_chars", "source", "src0", "src1")
  }

  // Benford first-digit audit over order totals — the fabricated-data
  // detector: observed leading-digit shares vs log10(1 + 1/d). The digit
  // comes from the decimal STRING of floor(price) (integer-to-string is
  // engine-unambiguous where floor(log10(x)) can flip an ulp near powers
  // of ten); the observed share is one exact-integer division per digit.
  private val x141 = Q("x141_benford_audit", Some(
    """WITH c AS (
      |  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
      |      AS VARCHAR), 1, 1) AS INT) AS digit,
      |    count(*) AS n
      |  FROM orders WHERE o_totalprice >= 1.0 GROUP BY 1),
      |t AS (SELECT sum(n) AS tt FROM c)
      |SELECT CAST(digit AS BIGINT) AS digit, CAST(n AS BIGINT) AS n,
      |  round(CAST(n AS DOUBLE) / CAST(t.tt AS DOUBLE), 6) AS observed,
      |  round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford
      |FROM c, t ORDER BY digit""".stripMargin)) { (s, dir) =>
    Stats.benfordAudit(t(s, dir, "orders"), "o_totalprice")
      .orderBy("digit")
  }

  // Mann–Whitney U rank-sum (tie-corrected) between two sources' length
  // distributions — the location-shift test beside x140's KS. Average
  // ranks stay exact by accumulating 2·R_A = Σ c_A·(2·S_below + c + 1)
  // as integers over the distinct-value frame; only the z-score touches
  // doubles, in one fixed operation order the oracle replays.
  private val x142 = Q("x142_mann_whitney", Some(
    """WITH f AS (
      |  SELECT n_chars AS v,
      |    CASE WHEN source = 'src2' THEN 1 ELSE 0 END AS a
      |  FROM documents WHERE source IN ('src2', 'src3')),
      |pv AS (SELECT v, sum(a) AS ca, count(*) AS c FROM f GROUP BY v),
      |cum AS (SELECT ca, c,
      |    coalesce(sum(c) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
      |  FROM pv),
      |m AS (SELECT sum(ca * (2 * s + c + 1)) AS r2, sum(ca) AS n1,
      |        sum(c - ca) AS n2, sum(c * c * c - c) AS tsum
      |      FROM cum),
      |k AS (SELECT n1, n2, tsum, r2 - n1 * (n1 + 1) AS u2 FROM m)
      |SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
      |  CAST(u2 AS BIGINT) AS u2,
      |  round(CAST(u2 AS DOUBLE) / 2.0, 6) AS u,
      |  round((CAST(u2 AS DOUBLE) / 2.0
      |      - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
      |    / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
      |      * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0)
      |        - CAST(tsum AS DOUBLE)
      |          / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
      |            * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0)))), 6)
      |    AS z
      |FROM k""".stripMargin)) { (s, dir) =>
    Stats.mannWhitney(t(s, dir, "documents"), "n_chars", "source",
      "src2", "src3")
  }

  // Daily event-mix drift: per-day chi-square goodness-of-fit of the
  // event-type distribution against the pooled mix — x139 unrolled into
  // a monitoring time series (the drift-dashboard query). Absent
  // (day, type) cells contribute expected mass via the day × type grid.
  private val x143 = Q("x143_daily_mix_drift", Some(
    """WITH f AS (SELECT CAST(ts AS DATE) AS g, event_type AS c FROM events),
      |obs AS (SELECT g, c, count(*) AS o FROM f GROUP BY 1, 2),
      |gt AS (SELECT g, sum(o) AS gtot FROM obs GROUP BY 1),
      |ctv AS (SELECT c, sum(o) AS ctot FROM obs GROUP BY 1),
      |n0 AS (SELECT sum(o) AS n FROM obs),
      |cells AS (
      |  SELECT gt.g, coalesce(obs.o, 0) AS oc,
      |    CAST(gt.gtot AS DOUBLE) * CAST(ctv.ctot AS DOUBLE)
      |      / CAST(n0.n AS DOUBLE) AS e
      |  FROM gt CROSS JOIN ctv
      |  LEFT JOIN obs ON obs.g = gt.g AND obs.c = ctv.c, n0)
      |SELECT g AS day, CAST(sum(oc) AS BIGINT) AS n_rows,
      |  round(CAST(sum(CAST((CAST(oc AS DOUBLE) - e) * (CAST(oc AS DOUBLE) - e)
      |    / e AS DECIMAL(28,18))) AS DOUBLE), 6) AS chi2
      |FROM cells GROUP BY g ORDER BY day""".stripMargin)) { (s, dir) =>
    Stats.mixDrift(
        Tables.events(s, dir).select(to_date(col("ts")).as("day"),
          col("event_type")),
        "day", "event_type")
      .orderBy("day")
  }

  // Gini coefficient of events-per-user — the concentration audit (bot
  // detection, "is the corpus 90% one source?"). Exact closed form over
  // row_number-ranked counts; integer/DECIMAL throughout with ONE final
  // division, rank window over |users| rows only.
  private val x146 = Q("x146_gini_concentration", Some(
    """WITH c AS (SELECT user_id AS k, count(*) AS x
      |           FROM events GROUP BY 1),
      |r AS (SELECT x, row_number() OVER (ORDER BY x, k) AS t FROM c),
      |m AS (SELECT count(*) AS n, sum(x) AS sx, sum(t * x) AS stx FROM r)
      |SELECT CAST(n AS BIGINT) AS n_keys, CAST(sx AS BIGINT) AS total,
      |  round(CAST(2 * stx - (n + 1) * sx AS DOUBLE)
      |    / CAST(n * sx AS DOUBLE), 6) AS gini
      |FROM m""".stripMargin)) { (s, dir) =>
    graft.operators.Stats.giniConcentration(
      Tables.events(s, dir).select("user_id"), "user_id")
  }

  /** DuckDB twin of Dedup.words (lowercased alphanumeric tokens). */
  private val WORDS =
    """list_filter(string_split_regex(regexp_replace(lower(text),
      |  '[^a-z0-9]+', ' ', 'g'), ' '), x -> x <> '')""".stripMargin

  // Threshold-free grade of a document scorer: AUC/Gini/KS of "n_chars
  // ranks docs that contain the token 'dup'" (longer docs draw more
  // tokens, so length genuinely ranks the label — a nontrivial mid-range
  // AUC). Tie-corrected rank sums over the DISTINCT-score frame; every
  // rank product stays integer until one final double division per
  // statistic, so the gate is exact.
  private val x186 = Q("x186_classifier_auc", Some(
    s"""WITH f AS (
       |  SELECT n_chars AS v,
       |    CASE WHEN list_contains($WORDS, 'dup') THEN 1 ELSE 0 END AS y
       |  FROM documents),
       |pv AS (SELECT v, sum(y) AS cp, count(*) AS c FROM f GROUP BY v),
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
    Stats.binaryAuc(t(s, dir, "documents"), "n_chars",
      array_contains(graft.operators.Dedup.words(col("text")), "dup"))
  }

  // Reliability diagram + ECE for a probabilistic scorer. The probability
  // squash is RATIONAL (p = n/(n+150)) rather than a sigmoid: IEEE
  // division is identically rounded in both engines, so bin assignment
  // (floor(p·10)) can never flip on a libm ULP the way exp() could.
  private val x187 = Q("x187_calibration_ece", Some(
    s"""WITH f AS (
       |  SELECT CAST(n_chars AS DOUBLE)
       |      / (CAST(n_chars AS DOUBLE) + 150.0) AS p,
       |    CASE WHEN list_contains($WORDS, 'dup') THEN 1 ELSE 0 END AS y
       |  FROM documents),
       |b AS (SELECT CAST(least(floor(p * 10), 9) AS BIGINT) AS bin, p, y
       |      FROM f),
       |pb AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(y) AS BIGINT) AS n_pos,
       |        sum(CAST(p AS DECIMAL(28,18))) AS sp
       |       FROM b GROUP BY bin),
       |tot AS (SELECT sum(abs(sp - n_pos)) AS es, sum(n) AS nn FROM pb)
       |SELECT bin, n, n_pos,
       |  round(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE), 6) AS conf,
       |  round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS acc,
       |  round(abs(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE)
       |    - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS gap,
       |  round(CAST(t.es AS DOUBLE) / CAST(t.nn AS DOUBLE), 6) AS ece
       |FROM pb, tot t ORDER BY bin""".stripMargin)) { (s, dir) =>
    val docs = t(s, dir, "documents")
    Stats.calibration(docs,
      col("n_chars").cast("double") /
        (col("n_chars").cast("double") + lit(150.0)),
      array_contains(graft.operators.Dedup.words(col("text")), "dup"),
      bins = 10)
  }

  // Step-wise average precision at distinct-score thresholds (descending)
  // — x186's PR-side companion; ΔR·P terms from exact integer products,
  // DECIMAL-quantized before the sum. base_rate rides along as the
  // random-classifier AP.
  private val x192 = Q("x192_avg_precision", Some(
    s"""WITH f AS (
       |  SELECT n_chars AS v,
       |    CASE WHEN list_contains($WORDS, 'dup') THEN 1 ELSE 0 END AS y
       |  FROM documents),
       |pv AS (SELECT v, sum(y) AS cp, count(*) AS c FROM f GROUP BY v),
       |cum AS (SELECT cp, c,
       |    sum(cp) OVER (ORDER BY v DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
       |    sum(c) OVER (ORDER BY v DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nn,
       |    sum(cp) OVER () AS n1, sum(c - cp) OVER () AS n0
       |  FROM pv),
       |m AS (SELECT max(n1) AS n1, max(n0) AS n0,
       |        sum(CAST(CAST(cp * tp AS DOUBLE)
       |          / CAST(n1 * nn AS DOUBLE) AS DECIMAL(28,18))) AS ap
       |      FROM cum)
       |SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(n0 AS BIGINT) AS n_neg,
       |  round(CAST(ap AS DOUBLE), 6) AS ap,
       |  round(CAST(n1 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE), 6)
       |    AS base_rate
       |FROM m""".stripMargin)) { (s, dir) =>
    Stats.averagePrecision(t(s, dir, "documents"), "n_chars",
      array_contains(graft.operators.Dedup.words(col("text")), "dup"))
  }

  // Decile gains/lift table with GROUP-ATOMIC buckets (tied scores never
  // split, assignment on the distinct-score frame — scale-safe AND
  // deterministic without a within-tie order). Cumulative lift/capture
  // from exact integer products.
  private val x193 = Q("x193_gains_table", Some(
    s"""WITH f AS (
       |  SELECT n_chars AS v,
       |    CASE WHEN list_contains($WORDS, 'dup') THEN 1 ELSE 0 END AS y
       |  FROM documents),
       |pv AS (SELECT v, sum(y) AS cp, count(*) AS c FROM f GROUP BY v),
       |cum AS (SELECT cp, c,
       |    coalesce(sum(c) OVER (ORDER BY v DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s,
       |    sum(c) OVER () AS nt, sum(cp) OVER () AS n1
       |  FROM pv),
       |bk AS (SELECT CAST((CAST(s AS HUGEINT) * 10) // nt AS BIGINT)
       |         AS bucket, cp, c, nt, n1
       |       FROM cum),
       |pb AS (SELECT bucket, sum(c) AS n, sum(cp) AS n_pos,
       |         max(nt) AS nt, max(n1) AS n1
       |       FROM bk GROUP BY bucket),
       |wc AS (SELECT bucket, n, n_pos,
       |    sum(n) OVER (ORDER BY bucket
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
       |    sum(n_pos) OVER (ORDER BY bucket
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
       |    nt, n1 FROM pb)
       |SELECT bucket, CAST(n AS BIGINT) AS n,
       |  CAST(n_pos AS BIGINT) AS n_pos, CAST(cum_n AS BIGINT) AS cum_n,
       |  CAST(cum_pos AS BIGINT) AS cum_pos,
       |  round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
       |  round(CAST(cum_pos * nt AS DOUBLE)
       |    / CAST(cum_n * n1 AS DOUBLE), 6) AS cum_lift,
       |  round(CAST(cum_pos AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS capture
       |FROM wc ORDER BY bucket""".stripMargin)) { (s, dir) =>
    Stats.gainsTable(t(s, dir, "documents"), "n_chars",
      array_contains(graft.operators.Dedup.words(col("text")), "dup"),
      buckets = 10)
  }

  // Per-slice AUC/Gini/KS (x186 partitioned by source) — the scorer-drift
  // view; every window is hash-partitioned by the slice key, so this is
  // the shape that scales (nothing moves to one partition).
  private val x196 = Q("x196_auc_by_source", Some(
    s"""WITH f AS (
       |  SELECT source, n_chars AS v,
       |    CASE WHEN list_contains($WORDS, 'dup') THEN 1 ELSE 0 END AS y
       |  FROM documents),
       |pv AS (SELECT source, v, sum(y) AS cp, count(*) AS c
       |       FROM f GROUP BY source, v),
       |cum AS (SELECT source, cp, c,
       |    coalesce(sum(c) OVER (PARTITION BY source ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s,
       |    sum(cp) OVER (PARTITION BY source ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
       |    sum(c - cp) OVER (PARTITION BY source ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gg,
       |    sum(cp) OVER (PARTITION BY source) AS n1t,
       |    sum(c - cp) OVER (PARTITION BY source) AS n0t
       |  FROM pv),
       |m AS (SELECT source, sum(cp * (2 * s + c + 1)) AS r2, sum(cp) AS n1,
       |        sum(c - cp) AS n0,
       |        max(abs(p * n0t - gg * n1t)) AS ksnum
       |      FROM cum GROUP BY source)
       |SELECT source, CAST(n1 AS BIGINT) AS n_pos,
       |  CAST(n0 AS BIGINT) AS n_neg,
       |  CAST(r2 - n1 * (n1 + 1) AS BIGINT) AS u2,
       |  round(CAST(r2 - n1 * (n1 + 1) AS DOUBLE)
       |    / (2.0 * CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)), 6) AS auc,
       |  round(CAST(r2 - n1 * (n1 + 1) AS DOUBLE)
       |    / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)) - 1.0, 6) AS gini,
       |  round(CAST(ksnum AS DOUBLE)
       |    / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)), 6) AS ks
       |FROM m ORDER BY source""".stripMargin)) { (s, dir) =>
    Stats.binaryAucBy(t(s, dir, "documents"), "source", "n_chars",
      array_contains(graft.operators.Dedup.words(col("text")), "dup"))
  }

  // Cross-source quantile alignment (batch-effect correction table):
  // per-source p25/p50/p75 of doc length next to the pooled reference
  // curve (mean of group quantiles) and the per-source median drift.
  // Quantiles replay via quantile_cont (the x110 parity); the reference
  // is a decimal-quantized mean over the ≤|groups|-row frame.
  private val x200 = Q("x200_quantile_normalize", Some(
    """WITH g AS (
      |  SELECT source, round(quantile_cont(n_chars, 0.25), 4) AS p25,
      |    round(quantile_cont(n_chars, 0.50), 4) AS p50,
      |    round(quantile_cont(n_chars, 0.75), 4) AS p75,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM documents GROUP BY source)
      |SELECT source, p25, p50, p75, n,
      |  round(CAST(sum(CAST(p25 AS DECIMAL(28,14))) OVER () AS DOUBLE)
      |    / CAST(count(*) OVER () AS DOUBLE), 4) AS ref_p25,
      |  round(CAST(sum(CAST(p50 AS DECIMAL(28,14))) OVER () AS DOUBLE)
      |    / CAST(count(*) OVER () AS DOUBLE), 4) AS ref_p50,
      |  round(CAST(sum(CAST(p75 AS DECIMAL(28,14))) OVER () AS DOUBLE)
      |    / CAST(count(*) OVER () AS DOUBLE), 4) AS ref_p75,
      |  round(p50 - round(CAST(sum(CAST(p50 AS DECIMAL(28,14))) OVER ()
      |      AS DOUBLE) / CAST(count(*) OVER () AS DOUBLE), 4), 4)
      |    AS delta_p50
      |FROM g ORDER BY source""".stripMargin)) { (s, dir) =>
    Stats.quantileNormalize(t(s, dir, "documents"), "source", "n_chars",
      Seq(0.25, 0.5, 0.75))
  }

  // Simplified (centroid-based) silhouette of the label partition over the
  // embedding corpus — "are the classes geometrically coherent": per class
  // the mean s = (b−a)/max(a,b) against centroid distances, plus the
  // count of points strictly closer to a foreign centroid. O(n·d·k), no
  // pairwise pass. The oracle replays explode → quantized centroids → the
  // all-centroid distance join → exact-DECIMAL a/b min → the fixed double
  // op sequence.
  private val x205 = Q("x205_silhouette", Some(
    """WITH f AS (SELECT vec_id AS id, CAST(label AS BIGINT) AS cell,
      |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |dims AS (SELECT max(len(v)) AS d FROM f),
      |ex AS MATERIALIZED (
      |  SELECT id, cell, r.i::BIGINT AS i, v[r.i] AS x
      |  FROM f CROSS JOIN dims CROSS JOIN unnest(range(1, d + 1)) AS r(i)),
      |cents AS MATERIALIZED (
      |  SELECT cell AS c2, i, CAST(sum(CAST(x AS DECIMAL(28,18))) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS cv
      |  FROM ex GROUP BY cell, i),
      |d2 AS MATERIALIZED (
      |  SELECT ex.id, ex.cell, c.c2,
      |    sum(CAST((ex.x - c.cv) * (ex.x - c.cv) AS DECIMAL(28,18))) AS d2
      |  FROM ex JOIN cents c USING (i) GROUP BY ex.id, ex.cell, c.c2),
      |ab AS (SELECT id, cell,
      |    min(CASE WHEN c2 = cell THEN d2 END) AS a2,
      |    min(CASE WHEN c2 <> cell THEN d2 END) AS b2
      |  FROM d2 GROUP BY id, cell),
      |sv AS (SELECT id, cell, b2 < a2 AS mis,
      |    CASE WHEN b2 IS NULL THEN NULL
      |         WHEN greatest(sqrt(CAST(a2 AS DOUBLE)),
      |           sqrt(CAST(b2 AS DOUBLE))) = 0.0 THEN 0.0
      |         ELSE (sqrt(CAST(b2 AS DOUBLE)) - sqrt(CAST(a2 AS DOUBLE)))
      |           / greatest(sqrt(CAST(a2 AS DOUBLE)),
      |               sqrt(CAST(b2 AS DOUBLE))) END AS s
      |  FROM ab)
      |SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors,
      |  round(CAST(sum(CAST(s AS DECIMAL(28,18))) AS DOUBLE)
      |    / CAST(count(s) AS DOUBLE), 6) AS mean_silhouette,
      |  CAST(sum(CASE WHEN mis THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_misassigned
      |FROM sv GROUP BY cell ORDER BY cell""".stripMargin)) { (s, dir) =>
    Stats.simplifiedSilhouette(t(s, dir, "embeddings"), "vec_id", "label",
      "embedding")
  }

  // Operating-point selection: sweep every distinct score as a
  // "positive when score ≥ v" threshold, return the F1-optimal row with
  // the full confusion matrix + precision/recall/F1/accuracy/MCC.
  // Integer confusion counts from the descending prefix sums; metric
  // doubles are single fixed-order divisions, the argmax breaks F1 ties
  // on the larger (stricter) threshold — the oracle replays all of it.
  private val x213 = Q("x213_best_threshold", Some(
    s"""WITH f AS (
       |  SELECT n_chars AS v,
       |    CASE WHEN list_contains($WORDS, 'dup') THEN 1 ELSE 0 END AS y
       |  FROM documents),
       |pv AS (SELECT v, sum(y) AS cp, count(*) AS c FROM f GROUP BY v),
       |cum AS (SELECT v,
       |    sum(cp) OVER (ORDER BY v DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
       |    sum(c - cp) OVER (ORDER BY v DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
       |    sum(cp) OVER () AS n1, sum(c - cp) OVER () AS n0
       |  FROM pv),
       |m AS (SELECT v, tp, fp, n1 - tp AS fn, n0 - fp AS tn, n1, n0,
       |    2.0 * CAST(tp AS DOUBLE)
       |      / (2.0 * CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)
       |        + CAST(n1 - tp AS DOUBLE)) AS f1
       |  FROM cum)
       |SELECT v AS threshold, CAST(tp AS BIGINT) AS tp,
       |  CAST(fp AS BIGINT) AS fp, CAST(tn AS BIGINT) AS tn,
       |  CAST(fn AS BIGINT) AS fn,
       |  round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6)
       |    AS "precision",
       |  round(CAST(tp AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS recall,
       |  round(f1, 6) AS f1,
       |  round(CAST(tp + tn AS DOUBLE) / CAST(n1 + n0 AS DOUBLE), 6)
       |    AS accuracy,
       |  round(CAST(tp * tn - fp * fn AS DOUBLE)
       |    / sqrt(CAST(tp + fp AS DOUBLE) * CAST(n1 AS DOUBLE)
       |      * CAST(tn + fn AS DOUBLE) * CAST(n0 AS DOUBLE)), 6) AS mcc
       |FROM m ORDER BY f1 DESC, v DESC LIMIT 1""".stripMargin)) {
    (s, dir) =>
      Stats.bestThreshold(t(s, dir, "documents"), "n_chars",
        array_contains(graft.operators.Dedup.words(col("text")), "dup"))
  }

  // Histogram-binning recalibration: per-bin empirical rates learned on
  // the doc_id%4=0 calibration split, applied to the rest; corpus Brier
  // before vs after rides along. The rational p = n/(n+150) squash keeps
  // bin assignment libm-free (the x187 discipline); Brier terms are
  // per-row DECIMAL-quantized.
  private val x214 = Q("x214_recalibrate", Some(
    s"""WITH f AS (
       |  SELECT doc_id, CAST(n_chars AS DOUBLE)
       |      / (CAST(n_chars AS DOUBLE) + 150.0) AS p,
       |    CASE WHEN list_contains($WORDS, 'dup') THEN 1 ELSE 0 END AS y
       |  FROM documents),
       |cb AS (SELECT CAST(least(floor(p * 10), 9) AS BIGINT) AS bin, p, y
       |       FROM f WHERE doc_id % 4 = 0),
       |tb AS (SELECT CAST(least(floor(p * 10), 9) AS BIGINT) AS bin, p, y
       |       FROM f WHERE doc_id % 4 != 0),
       |cr AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_cal,
       |        CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS rate_cal
       |       FROM cb GROUP BY bin),
       |cg AS (SELECT CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS gr
       |       FROM cb),
       |tj AS (SELECT t.bin, t.p, t.y, cr.n_cal, cr.rate_cal,
       |        coalesce(cr.rate_cal, cg.gr) AS pc
       |       FROM tb t LEFT JOIN cr USING (bin), cg),
       |pb AS (SELECT bin, coalesce(max(n_cal), 0) AS n_cal,
       |        max(rate_cal) AS rc, CAST(count(*) AS BIGINT) AS n_tgt,
       |        CAST(sum(y) AS BIGINT) AS pos_tgt,
       |        sum(CAST((p - y) * (p - y) AS DECIMAL(28,18))) AS sbr,
       |        sum(CAST((pc - y) * (pc - y) AS DECIMAL(28,18))) AS sbc
       |       FROM tj GROUP BY bin),
       |tt AS (SELECT sum(sbr) AS tbr, sum(sbc) AS tbc, sum(n_tgt) AS nn
       |       FROM pb)
       |SELECT bin, n_cal, round(rc, 6) AS rate_cal, n_tgt, pos_tgt,
       |  round(CAST(pos_tgt AS DOUBLE) / CAST(n_tgt AS DOUBLE), 6)
       |    AS rate_tgt,
       |  round(CAST(tbr AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS brier_raw,
       |  round(CAST(tbc AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS brier_cal
       |FROM pb, tt ORDER BY bin""".stripMargin)) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val prob = col("n_chars").cast("double") /
      (col("n_chars").cast("double") + lit(150.0))
    val label = array_contains(graft.operators.Dedup.words(col("text")),
      "dup")
    Stats.recalibrate(docs.filter(col("doc_id") % 4 =!= 0),
      docs.filter(col("doc_id") % 4 === 0), prob, label, bins = 10)
  }

  // Spearman ρ between the char-length and token-count scorers —
  // tie-corrected average ranks via DOUBLED ranks (2s+c+1, exact Longs),
  // five exact DECIMAL moments, ONE closed-form double pass. The oracle
  // replays the distinct-value rank maps, the rank joins, and the fixed
  // operation order.
  private val x215 = Q("x215_spearman_rho", Some(
    s"""WITH f AS (SELECT n_chars AS a, len($WORDS) AS b FROM documents),
       |pa AS (SELECT a AS v, count(*) AS c FROM f GROUP BY a),
       |qa AS (SELECT v, 2 * coalesce(sum(c) OVER (ORDER BY v
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1
       |    AS r FROM pa),
       |pb AS (SELECT b AS v, count(*) AS c FROM f GROUP BY b),
       |qb AS (SELECT v, 2 * coalesce(sum(c) OVER (ORDER BY v
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1
       |    AS r FROM pb),
       |j AS (SELECT qa.r AS ra, qb.r AS rb
       |      FROM f JOIN qa ON f.a = qa.v JOIN qb ON f.b = qb.v),
       |m AS (SELECT count(*) AS n, sum(ra) AS sa, sum(rb) AS sb,
       |        sum(ra * ra) AS saa, sum(rb * rb) AS sbb,
       |        sum(ra * rb) AS sab
       |      FROM j)
       |SELECT CAST(n AS BIGINT) AS n,
       |  round((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
       |      - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
       |    / (sqrt(CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
       |        - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
       |      * sqrt(CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
       |        - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 6) AS rho
       |FROM m""".stripMargin)) { (s, dir) =>
    Stats.spearmanRho(
      t(s, dir, "documents").select(col("n_chars"),
        size(graft.operators.Dedup.words(col("text"))).cast("long")
          .as("n_tok")),
      "n_chars", "n_tok")
  }

  // PSI drift of the doc-length distribution, every source vs the src0
  // baseline: equal-width bins over [0, 600), Laplace-smoothed shares so
  // zero bins carry finite symmetric mass, ln terms DECIMAL-quantized
  // pre-sum. The oracle replays the clamp, the materialized zero-count
  // grid, the smoothing, and the quantization.
  private val x216 = Q("x216_psi_drift", Some(
    """WITH b AS (SELECT source AS g,
      |    CAST(least(greatest(floor((CAST(n_chars AS DOUBLE) - 0.0)
      |      / 600.0 * 12), 0), 11) AS BIGINT) AS bin
      |  FROM documents),
      |cnt AS (SELECT g, bin, count(*) AS c FROM b GROUP BY 1, 2),
      |grid AS (SELECT g, r.range AS bin
      |         FROM (SELECT DISTINCT g FROM cnt), range(0, 12) r),
      |fl AS (SELECT grid.g, grid.bin, coalesce(cnt.c, 0) AS c
      |       FROM grid LEFT JOIN cnt USING (g, bin)),
      |tot AS (SELECT g, sum(c) AS n FROM fl GROUP BY g),
      |sh AS (SELECT fl.g, fl.bin, tot.n,
      |        CAST(c + 1 AS DOUBLE) / CAST(n + 12 AS DOUBLE) AS s
      |       FROM fl JOIN tot USING (g)),
      |base AS (SELECT bin, s AS q FROM sh WHERE g = 'src0'),
      |tm AS (SELECT g, n,
      |        CAST((s - q) * ln(s / q) AS DECIMAL(28,18)) AS term
      |       FROM sh JOIN base USING (bin) WHERE g <> 'src0')
      |SELECT g AS source, CAST(max(n) AS BIGINT) AS n,
      |  round(CAST(sum(term) AS DOUBLE), 6) AS psi
      |FROM tm GROUP BY g ORDER BY source""".stripMargin)) { (s, dir) =>
    Stats.psiByGroup(t(s, dir, "documents"), "source", "n_chars",
      baseline = "src0", bins = 12, lo = 0.0, hi = 600.0)
  }

  // Vocabulary coverage curve (tokenizer sizing): corpus token mass
  // covered by the top-V frequency-ranked vocabulary at V ∈ {4, 8, 16,
  // 32} (the fixture vocabulary is 31 tokens, so the curve saturates at
  // the last step). Ranking is frequency-desc with token tie-break
  // (unique tuple — deterministic cross-engine); masses are exact
  // integer sums.
  private val x219 = Q("x219_vocab_coverage", Some(
    s"""WITH tk AS (
       |  SELECT u.w AS token
       |  FROM (SELECT $WORDS AS ws FROM documents), unnest(ws) AS u(w)),
       |fr AS (SELECT token, count(*) AS cnt FROM tk GROUP BY token),
       |rk AS (SELECT token, cnt,
       |        row_number() OVER (ORDER BY cnt DESC, token) AS r
       |       FROM fr),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
       |         CAST(count(*) AS BIGINT) AS nv
       |        FROM fr),
       |sz AS (SELECT unnest([4, 8, 16, 32]) AS vocab_size),
       |cov AS (SELECT vocab_size, CAST(sum(cnt) AS BIGINT) AS covered
       |        FROM rk JOIN sz ON rk.r <= sz.vocab_size
       |        GROUP BY vocab_size)
       |SELECT CAST(vocab_size AS BIGINT) AS vocab_size, nv AS n_vocab,
       |  total AS total_tokens, covered,
       |  round(CAST(covered AS DOUBLE) / CAST(total AS DOUBLE), 6)
       |    AS coverage
       |FROM cov, tot ORDER BY vocab_size""".stripMargin)) { (s, dir) =>
    graft.functions.TextAnalysis.vocabCoverage(t(s, dir, "documents"),
      "text", Seq(4, 8, 16, 32))
  }

  // Half-sample bootstrap band around the x186 AUC: 8 deterministic
  // md5-gated replicates, tie-corrected rank AUC per replicate, and the
  // mean/min/max across them. The oracle replays the md5 membership, the
  // per-replicate rank sums (PARTITION BY replicate), and the
  // decimal-quantized band mean.
  private val x220 = Q("x220_bootstrap_auc", Some(
    s"""WITH f AS (
       |  SELECT doc_id AS id, n_chars AS v,
       |    CASE WHEN list_contains($WORDS, 'dup') THEN 1 ELSE 0 END AS y
       |  FROM documents),
       |r AS (SELECT t.b, f.v, f.y
       |      FROM f, range(0, 8) t(b)
       |      WHERE ('0x' || substring(md5(f.id::VARCHAR || ':'
       |        || t.b::VARCHAR), 1, 8))::BIGINT % 2 = 0),
       |pv AS (SELECT b, v, sum(y) AS cp, count(*) AS c FROM r
       |       GROUP BY b, v),
       |cum AS (SELECT b, cp, c,
       |    coalesce(sum(c) OVER (PARTITION BY b ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
       |  FROM pv),
       |m AS (SELECT b, sum(cp * (2 * s + c + 1)) AS r2, sum(cp) AS n1,
       |        sum(c - cp) AS n0
       |      FROM cum GROUP BY b),
       |a AS (SELECT b,
       |        CASE WHEN n1 = 0 OR n0 = 0 THEN NULL
       |          ELSE round(CAST(r2 - n1 * (n1 + 1) AS DOUBLE)
       |            / (2.0 * CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)), 6)
       |        END AS auc
       |      FROM m)
       |SELECT CAST(count(*) AS BIGINT) AS n_replicates,
       |  CAST(count(auc) AS BIGINT) AS n_valid,
       |  round(CAST(sum(CAST(auc AS DECIMAL(28,18))) AS DOUBLE)
       |    / CAST(count(auc) AS DOUBLE), 6) AS auc_mean,
       |  min(auc) AS auc_min, max(auc) AS auc_max
       |FROM a""".stripMargin)) { (s, dir) =>
    Stats.bootstrapAuc(t(s, dir, "documents"), "doc_id", "n_chars",
      array_contains(graft.operators.Dedup.words(col("text")), "dup"),
      replicates = 8)
  }

  // Calibration drift per source (x187 sliced the way x196 slices AUC):
  // one reliability diagram + ECE per source, every window partitioned
  // by the slice key. A scorer over-confident on one source shows as
  // that slice's gap/ece, invisible in the pooled diagram.
  private val x222 = Q("x222_calibration_by_source", Some(
    s"""WITH f AS (
       |  SELECT source, CAST(n_chars AS DOUBLE)
       |      / (CAST(n_chars AS DOUBLE) + 150.0) AS p,
       |    CASE WHEN list_contains($WORDS, 'dup') THEN 1 ELSE 0 END AS y
       |  FROM documents),
       |b AS (SELECT source, CAST(least(floor(p * 10), 9) AS BIGINT) AS bin,
       |        p, y
       |      FROM f),
       |pb AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(y) AS BIGINT) AS n_pos,
       |        sum(CAST(p AS DECIMAL(28,18))) AS sp
       |       FROM b GROUP BY source, bin),
       |tot AS (SELECT source, sum(abs(sp - n_pos)) AS es, sum(n) AS nn
       |        FROM pb GROUP BY source)
       |SELECT pb.source, bin, n, n_pos,
       |  round(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE), 6) AS conf,
       |  round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS acc,
       |  round(abs(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE)
       |    - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS gap,
       |  round(CAST(t.es AS DOUBLE) / CAST(t.nn AS DOUBLE), 6) AS ece
       |FROM pb JOIN tot t USING (source)
       |ORDER BY source, bin""".stripMargin)) { (s, dir) =>
    Stats.calibrationBy(t(s, dir, "documents"), "source",
      col("n_chars").cast("double") /
        (col("n_chars").cast("double") + lit(150.0)),
      array_contains(graft.operators.Dedup.words(col("text")), "dup"),
      bins = 10)
  }

  // Tokenizer fertility per language: subwords per whitespace word from
  // integer-exact per-group sums — the per-language context-budget cost
  // that drives vocab allocation. The oracle replays the x7 subword twin
  // (alphanumeric runs + standalone punctuation).
  private val x223 = Q("x223_tokenizer_fertility", Some(
    s"""WITH f AS (
       |  SELECT lang, len($WORDS) AS tk,
       |    len(regexp_extract_all(text, '[A-Za-z0-9]+')) +
       |    len(regexp_extract_all(text, '[^A-Za-z0-9 \\t\\n]')) AS sw
       |  FROM documents)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(tk) AS BIGINT) AS n_tokens,
       |  CAST(sum(sw) AS BIGINT) AS n_subwords,
       |  round(CAST(sum(sw) AS DOUBLE) / CAST(sum(tk) AS DOUBLE), 6)
       |    AS fertility,
       |  round(CAST(sum(tk) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
       |    AS tokens_per_doc
       |FROM f GROUP BY lang ORDER BY lang""".stripMargin)) { (s, dir) =>
    graft.functions.TextAnalysis.tokenizerFertility(
      t(s, dir, "documents"), "lang", "text")
  }

  // Weight-of-evidence table + information value of doc length against
  // the 'dup' label — psi's within-population sibling: per-bin WoE from
  // Laplace-smoothed class shares over the materialized bin grid, IV as
  // the decimal-quantized term sum. Feature-triage in one number.
  private val x225 = Q("x225_information_value", Some(
    s"""WITH b AS (
       |  SELECT CAST(least(greatest(floor((CAST(n_chars AS DOUBLE) - 0.0)
       |      / 600.0 * 12), 0), 11) AS BIGINT) AS bin,
       |    CASE WHEN list_contains($WORDS, 'dup') THEN 1 ELSE 0 END AS y
       |  FROM documents),
       |cnt AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(y) AS BIGINT) AS n_pos
       |        FROM b GROUP BY bin),
       |grid AS (SELECT r.range AS bin FROM range(0, 12) r),
       |fl AS (SELECT grid.bin, coalesce(cnt.n, 0) AS n,
       |        coalesce(cnt.n_pos, 0) AS n_pos,
       |        coalesce(cnt.n, 0) - coalesce(cnt.n_pos, 0) AS n_neg
       |       FROM grid LEFT JOIN cnt USING (bin)),
       |sh AS (SELECT bin, n, n_pos, n_neg,
       |        CAST(n_pos + 1 AS DOUBLE)
       |          / CAST((SELECT sum(n_pos) FROM fl) + 12 AS DOUBLE) AS pp,
       |        CAST(n_neg + 1 AS DOUBLE)
       |          / CAST((SELECT sum(n_neg) FROM fl) + 12 AS DOUBLE) AS pn
       |       FROM fl),
       |tm AS (SELECT bin, n, n_pos, n_neg, ln(pp / pn) AS woe,
       |        CAST((pp - pn) * ln(pp / pn) AS DECIMAL(28,18)) AS term
       |       FROM sh)
       |SELECT bin, n, n_pos, n_neg, round(woe, 6) AS woe,
       |  round(CAST((SELECT sum(term) FROM tm) AS DOUBLE), 6) AS iv
       |FROM tm ORDER BY bin""".stripMargin)) { (s, dir) =>
    Stats.informationValue(t(s, dir, "documents"), "n_chars",
      array_contains(graft.operators.Dedup.words(col("text")), "dup"),
      bins = 12, lo = 0.0, hi = 600.0)
  }

  // Padding-waste table for length-bucketed batching: docs bucket by
  // token count against (32, 64, 96), each bucket pads to its own max —
  // the batching-efficiency complement of x38's packing. Integer-exact
  // counts, one double ratio.
  private val x227 = Q("x227_padding_waste", Some(
    s"""WITH f AS (SELECT len($WORDS) AS l FROM documents),
       |b AS (SELECT l,
       |        (CASE WHEN l >= 32 THEN 1 ELSE 0 END
       |         + CASE WHEN l >= 64 THEN 1 ELSE 0 END
       |         + CASE WHEN l >= 96 THEN 1 ELSE 0 END) AS bucket
       |      FROM f)
       |SELECT CAST(bucket AS BIGINT) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(max(l) AS BIGINT) AS max_len,
       |  CAST(sum(l) AS BIGINT) AS sum_len,
       |  CAST(count(*) * max(l) AS BIGINT) AS padded,
       |  round(CAST(count(*) * max(l) - sum(l) AS DOUBLE)
       |    / CAST(count(*) * max(l) AS DOUBLE), 6) AS waste_pct
       |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin)) { (s, dir) =>
    graft.functions.TextAnalysis.paddingWaste(t(s, dir, "documents"),
      "text", Seq(32, 64, 96))
  }

  // CUPED-adjusted A/B read of per-user activity: pre-period (first 15
  // days) event counts as the covariate, post-period counts as the
  // metric, arms by user parity. Everything closed-form from one
  // per-arm aggregate of exact integer moments — the oracle replays the
  // user rollup, the pooled θ = Cov/Var, the per-arm adjusted means,
  // and the variance-reduction ratio in the same operation order.
  private val x228 = Q("x228_cuped_adjust", Some(
    """WITH u AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS y
      |  FROM events GROUP BY user_id),
      |a AS (SELECT user_id % 2 AS arm, x, y FROM u),
      |m AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
      |        sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
      |        sum(x * y) AS sxy, sum(y * y) AS syy
      |      FROM a GROUP BY arm),
      |p AS (SELECT arm, n, sx, sy,
      |        CAST(sum(n) OVER () AS DOUBLE) AS tn,
      |        CAST(sum(sx) OVER () AS DOUBLE) AS tx,
      |        CAST(sum(sy) OVER () AS DOUBLE) AS ty,
      |        CAST(sum(sxx) OVER () AS DOUBLE) AS txx,
      |        CAST(sum(sxy) OVER () AS DOUBLE) AS txy,
      |        CAST(sum(syy) OVER () AS DOUBLE) AS tyy
      |      FROM m),
      |d AS (SELECT arm, n, sx, sy, tx / tn AS mx,
      |        txx / tn - (tx / tn) * (tx / tn) AS varx,
      |        txy / tn - (tx / tn) * (ty / tn) AS cov,
      |        tyy / tn - (ty / tn) * (ty / tn) AS vary
      |      FROM p),
      |e AS (SELECT arm, n, sx, sy, mx, varx, cov, vary,
      |        CASE WHEN varx = 0.0 THEN NULL ELSE cov / varx END AS theta
      |      FROM d)
      |SELECT arm, n,
      |  round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_post,
      |  round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
      |    - theta * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) - mx), 6)
      |    AS mean_adj,
      |  round(theta, 6) AS theta,
      |  CASE WHEN vary = 0.0 THEN NULL
      |       ELSE round((cov * cov / varx) / vary, 6) END
      |    AS var_reduction
      |FROM e ORDER BY arm""".stripMargin)) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
    val users = ev.groupBy(col("user_id"))
      .agg(sum(when(col("ts") < cutoff, 1L).otherwise(0L)).as("pre"),
        sum(when(col("ts") >= cutoff, 1L).otherwise(0L)).as("post"))
      .withColumn("arm", col("user_id") % 2)
    Stats.cupedAdjust(users, "arm", "pre", "post")
  }

  // Welch's t on the post-period per-user activity by arm — x228's
  // significance companion (x158 covers proportions; this covers
  // unequal-variance means). t and the Welch–Satterthwaite df are exact
  // closed forms from integer moments; no p-value by design (t CDF is
  // libm-unstable cross-engine).
  private val x229 = Q("x229_welch_t", Some(
    """WITH u AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS y
      |  FROM events GROUP BY user_id),
      |a AS (SELECT user_id % 2 AS arm, y FROM u),
      |m AS (SELECT arm, CAST(count(*) AS BIGINT) AS n, sum(y) AS s,
      |        sum(y * y) AS ss
      |      FROM a GROUP BY arm),
      |d AS (SELECT arm, n, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
      |        (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
      |          / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS var
      |      FROM m),
      |lo AS (SELECT arm AS arm0, n AS n0, mean AS m0, var AS v0 FROM d
      |       ORDER BY arm LIMIT 1),
      |hi AS (SELECT arm AS arm1, n AS n1, mean AS m1, var AS v1 FROM d
      |       ORDER BY arm DESC LIMIT 1),
      |na AS (SELECT CAST(count(*) AS BIGINT) AS n_arms FROM m),
      |j AS (SELECT n_arms, arm0, arm1, n0, n1, m0, m1,
      |        v0 / CAST(n0 AS DOUBLE) AS se0,
      |        v1 / CAST(n1 AS DOUBLE) AS se1
      |      FROM lo, hi, na)
      |SELECT n_arms, arm0, arm1, n0, n1, round(m0, 6) AS mean0,
      |  round(m1, 6) AS mean1,
      |  CASE WHEN n_arms = 2 THEN round(m1 - m0, 6) END AS diff,
      |  CASE WHEN n_arms = 2
      |    THEN round((m1 - m0) / sqrt(se0 + se1), 6) END AS t,
      |  CASE WHEN n_arms = 2 THEN round(((se0 + se1) * (se0 + se1))
      |    / (se0 * se0 / (CAST(n0 AS DOUBLE) - 1.0)
      |      + se1 * se1 / (CAST(n1 AS DOUBLE) - 1.0)), 6) END AS df_welch
      |FROM j""".stripMargin)) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
    val users = ev.groupBy(col("user_id"))
      .agg(sum(when(col("ts") >= cutoff, 1L).otherwise(0L)).as("post"))
      .withColumn("arm", col("user_id") % 2)
    Stats.welchT(users, "arm", "post")
  }

  // Exact GLOBAL quantiles of a near-continuous column (59.8k distinct
  // of 60k lineitem prices at sf0.01 — the worst case): running counts
  // ride the range-partitioned prefix-sum path (no single-partition
  // window, no in-memory percentile buffer), target ranks are exact
  // integer basis-point arithmetic (ceil(q·N) in doubles would shift
  // ranks: 0.1·30 = 3.0000000000000004), and each quantile returns an
  // ACTUAL data element (percentile_disc semantics — interpolation on
  // a continuous column would hash-drift). The oracle replays the
  // cumulative counts and the rank pick.
  private val x244 = Q("x244_global_quantiles", Some(
    """WITH vals AS (SELECT l_extendedprice AS v,
      |         CAST(count(*) AS BIGINT) AS c
      |       FROM lineitem WHERE l_extendedprice IS NOT NULL
      |       GROUP BY v),
      |cum AS (SELECT v, sum(c) OVER (ORDER BY v
      |          ROWS UNBOUNDED PRECEDING) AS cum
      |        FROM vals),
      |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM vals),
      |t AS (SELECT bps,
      |        CAST((CAST(bps AS HUGEINT) * n + 9999) // 10000 AS BIGINT)
      |          AS tgt, n
      |      FROM (SELECT unnest([2500, 5000, 9000, 9900, 9990]) AS bps),
      |        n)
      |SELECT CAST(bps AS DOUBLE) / 10000.0 AS q, tgt AS rank,
      |  n AS n_values, min(v) AS value
      |FROM cum JOIN t ON cum.cum >= t.tgt
      |GROUP BY bps, tgt, n
      |ORDER BY q""".stripMargin)) { (s, dir) =>
    Stats.globalQuantiles(t(s, dir, "lineitem"), "l_extendedprice",
      Seq(2500, 5000, 9000, 9900, 9990))
  }

  // Per-group exact quantiles at corpus scale: documents' char lengths
  // sliced by source — the grouped prefix-sum path (partitioned BY
  // group), per-group integer bps ranks, and the equi+range pick.
  // Oracle replays per-(source, value) counts, per-source running
  // sums, and the rank arithmetic.
  private val x247 = Q("x247_quantiles_by_source", Some(
    """WITH vals AS (SELECT source AS g, n_chars AS v,
      |         CAST(count(*) AS BIGINT) AS c
      |       FROM documents WHERE n_chars IS NOT NULL
      |       GROUP BY g, v),
      |cum AS (SELECT g, v, sum(c) OVER (PARTITION BY g ORDER BY v
      |          ROWS UNBOUNDED PRECEDING) AS cum
      |        FROM vals),
      |n AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM vals GROUP BY g),
      |t AS (SELECT g, n, bps,
      |        CAST((CAST(bps AS HUGEINT) * n + 9999) // 10000 AS BIGINT)
      |          AS tgt
      |      FROM n, (SELECT unnest([2500, 5000, 7500, 9900]) AS bps))
      |SELECT t.g AS source, CAST(bps AS DOUBLE) / 10000.0 AS q,
      |  tgt AS rank, n AS n_values, min(v) AS value
      |FROM cum JOIN t ON cum.g = t.g AND cum.cum >= t.tgt
      |GROUP BY t.g, bps, tgt, n
      |ORDER BY source, q""".stripMargin)) { (s, dir) =>
    Stats.globalQuantilesBy(t(s, dir, "documents"), "source", "n_chars",
      Seq(2500, 5000, 7500, 9900))
  }

  // One-pass multi-column quantile profile: three lineitem measures
  // melted to (col_name, value) and pushed through the grouped
  // prefix-sum path with the COLUMN NAME as the group — p columns cost
  // one corpus scan, not p. Oracle replays the melt, the per-column
  // running counts, and the integer rank picks.
  private val x260 = Q("x260_multicol_quantiles", Some(
    """WITH m AS (
      |  SELECT 'l_discount' AS g, CAST(l_discount AS DOUBLE) AS v
      |  FROM lineitem WHERE l_discount IS NOT NULL
      |  UNION ALL
      |  SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE)
      |  FROM lineitem WHERE l_extendedprice IS NOT NULL
      |  UNION ALL
      |  SELECT 'l_quantity', CAST(l_quantity AS DOUBLE)
      |  FROM lineitem WHERE l_quantity IS NOT NULL),
      |vals AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
      |         FROM m GROUP BY g, v),
      |cum AS (SELECT g, v, sum(c) OVER (PARTITION BY g ORDER BY v
      |          ROWS UNBOUNDED PRECEDING) AS cum
      |        FROM vals),
      |n AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM vals GROUP BY g),
      |t AS (SELECT g, n, bps,
      |        CAST((CAST(bps AS HUGEINT) * n + 9999) // 10000 AS BIGINT)
      |          AS tgt
      |      FROM n, (SELECT unnest([2500, 5000, 9500, 9900]) AS bps))
      |SELECT t.g AS col_name, CAST(bps AS DOUBLE) / 10000.0 AS q,
      |  tgt AS rank, n AS n_values, min(v) AS value
      |FROM cum JOIN t ON cum.g = t.g AND cum.cum >= t.tgt
      |GROUP BY t.g, bps, tgt, n
      |ORDER BY col_name, q""".stripMargin)) { (s, dir) =>
    Stats.globalQuantilesMultiCol(t(s, dir, "lineitem"),
      Seq("l_quantity", "l_extendedprice", "l_discount"),
      Seq(2500, 5000, 9500, 9900))
  }

  val qs: Seq[Q] = Seq(x77, x78, x79, x80, x81, x82, x86, x87, x88, x89,
    x91, x92, x93, x94, x95, x110, x134, x135, x138, x139, x140, x141,
    x142, x143, x146, x186, x187, x192, x193, x196, x200, x205, x213,
    x214, x215, x216, x219, x220, x222, x223, x225, x227, x228, x229,
    x244, x247, x260)
}
