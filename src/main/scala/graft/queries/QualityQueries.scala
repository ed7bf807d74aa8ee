package graft.queries

import graft.functions.Curation
import graft.operators.{Dedup, Expectations, Graph, Resample, Stats}
import graft.operators.Similarity
import graft.streaming.EventStream
import org.apache.spark.sql.functions._

import Tables.t

/** Round-5 wiring for operators that previously existed without a driver
  * gate: the deequ-style expectations suite, n-gram containment verify,
  * deterministic label propagation, exact-decimal EWMA, seeded JL random
  * projection, native session windows, and the l-diversity audit. Every
  * oracle replays the full computation in DuckDB (same hashes, same
  * quantization), not just a row count. */
object QualityQueries {

  // Expectations suite over orders: four column checks fused into ONE
  // aggregate (one scan regardless of check count) plus a broadcast
  // anti-join referential-integrity probe of lineitem→orders. Two checks
  // are chosen to have non-zero violation counts (totalprice cap, status
  // set without 'P') so the violation arithmetic is gated, not just zeros.
  private val x97 = Q("x97_expectations_audit", Some(
    """WITH r AS (
      |  SELECT 'not_null:o_custkey' AS check_name,
      |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_violations
      |  FROM orders
      |  UNION ALL
      |  SELECT 'unique:o_orderkey',
      |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'between:o_totalprice',
      |    CAST(sum(CASE WHEN o_totalprice IS NOT NULL
      |      AND (o_totalprice < 0 OR o_totalprice > 300000)
      |      THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'in_set:o_orderstatus',
      |    CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
      |      AND o_orderstatus NOT IN ('O', 'F') THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'ri:l_orderkey',
      |    CAST((SELECT count(*) FROM lineitem l WHERE NOT EXISTS
      |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      |      AS BIGINT))
      |SELECT check_name, n_violations, n_violations = 0 AS passed
      |FROM r ORDER BY check_name""".stripMargin)) { (s, dir) =>
    val orders = t(s, dir, "orders")
    Expectations.audit(orders, Seq(
        Expectations.NotNull("o_custkey"),
        Expectations.Unique(Seq("o_orderkey")),
        Expectations.Between("o_totalprice", 0, 300000),
        Expectations.InSet("o_orderstatus", Seq("O", "F"))))
      .unionByName(Expectations.refIntegrity(
        t(s, dir, "lineitem"), "l_orderkey", orders, "o_orderkey",
        "ri:l_orderkey"))
      .orderBy("check_name")
  }

  // Asymmetric n-gram containment over an explicit candidate frame (the
  // quote/subset-detection verify where Jaccard fails): all 60×59/2 pairs
  // of a bounded block, every count and basis-point ratio integer-exact.
  private val x98 = Q("x98_ngram_containment", Some(
    """WITH grams AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(nt)-2, 1)),
      |           i -> substring(nt, i, 4))) AS gs
      |  FROM (SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS nt
      |        FROM documents WHERE doc_id < 60))
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(len(list_intersect(a.gs, b.gs)) AS BIGINT) AS n_inter,
      |  CAST(len(a.gs) AS BIGINT) AS n_a,
      |  CAST(len(b.gs) AS BIGINT) AS n_b,
      |  CAST(CASE WHEN len(a.gs) > 0
      |    THEN CAST(len(list_intersect(a.gs, b.gs)) AS BIGINT) * 10000 // len(a.gs)
      |    ELSE 0 END AS BIGINT) AS containment_a_bps,
      |  CAST(CASE WHEN len(b.gs) > 0
      |    THEN CAST(len(list_intersect(a.gs, b.gs)) AS BIGINT) * 10000 // len(b.gs)
      |    ELSE 0 END AS BIGINT) AS containment_b_bps
      |FROM grams a JOIN grams b ON a.doc_id < b.doc_id
      |ORDER BY id_a, id_b""".stripMargin)) { (s, dir) =>
    val docs = t(s, dir, "documents").filter(col("doc_id") < 60)
    val cands = docs.select(col("doc_id").as("id_a"))
      .crossJoin(docs.select(col("doc_id").as("id_b")))
      .filter(col("id_a") < col("id_b"))
    Dedup.ngramContainment(docs, "doc_id", "text", cands, 4)
      .orderBy("id_a", "id_b")
  }

  // Deterministic label propagation over the part↔supplier co-purchase
  // graph (x55's graph, community semantics instead of importance): the
  // oracle unrolls all three iterations with the identical total-order
  // update (count desc, label asc), so every iteration's fixed point is
  // hash-checked. Parts get even node ids, suppliers odd, keeping the two
  // key spaces disjoint without strings.
  private val x99 = Q("x99_label_propagation", Some {
    def iter(prev: String, name: String) =
      s"""$name AS (
         |  SELECT e.dst AS node, l.lab AS lab
         |  FROM e JOIN $prev l ON l.node = e.src
         |  GROUP BY e.dst, l.lab
         |  QUALIFY row_number() OVER (PARTITION BY e.dst
         |    ORDER BY count(*) DESC, l.lab) = 1)""".stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT CAST(l_partkey * 2 AS BIGINT) AS src,
       |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
       |  FROM lineitem),
       |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
       |l0 AS (SELECT node, node AS lab
       |       FROM (SELECT DISTINCT src AS node FROM e)),
       |${iter("l0", "i1")},
       |${iter("i1", "i2")},
       |${iter("i2", "i3")}
       |SELECT node, lab AS community FROM i3 ORDER BY node""".stripMargin
  }) { (s, dir) =>
    val e = t(s, dir, "lineitem").select(
      (col("l_partkey") * 2).cast("long").as("src"),
      (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
    Graph.labelPropagation(e, "src", "dst", iters = 3)
      .orderBy("node")
  }

  // EWMA(alpha=1/2) over the daily event series: every weighted term is an
  // exact decimal in BOTH engines (0.5^k has exactly k fractional digits;
  // the fold peaks at decimal(38,15) — see Resample.ewmaHalf's precision
  // budget), so the final double division sees identical bits.
  private val x100 = Q("x100_ewma_half", Some {
    val terms = (0 until 10).map { k =>
      val w = java.math.BigDecimal.valueOf(0.5).pow(k).toPlainString
      (s"coalesce(lag(tv, $k) OVER w * $w, 0)",
        s"CASE WHEN lag(tv, $k) OVER w IS NOT NULL THEN $w ELSE 0 END")
    }
    s"""WITH daily AS (
       |  SELECT event_type, date_trunc('day', ts) AS day,
       |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS tv
       |  FROM events GROUP BY event_type, date_trunc('day', ts)),
       |lagged AS (
       |  SELECT event_type, day, tv,
       |    ${terms.map(_._1).mkString(" + ")} AS num,
       |    ${terms.map(_._2).mkString(" + ")} AS den
       |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day))
       |SELECT event_type, day, round(CAST(tv AS DOUBLE), 2) AS total_value,
       |  floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 10000 + 0.5) / 10000 AS ewma
       |FROM lagged ORDER BY event_type, day""".stripMargin
  }) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,6)")).as("__tv"))
    Resample.ewmaHalf(daily, "event_type", "day", "__tv", terms = 10)
      .select(col("event_type"), col("day"),
        round(col("__tv").cast("double"), 2).as("total_value"), col("ewma"))
      .orderBy("event_type", "day")
  }

  // Johnson-Lindenstrauss random projection 64→8 with the seeded ±1 sign
  // matrix: the oracle re-derives every matrix entry from the same
  // md5-parity rule and re-computes the projection in exact BIGINT
  // arithmetic; the distortion ratio (E[‖y‖²] = outDim·‖x‖²) is the one
  // double, floor-quantized identically.
  private val x101 = Q("x101_random_projection", Some(
    """WITH x AS (
      |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |    v -> CAST(floor(v * 10000) AS BIGINT)) AS xq
      |  FROM embeddings),
      |m AS (
      |  SELECT j, i,
      |    CASE WHEN ('0x' || substring(md5('jl5:' || j::VARCHAR || ':' || i::VARCHAR), 1, 1))::INT % 2 = 0
      |         THEN 1 ELSE -1 END AS s
      |  FROM range(0, 8) r1(j), range(0, 64) r2(i)),
      |y AS (
      |  SELECT x.vec_id, m.j, CAST(sum(x.xq[m.i + 1] * m.s) AS BIGINT) AS yj
      |  FROM x, m GROUP BY x.vec_id, m.j),
      |ya AS (
      |  SELECT vec_id,
      |    CAST(max(CASE WHEN j = 0 THEN yj END) AS BIGINT) AS y0,
      |    CAST(max(CASE WHEN j = 1 THEN yj END) AS BIGINT) AS y1,
      |    CAST(sum(yj * yj) AS BIGINT) AS l2y
      |  FROM y GROUP BY vec_id),
      |xs AS (
      |  SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS l2x
      |  FROM (SELECT vec_id, unnest(xq) AS v FROM x) GROUP BY vec_id)
      |SELECT a.vec_id, a.y0, a.y1, xs.l2x, a.l2y,
      |  floor(CAST(a.l2y AS DOUBLE) / (8 * CAST(xs.l2x AS DOUBLE)) * 10000 + 0.5) / 10000
      |    AS distortion
      |FROM ya a JOIN xs USING (vec_id)
      |ORDER BY vec_id""".stripMargin)) { (s, dir) =>
    Similarity.randomProjectSigned(t(s, dir, "embeddings"),
        "vec_id", "embedding", inDim = 64, outDim = 8, seed = "jl5")
      .select(col("vec_id"),
        element_at(col("yq"), 1).as("y0"),
        element_at(col("yq"), 2).as("y1"),
        aggregate(col("xq"), lit(0L), (a, v) => a + v * v).as("l2x"),
        aggregate(col("yq"), lit(0L), (a, v) => a + v * v).as("l2y"))
      .withColumn("distortion",
        floor(col("l2y").cast("double") / (lit(8) * col("l2x").cast("double"))
          * 10000 + 0.5) / 10000)
      .orderBy("vec_id")
  }

  // Native session_window aggregation (the declarative sibling of x15's
  // mapGroupsWithState sessionizer): sessions merge while gaps stay UNDER
  // 30 minutes, window end = last event + gap. The oracle rebuilds the
  // same sessions with a boundary cumulative sum (diff >= gap starts a new
  // session — [t,t+g) windows touching at the boundary do NOT merge).
  private val SessionWindowOracle =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) >= 1800000
      |         THEN 1 ELSE 0 END AS b
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts, value,
      |    sum(b) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS total_value
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  private val x102 = Q("x102_session_windows", Some(SessionWindowOracle)) { (s, dir) =>
    EventStream.sessionWindows(Tables.events(s, dir), gap = "30 minutes")
      .orderBy("user_id", "session_start")
  }

  // session_window with a DYNAMIC per-event gap (the Column overload,
  // SPARK-36465): purchases hold sessions open 60 min, other events 30.
  // Merging is interval-UNION — the oracle replays it with a running max
  // of proposed ends (new session only when ts clears every previous
  // proposal; [start,end) ⇒ ties do NOT merge) and exact epoch_us math.
  private val x133 = Q("x133_dynamic_gap_sessions", Some(
    """WITH g AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN event_type = 'purchase' THEN 3600000000
      |         ELSE 1800000000 END AS gap_us
      |  FROM events),
      |p AS (
      |  SELECT *, max(epoch_us(ts) + gap_us) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      |  FROM g),
      |f AS (
      |  SELECT *, CASE WHEN prev_end IS NULL
      |      OR epoch_us(ts) >= prev_end THEN 1 ELSE 0 END AS b
      |  FROM p),
      |s AS (
      |  SELECT *, sum(b) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM f)
      |SELECT user_id, min(ts) AS session_start,
      |  make_timestamp(max(epoch_us(ts) + gap_us)) AS session_end,
      |  count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS total_value
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin)) { (s, dir) =>
    EventStream.sessionWindowsDynamic(Tables.events(s, dir))
      .orderBy("user_id", "session_start")
  }

  // TWO stateful operators chained in ONE streaming query (legal since
  // Spark 3.5): watermark-bounded dropDuplicatesWithinWatermark feeding
  // the native session_window aggregate. The stream sees every event
  // TWICE; the result must equal x102's single-pass oracle over the
  // original table — gating in-stream dedup AND the watermark propagating
  // correctly through the chained stateful pair.
  private val x131 = Q("x131_chained_stateful", Some(SessionWindowOracle)) { (s, dir) =>
    EventStream.dedupSessionWindowsReplay(s, Tables.events(s, dir))
      .orderBy("user_id", "session_start")
  }

  // l-diversity audit (x82's k-anonymity companion): bound how homogeneous
  // a quasi-identifier class's sensitive attribute can get. One grouped
  // count-distinct over |classes| rows, then a 1-row report.
  private val x103 = Q("x103_l_diversity", Some(
    """WITH cls AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    count(DISTINCT c_acctbal) AS nd, count(*) AS sz
      |  FROM customer GROUP BY c_nationkey, c_mktsegment)
      |SELECT CAST(5 AS BIGINT) AS l,
      |  min(nd) AS min_diversity,
      |  count(*) AS n_classes,
      |  CAST(sum(CASE WHEN nd < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_classes,
      |  CAST(sum(CASE WHEN nd < 5 THEN sz ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
      |  min(nd) >= 5 AS is_l_diverse
      |FROM cls""".stripMargin)) { (s, dir) =>
    Stats.lDiversity(t(s, dir, "customer"),
      Seq("c_nationkey", "c_mktsegment"), "c_acctbal", 5L)
  }

  // Winnowing (MOSS) fingerprints + local-overlap pair discovery: the
  // oracle replays the whole pipeline — word-shingle hashing, the
  // per-window rightmost-min selection (struct-min over the same frame),
  // df-capped inverted join — so both the fingerprint SELECTION and the
  // pair gate are hash-checked. 3-word shingles / window 4 over the
  // documents corpus; planted near-dups surface as high-n_shared pairs.
  private val x104 = Q("x104_winnowing_overlap", Some(
    """WITH ws AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(regexp_replace(lower(text),
      |      '[^a-z0-9]+', ' ', 'g'), ' '), x -> x <> '') AS ws
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, u.i::INT AS p,
      |    ('0x' || substring(md5(ws[u.i::INT] || ' ' || ws[u.i::INT + 1] || ' ' ||
      |      ws[u.i::INT + 2]), 1, 8))::BIGINT AS h
      |  FROM ws, unnest(range(1, len(ws) - 1)) AS u(i)
      |  WHERE len(ws) >= 3),
      |win AS (
      |  SELECT doc_id, p,
      |    min({'h': h, 'np': -p}) OVER (PARTITION BY doc_id ORDER BY p
      |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS best,
      |    count(*) OVER (PARTITION BY doc_id) AS nn
      |  FROM g),
      |f0 AS (
      |  SELECT DISTINCT doc_id, best.h AS h
      |  FROM win WHERE p <= greatest(nn - 3, 1)),
      |rare AS (SELECT h FROM f0 GROUP BY h HAVING count(DISTINCT doc_id) <= 16),
      |kept AS (SELECT f0.doc_id, f0.h FROM f0 JOIN rare USING (h))
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(count(*) AS BIGINT) AS n_shared
      |FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
      |GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 3
      |ORDER BY id_a, id_b""".stripMargin)) { (s, dir) =>
    Dedup.winnowMatches(t(s, dir, "documents"), "doc_id", "text",
        k = 3, w = 4, minShared = 3, maxDf = 16)
      .orderBy("id_a", "id_b")
  }

  // Hard-negative mining for contrastive training: per vector, the top-3
  // most-similar vectors with a DIFFERENT label, candidates bounded by
  // sign-bucket LSH whose width is sized IN-PLAN from the corpus count
  // (bits = clamp(8..16, ceil-log2(ceil(n/8))) — integer bit-length
  // arithmetic, no float log2, no plan-construction-time count() action).
  // The oracle replays the width rule, bucketing, probing, cross-label
  // candidates, and the raw-cosine top-k step for step, so the gate stays
  // valid at EVERY scale factor (n <= 2048 runs 8-bit; sf1's n = 20k runs
  // 12-bit in both engines).
  private val x105 = Q("x105_hard_negatives", Some(
    """WITH e AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |bb AS (
       |  SELECT CASE WHEN (count(*) + 7) // 8 <= 1 THEN 8
       |    ELSE least(16, greatest(8,
       |      length(bin((count(*) + 7) // 8 - 1))))::INT END AS bits FROM e),
       |b AS (
       |  SELECT vec_id, label, v,
       |    list_sum([CASE WHEN v[i] > 0 THEN (1 << (i - 1)::INT) ELSE 0 END
       |              FOR i IN range(1, bits + 1)])::INT AS bucket
       |  FROM e, bb),
       |p AS (
       |  SELECT vec_id AS qid, u.pb::INT AS bucket
       |  FROM b, bb, unnest(list_prepend(bucket,
       |    [xor(bucket, (1 << (j - 1))::INT) FOR j IN range(1, bits + 1)]))
       |    AS u(pb)),
       |cand AS (
       |  SELECT p.qid, c.vec_id AS nid
       |  FROM p JOIN b c USING (bucket) WHERE p.qid <> c.vec_id),
       |scored AS (
       |  SELECT cand.qid, cand.nid, y.label AS neg_label,
       |    list_dot_product(x.v, y.v) /
       |      (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) AS cos
       |  FROM cand JOIN b x ON cand.qid = x.vec_id JOIN b y ON cand.nid = y.vec_id
       |  WHERE x.label <> y.label)
       |SELECT qid AS vec_id, CAST(rk AS BIGINT) AS rank, nid AS neg_id,
       |  neg_label, round(cos, 4) AS cosine
       |FROM (SELECT *, row_number() OVER (PARTITION BY qid
       |        ORDER BY cos DESC, nid) AS rk FROM scored)
       |WHERE rk <= 3 ORDER BY vec_id, rank""".stripMargin)) { (s, dir) =>
    Similarity.hardNegativesAuto(t(s, dir, "embeddings"), "vec_id", "label",
        "embedding", k = 3, probeHamming = 1)
      .orderBy("vec_id", "rank")
  }

  // The STREAMING path of the native session_window aggregate, under the
  // SAME oracle as its batch twin x102: the static frame replays through a
  // real watermarked MemoryStream in time-ordered micro-batches; sentinel
  // events push the watermark past every real session so Append emits
  // them, while the sentinel sessions stay open and unemitted.
  private val x106 = Q("x106_stream_session_windows", Some(
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) >= 1800000
      |         THEN 1 ELSE 0 END AS b
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts, value,
      |    sum(b) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS total_value
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin)) { (s, dir) =>
    EventStream.sessionWindowsReplay(s, Tables.events(s, dir), gap = "30 minutes")
      .orderBy("user_id", "session_start")
  }

  // Luhn-gated card scrub over synthesized payment text: each order row
  // carries two 16-digit candidates (orderkey left-padded with '4's,
  // custkey with '5's), of which only the Luhn-valid ~10% may be redacted.
  // The candidate regex, the mod-10 checksum arithmetic, the longest-first
  // redaction fold and the audit count all replay digit-for-digit in
  // DuckDB, so a naive scrub-everything (or scrub-nothing) implementation
  // fails the hash.
  private val x107 = Q("x107_card_scrub", Some {
    def luhn(c: String) =
      s"""list_sum([CASE WHEN i % 2 = 0 THEN
         |      CASE WHEN 2 * (ascii(substring(reverse($c), i, 1)) - 48) > 9
         |        THEN 2 * (ascii(substring(reverse($c), i, 1)) - 48) - 9
         |        ELSE 2 * (ascii(substring(reverse($c), i, 1)) - 48) END
         |      ELSE ascii(substring(reverse($c), i, 1)) - 48 END
         |      FOR i IN range(1, 17)]) % 10 = 0""".stripMargin
    s"""WITH base AS (
       |  SELECT o_orderkey,
       |    lpad(CAST(o_orderkey AS VARCHAR), 16, '4') AS c1,
       |    lpad(CAST(o_custkey AS VARCHAR), 16, '5') AS c2
       |  FROM orders WHERE o_orderkey <= 5000),
       |lu AS (
       |  SELECT o_orderkey, c1, c2,
       |    'inv ' || o_orderkey || ' pay ' || c1 || ' alt ' || c2 AS text,
       |    ${luhn("c1")} AS ok1,
       |    ${luhn("c2")} AS ok2
       |  FROM base)
       |SELECT o_orderkey,
       |  CAST((CASE WHEN ok1 THEN 1 ELSE 0 END)
       |     + (CASE WHEN ok2 THEN 1 ELSE 0 END) AS BIGINT) AS n_cards,
       |  CASE WHEN ok2 THEN replace(t1, c2, '[CARD]') ELSE t1 END AS text
       |FROM (SELECT *, CASE WHEN ok1 THEN replace(text, c1, '[CARD]')
       |        ELSE text END AS t1 FROM lu)
       |ORDER BY o_orderkey""".stripMargin
  }) { (s, dir) =>
    val base = t(s, dir, "orders").filter(col("o_orderkey") <= 5000)
      .select(col("o_orderkey"),
        concat(lit("inv "), col("o_orderkey").cast("string"),
          lit(" pay "), lpad(col("o_orderkey").cast("string"), 16, "4"),
          lit(" alt "), lpad(col("o_custkey").cast("string"), 16, "5"))
          .as("text"))
    Curation.scrubCardsWithAudit(base, "o_orderkey", "text")
      .orderBy("o_orderkey")
  }

  // Exact bottom-quantile corpus gate ("drop the worst 20%") with no
  // SinglePartition window: ranks come from the range-partitioned global
  // index, the cut is floor(n * fraction), and the (n_chars, doc_id)
  // composed key makes the boundary deterministic even on tied lengths —
  // the oracle replays the exact same rank>cut arithmetic.
  private val x108 = Q("x108_prune_quantile", Some(
    """WITH k AS (
      |  SELECT doc_id, n_chars,
      |    n_chars * 10000000 + doc_id AS sort_key
      |  FROM documents),
      |r AS (SELECT doc_id, n_chars, sort_key,
      |        row_number() OVER (ORDER BY sort_key) AS rn,
      |        count(*) OVER () AS n
      |      FROM k)
      |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
      |  CAST(sort_key AS BIGINT) AS sort_key
      |FROM r WHERE rn > floor(n * 0.2)
      |ORDER BY doc_id""".stripMargin)) { (s, dir) =>
    val docs = t(s, dir, "documents").select(col("doc_id"), col("n_chars"),
      (col("n_chars") * 10000000L + col("doc_id")).as("sort_key"))
    Curation.pruneBottomQuantile(docs, "sort_key", 0.2)
      .orderBy("doc_id")
  }

  // TextRank keyword extraction — PageRank composed over the word
  // co-occurrence graph (distinct adjacent-word bigrams, undirected): the
  // graph-centrality alternative to x28's TF-IDF keywords. Reuses the
  // decimal-quantized pageRank fixed point, so the oracle replays BOTH the
  // bigram graph construction and two unrolled rank iterations exactly
  // (x55's machinery on a corpus-derived graph).
  private val x136 = Q("x136_textrank_keywords", Some(
    """WITH ws AS (
      |  SELECT doc_id, list_filter(string_split_regex(regexp_replace(
      |    lower(text), '[^a-z0-9]+', ' ', 'g'), ' '), x -> x <> '') AS ws
      |  FROM documents),
      |e0 AS (
      |  SELECT DISTINCT ws[u.i::INT] AS src, ws[u.i::INT + 1] AS dst
      |  FROM ws, unnest(range(1, len(ws))) AS u(i)
      |  WHERE len(ws) >= 2 AND ws[u.i::INT] <> ws[u.i::INT + 1]),
      |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
      |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM deg),
      |r0 AS (SELECT d.src AS node,
      |         floor(CAST(1 AS DOUBLE) / n.nn * 1e10 + 0.5) / 1e10 AS pr
      |       FROM deg d, n),
      |r1 AS (SELECT e.dst AS node,
      |         floor(((CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / max(n.nn)
      |           + CAST(0.85 AS DOUBLE) * CAST(sum(CAST(r.pr / d.deg AS DECIMAL(28,14))) AS DOUBLE)) * 1e10 + 0.5) / 1e10 AS pr
      |       FROM e JOIN r0 r ON r.node = e.src
      |       JOIN deg d ON d.src = e.src, n
      |       GROUP BY e.dst),
      |r2 AS (SELECT e.dst AS node,
      |         floor(((CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / max(n.nn)
      |           + CAST(0.85 AS DOUBLE) * CAST(sum(CAST(r.pr / d.deg AS DECIMAL(28,14))) AS DOUBLE)) * 1e10 + 0.5) / 1e10 AS pr
      |       FROM e JOIN r1 r ON r.node = e.src
      |       JOIN deg d ON d.src = e.src, n
      |       GROUP BY e.dst)
      |SELECT node AS word, pr FROM r2
      |ORDER BY pr DESC, word LIMIT 25""".stripMargin)) { (s, dir) =>
    val pairs = t(s, dir, "documents")
      .select(explode(Dedup.shingles(Dedup.words(col("text")), 2)).as("sh"))
      .select(split(col("sh"), " ").as("p"))
      .select(col("p")(0).as("src"), col("p")(1).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    Graph.pageRank(pairs, "src", "dst", iters = 2)
      .select(col("node").as("word"), col("rank").as("pr"))
      .orderBy(desc("pr"), col("word"))
      .limit(25)
  }

  // General-diameter connected components in O(log d) rounds: alternating
  // min-label propagation + pointer jump lab(v) ← lab(lab(v)) over the
  // part–supplier bipartite graph. The oracle unrolls all four
  // propagate+jump rounds, so the doubling state machine itself is
  // hash-gated, not just the fixed point.
  private val x151 = Q("x151_components_doubling", {
    def round(r: Int): String = {
      val prev = s"l${r - 1}"
      s"""pr$r AS (SELECT node, min(lab) AS lab FROM (
         |    SELECT node, lab FROM $prev
         |    UNION ALL
         |    SELECT e.dst AS node, l.lab FROM und e JOIN $prev l ON e.src = l.node)
         |  GROUP BY node),
         |l$r AS (SELECT a.node, b.lab FROM pr$r a JOIN pr$r b ON a.lab = b.node)""".stripMargin
    }
    Some(
      s"""WITH e0 AS (SELECT DISTINCT l_partkey * 2 AS src,
         |              l_suppkey * 2 + 1 AS dst FROM lineitem),
         |und AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         |l0 AS (SELECT DISTINCT src AS node, src AS lab FROM und),
         |${round(1)},
         |${round(2)},
         |${round(3)},
         |${round(4)}
         |SELECT CAST(node AS BIGINT) AS node, CAST(lab AS BIGINT) AS component
         |FROM l4 ORDER BY node""".stripMargin)
  }) { (s, dir) =>
    val e = t(s, dir, "lineitem").select(
      (col("l_partkey") * 2).as("src"),
      (col("l_suppkey") * 2 + 1).as("dst")).distinct()
    Graph.connectedComponentsDoubling(e, "src", "dst", rounds = 4)
      .select(col("node").cast("long").as("node"),
        col("component").cast("long").as("component"))
      .orderBy("node")
  }

  // k-core peeling of the part–supplier graph: nodes of degree < 10 are
  // iteratively dropped and the graph re-induced — the "dense enough to
  // matter" community filter. The oracle unrolls all three peels, so the
  // peeling trajectory is hash-gated (keep-sets have unique keys, making
  // the inner joins exact semi-join twins).
  private val x152 = Q("x152_kcore_peel", {
    def peel(r: Int): String = {
      val prev = if (r == 1) "und0" else s"u${r - 1}"
      s"""k$r AS (SELECT src FROM (
         |    SELECT src, count(*) AS d FROM $prev GROUP BY src) WHERE d >= 10),
         |u$r AS (SELECT u.src, u.dst FROM $prev u
         |        JOIN k$r a ON u.src = a.src JOIN k$r b ON u.dst = b.src)""".stripMargin
    }
    Some(
      s"""WITH e0 AS (SELECT DISTINCT l_partkey * 2 AS src,
         |              l_suppkey * 2 + 1 AS dst FROM lineitem),
         |und0 AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         |${peel(1)},
         |${peel(2)},
         |${peel(3)}
         |SELECT CAST(src AS BIGINT) AS node, count(*) AS core_degree
         |FROM u3 GROUP BY src ORDER BY node""".stripMargin)
  }) { (s, dir) =>
    val e = t(s, dir, "lineitem").select(
      (col("l_partkey") * 2).as("src"),
      (col("l_suppkey") * 2 + 1).as("dst")).distinct()
    Graph.kCorePeel(e, "src", "dst", k = 10, rounds = 3)
      .select(col("node").cast("long").as("node"), col("core_degree"))
      .orderBy("node")
  }

  // Personalized PageRank from a seed set of parts — influence as seen
  // FROM the seeds (related-entity expansion / taint spread). Same
  // decimal-quantized fixed point as x55; the oracle unrolls both
  // iterations with the seed-pinned restart term.
  private val x154 = Q("x154_personalized_pagerank", {
    def iter(prev: String, name: String): String =
      s"""$name AS (SELECT e.dst AS node,
         |    floor(((CASE WHEN s.node IS NOT NULL
         |        THEN (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / max(ns.n)
         |        ELSE CAST(0 AS DOUBLE) END)
         |      + CAST(0.85 AS DOUBLE) * CAST(sum(CAST(r.pr / d.deg AS DECIMAL(28,14))) AS DOUBLE)) * 1e10 + 0.5) / 1e10 AS pr
         |  FROM e JOIN $prev r ON r.node = e.src
         |  JOIN deg d ON d.src = e.src
         |  LEFT JOIN sd s ON s.node = e.dst, ns
         |  GROUP BY e.dst, s.node)""".stripMargin
    Some(
      s"""WITH e0 AS (SELECT DISTINCT 'p' || l_partkey::VARCHAR AS src,
         |              's' || l_suppkey::VARCHAR AS dst FROM lineitem),
         |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |sd AS (SELECT DISTINCT 'p' || l_partkey::VARCHAR AS node
         |       FROM lineitem WHERE l_partkey % 97 = 0),
         |ns AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM sd),
         |r0 AS (SELECT d.src AS node,
         |    floor((CASE WHEN s.node IS NOT NULL
         |        THEN CAST(1 AS DOUBLE) / ns.n
         |        ELSE CAST(0 AS DOUBLE) END) * 1e10 + 0.5) / 1e10 AS pr
         |  FROM deg d LEFT JOIN sd s ON s.node = d.src, ns),
         |${iter("r0", "r1")},
         |${iter("r1", "r2")}
         |SELECT node, pr FROM r2 ORDER BY pr DESC, node LIMIT 30""".stripMargin)
  }) { (s, dir) =>
    val li = t(s, dir, "lineitem")
    val e = li.select(
      concat(lit("p"), col("l_partkey").cast("string")).as("src"),
      concat(lit("s"), col("l_suppkey").cast("string")).as("dst")).distinct()
    val seeds = li.filter(col("l_partkey") % 97 === 0)
      .select(concat(lit("p"), col("l_partkey").cast("string")).as("node"))
      .distinct()
    Graph.personalizedPageRank(e, "src", "dst", seeds, "node", iters = 2)
      .select(col("node"), col("rank").as("pr"))
      .orderBy(desc("pr"), col("node"))
      .limit(30)
  }

  // HITS hubs & authorities over the DIRECTED part→supplier graph — the
  // two-sided importance measure PageRank flattens. Oracle unrolls both
  // alternating update rounds including every L1 normalization.
  private val x155 = Q("x155_hits_scores", {
    val q = (x: String) => s"floor(($x) * 1e10 + 0.5) / 1e10"
    def authStep(h: String, ar: String, a: String) =
      s"""$ar AS (SELECT e0.dst, sum(CAST(h.h AS DECIMAL(28,14))) AS raw
         |  FROM e0 JOIN $h h ON h.src = e0.src GROUP BY e0.dst),
         |$a AS (SELECT dst, ${q(s"CAST(raw AS DOUBLE) / CAST((SELECT sum(raw) FROM $ar) AS DOUBLE)")} AS a
         |  FROM $ar)""".stripMargin
    def hubStep(a: String, hr: String, h: String) =
      s"""$hr AS (SELECT e0.src, sum(CAST(a.a AS DECIMAL(28,14))) AS raw
         |  FROM e0 JOIN $a a ON a.dst = e0.dst GROUP BY e0.src),
         |$h AS (SELECT src, ${q(s"CAST(raw AS DOUBLE) / CAST((SELECT sum(raw) FROM $hr) AS DOUBLE)")} AS h
         |  FROM $hr)""".stripMargin
    Some(
      s"""WITH e0 AS (SELECT DISTINCT 'p' || l_partkey::VARCHAR AS src,
         |              's' || l_suppkey::VARCHAR AS dst FROM lineitem),
         |ns AS (SELECT CAST(count(DISTINCT src) AS DOUBLE) AS n FROM e0),
         |h0 AS (SELECT DISTINCT src, ${q("CAST(1 AS DOUBLE) / ns.n")} AS h
         |       FROM e0, ns),
         |${authStep("h0", "a1r", "a1")},
         |${hubStep("a1", "h1r", "h1")},
         |${authStep("h1", "a2r", "a2")},
         |${hubStep("a2", "h2r", "h2")}
         |SELECT role, node, score FROM (
         |  SELECT 'hub' AS role, src AS node, h AS score FROM h2
         |  UNION ALL
         |  SELECT 'authority' AS role, dst AS node, a AS score FROM a2)
         |ORDER BY role, score DESC, node LIMIT 40""".stripMargin)
  }) { (s, dir) =>
    val e = t(s, dir, "lineitem").select(
      concat(lit("p"), col("l_partkey").cast("string")).as("src"),
      concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
    Graph.hits(e, "src", "dst", iters = 2)
      .orderBy(col("role"), desc("score"), col("node"))
      .limit(40)
  }

  // Degree assortativity of the part–supplier graph: do hubs link to
  // hubs? Exact moments over endpoint-degree pairs (x79's closed form).
  private val x156 = Q("x156_assortativity", Some(
    """WITH e0 AS (SELECT DISTINCT 'p' || l_partkey::VARCHAR AS src,
      |              's' || l_suppkey::VARCHAR AS dst FROM lineitem),
      |und AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
      |deg AS (SELECT src, count(*) AS deg FROM und GROUP BY src),
      |p AS (SELECT dx.deg AS x, dy.deg AS y
      |      FROM und JOIN deg dx ON dx.src = und.src
      |      JOIN deg dy ON dy.src = und.dst),
      |m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(x * x AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(y * y AS DECIMAL(28,6))) AS DOUBLE) AS syy,
      |    CAST(sum(CAST(x * y AS DECIMAL(28,6))) AS DOUBLE) AS sxy
      |  FROM p)
      |SELECT CAST(n AS BIGINT) AS n_directed_edges,
      |  round((n * sxy - sx * sy)
      |    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
      |    AS assortativity
      |FROM m""".stripMargin)) { (s, dir) =>
    val e = t(s, dir, "lineitem").select(
      concat(lit("p"), col("l_partkey").cast("string")).as("src"),
      concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
    Graph.degreeAssortativity(e, "src", "dst")
  }

  // Link prediction by neighborhood overlap: supplier pairs ranked by the
  // exact Jaccard of the part sets they serve — candidates only from
  // co-occurrence under a shared part (one keyed self-join, never
  // all-pairs). Integer counts, one division, deterministic tiebreak.
  private val x157 = Q("x157_link_prediction", Some(
    """WITH e AS (SELECT DISTINCT l_partkey AS l,
      |             CAST(l_suppkey AS VARCHAR) AS r
      |           FROM lineitem),
      |deg AS (SELECT r, count(*) AS deg FROM e GROUP BY r),
      |p AS (SELECT a.r AS r_a, b.r AS r_b, count(*) AS common
      |      FROM e a JOIN e b ON a.l = b.l AND a.r < b.r
      |      GROUP BY a.r, b.r)
      |SELECT p.r_a, p.r_b, CAST(common AS BIGINT) AS common,
      |  round(CAST(common AS DOUBLE)
      |    / CAST(da.deg + db.deg - common AS DOUBLE), 6) AS jaccard
      |FROM p JOIN deg da ON da.r = p.r_a JOIN deg db ON db.r = p.r_b
      |ORDER BY jaccard DESC, r_a, r_b LIMIT 25""".stripMargin)) { (s, dir) =>
    Graph.neighborhoodSimilarity(
        t(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey")),
        "l_partkey", "l_suppkey")
      .orderBy(desc("jaccard"), col("r_a"), col("r_b"))
      .limit(25)
  }

  // PageRank convergence residuals: ‖rank_k − rank_{k−1}‖₁ per iteration
  // in exact 1e-10 rank quanta (BIGINT — ranks live on that grid by
  // construction, so the residual is an exact integer). Turns the fixed
  // iteration count into an informed choice: when l1_e10 plateaus, more
  // iterations buy nothing. The oracle replays all three iterations (the
  // x55 chain) plus the per-iteration diff aggregates.
  private val x161 = Q("x161_pagerank_residual", {
    def iter(prev: String, name: String) =
      s"""$name AS (SELECT e.dst AS node,
         |    floor(((CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / max(n.nn)
         |      + CAST(0.85 AS DOUBLE) * CAST(sum(CAST(r.pr / d.deg AS DECIMAL(28,14))) AS DOUBLE)) * 1e10 + 0.5) / 1e10 AS pr
         |  FROM e JOIN $prev r ON r.node = e.src
         |  JOIN deg d ON d.src = e.src, n
         |  GROUP BY e.dst)""".stripMargin
    def diff(i: Int, cur: String, prev: String) =
      s"""SELECT $i AS iter,
         |  CAST(sum(CAST(floor(abs(a.pr - b.pr) * 1e10 + 0.5) AS BIGINT)) AS BIGINT) AS l1_e10
         |FROM $cur a JOIN $prev b USING (node)""".stripMargin
    Some(
      s"""WITH e0 AS (
         |  SELECT DISTINCT 'p' || l_partkey::VARCHAR AS src,
         |    's' || l_suppkey::VARCHAR AS dst
         |  FROM lineitem),
         |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM deg),
         |r0 AS (SELECT d.src AS node,
         |         floor(CAST(1 AS DOUBLE) / n.nn * 1e10 + 0.5) / 1e10 AS pr
         |       FROM deg d, n),
         |${iter("r0", "r1")},
         |${iter("r1", "r2")},
         |${iter("r2", "r3")}
         |SELECT iter, l1_e10 FROM (
         |  ${diff(1, "r1", "r0")}
         |  UNION ALL ${diff(2, "r2", "r1")}
         |  UNION ALL ${diff(3, "r3", "r2")})
         |ORDER BY iter""".stripMargin)
  }) { (s, dir) =>
    val e = t(s, dir, "lineitem").select(
      concat(lit("p"), col("l_partkey").cast("string")).as("src"),
      concat(lit("s"), col("l_suppkey").cast("string")).as("dst")).distinct()
    Graph.pageRankResiduals(e, "src", "dst", iters = 3)
      .orderBy("iter")
  }

  // Label-propagation convergence: exact count of nodes that switched
  // label each round — zero means the previous round already reached the
  // fixed point. Same deterministic argmax trajectory as x99, replayed.
  private val x162 = Q("x162_lpa_convergence", {
    def iter(prev: String, name: String) =
      s"""$name AS (
         |  SELECT e.dst AS node, l.lab AS lab
         |  FROM e JOIN $prev l ON l.node = e.src
         |  GROUP BY e.dst, l.lab
         |  QUALIFY row_number() OVER (PARTITION BY e.dst
         |    ORDER BY count(*) DESC, l.lab) = 1)""".stripMargin
    def diff(i: Int, cur: String, prev: String) =
      s"""SELECT $i AS iter,
         |  CAST(sum(CASE WHEN a.lab <> b.lab THEN 1 ELSE 0 END) AS BIGINT) AS n_changed
         |FROM $cur a JOIN $prev b USING (node)""".stripMargin
    Some(
      s"""WITH e0 AS (
         |  SELECT DISTINCT CAST(l_partkey * 2 AS BIGINT) AS src,
         |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
         |  FROM lineitem),
         |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         |l0 AS (SELECT node, node AS lab
         |       FROM (SELECT DISTINCT src AS node FROM e)),
         |${iter("l0", "i1")},
         |${iter("i1", "i2")},
         |${iter("i2", "i3")}
         |SELECT iter, n_changed FROM (
         |  ${diff(1, "i1", "l0")}
         |  UNION ALL ${diff(2, "i2", "i1")}
         |  UNION ALL ${diff(3, "i3", "i2")})
         |ORDER BY iter""".stripMargin)
  }) { (s, dir) =>
    val e = t(s, dir, "lineitem").select(
      (col("l_partkey") * 2).cast("long").as("src"),
      (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
    Graph.labelPropagationConvergence(e, "src", "dst", iters = 3)
      .orderBy("iter")
  }

  // Personalized-PageRank residuals — x161's contract on the seed-pinned
  // walk (x154's graph + seeds), so `iters=2` becomes measurable.
  private val x163 = Q("x163_ppr_residual", {
    def iter(prev: String, name: String): String =
      s"""$name AS (SELECT e.dst AS node,
         |    floor(((CASE WHEN s.node IS NOT NULL
         |        THEN (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / max(ns.n)
         |        ELSE CAST(0 AS DOUBLE) END)
         |      + CAST(0.85 AS DOUBLE) * CAST(sum(CAST(r.pr / d.deg AS DECIMAL(28,14))) AS DOUBLE)) * 1e10 + 0.5) / 1e10 AS pr
         |  FROM e JOIN $prev r ON r.node = e.src
         |  JOIN deg d ON d.src = e.src
         |  LEFT JOIN sd s ON s.node = e.dst, ns
         |  GROUP BY e.dst, s.node)""".stripMargin
    def diff(i: Int, cur: String, prev: String) =
      s"""SELECT $i AS iter,
         |  CAST(sum(CAST(floor(abs(a.pr - b.pr) * 1e10 + 0.5) AS BIGINT)) AS BIGINT) AS l1_e10
         |FROM $cur a JOIN $prev b USING (node)""".stripMargin
    Some(
      s"""WITH e0 AS (SELECT DISTINCT 'p' || l_partkey::VARCHAR AS src,
         |              's' || l_suppkey::VARCHAR AS dst FROM lineitem),
         |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |sd AS (SELECT DISTINCT 'p' || l_partkey::VARCHAR AS node
         |       FROM lineitem WHERE l_partkey % 97 = 0),
         |ns AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM sd),
         |r0 AS (SELECT d.src AS node,
         |    floor((CASE WHEN s.node IS NOT NULL
         |        THEN CAST(1 AS DOUBLE) / ns.n
         |        ELSE CAST(0 AS DOUBLE) END) * 1e10 + 0.5) / 1e10 AS pr
         |  FROM deg d LEFT JOIN sd s ON s.node = d.src, ns),
         |${iter("r0", "r1")},
         |${iter("r1", "r2")}
         |SELECT iter, l1_e10 FROM (
         |  ${diff(1, "r1", "r0")}
         |  UNION ALL ${diff(2, "r2", "r1")})
         |ORDER BY iter""".stripMargin)
  }) { (s, dir) =>
    val li = t(s, dir, "lineitem")
    val e = li.select(
      concat(lit("p"), col("l_partkey").cast("string")).as("src"),
      concat(lit("s"), col("l_suppkey").cast("string")).as("dst")).distinct()
    val seeds = li.filter(col("l_partkey") % 97 === 0)
      .select(concat(lit("p"), col("l_partkey").cast("string")).as("node"))
      .distinct()
    Graph.personalizedPageRankResiduals(e, "src", "dst", seeds, "node",
        iters = 2)
      .orderBy("iter")
  }

  // HITS residuals per role: hub rows start at iteration 1 (vs the
  // uniform start), authority rows at 2 (no iteration-0 authority state).
  // Replays x155's full alternating/normalizing chain plus the diffs.
  private val x164 = Q("x164_hits_residual", {
    val q = (x: String) => s"floor(($x) * 1e10 + 0.5) / 1e10"
    def authStep(h: String, ar: String, a: String) =
      s"""$ar AS (SELECT e0.dst, sum(CAST(h.h AS DECIMAL(28,14))) AS raw
         |  FROM e0 JOIN $h h ON h.src = e0.src GROUP BY e0.dst),
         |$a AS (SELECT dst, ${q(s"CAST(raw AS DOUBLE) / CAST((SELECT sum(raw) FROM $ar) AS DOUBLE)")} AS a
         |  FROM $ar)""".stripMargin
    def hubStep(a: String, hr: String, h: String) =
      s"""$hr AS (SELECT e0.src, sum(CAST(a.a AS DECIMAL(28,14))) AS raw
         |  FROM e0 JOIN $a a ON a.dst = e0.dst GROUP BY e0.src),
         |$h AS (SELECT src, ${q(s"CAST(raw AS DOUBLE) / CAST((SELECT sum(raw) FROM $hr) AS DOUBLE)")} AS h
         |  FROM $hr)""".stripMargin
    def diff(role: String, i: Int, cur: String, prev: String, key: String,
        sc: String) =
      s"""SELECT '$role' AS role, $i AS iter,
         |  CAST(sum(CAST(floor(abs(a.$sc - b.$sc) * 1e10 + 0.5) AS BIGINT)) AS BIGINT) AS l1_e10
         |FROM $cur a JOIN $prev b USING ($key)""".stripMargin
    Some(
      s"""WITH e0 AS (SELECT DISTINCT 'p' || l_partkey::VARCHAR AS src,
         |              's' || l_suppkey::VARCHAR AS dst FROM lineitem),
         |ns AS (SELECT CAST(count(DISTINCT src) AS DOUBLE) AS n FROM e0),
         |h0 AS (SELECT DISTINCT src, ${q("CAST(1 AS DOUBLE) / ns.n")} AS h
         |       FROM e0, ns),
         |${authStep("h0", "a1r", "a1")},
         |${hubStep("a1", "h1r", "h1")},
         |${authStep("h1", "a2r", "a2")},
         |${hubStep("a2", "h2r", "h2")}
         |SELECT role, iter, l1_e10 FROM (
         |  ${diff("hub", 1, "h1", "h0", "src", "h")}
         |  UNION ALL ${diff("hub", 2, "h2", "h1", "src", "h")}
         |  UNION ALL ${diff("authority", 2, "a2", "a1", "dst", "a")})
         |ORDER BY role, iter""".stripMargin)
  }) { (s, dir) =>
    val e = t(s, dir, "lineitem").select(
      concat(lit("p"), col("l_partkey").cast("string")).as("src"),
      concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
    Graph.hitsResiduals(e, "src", "dst", iters = 2)
      .orderBy("role", "iter")
  }

  // SemDeDup end-to-end: k-means cells (pmod seed + 1 Lloyd round) →
  // within-cell cosine pairs → min-label semantic groups → keep-one-per-
  // group. Near-dups are planted as ×2-scaled copies: scaling by a power
  // of two is EXACT in fp (cosines and cell rankings are bit-identical to
  // the original's), so planted pairs survive any ulp-level cross-engine
  // centroid drift. The oracle replays the md5 cell seeding (md5, not
  // pmod(id,k) — string ids must not null-collapse into one quadratic
  // cell), the Lloyd round, the pair join, and both component rounds
  // step-for-step; cluster ids are internal (engine-sensitive at
  // boundaries) and not part of the output.
  private val x165 = Q("x165_semantic_dedup", Some(
    """WITH cp AS (
      |  SELECT vec_id + 100000 AS vec_id,
      |    list_transform(embedding, x -> x * 2) AS embedding
      |  FROM embeddings WHERE vec_id < 50),
      |e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      |  UNION ALL
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM cp),
      |a0 AS (SELECT vec_id,
      |  ((('0x' || substring(md5('cell:' || vec_id), 1, 6))::BIGINT % 8))::INT
      |    AS cell FROM e),
      |c1 AS (
      |  SELECT a.cell, r.i, avg(e.v[r.i]) AS cv
      |  FROM a0 a JOIN e USING (vec_id) CROSS JOIN range(1, 65) r(i)
      |  GROUP BY 1, 2),
      |c1n AS (SELECT cell, sqrt(sum(cv * cv)) AS cn FROM c1 GROUP BY cell),
      |a1s AS (
      |  SELECT e.vec_id, c.cell, sum(c.cv * e.v[c.i]) AS dp,
      |    any_value(sqrt(list_dot_product(e.v, e.v))) AS vn
      |  FROM e CROSS JOIN c1 c GROUP BY 1, 2),
      |a1 AS (
      |  SELECT s.vec_id, s.cell FROM a1s s JOIN c1n cn ON s.cell = cn.cell
      |  QUALIFY row_number() OVER (PARTITION BY s.vec_id
      |    ORDER BY s.dp / (cn.cn * s.vn) DESC, s.cell) = 1),
      |prs AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM a1 a JOIN a1 b ON a.cell = b.cell AND a.vec_id < b.vec_id
      |  JOIN e x ON a.vec_id = x.vec_id JOIN e y ON b.vec_id = y.vec_id
      |  WHERE list_dot_product(x.v, y.v) /
      |    (sqrt(list_dot_product(x.v, x.v)) *
      |     sqrt(list_dot_product(y.v, y.v))) >= 0.99),
      |und AS (SELECT id_a AS u, id_b AS w FROM prs
      |        UNION ALL SELECT id_b, id_a FROM prs),
      |l0 AS (SELECT DISTINCT u AS node, u AS lab FROM und),
      |l1 AS (SELECT node, min(lab) AS lab FROM (
      |         SELECT node, lab FROM l0
      |         UNION ALL
      |         SELECT g.u AS node, l.lab FROM und g JOIN l0 l ON g.w = l.node)
      |       GROUP BY node),
      |l2 AS (SELECT node, min(lab) AS lab FROM (
      |         SELECT node, lab FROM l1
      |         UNION ALL
      |         SELECT g.u AS node, l.lab FROM und g JOIN l1 l ON g.w = l.node)
      |       GROUP BY node),
      |lab AS (
      |  SELECT e.vec_id, coalesce(l2.lab, e.vec_id) AS component
      |  FROM e LEFT JOIN l2 ON l2.node = e.vec_id)
      |SELECT vec_id, CAST(component AS BIGINT) AS component,
      |  component = vec_id AS kept,
      |  count(*) OVER (PARTITION BY component) AS n_members
      |FROM lab ORDER BY vec_id""".stripMargin)) { (s, dir) =>
    val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
    val copies = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("component")
    // k=8 fits the gate corpus (~31/cell at sf0.01); production sizes
    // k ~ n/targetCellSize — the operator's content-group pre-pass already
    // keeps replicated corpora (the 10x bench) at distinct-content cost
    Similarity.semanticDedup(emb.unionByName(copies), "vec_id", "embedding",
        k = 8, threshold = 0.99)
      .withColumn("n_members", count(lit(1)).over(w))
      .select(col("id").as("vec_id"), col("component"), col("kept"),
        col("n_members"))
      .orderBy("vec_id")
  }

  // ε-DP count release over event types: Laplace(1/ε) noise from a SEEDED
  // inverse-CDF draw (one release per seed = one privacy-budget spend; a
  // fresh random draw per run would silently re-spend it). The oracle
  // replays the md5→uniform map, the DECIMAL(20,14)-quantized ln, and the
  // exact-decimal release arithmetic digit for digit.
  private val x166 = Q("x166_dp_counts", Some(
    """WITH g AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
      |u AS (SELECT event_type, n,
      |  ((('0x' || substring(md5('dp1:' || event_type), 1, 6))::BIGINT
      |     + 0.5) / 16777216.0) - 0.5 AS uu FROM g),
      |q AS (SELECT event_type, n, uu,
      |  CAST(ln(1 - 2 * abs(uu)) AS DECIMAL(20,14)) AS lnq FROM u)
      |SELECT event_type,
      |  round(CAST(CASE WHEN uu >= 0
      |    THEN CAST(n AS DECIMAL(14,0)) + (-lnq) * CAST(2.0 AS DECIMAL(10,4))
      |    ELSE CAST(n AS DECIMAL(14,0)) - (-lnq) * CAST(2.0 AS DECIMAL(10,4))
      |    END AS DOUBLE), 4) AS n_released,
      |  CAST(0.5 AS DOUBLE) AS epsilon
      |FROM q ORDER BY event_type""".stripMargin)) { (s, dir) =>
    Stats.dpCounts(Tables.events(s, dir), "event_type",
        epsilon = 0.5, seed = "dp1")
      .orderBy("event_type")
  }

  // Embedding-level split-leakage report: near-copies planted across the
  // train/test boundary (×2-scaled vectors — exact in fp, so cosine 1.0
  // survives any engine) must surface as leaked; everything else gets its
  // honest nearest-train cosine — and a test vector with NO train vector
  // in its probed buckets still emits a (null nearest, leaked=false) row,
  // so the audit never silently drops a query. The oracle replays the
  // split assignment, the 8-bit sign bucketing with Hamming-1 probes, the
  // top-1 ranking, and the query-side left join.
  private val x167 = Q("x167_split_leakage", Some {
    val flips = (0 until 8).map(j => s"xor(bucket, ${1 << j})").mkString(", ")
    s"""WITH e0 AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 200000,
       |    list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2)
       |  FROM embeddings WHERE vec_id < 30),
       |e AS (
       |  SELECT vec_id, v,
       |    CASE WHEN vec_id >= 200000 THEN 'test'
       |         WHEN vec_id < 30 THEN 'train'
       |         WHEN ('0x' || substring(md5('spl:' || vec_id), 1, 6))::BIGINT
       |              % 10 < 8 THEN 'train' ELSE 'test' END AS split
       |  FROM e0),
       |b AS (
       |  SELECT vec_id, split, v,
       |    list_sum([CASE WHEN v[i] > 0 THEN (1 << (i - 1)::INT) ELSE 0 END
       |              FOR i IN range(1, 9)])::INT AS bucket
       |  FROM e),
       |p AS (
       |  SELECT vec_id AS qid, u.pb::INT AS bucket
       |  FROM b, unnest([bucket, $flips]) AS u(pb) WHERE b.split = 'test'),
       |cand AS (
       |  SELECT p.qid, c.vec_id AS tid
       |  FROM p JOIN b c USING (bucket) WHERE c.split = 'train'),
       |scored AS (
       |  SELECT cand.qid, cand.tid,
       |    list_dot_product(x.v, y.v) /
       |      (sqrt(list_dot_product(x.v, x.v)) *
       |       sqrt(list_dot_product(y.v, y.v))) AS cos
       |  FROM cand JOIN b x ON cand.qid = x.vec_id
       |    JOIN b y ON cand.tid = y.vec_id),
       |top1 AS (
       |  SELECT qid, tid, cos
       |  FROM (SELECT *, row_number() OVER (PARTITION BY qid
       |          ORDER BY cos DESC, tid) AS rk FROM scored)
       |  WHERE rk = 1)
       |SELECT q.vec_id, t.tid AS nearest_train_id,
       |  round(t.cos, 4) AS cosine, coalesce(t.cos >= 0.99, false) AS leaked
       |FROM (SELECT vec_id FROM e WHERE split = 'test') q
       |LEFT JOIN top1 t ON q.vec_id = t.qid
       |ORDER BY q.vec_id""".stripMargin
  }) { (s, dir) =>
    val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
    val planted = emb.filter(col("vec_id") < 30)
      .select((col("vec_id") + 200000).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val all = emb.unionByName(planted)
      .withColumn("split",
        when(col("vec_id") >= 200000, "test")
          .when(col("vec_id") < 30, "train")
          .when(conv(substring(md5(concat(lit("spl:"),
              col("vec_id").cast("string"))), 1, 6), 16, 10)
            .cast("long") % 10 < 8, "train")
          .otherwise("test"))
    Similarity.splitLeakage(all, "vec_id", "split", "embedding",
        threshold = 0.99, bits = 8, probeHamming = 1)
      .orderBy("vec_id")
  }

  // Measured candidate recall of the sign-bucket LSH family
  // (splitLeakage / hardNegatives geometry) against brute-force ground
  // truth — the eval the IVF/PQ paths already have (x69/x75) pointed at
  // the sign buckets, where a recall hole means silent decontamination
  // misses. Per config (pinned 8-bit, in-plan sized): how many test
  // queries found a train neighbor AS GOOD AS the exact nearest (rounded
  // cosine equality — id-tie-proof), how many had NO candidate at all
  // (the left-join row the audit must see), and recall in exact basis
  // points. Ground truth is inherently all-pairs (that is what "exact"
  // means), so the query side is a bounded deterministic sample — the
  // md5-ranked top-256 test ids — keeping the harness linear in corpus
  // size (256 × |train|) at any SF; an uncapped query side measured
  // quadratic (112 s at 10× data). The oracle replays the split, the
  // sample boundary, the exact ranking, both bucket geometries
  // (including the in-plan width rule), and the integer recall
  // arithmetic.
  private val x168 = Q("x168_signbucket_recall", Some {
    // the range bound must stay a COLUMN reference (`bits + 1`): DuckDB
    // 1.0 constant-folds a literal bound and then fails to bind the
    // comprehension's lateral column refs, so the pinned config carries
    // its own 1-row bits CTE instead of an inlined literal
    def cfgBlock(tag: String, bitsSrc: String, hamming: Int = 1) =
      s"""b_$tag AS (
         |  SELECT vec_id, split, v,
         |    list_sum([CASE WHEN v[i] > 0 THEN (1 << (i - 1)::INT) ELSE 0 END
         |              FOR i IN range(1, bits + 1)])::INT AS bucket
         |  FROM e, $bitsSrc),
         |p_$tag AS (
         |  SELECT vec_id AS qid, u.pb::INT AS bucket
         |  FROM b_$tag, $bitsSrc, unnest(list_prepend(bucket,
         |    [xor(bucket, (1 << (j - 1))::INT) FOR j IN range(1, bits + 1)]${
           // two-flip probes for the high-recall (Hamming-2) audit mode;
           // raw (un-stripMargined) insert whose `|` margins are consumed
           // by the OUTER stripMargin — a line may never START with `||`
           if (hamming >= 2)
             """) || flatten(
               |      [[xor(bucket, ((1 << (i - 1)) + (1 << (j - 1)))::INT)
               |        FOR j IN range(i + 1, bits + 1)]
               |        FOR i IN range(1, bits + 1)]"""
           else ""}))
         |    AS u(pb)
         |  WHERE split = 'test'),
         |sc_$tag AS (
         |  SELECT c.qid, c.tid, cs.cos
         |  FROM (SELECT p.qid, b.vec_id AS tid
         |        FROM p_$tag p JOIN b_$tag b USING (bucket)
         |        WHERE b.split = 'train') c
         |  JOIN cs ON c.qid = cs.qid AND c.tid = cs.tid),
         |t1_$tag AS (
         |  SELECT qid, round(cos, 4) AS acos
         |  FROM (SELECT *, row_number() OVER (PARTITION BY qid
         |          ORDER BY cos DESC, tid) AS rk FROM sc_$tag)
         |  WHERE rk = 1),
         |r_$tag AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |    CAST(sum(CASE WHEN t.qid IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_candidateless,
         |    CAST(sum(CASE WHEN t.acos = ex.ecos THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_top1_found,
         |    CAST(sum(CASE WHEN t.acos = ex.ecos THEN 1 ELSE 0 END) * 10000
         |      // count(*) AS BIGINT) AS recall_bps
         |  FROM ex LEFT JOIN t1_$tag t USING (qid))""".stripMargin
    s"""WITH e0 AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |    CASE WHEN ('0x' || substring(md5('spl:' || vec_id), 1, 6))::BIGINT
       |         % 10 < 8 THEN 'train' ELSE 'test' END AS split
       |  FROM embeddings),
       |qs AS (
       |  SELECT vec_id FROM e0 WHERE split = 'test'
       |  ORDER BY md5('qs:' || vec_id), vec_id LIMIT 256),
       |e AS (
       |  SELECT * FROM e0 WHERE split = 'train'
       |    OR vec_id IN (SELECT vec_id FROM qs)),
       |bb AS (
       |  SELECT CASE WHEN (count(*) + 7) // 8 <= 1 THEN 8
       |    ELSE least(16, greatest(8,
       |      length(bin((count(*) + 7) // 8 - 1))))::INT END AS bits FROM e),
       |b8 AS (SELECT 8::INT AS bits),
       |cs AS (
       |  SELECT q.vec_id AS qid, t.vec_id AS tid,
       |    list_dot_product(q.v, t.v) /
       |      (sqrt(list_dot_product(q.v, q.v)) *
       |       sqrt(list_dot_product(t.v, t.v))) AS cos
       |  FROM e q JOIN e t ON q.split = 'test' AND t.split = 'train'),
       |ex AS (
       |  SELECT qid, round(cos, 4) AS ecos
       |  FROM (SELECT *, row_number() OVER (PARTITION BY qid
       |          ORDER BY cos DESC, tid) AS rk FROM cs)
       |  WHERE rk = 1),
       |${cfgBlock("c8", "b8")},
       |${cfgBlock("ca", "bb")},
       |${cfgBlock("h2", "b8", hamming = 2)}
       |SELECT 'bits8_h1' AS config, * FROM r_c8
       |UNION ALL
       |SELECT 'bits8_h2', * FROM r_h2
       |UNION ALL
       |SELECT 'sized_auto', * FROM r_ca
       |ORDER BY config""".stripMargin
  }) { (s, dir) =>
    val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
      .withColumn("split",
        when(conv(substring(md5(concat(lit("spl:"),
            col("vec_id").cast("string"))), 1, 6), 16, 10)
          .cast("long") % 10 < 8, "train")
          .otherwise("test"))
    val train = emb.filter(col("split") === "train")
    // Bounded deterministic query sample (md5-ranked top-256 test ids):
    // ground truth is brute force, so an uncapped query side makes the
    // harness quadratic in corpus size — with the cap its cost is
    // 256 × |train|, linear, while staying engine-replayable
    // (TakeOrderedAndProject; md5 keys collide never, so the boundary is
    // tie-proof).
    val test = emb.filter(col("split") === "test")
      .withColumn("__qk", md5(concat(lit("qs:"), col("vec_id").cast("string"))))
      .orderBy(col("__qk"), col("vec_id")).limit(256).drop("__qk")
    val sub = train.unionByName(test)
    val exact1 = Similarity
      .bruteForceTopKBatch(train, "vec_id", "embedding", test, "vec_id", k = 1)
      .select(col("query_id").as("qid"), round(col("cosine"), 4).as("ecos"))
    def recallOf(name: String, approx: org.apache.spark.sql.DataFrame) =
      exact1.join(approx.select(col("vec_id").as("qid"),
          col("nearest_train_id"), col("cosine").as("acos")), Seq("qid"), "left")
        .agg(count(lit(1)).as("n_queries"),
          sum(when(col("nearest_train_id").isNull, 1L).otherwise(0L))
            .as("n_candidateless"),
          sum(when(col("acos") === col("ecos"), 1L).otherwise(0L))
            .as("n_top1_found"))
        .select(lit(name).as("config"), col("n_queries"),
          col("n_candidateless"), col("n_top1_found"),
          expr("n_top1_found * 10000 div n_queries").as("recall_bps"))
    recallOf("bits8_h1", Similarity.splitLeakage(sub, "vec_id", "split",
        "embedding", threshold = 0.95, bits = 8, probeHamming = 1))
      .unionByName(recallOf("bits8_h2", Similarity.splitLeakage(sub,
        "vec_id", "split", "embedding", threshold = 0.95, bits = 8,
        probeHamming = 2)))
      .unionByName(recallOf("sized_auto", Similarity.splitLeakageAuto(sub,
        "vec_id", "split", "embedding", threshold = 0.95, probeHamming = 1)))
      .orderBy("config")
  }

  // Exact substring dedup (Lee et al. 2021 ExactSubstr): duplicated
  // >= l-token runs keep their global-first occurrence and are stripped
  // everywhere else — within and across documents. The oracle replays
  // tokenization, the per-window md5 keys, the first-occurrence ranking,
  // the overlapping-window position union, and the doc-side index-filter
  // reassembly word for word, so both the removal decision AND the exact
  // rebuilt text are gated. l=5 on the synthetic docs (10-99 tokens;
  // production uses l≈50 — the parameter scales freely).
  // Shared by x169 (full-corpus) and x288 (incremental batch-vs-history,
  // which must EQUAL the full-corpus pass on history ∪ batch — the x76
  // equality shape lifted to substring level).
  private val substrDedupOracle: String =
    substrDedupOracleOver("SELECT doc_id, text FROM documents")

  // Corpus-parameterized variant: `corpusSql` must expose (doc_id, text).
  // x291 replays the takedown story by instantiating it over
  // survivors ∪ synthesized batch instead of the raw table.
  private def substrDedupOracleOver(corpusSql: String): String = {
    val words =
      """list_filter(string_split_regex(regexp_replace(lower(text),
        |    '[^a-z0-9]+', ' ', 'g'), ' '), x -> x <> '')""".stripMargin
    s"""WITH corpus AS ($corpusSql),
       |base AS (
       |  SELECT doc_id, $words AS ws, len($words) AS nt
       |  FROM corpus),
       |occ AS (
       |  SELECT doc_id, u.i AS pos,
       |    md5(array_to_string(ws[u.i : u.i + 4], ' ')) AS h
       |  FROM base, unnest(range(1, nt - 5 + 2)) AS u(i)
       |  WHERE nt >= 5),
       |dup AS (SELECT h FROM occ GROUP BY h HAVING count(*) >= 2),
       |rmocc AS (
       |  SELECT doc_id, pos FROM (
       |    SELECT o.doc_id, o.pos, o.h,
       |      row_number() OVER (PARTITION BY o.h
       |        ORDER BY o.doc_id, o.pos) AS rk
       |    FROM occ o JOIN dup USING (h))
       |  WHERE rk > 1),
       |rmpos AS (
       |  SELECT DISTINCT doc_id, pos + u.j AS rp
       |  FROM rmocc, unnest(range(0, 5)) AS u(j)),
       |rml AS (SELECT doc_id, list_sort(list(rp)) AS rm
       |        FROM rmpos GROUP BY doc_id)
       |SELECT b.doc_id,
       |  coalesce(array_to_string([b.ws[i] FOR i IN range(1, b.nt + 1)
       |    IF NOT list_contains(coalesce(r.rm, []), i)], ' '), '')
       |    AS clean_text,
       |  CAST(b.nt - coalesce(len(r.rm), 0) AS BIGINT) AS n_tokens_kept,
       |  CAST(coalesce(len(r.rm), 0) AS BIGINT) AS n_tokens_removed
       |FROM base b LEFT JOIN rml r USING (doc_id)
       |ORDER BY b.doc_id""".stripMargin
  }

  private val x169 = Q("x169_substring_dedup", Some(substrDedupOracle)) {
    (s, dir) =>
      Dedup.substringDedup(t(s, dir, "documents"), "doc_id", "text", l = 5)
        .orderBy("doc_id")
  }

  // Incremental ExactSubstr dedup — the rolling-ingest decomposition of
  // x169: history (the first 80% of doc ids, already deduped by the full
  // pass) stays untouched; the batch dedupes against history ∪ batch
  // through ONE Bloom-filtered map-only history window scan + exact
  // semi-join confirm. The gate is EQUALITY with the full-corpus pass:
  // history rows from substringDedup(history) plus batch rows from the
  // incremental op must reproduce x169's oracle over ALL documents —
  // any missed cross-boundary duplicate, any wrongly-stripped
  // batch-first occurrence, any rewritten history doc flips the hash.
  // The cut is max-RELATIVE (documents row count scales with sf; a fixed
  // threshold inverted the history/batch ratio at sf1 and priced the
  // whole corpus as "batch"); the oracle replays the full corpus, so
  // where the cut falls never enters the gate.
  private val x288 = Q("x288_incremental_substring_dedup",
      Some(substrDedupOracle)) { (s, dir) =>
    val d = t(s, dir, "documents")
    val cut = d.agg(max(col("doc_id"))).head().getLong(0) * 8L / 10L
    val hist = d.filter(col("doc_id") < cut)
    val batch = d.filter(col("doc_id") >= cut)
    Dedup.substringDedup(hist, "doc_id", "text", l = 5)
      .unionByName(
        Dedup.incrementalSubstringDedup(hist, batch, "doc_id", "text",
          l = 5))
      .orderBy("doc_id")
  }

  // The rolling steady state of x288: history's window keys live in a
  // PERSISTED narrow key table (buildSubstringKeys), each batch is one
  // Bloom-filtered key-table scan + appendSubstringKeys — history TEXT
  // is never re-read. Two consecutive batches roll through (batch 2 must
  // see batch 1's keys as history: a b1-window recurring in b2 keeps
  // only its b1 occurrence), and the chain must still reproduce the
  // full-corpus x169 oracle over all documents.
  private val x289 = Q("x289_rolling_substring_dedup",
      Some(substrDedupOracle)) { (s, dir) =>
    val d = t(s, dir, "documents")
    // max-relative cuts (60% / 80%) — see x288's note on why the split
    // must scale with the corpus
    val maxId = d.agg(max(col("doc_id"))).head().getLong(0)
    val (c1, c2) = (maxId * 6L / 10L, maxId * 8L / 10L)
    val hist = d.filter(col("doc_id") < c1)
    val b1 = d.filter(col("doc_id") >= c1 && col("doc_id") < c2)
    val b2 = d.filter(col("doc_id") >= c2)
    Dedup.buildSubstringKeys(hist, "doc_id", "text", l = 5,
      "graft_x289_subkeys")
    // each batch's output must land BEFORE its keys append (appending
    // first would make the batch its own history) — the phase discipline
    val out1 = Dedup.incrementalSubstringDedupIndexed(s,
        "graft_x289_subkeys", b1, "doc_id", "text", l = 5)
      .localCheckpoint(eager = true)
    Dedup.appendSubstringKeys(b1, "doc_id", "text", l = 5,
      "graft_x289_subkeys")
    val out2 = Dedup.incrementalSubstringDedupIndexed(s,
      "graft_x289_subkeys", b2, "doc_id", "text", l = 5)
    Dedup.substringDedup(hist, "doc_id", "text", l = 5)
      .unionByName(out1).unionByName(out2)
      .orderBy("doc_id")
  }

  // Substring-key takedown (right-to-be-forgotten reaching DERIVED
  // state): after deleteCascade erases a history slice, their window
  // keys must stop stripping future batches — a batch legitimately
  // re-introducing a DELETED doc's text keeps it (its first occurrence
  // no longer exists), while a batch repeating SURVIVING text is still
  // stripped, including keys the deleted and surviving docs SHARED
  // (the signed per-key doc-count ledger decides: live iff sum > 0).
  // The batch is half re-introduced deleted text (+10M ids), half
  // repeated survivor text (+20M ids); the gate is equality with the
  // full-corpus pass over survivors ∪ batch, replayed end to end by
  // the oracle over the same synthesized corpus.
  private val x291 = Q("x291_substring_key_takedown", Some(
    substrDedupOracleOver(
      """SELECT doc_id, text FROM documents
        |  WHERE doc_id < (SELECT max(doc_id) * 6 // 10 FROM documents)
        |    AND doc_id % 5 <> 4
        |  UNION ALL
        |  SELECT doc_id + 10000000, text FROM documents
        |  WHERE doc_id < (SELECT max(doc_id) * 6 // 10 FROM documents)
        |    AND doc_id % 5 = 4
        |  UNION ALL
        |  SELECT doc_id + 20000000, text FROM documents
        |  WHERE doc_id < (SELECT max(doc_id) * 6 // 10 FROM documents)
        |    AND doc_id % 5 <> 4 AND doc_id % 7 = 0""".stripMargin))) {
    (s, dir) =>
      val d = t(s, dir, "documents")
      val cut = d.agg(max(col("doc_id"))).head().getLong(0) * 6L / 10L
      val hist = d.filter(col("doc_id") < cut)
      val delKeys = hist.filter(col("doc_id") % 5 === 4).select("doc_id")
      // deleteCascade gives the surviving base table; the key-state
      // takedown needs the deleted docs' TEXT (exactly as ingested)
      val survivors = graft.operators.Merge.deleteCascade(
        Map("documents" -> (hist, "doc_id")), delKeys, "doc_id")("documents")
      val deleted = hist.filter(col("doc_id") % 5 === 4)
      val batch = deleted
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
        .unionByName(survivors.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 20000000L).as("doc_id"), col("text")))
      Dedup.buildSubstringKeys(hist, "doc_id", "text", l = 5,
        "graft_x291_subkeys")
      Dedup.deleteSubstringKeys(deleted, "doc_id", "text", l = 5,
        "graft_x291_subkeys")
      Dedup.substringDedup(survivors, "doc_id", "text", l = 5)
        .unionByName(Dedup.incrementalSubstringDedupIndexed(s,
          "graft_x291_subkeys", batch, "doc_id", "text", l = 5))
        .orderBy("doc_id")
  }

  // Budget-accounted DP release through the PrivacyLedger, version-bound:
  // the noise input is "seed:datasetVersion:group", so two ADJACENT
  // snapshots can never share a noise stream (the differencing-attack
  // fix), and the ledger refuses over-budget spends before any frame is
  // built (spec-gated; refusal is driver-side control flow). The oracle
  // replays the tagged md5 stream and the exact decimal release
  // arithmetic — the x166 replay with the bound tag.
  private val x170 = Q("x170_dp_budgeted_release", Some(
    """WITH g AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
      |u AS (SELECT event_type, n,
      |  ((('0x' || substring(md5('dp2:v1:' || event_type), 1, 6))::BIGINT
      |     + 0.5) / 16777216.0) - 0.5 AS uu FROM g),
      |q AS (SELECT event_type, n, uu,
      |  CAST(ln(1 - 2 * abs(uu)) AS DECIMAL(20,14)) AS lnq FROM u)
      |SELECT event_type,
      |  round(CAST(CASE WHEN uu >= 0
      |    THEN CAST(n AS DECIMAL(14,0)) + (-lnq) * CAST(2.0 AS DECIMAL(10,4))
      |    ELSE CAST(n AS DECIMAL(14,0)) - (-lnq) * CAST(2.0 AS DECIMAL(10,4))
      |    END AS DOUBLE), 4) AS n_released,
      |  CAST(0.5 AS DOUBLE) AS epsilon
      |FROM q ORDER BY event_type""".stripMargin)) { (s, dir) =>
    new graft.operators.PrivacyLedger(budget = 1.0)
      .release(Tables.events(s, dir), "event_type", epsilon = 0.5,
        seed = "dp2", datasetVersion = "v1")
      .orderBy("event_type")
  }

  // Newman modularity of the x99 LPA partition over the part–supplier
  // graph — the quality gauge closing the community-detection loop
  // (x99 finds communities, x162 tracks convergence, x188 grades the
  // result). The oracle replays the full 3-iteration LPA chain AND the
  // modularity assembly; all numerators integer (4m·l_c − d_c²), one
  // double division per column, so per-community contributions and the
  // corpus Q gate exactly.
  private val x188 = Q("x188_modularity", Some {
    def iter(prev: String, name: String) =
      s"""$name AS (
         |  SELECT e.dst AS node, l.lab AS lab
         |  FROM e JOIN $prev l ON l.node = e.src
         |  GROUP BY e.dst, l.lab
         |  QUALIFY row_number() OVER (PARTITION BY e.dst
         |    ORDER BY count(*) DESC, l.lab) = 1)""".stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT CAST(l_partkey * 2 AS BIGINT) AS src,
       |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
       |  FROM lineitem),
       |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
       |l0 AS (SELECT node, node AS lab
       |       FROM (SELECT DISTINCT src AS node FROM e)),
       |${iter("l0", "i1")},
       |${iter("i1", "i2")},
       |${iter("i2", "i3")},
       |mem AS (SELECT node, lab AS comm FROM i3),
       |ec AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |       FROM e0 WHERE src <> dst),
       |mm AS (SELECT count(*) AS m FROM ec),
       |deg AS (SELECT node, count(*) AS deg
       |        FROM (SELECT a AS node FROM ec
       |              UNION ALL SELECT b AS node FROM ec)
       |        GROUP BY node),
       |nodes AS (
       |  SELECT comm, count(*) AS n_nodes,
       |    sum(coalesce(deg, 0)) AS degree_sum
       |  FROM mem LEFT JOIN deg USING (node) GROUP BY comm),
       |intra AS (
       |  SELECT ma.comm AS comm, count(*) AS intra_edges
       |  FROM ec JOIN mem ma ON ec.a = ma.node
       |    JOIN mem mb ON ec.b = mb.node
       |  WHERE ma.comm = mb.comm GROUP BY ma.comm),
       |per AS (
       |  SELECT n.comm, n.n_nodes,
       |    coalesce(i.intra_edges, 0) AS intra_edges, n.degree_sum,
       |    4 * m.m * coalesce(i.intra_edges, 0)
       |      - n.degree_sum * n.degree_sum AS num,
       |    m.m AS m
       |  FROM nodes n LEFT JOIN intra i USING (comm), mm m)
       |SELECT comm AS community, CAST(n_nodes AS BIGINT) AS n_nodes,
       |  CAST(intra_edges AS BIGINT) AS intra_edges,
       |  CAST(degree_sum AS BIGINT) AS degree_sum,
       |  round(CAST(num AS DOUBLE)
       |    / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)), 6)
       |    AS contribution,
       |  round(CAST((SELECT sum(num) FROM per) AS DOUBLE)
       |    / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)), 6)
       |    AS modularity
       |FROM per ORDER BY community""".stripMargin
  }) { (s, dir) =>
    val e = t(s, dir, "lineitem").select(
      (col("l_partkey") * 2).cast("long").as("src"),
      (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
    Graph.modularity(e, "src", "dst",
      Graph.labelPropagation(e, "src", "dst", iters = 3))
  }

  // k-NN label classification accuracy over the embeddings corpus: for a
  // bounded md5-ranked 256-query sample (the x168 harness discipline —
  // never corpus², engine-replayable), majority-vote the label of the 10
  // nearest other vectors and report per-class accuracy in integer bps.
  // This is the "are the embeddings label-pure" probe AND the evaluation
  // harness any ANN index variant can be diffed against.
  private val x191 = Q("x191_knn_classify", Some(
    """WITH q AS (
      |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv,
      |    label AS qlab
      |  FROM embeddings
      |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 256),
      |sc AS (
      |  SELECT q.qid, q.qlab, e.vec_id AS nid, e.label AS nlab,
      |    list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv) /
      |      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
      |         CAST(e.embedding AS DOUBLE[]))) *
      |       sqrt(list_dot_product(q.qv, q.qv))) AS cos
      |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
      |top AS (
      |  SELECT qid, qlab, nlab
      |  FROM sc QUALIFY row_number() OVER (PARTITION BY qid
      |    ORDER BY cos DESC, nid) <= 10),
      |cnts AS (
      |  SELECT qid, qlab, nlab, count(*) AS cnt
      |  FROM top GROUP BY qid, qlab, nlab),
      |vote AS (
      |  SELECT qid, qlab, nlab AS pred
      |  FROM cnts QUALIFY row_number() OVER (PARTITION BY qid
      |    ORDER BY cnt DESC, nlab) = 1)
      |SELECT CAST(qlab AS BIGINT) AS label,
      |  CAST(count(*) AS BIGINT) AS n_queries,
      |  CAST(sum(CASE WHEN pred = qlab THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_correct,
      |  CAST((CAST(sum(CASE WHEN pred = qlab THEN 1 ELSE 0 END)
      |    AS HUGEINT) * 10000) // count(*) AS BIGINT) AS acc_bps
      |FROM vote GROUP BY qlab ORDER BY label""".stripMargin)) { (s, dir) =>
    Similarity.knnClassify(t(s, dir, "embeddings"), "vec_id", "embedding",
      "label", nQueries = 256, k = 10)
  }

  // Per-community conductance of the same LPA partition x188 grades
  // globally: φ(c) = cut/min(vol, volᵀ−vol), the local cluster-quality
  // measure (a high-φ community is a bad cluster even when corpus Q looks
  // fine). Oracle replays the LPA chain + the cut/volume assembly;
  // integer ratios, one rounded double division.
  private val x194 = Q("x194_conductance", Some {
    def iter(prev: String, name: String) =
      s"""$name AS (
         |  SELECT e.dst AS node, l.lab AS lab
         |  FROM e JOIN $prev l ON l.node = e.src
         |  GROUP BY e.dst, l.lab
         |  QUALIFY row_number() OVER (PARTITION BY e.dst
         |    ORDER BY count(*) DESC, l.lab) = 1)""".stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT CAST(l_partkey * 2 AS BIGINT) AS src,
       |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
       |  FROM lineitem),
       |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
       |l0 AS (SELECT node, node AS lab
       |       FROM (SELECT DISTINCT src AS node FROM e)),
       |${iter("l0", "i1")},
       |${iter("i1", "i2")},
       |${iter("i2", "i3")},
       |mem AS (SELECT node, lab AS comm FROM i3),
       |ec AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |       FROM e0 WHERE src <> dst),
       |vt AS (SELECT 2 * count(*) AS vt FROM ec),
       |deg AS (SELECT node, count(*) AS deg
       |        FROM (SELECT a AS node FROM ec
       |              UNION ALL SELECT b AS node FROM ec)
       |        GROUP BY node),
       |vol AS (
       |  SELECT comm, count(*) AS n_nodes,
       |    sum(coalesce(deg, 0)) AS volume
       |  FROM mem LEFT JOIN deg USING (node) GROUP BY comm),
       |lab AS (
       |  SELECT ma.comm AS ca, mb.comm AS cb
       |  FROM ec JOIN mem ma ON ec.a = ma.node
       |    JOIN mem mb ON ec.b = mb.node),
       |cut AS (
       |  SELECT comm, count(*) AS cut_edges
       |  FROM (SELECT ca AS comm FROM lab WHERE ca <> cb
       |        UNION ALL SELECT cb AS comm FROM lab WHERE ca <> cb)
       |  GROUP BY comm)
       |SELECT v.comm AS community, CAST(v.n_nodes AS BIGINT) AS n_nodes,
       |  CAST(coalesce(c.cut_edges, 0) AS BIGINT) AS cut_edges,
       |  CAST(v.volume AS BIGINT) AS volume,
       |  CASE WHEN least(v.volume, vt.vt - v.volume) = 0 THEN NULL
       |    ELSE round(CAST(coalesce(c.cut_edges, 0) AS DOUBLE)
       |      / CAST(least(v.volume, vt.vt - v.volume) AS DOUBLE), 6)
       |  END AS conductance
       |FROM vol v LEFT JOIN cut c ON v.comm = c.comm, vt
       |ORDER BY community""".stripMargin
  }) { (s, dir) =>
    val e = t(s, dir, "lineitem").select(
      (col("l_partkey") * 2).cast("long").as("src"),
      (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
    Graph.conductance(e, "src", "dst",
      Graph.labelPropagation(e, "src", "dst", iters = 3))
  }

  // MMR diversified re-rank (λ=0.7, top-10 candidates → 5 picks) for two
  // query vectors. The oracle replays the brute-force candidate stage and
  // all 5 greedy steps; every pick/remainder CTE is MATERIALIZED (each is
  // referenced twice — DuckDB's default inlining doubles the plan per
  // step, the x176 2^N lesson).
  private val x197 = Q("x197_mmr_rerank", Some {
    def cos(a: String, b: String) =
      s"""list_dot_product($a, $b) /
         |      (sqrt(list_dot_product($a, $a))
         |       * sqrt(list_dot_product($b, $b)))""".stripMargin
    val steps = (1 to 5).map { t =>
      val p = t - 1
      s"""p$t AS MATERIALIZED (
         |  SELECT qid, id, score, v, 0.7 * score - 0.3 * msim AS mmr
         |  FROM r$p
         |  QUALIFY row_number() OVER (PARTITION BY qid
         |    ORDER BY 0.7 * score - 0.3 * msim DESC, id) = 1),
         |r$t AS MATERIALIZED (
         |  SELECT r.qid, r.id, r.score, r.v,
         |    greatest(r.msim, ${cos("r.v", "p.v")}) AS msim
         |  FROM r$p r JOIN p$t p USING (qid) WHERE r.id <> p.id)"""
        .stripMargin
    }.mkString(",\n")
    val out = (1 to 5).map { t =>
      s"""SELECT qid AS query_id, id AS vec_id, CAST($t AS INT) AS rank,
         |  round(score, 4) AS score, round(mmr, 4) AS mmr FROM p$t"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH q AS (
       |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id IN (0, 1)),
       |sc AS (
       |  SELECT q.qid, e.vec_id AS id,
       |    ${cos("CAST(e.embedding AS DOUBLE[])", "q.qv")} AS score,
       |    CAST(e.embedding AS DOUBLE[]) AS v
       |  FROM embeddings e, q),
       |r0 AS MATERIALIZED (
       |  SELECT qid, id, score, v, CAST(0.0 AS DOUBLE) AS msim
       |  FROM sc QUALIFY row_number() OVER (PARTITION BY qid
       |    ORDER BY score DESC, id) <= 10),
       |$steps
       |$out
       |ORDER BY query_id, rank""".stripMargin
  }) { (s, dir) =>
    val emb = t(s, dir, "embeddings")
    Similarity.mmrRerank(emb, "vec_id", "embedding",
      emb.filter(col("vec_id").isin(0L, 1L)), "vec_id",
      m = 10, k = 5, lambda = 0.7)
  }

  // Label-noise audit: the x191 neighborhood machinery pointed at the
  // examples themselves — top-20 suspects by share of k-NN neighbors
  // with a DIFFERENT label (confident-learning lite). Integer bps keeps
  // the suspect ranking exact.
  private val x199 = Q("x199_label_noise_audit", Some(
    """WITH q AS (
      |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv,
      |    label AS qlab
      |  FROM embeddings
      |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 256),
      |sc AS (
      |  SELECT q.qid, q.qlab, e.vec_id AS nid, e.label AS nlab,
      |    list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv) /
      |      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
      |         CAST(e.embedding AS DOUBLE[]))) *
      |       sqrt(list_dot_product(q.qv, q.qv))) AS cos
      |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
      |top AS (
      |  SELECT qid, qlab, nlab
      |  FROM sc QUALIFY row_number() OVER (PARTITION BY qid
      |    ORDER BY cos DESC, nid) <= 10),
      |agg AS (
      |  SELECT qid, qlab, count(*) AS n_neighbors,
      |    sum(CASE WHEN nlab <> qlab THEN 1 ELSE 0 END) AS n_diff
      |  FROM top GROUP BY qid, qlab)
      |SELECT qid AS vec_id, CAST(qlab AS BIGINT) AS label,
      |  CAST(n_neighbors AS BIGINT) AS n_neighbors,
      |  CAST(n_diff AS BIGINT) AS n_diff,
      |  CAST((CAST(n_diff AS HUGEINT) * 10000) // n_neighbors AS BIGINT)
      |    AS diff_bps
      |FROM agg
      |ORDER BY diff_bps DESC, vec_id LIMIT 20""".stripMargin)) { (s, dir) =>
    Similarity.labelNoiseAudit(t(s, dir, "embeddings"), "vec_id",
      "embedding", "label", nQueries = 256, k = 10, topN = 20)
  }

  // Nearest-centroid (Rocchio) classification — the O(n·d) linear-probe
  // companion to x191's kNN: train 10 class centroids on the md5 75%
  // train folds (per-dim DECIMAL-quantized means packed into i-ordered
  // arrays), score every held-out vector against the broadcast centroid
  // frame by cosine (in-order dot ≡ list_dot_product), argmax with
  // smaller-class tie-break. Per-class integer-bps accuracy. The oracle
  // replays split, centroids, scoring, and the argmax window.
  private val x202 = Q("x202_nearest_centroid", Some(
    """WITH f AS (
      |  SELECT vec_id AS id, label, CAST(embedding AS DOUBLE[]) AS v,
      |    ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % 4
      |      AS fold
      |  FROM embeddings),
      |dims AS (SELECT max(len(v)) AS d FROM f),
      |ex AS MATERIALIZED (
      |  SELECT label, r.i::BIGINT AS i, v[r.i] AS x
      |  FROM f CROSS JOIN dims CROSS JOIN unnest(range(1, d + 1)) AS r(i)
      |  WHERE fold != 0),
      |cm AS (
      |  SELECT label, i,
      |    CAST(sum(CAST(x AS DECIMAL(28,18))) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE) AS c
      |  FROM ex GROUP BY label, i),
      |cent AS MATERIALIZED (
      |  SELECT label AS clab, list(c ORDER BY i) AS cv FROM cm GROUP BY label),
      |sc AS (
      |  SELECT f.id, f.label AS tlab, cent.clab,
      |    list_dot_product(f.v, cent.cv)
      |      / (sqrt(list_dot_product(f.v, f.v))
      |         * sqrt(list_dot_product(cent.cv, cent.cv))) AS cos
      |  FROM f, cent WHERE f.fold = 0),
      |pr AS (SELECT id, tlab, clab AS pred FROM sc
      |       QUALIFY row_number() OVER (PARTITION BY id
      |         ORDER BY cos DESC, clab) = 1)
      |SELECT CAST(tlab AS BIGINT) AS label,
      |  CAST(count(*) AS BIGINT) AS n_vectors,
      |  CAST(sum(CASE WHEN pred = tlab THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_correct,
      |  CAST((CAST(sum(CASE WHEN pred = tlab THEN 1 ELSE 0 END) AS HUGEINT)
      |    * 10000) // count(*) AS BIGINT) AS acc_bps
      |FROM pr GROUP BY tlab ORDER BY label""".stripMargin)) { (s, dir) =>
    Similarity.nearestCentroidClassify(t(s, dir, "embeddings"), "vec_id",
      "embedding", "label", folds = 4, testFold = 0)
  }

  // Adjusted Rand Index between the LPA partition after 2 vs after 3
  // iterations — the community-STABILITY grade (x162 counts label flips;
  // ARI grades whether the flips actually moved pair structure,
  // chance-corrected). Pure pair counting: one contingency aggregate,
  // exact C(n,2) sums, one fixed double op sequence. The oracle replays
  // both LPA chains, the membership join, and the pair arithmetic.
  private val x206 = Q("x206_ari_stability", Some {
    def iter(prev: String, name: String) =
      s"""$name AS (
         |  SELECT e.dst AS node, l.lab AS lab
         |  FROM e JOIN $prev l ON l.node = e.src
         |  GROUP BY e.dst, l.lab
         |  QUALIFY row_number() OVER (PARTITION BY e.dst
         |    ORDER BY count(*) DESC, l.lab) = 1)""".stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT CAST(l_partkey * 2 AS BIGINT) AS src,
       |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
       |  FROM lineitem),
       |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
       |l0 AS (SELECT node, node AS lab
       |       FROM (SELECT DISTINCT src AS node FROM e)),
       |${iter("l0", "i1")},
       |${iter("i1", "i2")},
       |${iter("i2", "i3")},
       |ct AS (SELECT a.lab AS ca, b.lab AS cb, count(*) AS n
       |       FROM i2 a JOIN i3 b USING (node) GROUP BY 1, 2),
       |nf AS (SELECT sum(n) AS nt, sum(n * (n - 1) // 2) AS sij FROM ct),
       |saf AS (SELECT sum(na * (na - 1) // 2) AS sa
       |        FROM (SELECT sum(n) AS na FROM ct GROUP BY ca)),
       |sbf AS (SELECT sum(nb * (nb - 1) // 2) AS sb
       |        FROM (SELECT sum(n) AS nb FROM ct GROUP BY cb)),
       |m AS (SELECT nt, sij, sa, sb, nt * (nt - 1) // 2 AS cn2
       |      FROM nf, saf, sbf),
       |fin AS (SELECT nt, sij,
       |    CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE) / CAST(cn2 AS DOUBLE)
       |      AS e,
       |    (CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE)) / 2.0
       |      - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE) / CAST(cn2 AS DOUBLE)
       |      AS den
       |  FROM m)
       |SELECT CAST(nt AS BIGINT) AS n_items, CAST(sij AS BIGINT)
       |    AS pairs_both,
       |  CASE WHEN den = 0.0 THEN NULL
       |       ELSE round((CAST(sij AS DOUBLE) - e) / den, 6) END AS ari
       |FROM fin""".stripMargin
  }) { (s, dir) =>
    val e = t(s, dir, "lineitem").select(
      (col("l_partkey") * 2).cast("long").as("src"),
      (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
    // one trajectory, two read points: LPA's update is deterministic, so
    // iters=2 is exactly frames(2) of the iters=3 run — the former two
    // separate runs re-symmetrized the edges and re-ran the shared
    // 2-iteration prefix (r15; bit-identical by construction, the same
    // lineage-truncated iterates)
    val frames = Graph.labelPropagationFrames(e, "src", "dst", iters = 3,
      checkpointDir = None)
    val a = frames(2).select(col("node"), col("lab").as("comm_a"))
    val b = frames(3).select(col("node"), col("lab").as("comm_b"))
    graft.operators.Stats.adjustedRandIndex(a.join(b, "node"), "node",
      "comm_a", "comm_b")
  }

  val qs: Seq[Q] = Seq(x97, x98, x99, x100, x101, x102, x103, x104, x105,
    x106, x107, x108, x131, x133, x136, x151, x152, x154, x155, x156,
    x157, x161, x162, x163, x164, x165, x166, x167, x168, x169, x170,
    x188, x191, x194, x197, x199, x202, x206, x288, x289, x291)
}
