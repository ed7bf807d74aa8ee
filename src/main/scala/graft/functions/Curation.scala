package graft.functions

import graft.operators.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data curation operators (beyond-reference north star):
  * token-bounded chunking, deterministic stratified sampling, PII
  * scrubbing. All pure expressions — no shuffle except the chunk explode.
  */
object Curation {

  /** Split documents into token-bounded chunks with overlap. stride =
    * chunkTokens - overlap; every token lands in ≥1 chunk, consecutive
    * chunks share `overlap` tokens (the standard context-window prep).
    * One explode — embarrassingly parallel, no shuffle. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 50, overlap: Int = 10): DataFrame = {
    require(overlap < chunkTokens, "overlap must be smaller than chunkTokens")
    val stride = chunkTokens - overlap
    val withWords = df.withColumn("__ws", Dedup.words(col(textCol)))
      .withColumn("__n", size(col("__ws")))
    withWords
      .filter(col("__n") > 0)
      .withColumn("__chunks", expr(
        s"transform(sequence(0, int((greatest(__n - $overlap - 1, 0)) / $stride)), " +
        s"i -> array_join(slice(__ws, i * $stride + 1, $chunkTokens), ' '))"))
      .select(col(idCol), posexplode(col("__chunks")))
      .select(col(idCol), col("pos").cast("int").as("chunk_idx"),
        col("col").as("chunk_text"),
        size(split(col("col"), " ")).as("chunk_tokens"))
  }

  /** Deterministic stratified sampling: md5-hash the id with a seed and
    * keep the row when `hash % 100 < rate(stratum)`. Reproducible across
    * runs AND engines (no rand()), per-stratum rates, default for unlisted
    * strata. Pure filter — pushes down, no shuffle, no driver state. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      ratesPct: Map[String, Int], defaultPct: Int, seed: String = "s"): DataFrame = {
    val bucket = Dedup.seededHash(0, concat(lit(s"$seed:"), col(idCol).cast("string"))) % 100
    val rate = ratesPct.foldLeft(lit(defaultPct)) { case (acc, (stratum, pct)) =>
      when(col(stratumCol) === stratum, lit(pct)).otherwise(acc)
    }
    df.filter(bucket < rate)
  }

  /** Exact-quota mixture sampling — "build me a training mix of exactly
    * `total` documents with each group's share preserved": per-group
    * quotas by Hamilton's largest-remainder method (base = ⌊total·n_g/N⌋,
    * the total−Σbase leftovers go to the largest integer remainders,
    * ties to the lower group key), then each group contributes its
    * md5-ranked top-quota documents. Unlike rate-based sampling
    * ([[stratifiedSample]]) the output size is EXACTLY `total` and the
    * allocation is the closest integer apportionment to the true shares
    * — the property a fixed token budget needs.
    *
    * Everything is integer arithmetic (quotas via DECIMAL(38,0) div/mod
    * — no float shares anywhere) plus one deterministic md5 order, so
    * the draw replays bit-for-bit in any engine. Scale shape: one count
    * aggregate (≤|groups| rows, windows over that bounded frame only),
    * quotas broadcast back, and the per-group draw is a rank window the
    * optimizer caps pre-shuffle (WindowGroupLimit at the max quota).
    *
    * Requires total ≤ N (quota of a group never exceeds its n_g only
    * when shares are consistent — callers sample DOWN). ENFORCED at
    * action time: a `raise_error` guard rides the ≤|groups|-row counts
    * frame (no extra corpus pass, the plan stays lazily buildable), so
    * a budget larger than the corpus fails loudly instead of silently
    * returning all N rows — fewer than the promised total.
    *
    * EMPTY-corpus caveat: the guard rides the counts frame, which has
    * no rows when `df` is empty — an empty input returns an EMPTY frame
    * rather than raising (there is no row for the guard to evaluate
    * on), even though total >= 1 > N = 0 violates the exact-budget
    * contract. Callers drawing from a possibly-empty corpus must treat
    * an empty result as that violation; every non-empty input with
    * total > N raises. The same caveat applies to
    * [[temperatureQuotaSample]]'s saturation guard. */
  def quotaSample(df: DataFrame, idCol: String, groupCol: String,
      total: Int, seed: String = "q"): DataFrame = {
    require(total >= 1, "total must be positive")
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val wRem = org.apache.spark.sql.expressions.Window
      .orderBy(desc("__rem"), col(groupCol))
    // "__tot", not "__N": Spark SQL resolution is case-insensitive, so a
    // name differing from "__n" only by case would alias the SAME column
    // inside expr() and the apportionment would divide n by itself
    val quotas = counts
      .withColumn("__tot", sum(col("__n")).over(wAll))
      .withColumn("__tot",
        when(col("__tot") < lit(total.toLong),
          raise_error(concat(
            lit(s"quotaSample: total=$total exceeds corpus size N="),
            col("__tot").cast("string"))).cast("bigint"))
        .otherwise(col("__tot")))
      .withColumn("__base",
        expr(s"CAST((CAST(__n AS DECIMAL(38,0)) * $total) DIV __tot " +
          "AS BIGINT)"))
      .withColumn("__rem",
        (dec(col("__n")) * dec(lit(total.toLong))) %
          dec(col("__tot")))
      .withColumn("__left",
        lit(total.toLong) - sum(col("__base")).over(wAll))
      .withColumn("__rr", row_number().over(wRem))
      .select(col(groupCol),
        (col("__base") +
          when(col("__rr") <= col("__left"), 1L).otherwise(0L))
          .as("quota"))
    val wDraw = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(col("__ord"), col(idCol))
    df.select(col(groupCol), col(idCol))
      .withColumn("__ord", Dedup.seededHash(0,
        concat(lit(s"$seed:"), col(idCol).cast("string"))))
      .join(broadcast(quotas), Seq(groupCol))
      .withColumn("__rn", row_number().over(wDraw))
      .filter(col("__rn") <= col("quota"))
      .select(col(groupCol), col(idCol), col("quota"))
  }

  /** Temperature-flattened mixture sampling — the multilingual/multi-
    * domain rebalancing step of LLM data prep (Lample & Conneau 2019's
    * exponentiated-share sampling): per-group quotas proportional to
    * n_g^α instead of n_g, so low-resource groups are oversampled
    * relative to their raw share while the corpus-wide budget stays
    * EXACTLY `total`. α = 1/2^sqrtSteps (default 0.5, the common
    * choice): the exponent is computed as `sqrtSteps` nested square
    * roots because IEEE sqrt is correctly rounded — bit-identical in
    * any engine — where a general libm pow() is not.
    *
    * Determinism: weights are integerized as floor(1e6·n^α + 0.5)
    * (floor(x+0.5) is engine-stable where round()/rint() tie rules are
    * not), apportionment is [[quotaSample]]'s Hamilton largest-remainder
    * method on those exact integers, and the per-group draw is the same
    * md5-ranked top-quota. Scale shape identical to [[quotaSample]]:
    * one ≤|groups|-row counts aggregate (windows ride only that frame),
    * quotas broadcast back, WindowGroupLimit-capped draw.
    *
    * Flattening can apportion a small group MORE than it has (that is
    * the point of temperature sampling — and its failure mode, since
    * a saturated group cannot fill its quota): enforced at action time
    * via raise_error on the bounded quota frame — lower `total` or use
    * more corpus rather than silently missing the budget. */
  def temperatureQuotaSample(df: DataFrame, idCol: String,
      groupCol: String, total: Int, sqrtSteps: Int = 1,
      seed: String = "tq"): DataFrame = {
    require(total >= 1, "total must be positive")
    require(sqrtSteps >= 1 && sqrtSteps <= 3, "sqrtSteps must be in [1, 3]")
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val wRem = org.apache.spark.sql.expressions.Window
      .orderBy(desc("__rem"), col(groupCol))
    val flat = (1 to sqrtSteps)
      .foldLeft(col("__n").cast("double"))((a, _) => sqrt(a))
    val quotas = counts
      .withColumn("__w",
        floor(flat * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("__wtot", sum(col("__w")).over(wAll))
      .withColumn("__base",
        expr(s"CAST((CAST(__w AS DECIMAL(38,0)) * $total) DIV __wtot " +
          "AS BIGINT)"))
      .withColumn("__rem",
        (dec(col("__w")) * dec(lit(total.toLong))) % dec(col("__wtot")))
      .withColumn("__left",
        lit(total.toLong) - sum(col("__base")).over(wAll))
      .withColumn("__rr", row_number().over(wRem))
      .withColumn("quota",
        col("__base") +
          when(col("__rr") <= col("__left"), 1L).otherwise(0L))
      .withColumn("quota",
        when(col("quota") > col("__n"),
          raise_error(concat(
            lit("temperatureQuotaSample: flattened quota "),
            col("quota").cast("string"), lit(" exceeds group size "),
            col("__n").cast("string"),
            lit(" — lower total or flatten less"))).cast("bigint"))
        .otherwise(col("quota")))
      .select(col(groupCol), col("quota"))
    val wDraw = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(col("__ord"), col(idCol))
    df.select(col(groupCol), col(idCol))
      .withColumn("__ord", Dedup.seededHash(0,
        concat(lit(s"$seed:"), col(idCol).cast("string"))))
      .join(broadcast(quotas), Seq(groupCol))
      .withColumn("__rn", row_number().over(wDraw))
      .filter(col("__rn") <= col("quota"))
      .select(col(groupCol), col(idCol), col("quota"))
  }

  /** Benchmark decontamination: flag training documents that share any word
    * n-gram with an eval/benchmark set (the standard n-gram-overlap
    * decontamination step of LLM training-data prep; production uses n≈13,
    * the parameter scales freely). 100 TB design: the benchmark side is an
    * eval suite — small by construction — so its DISTINCT grams broadcast
    * (`broadcastBench=false` falls back to a shuffle hash join when the
    * "benchmark" is itself large); the train side is one shingle explode +
    * one hash aggregate, never a cross join. Returns one row per train doc:
    * (id, n_overlap = distinct shared grams, contaminated). */
  def decontaminate(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 13, broadcastBench: Boolean = true): DataFrame = {
    val bg0 = Dedup.shingleSets(bench, idCol, textCol, n)
      .select(explode(col("shs")).as("g")).distinct()
    val bg = if (broadcastBench) broadcast(bg0) else bg0
    val tg = Dedup.shingleSets(train, idCol, textCol, n)
      .select(col(idCol), explode(col("shs")).as("g"))
    val hits = tg.join(bg, "g")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_overlap"))
    train.select(col(idCol)).join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) > 0).as("contaminated"))
  }

  /** GPT-style sequence packing: conceptually concatenate all documents of a
    * shard in id order and cut the token stream at `capacity` boundaries.
    * Emits, per document, the pack its first token lands in, the offset
    * inside that pack, and how many packs it spans — everything a writer
    * needs to materialize packed training sequences. Zero-token documents
    * contribute nothing to the stream and are dropped.
    *
    * 100 TB design: the only non-map operation is a running sum windowed BY
    * SHARD (`shardCol`) — packs are per-shard, so shards pack in parallel
    * with no global ordering bottleneck (pack ids are unique per shard, as
    * training shards are). */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      capacity: Int, shardCol: String): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("n_tokens", size(Dedup.words(col(textCol))).cast("long"))
      .filter(col("n_tokens") > 0)
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("__start", col("__cum") - col("n_tokens"))
      .select(col(idCol), col(shardCol), col("n_tokens"),
        expr(s"__start div $capacity").as("pack_id"),
        (col("__start") % capacity).as("pack_offset"),
        (expr(s"(__cum - 1) div $capacity") -
          expr(s"__start div $capacity") + 1).as("n_packs"))
  }

  /** Vocabulary-based token-id encoding: build a frequency-ranked vocab of
    * the top `vocabSize` tokens (deterministic count-then-token ordering),
    * then encode every document as its token-id sequence (OOV → 0). The
    * classic text→ids step before sequence packing.
    *
    * 100 TB design: the vocab is bounded (`vocabSize` rows) and broadcast;
    * encoding is one posexplode + broadcast join + one groupBy with an
    * in-group sort — no global ordering. Token ids are emitted as a
    * comma-joined string column (`token_ids`), ready for a writer. */
  def vocabEncode(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 50): DataFrame = {
    val toks = df.select(col(idCol),
      posexplode(Dedup.words(col(textCol))).as(Seq("pos", "w")))
    val wRank = org.apache.spark.sql.expressions.Window
      .orderBy(desc("__c"), col("w"))
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("__c"))
      .orderBy(desc("__c"), col("w")).limit(vocabSize)
      .withColumn("token_id", row_number().over(wRank).cast("long"))
      .select(col("w"), col("token_id"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .withColumn("__tid", coalesce(col("token_id"), lit(0L)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("__tid")))),
          s => s.getField("__tid").cast("string")), ",").as("token_ids"))
  }

  /** Data-driven domain rebalancing: hit a target corpus MIX, not fixed
    * per-stratum rates. Given target weights per domain and a total row
    * budget, the keep-rate for domain d is min(1, budget·w_d / n_d) —
    * computed FROM the data (one tiny count aggregate, broadcast back) —
    * and rows are kept by the same deterministic seeded-hash filter as
    * [[stratifiedSample]]. Domains without a weight fall back to
    * `defaultWeight`. At 100 TB the counts frame is |domains| rows; the
    * data-side work is a broadcast join + a pushed-down filter. */
  def domainMix(df: DataFrame, idCol: String, domainCol: String,
      weights: Map[String, Double], totalTarget: Long,
      defaultWeight: Double = 0.0, seed: String = "mix"): DataFrame = {
    val wExpr = weights.foldLeft(lit(defaultWeight)) { case (acc, (d, w)) =>
      when(col(domainCol) === d, lit(w)).otherwise(acc)
    }
    val rates = df.groupBy(domainCol).agg(count(lit(1)).as("__n"))
      .withColumn("__cut",
        floor(least(lit(1.0), lit(totalTarget.toDouble) * wExpr / col("__n"))
          * 10000).cast("long"))
      .select(col(domainCol), col("__cut"))
    df.join(broadcast(rates), Seq(domainCol))
      .filter(Dedup.seededHash(0,
        concat(lit(s"$seed:"), col(idCol).cast("string"))) % 10000 < col("__cut"))
      .drop("__cut")
  }

  /** URL canonicalization — the normalization step before URL-keyed dedup
    * of a crawl (same page fetched as `HTTP://Site.com/a?utm_source=x#top`
    * and `http://site.com/a` must collide). Steps, in order: lowercase the
    * scheme+host (path stays case-sensitive), drop the fragment, strip
    * tracking params (utm_*, fbclid, gclid), drop default ports (:80/:443),
    * collapse a now-empty query, and trim one trailing slash. Pure
    * RE2-compatible regexp_replace chain — codegen'd, engine-portable, no
    * UDF. */
  def canonicalizeUrl(url: Column): Column = {
    // lowercase scheme://host[:port] only: rebuild from extracted groups
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val host = lower(regexp_extract(rest, "^([^/?#]*)", 1))
    val tail = regexp_replace(rest, "^[^/?#]*", "")
    val noFragment = regexp_replace(tail, "#.*", "")
    val noTracking = regexp_replace(noFragment,
      "(utm_[a-z]+|fbclid|gclid)=[^&#]*&?", "")
    val noDanglingSep = regexp_replace(noTracking, "[?&]$", "")
    val noDefaultPort = regexp_replace(host, ":(80|443)$", "")
    val joined = concat(scheme, lit("://"), noDefaultPort, noDanglingSep)
    regexp_replace(joined, "/$", "")
  }

  /** Keyed crawl dedup: canonicalize `urlCol`, keep the first (min-id) row
    * per canonical URL. Same one-shuffle min-aggregate shape as
    * Dedup.exactDedup — no window, map-side combine does most of the work. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val withC = df.withColumn("canonical_url", canonicalizeUrl(col(urlCol)))
    val winners = withC.groupBy("canonical_url")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
    withC.join(winners, Seq("canonical_url", idCol))
  }

  /** Exactly-n-per-group sampling: rank rows inside each stratum by a
    * seeded md5 of the id and keep the first n. Unlike [[stratifiedSample]]
    * (rate-based, size ∝ stratum), this guarantees the sample SIZE —
    * the eval-set / few-shot-selection primitive. The rank filter plans a
    * WindowGroupLimit, so each map task forwards at most n rows per group
    * before the shuffle. Deterministic across runs and engines. */
  def groupSample(df: DataFrame, idCol: String, stratumCol: String,
      n: Int, seed: String = "gs"): DataFrame = {
    require(n > 0, "sample size must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol)
      .orderBy(md5(concat(lit(s"$seed:"), col(idCol).cast("string"))), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Content-defined chunking (stateless gear-hash style): a position is a
    * chunk boundary when the md5 of the trailing `window` chars hits
    * 0 mod `mask` — so boundaries depend only on LOCAL content and survive
    * insertions/deletions elsewhere (the CDC property that makes
    * blob-level dedup work across edits; average chunk ≈ `mask` chars).
    * Returns per doc: n_chunks, max_chunk, and the exact boundary-position
    * sum (the audit checksum).
    *
    * 100 TB design: one explode over positions + one per-doc window/agg —
    * embarrassingly parallel across docs, no cross-doc state. (A
    * min/max-chunk-size variant needs a sequential scan per doc — this
    * stateless form is the one that parallelizes.) */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      window: Int = 8, mask: Int = 32): DataFrame = {
    require(window >= 2 && mask >= 2, "window and mask must be >= 2")
    val base = df.select(col(idCol), col(textCol).cast("string").as("__t"))
      .withColumn("__len", length(col("__t")).cast("long"))
    // sequence(a, b) with b < a generates DESCENDING values — guard first
    val bounds = base.filter(col("__len") >= window)
      .select(col(idCol), col("__len"), col("__t"),
        explode(expr(s"sequence($window, __len)")).as("i"))
      .withColumn("__w", expr(s"substring(__t, i - ${window - 1}, $window)"))
      .filter(Dedup.seededHash(1, col("__w")) % mask === 0)
      .select(col(idCol), col("__len"), col("i"))
    val wLag = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("i")
    val agg = bounds
      .withColumn("__gap", col("i") - coalesce(lag(col("i"), 1).over(wLag), lit(0L)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__nb"), sum(col("i")).as("boundary_sum"),
        max(col("__gap")).as("__maxgap"), max(col("i")).as("__lastb"),
        max(col("__len")).as("__len"))
    base.select(col(idCol), col("__len").as("__dlen"))
      .join(agg, Seq(idCol.toString), "left")
      .select(col(idCol),
        when(col("__nb").isNull, lit(1L))
          .otherwise(col("__nb") +
            when(col("__dlen") > col("__lastb"), lit(1L)).otherwise(lit(0L)))
          .as("n_chunks"),
        when(col("__nb").isNull, col("__dlen"))
          .otherwise(greatest(col("__maxgap"), col("__dlen") - col("__lastb")))
          .as("max_chunk"),
        coalesce(col("boundary_sum"), lit(0L)).as("boundary_sum"))
  }

  /** Weight-proportional sampling with EXACT integer tickets: each row gets
    * `weight` md5 tickets and its priority is the minimum ticket; the k rows
    * with the smallest priorities win. P(selected) grows with weight like
    * the classic exponential-key A-Res scheme, but every comparison is an
    * integer md5 compare — no pow()/ln() whose last-ulp drift could flip a
    * selection across engines or hardware.
    *
    * 100 TB design: the explode is bounded by `maxWeight` (guarded), the
    * per-row min is a map-side-combined aggregate, and the global top-k is
    * TakeOrderedAndProject — no global sort, no driver loop. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, maxWeight: Int = 64, seed: String = "ws"): DataFrame = {
    require(k > 0, "k must be positive")
    val capped = least(greatest(col(weightCol).cast("int"), lit(1)), lit(maxWeight))
    df.withColumn("__w", capped)
      .withColumn("__t", explode(expr("sequence(1, __w)")))
      .withColumn("__ticket", Dedup.seededHash(0,
        concat(lit(s"$seed:"), col(idCol).cast("string"), lit(":"),
          col("__t").cast("string"))))
      .groupBy(col(idCol))
      .agg(min(col("__ticket")).as("priority"),
        first(col("__w")).as("eff_weight"))
      .orderBy(col("priority"), col(idCol))
      .limit(k)
  }

  /** PII scrubbing: redact emails and phone-shaped tokens. RE2-compatible
    * patterns (portable across engines); extend the list per policy. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, "[EMAIL]"),
      PhonePattern, "[PHONE]")

  /** Scrub + count what was redacted in the same pass (audit trail). */
  def scrubPiiWithCounts(df: DataFrame, textCol: String): DataFrame = df
    .withColumn("n_emails",
      size(split(col(textCol), EmailPattern, -1)) - 1)
    .withColumn("n_phones",
      size(split(col(textCol), PhonePattern, -1)) - 1)
    .withColumn(textCol, scrubPii(col(textCol)))

  /** 13–19 digit runs with optional single space/dash separators — the
    * payment-card CANDIDATE shape; the Luhn checksum decides. */
  val CardPattern = "\\b(?:\\d[ -]?){12,18}\\d\\b"

  /** Luhn-validated card scrub: candidates come from [[CardPattern]], but
    * only sequences passing the Luhn mod-10 checksum are redacted — the
    * distinction a naive regex cannot make (invoices, order ids and
    * timestamps are 16-digit runs too; scrubbing them destroys data for
    * zero privacy gain). Returns the frame with `textCol` scrubbed and an
    * exact `n_cards` audit count.
    *
    * Shape: candidates explode to rows, the checksum is the native
    * codegen'd [[graft.functions.expr.LuhnValid]] (one right-to-left byte
    * scan — no regexp_replace/reverse/HOF-fold chain, no per-row lambda
    * interpretation), valid matches regroup per row, and the redaction is
    * one fold of `replace` over the distinct matches, longest first so a
    * shorter match can never corrupt a longer one it is a substring of.
    * One explode + one groupBy on the row key; no shuffle wider than the
    * candidate count. */
  def scrubCardsWithAudit(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val cand = df.select(col(idCol), col(textCol).as("__text"),
        explode_outer(regexp_extract_all(col(textCol), lit(CardPattern), lit(0)))
          .as("__m"))
      // Luhn: from the rightmost digit, double every second one, subtract
      // 9 when doubling overflows a digit; valid iff the sum is ≡ 0 mod 10
      // AND the digit count (separators ignored) lands in [13, 19]
      .withColumn("__ok", {
        import org.apache.spark.sql.graftbridge.Bridge
        col("__m").isNotNull && Bridge.column(
          graft.functions.expr.LuhnValid(Bridge.expression(col("__m"))))
      })
    cand.groupBy(col(idCol), col("__text"))
      .agg(sum(when(col("__ok"), 1L).otherwise(0L)).as("n_cards"),
        array_distinct(collect_list(when(col("__ok"), col("__m")))).as("__cards"))
      .withColumn("__sorted", expr(
        "transform(array_sort(transform(__cards, " +
          "m -> struct(-length(m) as l, m as m))), s -> s.m)"))
      .withColumn(textCol, expr(
        "aggregate(__sorted, __text, (acc, m) -> replace(acc, m, '[CARD]'))"))
      .drop("__text", "__cards", "__sorted")
  }

  /** Drop the bottom `fraction` of rows by `keyCol` — the exact-percentile
    * corpus gate ("prune the worst-quality 20%") with NO SinglePartition
    * window: ranks come from Indexing.globalIndex (range shuffle + local
    * row_number + broadcast offsets) and the row count rides in as a
    * broadcast 1-row frame, so the cut is exact and deterministic (make
    * `keyCol` unique — compose score and id) at any scale. */
  def pruneBottomQuantile(df: DataFrame, keyCol: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction < 1.0, s"fraction=$fraction out of [0,1)")
    val n = df.agg(count(lit(1)).as("__n"))
    graft.operators.Indexing.globalIndex(df, keyCol)
      .crossJoin(broadcast(n))
      .filter(col("global_idx") > floor(col("__n") * fraction))
      .drop("__n", "global_idx")
  }

  /** Leakage-safe TEMPORAL train/val/test split with embargo — the
    * time-series complement to [[groupAwareSplit]]'s cluster split:
    * boundaries
    * are the actual timestamps at ranks `floor(n·trainFrac)` and
    * `floor(n·(trainFrac+valFrac))` (discrete, so no interpolation
    * arithmetic can differ across engines), and rows within
    * `embargoSeconds` AFTER each boundary are labeled `embargo_*` — a
    * model trained on `train` never sees a `val` row whose look-back
    * window overlaps the training period (the purged/embargoed split of
    * financial ML). Rank assignment is by (`tsCol`, `idCol`) — the id
    * tiebreak makes the boundary deterministic on timestamp ties.
    *
    * Scale shape: ranks via the range-partitioned [[graft.operators
    * .Indexing.globalIndexBy]] (never a SinglePartition window), the two
    * boundary timestamps and the row count ride back as a broadcast 1-row
    * frame, and the labeling itself is a map-only projection. */
  def temporalSplit(df: DataFrame, tsCol: String, idCol: String,
      trainFrac: Double = 0.7, valFrac: Double = 0.15,
      embargoSeconds: Long = 3600): DataFrame = {
    require(trainFrac > 0 && valFrac > 0 && trainFrac + valFrac < 1,
      s"bad fractions: train=$trainFrac val=$valFrac")
    require(embargoSeconds >= 0, s"embargoSeconds=$embargoSeconds")
    val n = df.agg(count(lit(1)).as("__n"))
    val bounds = graft.operators.Indexing.globalIndexBy(df, Seq(tsCol, idCol))
      .crossJoin(broadcast(n))
      .filter(col("global_idx") ===
          greatest(lit(1L), floor(col("__n") * trainFrac)) ||
        col("global_idx") ===
          greatest(lit(1L), floor(col("__n") * (trainFrac + valFrac))))
      // the smaller rank is the earlier timestamp (ordering is by ts)
      .agg(min(col(tsCol)).as("__t1"), max(col(tsCol)).as("__t2"))
    df.crossJoin(broadcast(bounds))
      .withColumn("split",
        when(col(tsCol) <= col("__t1"), "train")
          .when(col(tsCol) <=
            col("__t1") + expr(s"INTERVAL $embargoSeconds SECOND"),
            "embargo_train_val")
          .when(col(tsCol) <= col("__t2"), "val")
          .when(col(tsCol) <=
            col("__t2") + expr(s"INTERVAL $embargoSeconds SECOND"),
            "embargo_val_test")
          .otherwise("test"))
      .drop("__t1", "__t2")
  }

  /** Training-mixture token allocator — the "data recipe" step: given
    * per-source integer weights and a total token budget, how many FULL
    * passes of each source to take plus what fraction of one more. All
    * arithmetic is integer (targets are `budget·w div Σw`, the tail
    * fraction is basis points of the last pass), so the plan replays
    * bit-exactly in any engine — no fp mixture drift. Sources absent from
    * `weights` are excluded from the plan (not in the recipe, not in the
    * run). One token-count aggregate over the corpus + a broadcast join
    * against the |sources|-row weight frame. */
  def mixturePlan(df: DataFrame, sourceCol: String, textCol: String,
      weights: Map[String, Long], budgetTokens: Long): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    require(budgetTokens >= 0, s"budgetTokens=$budgetTokens")
    val sumW = weights.values.sum
    val spark = df.sparkSession
    import spark.implicits._
    val w = broadcast(weights.toSeq.sortBy(_._1)
      .toDF(sourceCol, "__w"))
    df.select(col(sourceCol),
        size(Dedup.words(col(textCol))).cast("long").as("__t"))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__t")).as("available_tokens"))
      .join(w, sourceCol)
      .withColumn("target_tokens",
        expr(s"${budgetTokens}L * __w div ${sumW}L"))
      .withColumn("n_full_epochs",
        expr("target_tokens div available_tokens"))
      .withColumn("tail_sample_bps",
        expr("(target_tokens % available_tokens) * 10000 div available_tokens"))
      .withColumn("oversampled",
        col("target_tokens") > col("available_tokens"))
      .drop("__w")
  }

  /** Deterministic epoch shuffle into training shards: each row's md5
    * ticket (seed + id) decides its shard AND its position within the
    * shard — a seeded pseudo-random permutation with no global sort.
    * Changing the seed reshuffles every epoch; the same seed replays
    * identically (resumable training). The position window partitions BY
    * SHARD, so shards order themselves in parallel — no SinglePartition
    * exchange at any scale. */
  def epochShuffle(df: DataFrame, idCol: String, seed: String,
      nShards: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__r"), col(idCol))
    df.withColumn("__r",
        md5(concat(lit(seed + ":"), col(idCol).cast("string"))))
      .withColumn("shard",
        conv(substring(col("__r"), 1, 8), 16, 10).cast("long") % nShards)
      .withColumn("pos_in_shard", row_number().over(w))
      .drop("__r")
  }

  /** Hashing-trick bag-of-words: each token hashes (md5 — engine-portable,
    * seedable) into one of `dim` buckets; a document becomes its sparse
    * (bucket → count) vector. Fixed dimensionality with NO vocabulary pass —
    * the point of feature hashing at corpus scale. Returns per-doc
    * (nnz, l1, checksum, vec_md5) plus the sparse vector itself. */
  def featureHash(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 32): DataFrame = {
    val buckets = df
      .select(col(idCol), explode(Dedup.words(col(textCol))).as("__w"))
      .withColumn("__bucket",
        conv(substring(md5(col("__w")), 1, 8), 16, 10).cast("long") % dim)
      .groupBy(col(idCol), col("__bucket"))
      .agg(count(lit(1)).as("__cnt"))
    buckets.groupBy(idCol)
      .agg(count(lit(1)).as("nnz"),
        sum(col("__cnt")).cast("long").as("l1"),
        sum((col("__bucket") + 1) * col("__cnt")).cast("long").as("checksum"),
        expr("transform(array_sort(collect_list(struct(__bucket, __cnt))), " +
          "x -> concat(x.__bucket, ':', x.__cnt))").as("__vec"))
      .withColumn("vec_md5", md5(array_join(col("__vec"), ",")))
      .withColumn("vector", col("__vec"))
      .drop("__vec")
  }

  /** Leakage-safe train/val/test split: near-duplicate CLUSTERS are the
    * split unit, so two near-identical documents can never land in
    * different splits (the classic eval-contamination bug). Cluster labels
    * come from [[Dedup.nearDupComponents]] over the supplied candidate
    * pairs; singletons cluster as themselves. Assignment is a seeded md5
    * bucket of the CLUSTER id — deterministic, engine-portable, and stable
    * under re-runs. Buckets 0..trainPct-1 → train, next valPct → val,
    * rest → test (out of 10). */
  def groupAwareSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      seed: String, trainPct: Int = 8, valPct: Int = 1,
      iters: Int = 2): DataFrame =
    groupAwareSplitFromComponents(docs, idCol,
      Dedup.nearDupComponents(pairs, iters), seed, trainPct, valPct)

  /** [[groupAwareSplit]] over PRE-COMPUTED components (node, component) —
    * the entry point when the near-dup clustering already exists (it is
    * the expensive half: LSH + iterative propagation), so one persisted
    * components frame can feed dedup reporting and splitting without
    * re-deriving the chain. */
  def groupAwareSplitFromComponents(docs: DataFrame, idCol: String,
      comps: DataFrame, seed: String, trainPct: Int = 8,
      valPct: Int = 1): DataFrame = {
    require(trainPct + valPct < 10, "train+val must leave room for test")
    docs.select(col(idCol))
      .join(comps, col(idCol) === col("node"), "left")
      .withColumn("cluster", coalesce(col("component"), col(idCol)))
      .withColumn("__b", conv(substring(md5(
        concat(lit(seed + ":"), col("cluster").cast("string"))), 1, 6), 16, 10)
        .cast("long") % 10)
      .withColumn("split",
        when(col("__b") < trainPct, "train")
          .when(col("__b") < trainPct + valPct, "val")
          .otherwise("test"))
      .select(col(idCol), col("cluster"), col("split"))
  }

  /** CCNet-style boilerplate removal: segments that recur across ≥ `minDocs`
    * DISTINCT documents (headers, footers, navigation chrome) are dropped
    * from every document, and the survivors reassemble in order.
    *
    * Segmentation is expression-only (slice over the word array — no
    * shuffle) and the cross-corpus frequency is ONE map-side-combinable
    * distinct-count groupBy. The key scale property is what the
    * reassembly does NOT shuffle: instead of re-grouping every kept
    * segment's text per document (full-corpus text through a
    * collect_list), only boilerplate OCCURRENCES — (id, seg_idx) integer
    * pairs, a ≤1/minDocs-selectivity semi join — reach the per-doc
    * aggregate, and the clean text is rebuilt doc-side by an index-filter
    * expression over the original segment array (map-only; AQE broadcasts
    * the per-doc removal lists when they fit, making the final join
    * shuffle-free). A prior collect_list-reassembly version measured 8.6×
    * time at 10× data; this shape is the fix. */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
      segWords: Int = 2, minDocs: Long = 150): DataFrame = {
    val withSegs = df
      .withColumn("__ws", Dedup.words(col(textCol)))
      .withColumn("__segs", expr(
        s"transform(sequence(0, int((size(__ws) - 1) / $segWords)), " +
        s"i -> array_join(slice(__ws, i * $segWords + 1, $segWords), ' '))"))
      .drop("__ws")
    val segs = withSegs
      .select(col(idCol), posexplode(col("__segs")))
      .select(col(idCol), col("pos").cast("long").as("seg_idx"),
        col("col").as("seg"))
    val boilerplate = segs.groupBy("seg")
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select("seg")
    val removed = segs.join(boilerplate, Seq("seg"), "left_semi")
      .groupBy(idCol)
      .agg(sort_array(collect_list(col("seg_idx"))).as("__rm"))
    withSegs.join(removed, Seq(idCol), "left")
      .withColumn("__rm",
        coalesce(col("__rm"), expr("array()").cast("array<long>")))
      .select(col(idCol),
        array_join(expr(
          "filter(__segs, (s, i) -> NOT array_contains(__rm, bigint(i)))"),
          " ").as("clean_text"),
        (size(col("__segs")) - size(col("__rm"))).cast("long").as("n_kept"),
        size(col("__rm")).cast("long").as("n_removed"))
  }

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", hashed-n-gram variant):
    * every document is scored by the log-likelihood ratio of its hashed
    * word-unigram features under an add-1-smoothed TARGET bucket model vs
    * the RAW (non-target) corpus model, and the top-k highest-ratio
    * documents are kept — "give me more raw data that looks like my
    * high-quality domain".
    *
    * Determinism discipline: bucket = md5-hash(word) % dim (the
    * [[featureHash]] convention, engine-portable); each of the two ln
    * bucket-probabilities is quantized to DECIMAL(24,14) BEFORE the
    * subtraction, so per-bucket log-ratios are exact decimals, the
    * BIGINT count × DECIMAL(24,14) product fits decimal(35,14) with zero
    * loss, and the per-document sum is order-free — identical in any
    * engine. The top-k boundary tie-breaks on id.
    *
    * Scale shape: ONE explode over the corpus feeds a (doc, bucket)
    * count aggregate that is lineage-truncated and reused by BOTH the
    * model pass and the scoring pass (without it the corpus tokenizes
    * twice). The model, totals, and log-ratio frames are ≤ dim rows and
    * broadcast; scoring is a broadcast join + per-doc aggregate; the
    * final top-k is TakeOrderedAndProject, never a global sort.
    * (localCheckpoint is the single-JVM shape — on a real cluster the
    * counts frame would land in an intermediate table.)
    *
    * Documents with zero alphanumeric tokens have no features, hence no
    * score, and are never selected. */
  def dsirSelect(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, dim: Int = 64, topK: Int = 100): DataFrame = {
    require(dim >= 2 && dim <= 4096, s"dim=$dim out of [2,4096]")
    val counts = df
      .select(col(idCol), isTarget.as("__t"),
        explode(Dedup.words(col(textCol))).as("__w"))
      .withColumn("__bucket",
        conv(substring(md5(col("__w")), 1, 8), 16, 10).cast("long") % dim)
      .groupBy(col(idCol), col("__t"), col("__bucket"))
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint()
    val model = counts.groupBy("__bucket")
      .agg(sum(when(col("__t"), col("__n")).otherwise(0L)).as("__tn"),
        sum(when(!col("__t"), col("__n")).otherwise(0L)).as("__rn"))
    val totals = model.agg(sum("__tn").as("__tt"), sum("__rn").as("__rt"))
    val ratio = model.crossJoin(broadcast(totals))
      .select(col("__bucket"),
        (log((col("__tn") + 1).cast("double") / (col("__tt") + dim).cast("double"))
            .cast("decimal(24,14)")
          - log((col("__rn") + 1).cast("double") / (col("__rt") + dim).cast("double"))
            .cast("decimal(24,14)")).as("__lr"))
    counts.join(broadcast(ratio), "__bucket")
      .groupBy(col(idCol))
      .agg(sum("__n").cast("long").as("n_tokens"),
        sum(col("__n").cast("decimal(10,0)") * col("__lr")).as("__s"))
      .orderBy(col("__s").desc, col(idCol))
      .limit(topK)
      .select(col(idCol), col("n_tokens"),
        round(col("__s").cast("double"), 4).as("log_ratio"))
  }

  /** Hashed features + bias for the logistic-regression pair below:
    * (id, y, bucket, x) rows — md5 unigram buckets (the [[featureHash]]
    * convention) as BINARY presence features (x = 1; bounded feature
    * scale keeps constant-rate GD from oscillating the way raw counts
    * measurably do), plus one bias row (bucket = dim, x = 1) per
    * document. Token-free documents contribute no rows and are excluded
    * from training/scoring (no features to learn from).
    *
    * `iterate = true` (the training path) repartitions by id and
    * persists: every GD iteration re-reads the frame twice, and the
    * per-doc z aggregate + gradient join both key on id, so they reuse
    * the partitioning with zero further exchanges. A single-pass scorer
    * sets `iterate = false` — there a pre-shuffle and a cache write are
    * pure overhead (the one z aggregate shuffles on id anyway).
    *
    * `bigrams = true` adds hashed word-BIGRAM presence features into the
    * same bucket space (the fastText signature: word order enters the
    * linear model through bigram features; collisions with unigram
    * buckets are the accepted hashing-trick noise — size `dim` up). */
  private def logisticFeatures(df: DataFrame, idCol: String, textCol: String,
      label: Column, dim: Int, iterate: Boolean = true,
      bigrams: Boolean = false): DataFrame = {
    val base = df.select(col(idCol).as("id"), label.cast("int").as("y"),
      Dedup.words(col(textCol)).as("__ws"))
    // per-doc array_distinct BEFORE the hash: presence features dedupe
    // per (id, bucket) anyway, so collapsing repeated words row-locally
    // (no shuffle) saves one md5+conv per repeated occurrence
    val gramsCol =
      if (!bigrams) array_distinct(col("__ws"))
      else array_distinct(concat(col("__ws"),
        // guard: sequence(1, 0) runs DESCENDING, so token counts < 2
        // must emit an empty bigram list, not a broken one
        when(size(col("__ws")) >= 2,
          expr("transform(sequence(1, size(__ws) - 1), " +
            "i -> concat(element_at(__ws, i), ' ', element_at(__ws, i + 1)))"))
          .otherwise(expr("array()").cast("array<string>"))))
    val counts = base.select(col("id"), col("y"),
        explode(gramsCol).as("__w"))
      .withColumn("bucket",
        conv(substring(md5(col("__w")), 1, 8), 16, 10).cast("long") % dim)
      .select("id", "y", "bucket").distinct()
      .withColumn("x", lit(1L))
    val all = counts.unionByName(counts.select(col("id"), col("y")).distinct()
      .select(col("id"), col("y"), lit(dim.toLong).as("bucket"),
        lit(1L).as("x")))
    if (iterate)
      all.repartition(col("id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else all
  }

  /** Per-doc exact-decimal logit: one pass over the feature frame with
    * the broadcast (≤ dim+1)-row weight frame. A corpus bucket with no
    * trained weight contributes 0 by the inner join (the hashing-trick
    * unseen-feature convention); the bias bucket keeps every featured
    * doc present. */
  private def zOf(feats: DataFrame, w: DataFrame): DataFrame =
    feats.join(broadcast(w.select(col("bucket"),
        col("weight").cast("double").as("weight"))), "bucket")
      .groupBy("id")
      // NOTE: stays the interpreted decimal sum deliberately — a native
      // TypedImperativeAggregate here would put corpus-many keys through
      // ObjectHashAggregate, whose 128-key fallback degrades to
      // sort-based aggregation (measured 2x SLOWER at sf0.1). The
      // small-key aggregates (per-bucket gradient, loss, norm) use
      // SumDec18 instead.
      .agg(sum((col("x").cast("double") * col("weight"))
          .cast("decimal(28,18)")).as("__z"),
        max(col("y")).as("y"))

  /** Confusion matrix + basis-point accuracy of the integer-exact
    * decision σ(z) ≥ 0.5 ⇔ z ≥ 0 on the exact DECIMAL z. */
  private def confusionOf(z: DataFrame): DataFrame =
    z.withColumn("__pred", (col("__z") >= lit(0)).cast("int"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("y") === 1 && col("__pred") === 1, 1L).otherwise(0L))
          .as("tp"),
        sum(when(col("y") === 0 && col("__pred") === 1, 1L).otherwise(0L))
          .as("fp"),
        sum(when(col("y") === 0 && col("__pred") === 0, 1L).otherwise(0L))
          .as("tn"),
        sum(when(col("y") === 1 && col("__pred") === 0, 1L).otherwise(0L))
          .as("fn"))
      .withColumn("accuracy_bps", expr("(tp + tn) * 10000 div n_docs"))

  /** Per-doc feature-ARRAY frame + driver-side class stats — the GD
    * loop's working set: one aggregate over the persisted exploded
    * frame (reuses its id partitioning), then every iteration is a
    * MAP-ONLY pass (native gather-sum z against the broadcast-literal
    * weight vector) plus one (dim+1)-key gradient aggregate. Returns
    * (docs frame persisted by the caller's lifetime, n_docs, class
    * weights wpos/wneg, the sorted seen-bucket list). */
  private def logisticDocs(feats: DataFrame)
      : (DataFrame, Double, Double, Double, Array[Long]) = {
    val docs = feats.groupBy("id", "y")
      .agg(sort_array(collect_list(col("bucket"))).as("__bs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // class-balanced residual weights n/(2·n_class): with a 5% positive
    // rate an unweighted full-batch GD provably stalls (the rare class's
    // gradient is outvoted ~20:1 — measured: all-negative predictions
    // after 8 steps); balanced weights also cancel the gradient of every
    // non-discriminative bucket at w=0, so learning concentrates on the
    // separating features. max(·,1) guards a single-class corpus
    // (weights degenerate to a no-op instead of dividing by zero).
    val cnt = docs.agg(count(lit(1)).cast("double").as("na"),
      sum(when(col("y") === 1, 1L).otherwise(0L)).cast("double").as("np"),
      sum(when(col("y") === 0, 1L).otherwise(0L)).cast("double").as("nn"))
      .head()
    // SQL sum over an EMPTY frame is null (count is 0): a training slice
    // with zero featured docs (a tiny learning-curve fraction, a fold
    // covering the whole corpus, an all-token-free corpus) must degrade
    // to a no-op training run, not a NullPointerException (r13 ADVICE)
    val na = cnt.getDouble(0)
    val np = if (cnt.isNullAt(1)) 0.0 else cnt.getDouble(1)
    val nn = if (cnt.isNullAt(2)) 0.0 else cnt.getDouble(2)
    val wpos = na / (2.0 * math.max(np, 1.0))
    val wneg = na / (2.0 * math.max(nn, 1.0))
    val seen = feats.select("bucket").distinct().collect()
      .map(_.getLong(0)).sorted
    (docs, na, wpos, wneg, seen)
  }

  /** One full-batch GD step at the current driver-held weight vector:
    * per-doc z via [[graft.functions.expr.GatherSumDec18]] (map-only —
    * no join, no per-id aggregate), residual as the same fixed double op
    * sequence as ever, then the whole (dim+1)-slot exact-decimal
    * gradient in ONE [[graft.functions.expr.ScatterSumDec18]] aggregate
    * (r15, the x185 watchlist: the former explode → groupBy(bucket) →
    * sum_dec18 shape materialized one row PER FEATURE per iteration —
    * 16 × corpus-features rows of encode/probe/quantize; the scatter
    * aggregate walks each doc's bucket array in place and quantizes the
    * doc's residual once). Returns (bucket → Σdec18(resid)) for buckets
    * with at least one term — value-identical to both former
    * formulations: same quantized terms, same exact split-long sums,
    * same final decimal→double conversion per bucket. */
  private def gradStep(docs: DataFrame, w: Array[Double], wpos: Double,
      wneg: Double, nSlots: Int): Map[Long, Double] = {
    import graft.functions.expr.GatherSumDec18.gatherSumDec18
    import graft.functions.expr.ScatterSumDec18.scatterSumDec18
    val z = gatherSumDec18(col("__bs"), lit(w))
    val resid =
      (lit(1.0) / (lit(1.0) + exp(-z)) - col("y").cast("double")) *
        when(col("y") === 1, lit(wpos)).otherwise(lit(wneg))
    val slots = docs
      .select(scatterSumDec18(col("__bs"), resid, nSlots).as("__g"))
      .head().getSeq[Any](0)
    slots.iterator.zipWithIndex.collect {
      case (g, b) if g != null => b.toLong -> g.asInstanceOf[Double]
    }.toMap
  }

  /** Per-bucket weights after `iters` full-batch GD steps (unrounded
    * DOUBLE weights plus the exact-decimal machinery the gates need).
    *
    * 100 TB shape (r13): the weight vector lives on the DRIVER
    * (dim+1 ≤ 4097 doubles) and enters each iteration as an array
    * literal, so one GD step is ONE job — a map-only pass over the
    * persisted per-doc array frame into a (dim+1)-key gradient
    * aggregate — instead of the former broadcast join + corpus-keyed
    * interpreted DECIMAL aggregate + gradient join + lineage
    * checkpoint. Every number is bit-identical to that formulation:
    * z is the same exact decimal sum (gather-sum of the same quantized
    * terms), the residual/update arithmetic is the same IEEE op
    * sequence, and buckets without gradient rows keep their weight
    * (the old left-join coalesce-0 update subtracted an exact 0). */
  /** The full-batch GD loop body shared by [[logisticWeights]] (which
    * owns the docs lifecycle) and [[logisticScore]] (which keeps docs
    * alive to score from the same frame): `iters` steps of
    * [[gradStep]] against the driver-held weight array. */
  private def gdLoop(docs: DataFrame, n: Double, wpos: Double,
      wneg: Double, seen: Array[Long], iters: Int, lr: Double)
      : Array[Double] = {
    val maxB = if (seen.isEmpty) 0 else seen.max.toInt
    val w = new Array[Double](maxB + 1)
    // n == 0: nothing to learn from — skip the iteration jobs entirely
    // (every gradient is empty) instead of running `iters` no-op passes
    if (n > 0) (1 to iters).foreach { _ =>
      val gs = gradStep(docs, w, wpos, wneg, maxB + 1)
      gs.foreach { case (b, g) => w(b.toInt) -= lr * (g / n) }
    }
    w
  }

  private def logisticWeights(feats: DataFrame, iters: Int, lr: Double)
      : DataFrame = {
    val (docs, n, wpos, wneg, seen) = logisticDocs(feats)
    val w =
      try gdLoop(docs, n, wpos, wneg, seen, iters, lr)
      finally docs.unpersist()
    val spark = feats.sparkSession
    import spark.implicits._
    seen.toSeq.map(b => (b, w(b.toInt))).toDF("bucket", "weight")
  }

  /** Model-based quality filtering, training side: a fastText-shaped
    * linear classifier (logistic regression over hashed unigram PRESENCE features +
    * bias) trained with `iters` full-batch gradient-descent steps — the
    * standard "train a small quality classifier, score the corpus" step
    * of LLM data curation, expressed entirely as Spark plans.
    *
    * Determinism (gate-grade): per-row double products are bit-identical
    * cross-engine; every sum that could reorder (per-doc z, per-bucket
    * gradient) is quantized to DECIMAL(28,18) first; σ, the residual and
    * the weight update are one fixed double op sequence evaluated once
    * per doc/bucket. The whole training run replays in SQL by unrolling
    * the iterations.
    *
    * 100 TB design: each iteration is ONE pass over the persisted
    * (id, y, bucket, x) frame joined with the broadcast (dim+1)-row
    * weight frame (per-doc z), plus one pass for the gradient — the
    * Lloyd-iteration shape of [[graft.operators.Similarity]]'s k-means.
    * Weight frames localCheckpoint per iteration so lineage stays flat.
    * DECIMAL(28,18) leaves 10 integer digits for the gradient sums —
    * rescale to (38,18) beyond ~10⁹-token corpora per bucket.
    *
    * Returns (bucket, weight) with `bucket = dim` the bias. */
  def logisticTrain(df: DataFrame, idCol: String, textCol: String,
      label: Column, dim: Int = 32, iters: Int = 8, lr: Double = 0.5,
      roundTo: Int = 6, bigrams: Boolean = false): DataFrame = {
    require(dim >= 2 && dim <= 4096, s"dim=$dim out of [2,4096]")
    require(iters >= 1 && iters <= 16, "iters out of [1,16]")
    val feats = logisticFeatures(df, idCol, textCol, label, dim,
      bigrams = bigrams)
    // the GD loop is eager (driver-held weights) and the returned frame
    // is a driver-local toDF, so the persisted feature frame can be
    // released here — no downstream plan references it (r13 ADVICE:
    // persisted corpus frames must not accumulate across calls)
    val w =
      try logisticWeights(feats, iters, lr)
      finally feats.unpersist()
    w.select(col("bucket"), round(col("weight"), roundTo).as("weight"))
  }

  /** Train-and-score in one call: trains on `df` with [[logisticTrain]]'s
    * GD loop (UNROUNDED weights, bit-compatible with the pre-split form
    * of this operator) and reports the confusion matrix + accuracy over
    * the same corpus. Kept for self-evaluation (x177); a production
    * pipeline trains ONCE on its labeled sample and scores corpora with
    * [[logisticScoreWith]] / [[logisticPredictWith]] — scoring must
    * never pay the 8-iteration training cost per call. */
  def logisticScore(df: DataFrame, idCol: String, textCol: String,
      label: Column, dim: Int = 32, iters: Int = 8, lr: Double = 0.5,
      bigrams: Boolean = false): DataFrame = {
    require(dim >= 2 && dim <= 4096, s"dim=$dim out of [2,4096]")
    val feats = logisticFeatures(df, idCol, textCol, label, dim,
      bigrams = bigrams)
    val (docs, n, wpos, wneg, seen) =
      try logisticDocs(feats) finally feats.unpersist()
    // score from the SAME compact docs frame the GD loop iterates on
    // (r15, the x185 watchlist): the former zOf(feats, w) pass paid a
    // broadcast join + per-id DECIMAL aggregate over the corpus-of-grams
    // feature frame; the native gather-sum over the per-doc bucket
    // arrays is the identical exact-decimal z (same quantized terms,
    // and exact decimal addition is order-free — the r14 bit-parity
    // pin) with a MAP-ONLY pass over one row per doc. feats is released
    // as soon as logisticDocs' eager reads are done; the 1-row confusion
    // frame is checkpointed eagerly before docs goes away.
    try {
      import graft.functions.expr.GatherSumDec18.gatherSumDec18
      val w = gdLoop(docs, n, wpos, wneg, seen, iters, lr)
      confusionOf(docs.select(col("id"),
          gatherSumDec18(col("__bs"), lit(w)).as("__z"), col("y")))
        .localCheckpoint(eager = true)
    } finally docs.unpersist()
  }

  /** Scoring decoupled from training: apply a PRE-TRAINED (bucket,
    * weight) frame — e.g. the gated output of [[logisticTrain]] on a
    * labeled sample — to any corpus, and report the confusion matrix +
    * basis-point accuracy against `label`. The decision is INTEGER-EXACT
    * (σ(z) ≥ 0.5 ⇔ z ≥ 0 on the exact DECIMAL z).
    *
    * This is the 100 TB entry point the training loop exists for: train
    * once on the human-labeled sample, then every scoring run is ONE
    * corpus pass — tokenize → distinct presence features → broadcast
    * join with the ≤ (dim+1)-row weight frame → per-doc z aggregate →
    * confusion aggregate. Zero GD iterations, zero persisted frames,
    * zero repartition (the single z aggregate provides its own shuffle);
    * `dim` must match the dimension the weights were trained with. */
  def logisticScoreWith(df: DataFrame, idCol: String, textCol: String,
      label: Column, weights: DataFrame, dim: Int = 32,
      bigrams: Boolean = false): DataFrame = {
    require(dim >= 2 && dim <= 4096, s"dim=$dim out of [2,4096]")
    confusionOf(zOf(
      logisticFeatures(df, idCol, textCol, label, dim, iterate = false,
        bigrams = bigrams),
      weights))
  }

  /** Per-document exact-DECIMAL logit under published weights — the
    * CONTINUOUS-score handoff to the threshold-free evaluators
    * ([[graft.operators.Stats.binaryAuc]] / averagePrecision /
    * gainsTable): AUC is invariant under the monotone σ, so grading the
    * exact z avoids exp() entirely (libm ULPs are not identical
    * cross-engine; the DECIMAL(28,18) feature-dot is). The z column is
    * essentially distinct per document — the all-distinct regime the
    * evaluators' range-partitioned prefix-sum path exists for. One
    * broadcast-join pass, zero GD iterations; returns (id, y, z). */
  def logisticLogitsWith(df: DataFrame, idCol: String, textCol: String,
      label: Column, weights: DataFrame, dim: Int = 32,
      bigrams: Boolean = false): DataFrame = {
    require(dim >= 2 && dim <= 4096, s"dim=$dim out of [2,4096]")
    zOf(logisticFeatures(df, idCol, textCol, label, dim, iterate = false,
        bigrams = bigrams), weights)
      .select(col("id"), col("y"), col("__z").as("z"))
  }

  /** Label-free corpus scoring with pre-trained weights — the actual
    * curation filter: one row per featured document with its quality
    * probability σ(z) (rounded) and the integer-exact keep decision
    * z ≥ 0. Same one-pass broadcast-join plan as [[logisticScoreWith]];
    * token-free documents carry no features and emit no row (they have
    * no evidence to score — filter them by length rules instead). */
  def logisticPredictWith(df: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, dim: Int = 32, roundTo: Int = 6,
      bigrams: Boolean = false): DataFrame = {
    require(dim >= 2 && dim <= 4096, s"dim=$dim out of [2,4096]")
    zOf(logisticFeatures(df, idCol, textCol, lit(0), dim, iterate = false,
        bigrams = bigrams),
        weights)
      .select(col("id"),
        round(lit(1.0) / (lit(1.0) + exp(-col("__z").cast("double"))), roundTo)
          .as("prob"),
        (col("__z") >= lit(0)).cast("int").as("pred"))
  }

  /** k-fold cross-validation for the quality classifier — the estimate a
    * curation team actually reports before spending the corpus-scale
    * scoring run: for each md5-assigned fold i, train on the other k−1
    * folds ([[logisticTrain]], published ROUNDED weights — the same
    * train-once-publish-apply contract as [[logisticScoreWith]]) and
    * grade the held-out fold THRESHOLD-FREE with the tie-robust rank AUC
    * ([[graft.operators.Stats.binaryAuc]] pointed at the exact-DECIMAL
    * logit z — AUC is invariant under the monotone σ, so no exp() enters
    * the gate). One row per fold: held-out class counts, the
    * Mann–Whitney U₂ rank sum (integer-exact), AUC/Gini/KS. A single-class
    * held-out fold reports null metrics (binaryAuc's convention); a fold
    * whose held-out slice has NO featured documents emits no row at all
    * (k is small — a vanished fold is loud, unlike a vanished query in a
    * mean).
    *
    * Fold assignment hashes the ID (md5 first-8-hex % k — the registry's
    * deterministic-seeding convention), NOT row position, so folds are
    * stable under repartitioning and reproducible cross-engine. Note this
    * is row-level assignment: if near-duplicates should never straddle a
    * train/test boundary, dedup first (or key the hash by a cluster id) —
    * [[graft.operators.Similarity.splitLeakage]] audits exactly that.
    *
    * 100 TB shape: k sequential trainings, each the Lloyd-iteration plan
    * of [[logisticTrain]] (persisted (k−1)/k feature frame + broadcast
    * (dim+1)-row weights per iteration), plus one single-pass scoring of
    * the held-out 1/k. Nothing here is more expensive than k× the
    * training run itself; the per-fold AUC reduces the held-out corpus to
    * its distinct-z frame before any window runs. */
  def logisticCrossVal(df: DataFrame, idCol: String, textCol: String,
      label: Column, k: Int = 3, dim: Int = 32, iters: Int = 8,
      lr: Double = 0.5, roundTo: Int = 6, bigrams: Boolean = false)
      : DataFrame = {
    require(k >= 2 && k <= 8, s"k=$k out of [2,8]")
    // features are a PER-ROW function of the document, so fold filters
    // commute with the build: ONE persisted full-corpus feature frame
    // serves every fold's training and held-out scoring, instead of 2k
    // tokenize+hash rebuilds (r13 — the crossval queries' remaining
    // cost). The fold is recomputed from the carried id, identically.
    val feats = logisticFeatures(df, idCol, textCol, label, dim,
      bigrams = bigrams)
    val foldOfId = conv(substring(md5(col("id").cast("string")), 1, 8),
      16, 10).cast("long") % k
    try {
      val perFold = (0 until k).map { i =>
        val w = logisticWeights(feats.filter(foldOfId =!= i), iters, lr)
          .select(col("bucket"), round(col("weight"), roundTo).as("weight"))
        val z = zOf(feats.filter(foldOfId === i), w)
        graft.operators.Stats.binaryAuc(z, "__z", col("y") === 1)
          .select(lit(i).cast("long").as("fold"), col("n_pos"), col("n_neg"),
            col("u2"), col("auc"), col("gini"), col("ks"))
      }
      // ≤ k rows: materialize eagerly so the persisted full-corpus
      // feature frame can be released in the finally (r13 ADVICE — it
      // accumulated MEMORY_AND_DISK blocks across calls)
      perFold.reduce(_.unionByName(_)).orderBy("fold")
        .localCheckpoint(eager = true)
    } finally feats.unpersist()
  }

  /** Learning curve for the quality classifier — "is more labeled data
    * still buying accuracy?", the question that decides whether the next
    * labeling budget is worth spending: hold out a fixed md5 eval slice
    * (20%, seeded `lc-eval`), then for each requested percentage train on
    * that fraction of the REMAINING pool (seeded `lc-frac` — fractions
    * are NESTED, 25% ⊂ 50% ⊂ 100%, so the curve varies only the data
    * quantity, never the sample identity) and score the SAME eval slice
    * with the published rounded weights ([[logisticScoreWith]]'s
    * one-pass broadcast plan). One row per fraction: the integer-exact
    * confusion matrix + basis-point accuracy on the common eval set.
    *
    * Scale shape: |fractions| sequential trainings (each the
    * Lloyd-iteration plan of [[logisticTrain]] over its subset) + one
    * single-pass scoring each; the eval slice is scored with broadcast
    * weights, never re-trained. Token-free eval docs carry no features
    * and drop from every row identically (the n_docs column is constant
    * down the curve — a non-constant n_docs means the fixture changed,
    * not the operator). */
  def learningCurve(df: DataFrame, idCol: String, textCol: String,
      label: Column, fractionsPct: Seq[Int] = Seq(25, 50, 100),
      dim: Int = 32, iters: Int = 8, lr: Double = 0.5, roundTo: Int = 6,
      bigrams: Boolean = false): DataFrame = {
    require(fractionsPct.nonEmpty && fractionsPct.forall(p => p >= 1 && p <= 100),
      "fractionsPct must be within [1,100]")
    val h = (tag: String) =>
      conv(substring(md5(concat(lit(tag + ":"), col(idCol).cast("string"))),
        1, 8), 16, 10).cast("long")
    val isEval = h("lc-eval") % 5 === 0
    // fraction filters commute with the per-row feature build (the
    // crossval amortization, r13): one persisted pool feature frame is
    // filtered per fraction, and the common eval slice's features are
    // built and persisted ONCE instead of once per fraction
    val pool = logisticFeatures(df.filter(!isEval), idCol, textCol, label,
      dim, bigrams = bigrams)
    val fracOfId = conv(substring(md5(concat(lit("lc-frac:"),
      col("id").cast("string"))), 1, 8), 16, 10).cast("long") % 100
    val evalFeats = logisticFeatures(df.filter(isEval), idCol, textCol,
        label, dim, iterate = false, bigrams = bigrams)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try
      // |fractions| rows: materialize eagerly so both persisted feature
      // frames can be released in the finally (r13 ADVICE)
      fractionsPct.map { p =>
        val w = logisticWeights(pool.filter(fracOfId < p), iters, lr)
          .select(col("bucket"), round(col("weight"), roundTo).as("weight"))
        confusionOf(zOf(evalFeats, w))
          .select(lit(p).cast("long").as("train_pct"), col("n_docs"),
            col("tp"), col("fp"), col("tn"), col("fn"), col("accuracy_bps"))
      }.reduce(_.unionByName(_)).orderBy("train_pct")
        .localCheckpoint(eager = true)
    finally { pool.unpersist(); evalFeats.unpersist() }
  }

  /** Training-loss trajectory of the quality classifier — the diagnostics
    * frame that says WHY an accuracy curve plateaus ([[learningCurve]]
    * reports the plateau; this decomposes it into optimization vs data):
    * one row per GD iteration with the class-weighted logistic loss
    * (evaluated at the step's INCOMING weights — the same z_t the update
    * consumes) and the gradient L2 norm. Falling loss + falling norm =
    * converging; flat loss + large norm = lr trouble; flat loss + ~0
    * norm = model capacity, more data won't help.
    *
    * The weight chain is BIT-compatible with [[logisticTrain]] (same
    * feature frame, z/residual/gradient arithmetic, DECIMAL(28,18)
    * quantization points and update sequence), so the oracle replays it
    * with the exact same unrolled CTE chain x176 gates and reads the
    * losses off each step — the x176 replay pattern pointed at the loss
    * instead of the weights. The loss terms go through libm (ln/exp) on
    * both engines, per-row-quantized before the sum like the BM25 idf.
    *
    * Scale: identical to [[logisticTrain]] (two passes per iteration
    * over the persisted feature frame, broadcast weights) plus one
    * (dim+1)-row norm aggregate per step — the diagnostics add nothing
    * corpus-sized. */
  def logisticTrainCurve(df: DataFrame, idCol: String, textCol: String,
      label: Column, dim: Int = 32, iters: Int = 8, lr: Double = 0.5,
      roundTo: Int = 6, bigrams: Boolean = false): DataFrame = {
    require(dim >= 2 && dim <= 4096, s"dim=$dim out of [2,4096]")
    require(iters >= 1 && iters <= 16, "iters out of [1,16]")
    val feats = logisticFeatures(df, idCol, textCol, label, dim,
      bigrams = bigrams)
    import graft.functions.expr.DotProductDec18.q18OrNull
    import graft.functions.expr.GatherSumDec18.gatherSumDec18
    import graft.functions.expr.SumDec18.sumDec18
    val (docs, n, wpos, wneg, seen) = logisticDocs(feats)
    val maxB = if (seen.isEmpty) 0 else seen.max.toInt
    val w = new Array[Double](maxB + 1)
    val rows = Seq.newBuilder[(Long, Double, Double)]
    // Spark's round(double, s) sequence — shortest-decimal HALF_UP
    def rnd(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(roundTo, java.math.RoundingMode.HALF_UP).doubleValue
    try {
      // n == 0 (no featured docs): the curve is empty — skip the
      // per-iteration jobs rather than dividing the loss by zero
      for (t <- 1 to iters if n > 0) {
        // class-weighted logistic loss at the incoming weights: per-row
        // cw·ln(1+exp(∓z)) quantized pre-sum, one final division by n —
        // z via the native gather-sum, the same exact decimal total the
        // former join-aggregate produced
        val z = gatherSumDec18(col("__bs"), lit(w))
        // sumDec18 over an empty/all-null frame is null (SQL sum
        // semantics) — degrade to loss 0 instead of an NPE (r13 ADVICE)
        val lsRow = docs.select(
            (when(col("y") === 1, lit(wpos) * log(lit(1.0) + exp(-z)))
              .otherwise(lit(wneg) * log(lit(1.0) + exp(z)))).as("__l"))
          .agg(sumDec18(col("__l")).as("__ls")).head()
        val ls = if (lsRow.isNullAt(0)) 0.0 else lsRow.getDouble(0)
        val gs = gradStep(docs, w, wpos, wneg, maxB + 1)
        // grad-norm: sqrt of the exact dec18 sum of grad² — the same
        // quantize/exact-sum/convert chain, replayed driver-side over
        // the (dim+1)-bounded gradient
        var g2 = java.math.BigDecimal.ZERO
        val grads = gs.map { case (b, g) => b -> (g / n) }
        grads.values.foreach { g =>
          val q = q18OrNull(g * g)
          if (q ne null) g2 = g2.add(q)
        }
        rows += ((t.toLong, rnd(ls / n), rnd(math.sqrt(g2.doubleValue))))
        grads.foreach { case (b, g) => w(b.toInt) -= lr * g }
      }
    } finally { docs.unpersist(); feats.unpersist() }
    val spark = df.sparkSession
    import spark.implicits._
    rows.result().toDF("iter", "loss", "grad_norm").orderBy("iter")
  }

  /** χ² token–label feature selection — which vocabulary items carry the
    * label signal: per token the 2×2 document-presence contingency
    * (contains/absent × positive/negative) and its chi-square statistic,
    * top `topK` tokens. The interpretable companion to the hashed
    * classifier ([[logisticTrain]] buckets collide by design; this names
    * the actual separating tokens — vocabulary pruning, leakage hunting
    * "why does 'january' predict quality?", dataset-card reporting).
    *
    * Exactness: all four cells are exact BIGINT document counts (presence
    * via one distinct, not term frequency); χ² = N(ad−bc)²/((a+b)(c+d)
    * ·P·N₋) is evaluated as ONE fixed IEEE op sequence on those exact
    * counts — pure ×/− /÷ arithmetic (no libm), so the double is
    * bit-reproducible cross-engine at ANY corpus size, with no DECIMAL
    * headroom cliff (N⁵ would overflow DECIMAL(38) past ~3.6M docs).
    * Degenerate margins (single-class corpus, token in every/no doc)
    * score 0 rather than 0/0. Ranking orders by the UNROUNDED statistic
    * (bit-identical), tie-broken by token.
    *
    * Scale shape: explode → one (doc, token) distinct → one token
    * aggregate → broadcast 1-row totals → TakeOrderedAndProject top-k.
    * Two shuffles, both token/doc-keyed; nothing corpus² anywhere.
    * `minDf` prunes the hapax tail before the top-k heap. */
  def chi2TokenSelect(df: DataFrame, idCol: String, textCol: String,
      label: Column, topK: Int = 50, minDf: Int = 5): DataFrame = {
    require(topK >= 1, "topK must be positive")
    require(minDf >= 1, "minDf must be positive")
    val d = (c: Column) => c.cast("double")
    val base = df.select(col(idCol).as("__id"), label.cast("int").as("__y"),
      Dedup.words(col(textCol)).as("__ws"))
    val totals = broadcast(base.agg(
      sum(when(col("__y") === 1, 1L).otherwise(0L)).as("__p"),
      sum(when(col("__y") === 0, 1L).otherwise(0L)).as("__ng")))
    val pres = base
      .select(col("__id"), col("__y"), explode(col("__ws")).as("token"))
      .distinct()
    pres.groupBy("token")
      .agg(sum(when(col("__y") === 1, 1L).otherwise(0L)).as("__a"),
        sum(when(col("__y") === 0, 1L).otherwise(0L)).as("__b"))
      .filter(col("__a") + col("__b") >= minDf)
      .crossJoin(totals)
      .withColumn("__c", col("__p") - col("__a"))
      .withColumn("__d", col("__ng") - col("__b"))
      .withColumn("__det",
        d(col("__a")) * d(col("__d")) - d(col("__b")) * d(col("__c")))
      .withColumn("__den",
        d(col("__a") + col("__b")) * d(col("__c") + col("__d")) *
          d(col("__p")) * d(col("__ng")))
      .withColumn("__chi2", when(col("__den") === 0.0, lit(0.0))
        .otherwise(d(col("__p") + col("__ng")) *
          (col("__det") * col("__det")) / col("__den")))
      .orderBy(desc("__chi2"), col("token"))
      .limit(topK)
      .select(col("token"), (col("__a") + col("__b")).as("df_docs"),
        col("__a").as("pos_docs"), round(col("__chi2"), 6).as("chi2"))
  }
}
