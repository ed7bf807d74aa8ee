package graft.functions

import graft.operators.Dedup
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (beyond-reference north star):
  * language ID, quality scoring, token counting, document fingerprinting.
  * Pure Catalyst expressions — every function is a scalar/array expression
  * that stays in whole-stage codegen and pushes through any scan.
  */
object TextAnalysis {

  /** Marker-word profiles for the n-gram/stopword language heuristic. Tiny on
    * purpose: the operator contract is a deterministic argmax over per-language
    * marker hits, not a statistical model. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ist", "nicht", "das", "ein", "zu"),
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "un", "por"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "que", "est"),
    "zh" -> Seq("de", "shi", "bu", "le", "ren", "wo", "zai", "you"))

  /** Language ID: argmax of marker-token hits (count WITH multiplicity),
    * deterministic alphabetical tie-break, 'und' (undetermined) when no
    * marker hits at all. */
  def langId(text: Column): Column = {
    val ws = Dedup.words(text)
    val best = LangMarkers
      .map { case (lang, markers) =>
        size(filter(ws, w => markers.map(m => w === m).reduce(_ || _))) -> lang
      }
      .foldLeft((lit(0), lit("und"))) { case ((bs, bl), (s, l)) =>
        // strictly-greater keeps the FIRST (alphabetically smallest) on ties
        (when(s > bs, s).otherwise(bs), when(s > bs, lit(l)).otherwise(bl))
      }._2
    when(size(ws) === 0, lit("und")).otherwise(best)
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(Dedup.words(text))

  /** BPE-ish subword count: alphanumeric runs + standalone punctuation marks,
    * the usual pre-tokenizer regex shape. */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
      t => length(trim(t)) > 0))

  /** Quality score in [0,1] from cheap surface stats: length band, alpha
    * ratio, punctuation ratio, mean word length band. One expression, no
    * shuffle; meant to gate documents before expensive pipeline stages. */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val alpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?]", "")).cast("double")
    val toks = tokenCount(text).cast("double")
    val lenScore = when(len >= 200 && len <= 8000, 1.0)
      .when(len >= 50, 0.5).otherwise(0.0)
    val alphaScore = when(len === 0, 0.0).otherwise(
      when(alpha / len >= 0.6, 1.0).when(alpha / len >= 0.3, 0.5).otherwise(0.0))
    val punctScore = when(len === 0, 0.0).otherwise(
      when(punct / len <= 0.1, 1.0).otherwise(0.5))
    val wordScore = when(toks === 0, 0.0).otherwise(
      when((alpha / toks).between(2.5, 12.0), 1.0).otherwise(0.5))
    round((lenScore + alphaScore + punctScore + wordScore) / 4.0, 4)
  }

  /** Stopword list shared by the quality-rule gate (English function words —
    * the Gopher-style "has at least N stopwords" naturalness check). */
  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "that")

  /** Gopher-style quality RULES: unlike [[qualityScore]]'s blended score,
    * each rule is an independent boolean gate (word-count band, mean word
    * length band, minimum stopword hits, numeric-token ratio cap) so a
    * pipeline can report per-rule rejection counts — the shape real curation
    * stacks (Gopher §A1.1, C4) use. One struct-valued expression: stays in
    * codegen, no shuffle. */
  def qualityRules(text: Column, minWords: Int = 20, maxWords: Int = 80,
      minMeanLen: Double = 2.0, maxMeanLen: Double = 8.0,
      minStopwords: Int = 2, maxNumericRatio: Double = 0.3): Column = {
    val ws = Dedup.words(text)
    val n = size(ws).cast("double")
    // sum of word lengths == length of the gap-free join (expression-only,
    // no higher-order aggregate needed)
    val meanLen = when(n === 0, 0.0)
      .otherwise(length(array_join(ws, "")).cast("double") / n)
    val stopHits = size(filter(ws, w => StopWords.map(w === _).reduce(_ || _)))
    val numRatio = when(n === 0, 1.0)
      .otherwise(size(filter(ws, w => w.rlike("^[0-9]+$"))).cast("double") / n)
    val rWords = n >= minWords && n <= maxWords
    val rMean = meanLen >= minMeanLen && meanLen <= maxMeanLen
    val rStop = stopHits >= minStopwords
    val rNum = numRatio <= maxNumericRatio
    struct(
      rWords.as("r_word_count"),
      rMean.as("r_mean_word_len"),
      rStop.as("r_stopwords"),
      rNum.as("r_numeric_ratio"),
      (rWords && rMean && rStop && rNum).as("passes"))
  }

  /** Document fingerprint: minimum seeded hash over word shingles — a
    * one-permutation minhash, stable under small edits, identical across
    * engines (md5-derived). */
  def fingerprint(text: Column, k: Int = 3): Column = {
    val shs = Dedup.shingles(Dedup.words(text), k)
    when(size(shs) === 0, lit(null).cast("long"))
      .otherwise(array_min(transform(shs, s => Dedup.seededHash(0, s))))
  }

  /** Corpus-model fluency score: fraction of a document's word bigrams that
    * appear in the corpus's top-`modelSize` bigram model — the cheap
    * n-gram-LM proxy for "does this text look like the corpus" (quality
    * filtering, outlier triage). Documents with < 2 words are dropped.
    *
    * 100 TB design: the model is a bounded top-k (one partial-aggregated
    * groupBy + TakeOrderedAndProject) and broadcasts; scoring is one explode
    * + broadcast left join + one per-doc aggregate — no shuffle wider than
    * |docs|. The score divides two exact integers and re-quantizes with
    * floor(x·1e4 + 0.5) (round() tie-break semantics differ across engines;
    * floor of identical IEEE ops cannot). */
  /** Per-stratum quality report: how each slice of the corpus (language,
    * source, …) fares against the [[qualityRules]] gates — the dashboard
    * row a curation run publishes per shard. One pass, one groupBy;
    * every metric is an integer count or integer basis points. */
  def qualityReport(df: org.apache.spark.sql.DataFrame, textCol: String,
      stratumCol: String): org.apache.spark.sql.DataFrame = {
    val q = qualityRules(col(textCol))
    def cnt(flag: Column) = sum(when(flag, 1L).otherwise(0L))
    df.select(col(stratumCol), q.as("__q"))
      .groupBy(stratumCol)
      .agg(count(lit(1)).as("n_docs"),
        cnt(col("__q.r_word_count")).as("n_word_count"),
        cnt(col("__q.r_mean_word_len")).as("n_mean_word_len"),
        cnt(col("__q.r_stopwords")).as("n_stopwords"),
        cnt(col("__q.r_numeric_ratio")).as("n_numeric_ratio"),
        cnt(col("__q.passes")).as("n_pass"))
      .withColumn("pass_bps", expr("n_pass * 10000 div n_docs"))
  }

  /** Repetition profile (the Gopher-style duplicate-n-gram gate): per doc,
    * the fraction of word n-grams that are repeats of an earlier n-gram in
    * the same doc — templated/spammy text scores high, natural text low.
    * All counts are exact integers; the fraction is floor-quantized to
    * basis points. Pure expressions over the shingle array — no shuffle,
    * stays parallel at any scale. */
  def repetitionProfile(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int = 4,
      maxRepeatBps: Long = 2000): org.apache.spark.sql.DataFrame = {
    val shs = Dedup.shingleList(Dedup.words(col(textCol)), n)
    df.select(col(idCol),
        size(shs).cast("long").as("n_grams"),
        size(array_distinct(shs)).cast("long").as("n_distinct"))
      .withColumn("repeat_bps",
        when(col("n_grams") === 0, lit(0L))
          .otherwise(floor((col("n_grams") - col("n_distinct")).cast("double") /
            col("n_grams").cast("double") * lit(10000) + lit(0.5)).cast("long")))
      .withColumn("passes_gate", col("repeat_bps") <= maxRepeatBps)
  }

  /** Token co-occurrence PMI over the top-`vocabSize` vocabulary: which
    * word pairs appear in the same document more than chance predicts —
    * corpus topic structure without a topic model. PMI(a,b) =
    * ln(n_ab·N / (n_a·n_b)) over document-level occurrence counts.
    *
    * 100 TB design: the pair explosion is the classic co-occurrence
    * scale-killer, so tokens are FILTERED to the broadcast top-k vocab
    * BEFORE pairing — the per-doc pair count is bounded by the vocab hits
    * in that doc, and the pair space by vocabSize², independent of corpus
    * size. One vocab pass + one pair aggregate. The association score is
    * emitted as an EXACT integer `lift_ppm` = ⌊n_ab·N·10⁶ / (n_a·n_b)⌋
    * (PMI = ln(lift_ppm/10⁶)) — pure integer arithmetic, so rankings can
    * never drift across engines the way libm ln() last-ulps can. */
  def pmiPairs(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, vocabSize: Int = 100,
      minPairCount: Long = 5): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol),
      explode(array_distinct(Dedup.words(col(textCol)))).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("n_tok"))
      .orderBy(desc("n_tok"), col("tok")).limit(vocabSize)
    // The vocab-filtered hits frame is BOUNDED (≤ n_docs·vocabSize rows,
    // 3 narrow columns) while the frame it derives from is corpus-scale
    // (full tokenize + explode). Both sides of the pair self-join read it,
    // so without truncation the expensive explode runs twice more after
    // the vocab pass; the checkpoint pins corpus-scale work at exactly
    // two passes (vocab count + hits filter) regardless of corpus size.
    val vtoks = toks.join(broadcast(vocab), "tok").localCheckpoint()
    val nDocs = df.select(col(idCol)).distinct()
      .agg(count(lit(1)).as("n_docs"))
    val a = vtoks.select(col(idCol), col("tok").as("tok_a"), col("n_tok").as("n_a"))
    val b = vtoks.select(col(idCol), col("tok").as("tok_b"), col("n_tok").as("n_b"))
    a.join(b, Seq(idCol.toString))
      .filter(col("tok_a") < col("tok_b"))
      .groupBy("tok_a", "tok_b", "n_a", "n_b")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
      .crossJoin(broadcast(nDocs))
      .select(col("tok_a"), col("tok_b"), col("n_ab"),
        expr("n_ab * n_docs * 1000000 div (n_a * n_b)").as("lift_ppm"))
  }

  /** Inverted-index build: token → sorted posting list (+ document
    * frequency), the search-side artifact of a corpus. Posting lists are
    * capped at `maxPostings` ids (stop-word tokens would otherwise emit
    * |corpus|-sized rows — the classic long-posting skew); `truncated`
    * reports when the cap bit. One explode + one distinct + one groupBy
    * with map-side combine; in-group sort only (no global order).
    *
    * At 100 TB: posting lists shard naturally by token (the groupBy key);
    * a production index would also shard WITHIN hot tokens (doc-range
    * segments) — the cap marks exactly the tokens needing that. */
  def invertedIndex(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, maxPostings: Int = 1000): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), explode(array_distinct(Dedup.words(col(textCol))))
        .as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("doc_freq"),
        array_join(slice(array_sort(collect_list(col(idCol))), 1, maxPostings),
          ",").as("postings"),
        (count(lit(1)) > maxPostings).as("truncated"))

  /** Per-doc perplexity under the corpus's own unigram LM — the classic
    * CCNet-style quality filter: repetitive junk scores LOW (its words are
    * its own corpus mass), off-distribution noise scores HIGH. No
    * smoothing is needed because every scored word is in the corpus by
    * construction; docs with zero tokens drop out. Each `−ln p(w)` term is
    * quantized to DECIMAL(28,18) before the per-doc sum so aggregation
    * order cannot move the result (the clusterInertia discipline); the
    * final `exp(nll/n)` runs once per doc. Two grouped aggregates + one
    * equi-join on the word key — the frequency table shards by word and is
    * NEVER broadcast (vocabulary is data-sized); only the 1-row corpus
    * total rides a broadcast. */
  def unigramPerplexity(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val w = df.select(col(idCol), explode(Dedup.words(col(textCol))).as("__w"))
    val freq = w.groupBy("__w").agg(count(lit(1)).as("__c"))
    val tot = w.agg(count(lit(1)).as("__tot"))
    w.join(freq, "__w").crossJoin(broadcast(tot))
      .withColumn("__term",
        (-log(col("__c").cast("double") / col("__tot").cast("double")))
          .cast("decimal(28,18)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__term")).as("__nll"))
      .withColumn("nll", round(col("__nll").cast("double"), 4))
      .withColumn("perplexity",
        round(exp(col("__nll").cast("double") / col("n_tokens")), 4))
      .drop("__nll")
  }

  def bigramModelScore(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, modelSize: Int = 100): org.apache.spark.sql.DataFrame = {
    require(modelSize > 0, "modelSize must be positive")
    // bind words to a named column: HOF lambdas re-evaluate the outer
    // subtree per element if inlined (the x2 25x lesson)
    val bg = df.withColumn("__ws", Dedup.words(col(textCol)))
      .withColumn("__n", size(col("__ws")))
      .filter(col("__n") >= 2)
      .select(col(idCol), explode(expr(
        "zip_with(slice(__ws, 1, __n - 1), slice(__ws, 2, __n - 1), " +
          "(a, b) -> concat(a, ' ', b))")).as("bg"))
    val model = bg.groupBy("bg").agg(count(lit(1)).as("__c"))
      .orderBy(desc("__c"), col("bg")).limit(modelSize)
      .select(col("bg"), lit(1).as("__hit"))
    bg.join(broadcast(model), Seq("bg"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("__hit"), lit(0))).cast("bigint").as("n_covered"))
      .withColumn("lm_score",
        floor(col("n_covered").cast("double") / col("n_bigrams").cast("double")
          * lit(10000) + lit(0.5)) / lit(10000))
  }

  /** Learn the first `iters` BPE merges from a corpus — the distributed
    * heart of tokenizer training. Classic word-frequency formulation: the
    * corpus collapses to (word, freq) ONCE (all further passes touch only
    * the vocabulary — thousands of rows, not billions), words split to
    * space-joined character tokens, then each iteration (a) counts adjacent
    * token pairs weighted by word freq, (b) takes the argmax pair
    * (count DESC, pair ASC — a total order, so the learned merge table is
    * deterministic), and (c) applies the merge via space-delimited
    * replace — left-to-right non-overlapping, identical in Spark and the
    * oracle. Per-iteration persists keep lineage linear in `iters`
    * (the [[graft.operators.Dedup.nearDupComponents]] discipline); the
    * 1-row argmax broadcasts back, never a driver collect in the plan.
    * Returns (iter, merge_pair, weighted_count). */
  def bpeLearnMerges(df: org.apache.spark.sql.DataFrame, textCol: String,
      iters: Int = 3): org.apache.spark.sql.DataFrame =
    bpeTrain(df, textCol, iters)._2.reduce(_ unionAll _)

  /** Greedy BPE encoding with the merges learned from the same corpus:
    * every document's word occurrences join the trained (word → token
    * sequence) vocabulary, so encode cost is ONE corpus pass + a
    * vocab-sized join (AQE broadcasts the vocab when it fits). Returns
    * per-doc (n_words, n_chars, n_subwords) — the compression the learned
    * merges actually buy. */
  def bpeEncode(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, iters: Int = 3): org.apache.spark.sql.DataFrame = {
    val vocab = bpeTrain(df, textCol, iters)._1
      .select(col("wd").as("__wd"), size(split(col("tok"), " ")).as("__nsub"))
    df.select(col(idCol), explode(Dedup.words(col(textCol))).as("wd"))
      .join(vocab, col("wd") === col("__wd"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("wd"))).cast("long").as("n_chars"),
        sum(col("__nsub")).cast("long").as("n_subwords"))
  }

  /** Shared BPE training loop: returns the post-merge vocabulary
    * (wd, tok, freq) and the per-iteration (iter, merge_pair,
    * weighted_count) argmax frames. See [[bpeLearnMerges]] for the
    * algorithm and scale notes. */
  private def bpeTrain(df: org.apache.spark.sql.DataFrame, textCol: String,
      iters: Int): (org.apache.spark.sql.DataFrame,
        Seq[org.apache.spark.sql.DataFrame]) = {
    var vocab = df
      .select(explode(Dedup.words(col(textCol))).as("wd"))
      .groupBy("wd").agg(count(lit(1)).as("freq"))
      .withColumn("tok", array_join(
        expr("transform(sequence(1, length(wd)), i -> substring(wd, i, 1))"),
        " "))
      .select("wd", "tok", "freq")
      // lineage-truncate the evolving vocab per iteration (localCheckpoint):
      // each merge round rewrites `tok` on top of the previous round, so a
      // persist-only loop grows the plan tree per iteration and the driver
      // re-analyzes the whole chain on every action (see Graph.pageRank)
      .localCheckpoint()
    val merges = (1 to iters).map { k =>
      val pairs = vocab
        .withColumn("__lp", split(col("tok"), " "))
        // guard: Spark's sequence(1, 0) steps DOWN; single-token words have
        // no pairs and must not explode a bogus descending range
        .filter(size(col("__lp")) >= 2)
        .withColumn("pair", explode(expr(
          "transform(sequence(1, size(__lp) - 1), " +
          "i -> concat(element_at(__lp, i), ' ', element_at(__lp, i + 1)))")))
        .groupBy("pair").agg(sum(col("freq")).as("cnt"))
      val best = pairs.orderBy(desc("cnt"), col("pair")).limit(1).localCheckpoint()
      vocab = vocab
        .crossJoin(broadcast(best.select(col("pair").as("__p"))))
        .withColumn("tok", expr(
          "trim(replace(concat(' ', tok, ' '), concat(' ', __p, ' '), " +
          "concat(' ', replace(__p, ' ', ''), ' ')))"))
        .select("wd", "tok", "freq")
        .localCheckpoint()
      best.select(lit(k).as("iter"), col("pair").as("merge_pair"),
        col("cnt").cast("long").as("weighted_count"))
    }
    (vocab, merges)
  }

  /** Distinct-n corpus diversity per group (the distinct-1/2/3 metric of
    * Li et al. 2016): for n ∈ [1, maxN], the fraction of n-gram tokens in
    * each group that are distinct — 1.0 is maximally diverse, repetitive
    * or templated text drives it toward 0. The standard pre-training
    * corpus health report alongside [[qualityReport]].
    *
    * Scale shape: one positional-shingle explode per n (map-side, no
    * distinct set materialized per doc), unioned into ONE shuffle on
    * (group, n, gram) — the distinct count is the standard two-phase
    * expanded aggregate, partial per partition. Output is |groups|·maxN
    * rows. */
  def distinctNgrams(df: org.apache.spark.sql.DataFrame, groupCol: String,
      textCol: String, maxN: Int = 3): org.apache.spark.sql.DataFrame = {
    require(maxN >= 1 && maxN <= 6, s"maxN=$maxN out of [1,6]")
    val grams = (1 to maxN).map { n =>
      df.select(col(groupCol), lit(n).as("n"),
        explode(Dedup.shingleList(Dedup.words(col(textCol)), n)).as("__g"))
    }.reduce(_ unionAll _)
    grams.groupBy(col(groupCol), col("n"))
      .agg(count(lit(1)).as("n_total"),
        countDistinct(col("__g")).as("n_distinct"))
      .withColumn("distinct_ratio",
        round(col("n_distinct").cast("double") / col("n_total"), 4))
  }

  /** Zipf slope per group: OLS fit of ln(frequency) against ln(rank) over
    * the top-k words — natural language sits near −1 (Zipf's law);
    * machine-generated or templated text bends away. The third corpus
    * fingerprint next to [[distinctNgrams]] and [[sourceKlDivergence]].
    *
    * Ranking is a per-group window (count desc, word asc — the word
    * tiebreak pins equal-frequency ranks cross-engine); the regression
    * reuses [[graft.operators.Stats.olsTrend]]'s DECIMAL(28,6)-quantized
    * moment discipline, so the fit replays exactly. The window ranks the
    * per-group vocabulary (sort-based, spill-safe), and only topK rows
    * per group survive into the tiny moment aggregate. */
  def zipfSlope(df: org.apache.spark.sql.DataFrame, groupCol: String,
      textCol: String, topK: Int = 100): org.apache.spark.sql.DataFrame = {
    val gw = df
      .select(col(groupCol), explode(Dedup.words(col(textCol))).as("__w"))
      .groupBy(col(groupCol), col("__w"))
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("__c").desc, col("__w"))
    val top = gw.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= topK)
    graft.operators.Stats.olsTrend(
      top.select(col(groupCol),
        log(col("__r").cast("double")).as("ln_rank"),
        log(col("__c").cast("double")).as("ln_freq")),
      Seq(groupCol), "ln_rank", "ln_freq")
  }

  /** Per-group domain-shift report: KL(P_group ‖ P_corpus) over word
    * unigrams — how far each source's word distribution sits from the
    * corpus mixture (0 = indistinguishable; large = its own dialect).
    * The drift/mixture diagnostic consumed alongside [[graft.functions
    * .Curation.mixturePlan]] and x116's DSIR scores.
    *
    * No smoothing is needed: every group word occurs in the corpus by
    * construction, so p_corpus > 0 wherever p_group > 0. Each term
    * p_g·ln(p_g/p_c) is quantized to DECIMAL(28,18) (the x113
    * discipline) so the per-group sum is order-free and engine-exact.
    *
    * Scale shape: words explode once; per-(group, word) counts are one
    * hash shuffle; corpus word counts derive from those counts (re-agg
    * over |vocab|·|groups| rows, NOT a second corpus pass); group totals
    * are a |groups|-row broadcast; the word-key join is AQE-decided
    * (broadcast at test scale, shuffle join for data-sized vocabularies). */
  def sourceKlDivergence(df: org.apache.spark.sql.DataFrame,
      groupCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val gw = df
      .select(col(groupCol), explode(Dedup.words(col(textCol))).as("__w"))
      .groupBy(col(groupCol), col("__w"))
      .agg(count(lit(1)).as("__c"))
    val corpus = gw.groupBy("__w").agg(sum("__c").as("__cc"))
    val gtot = gw.groupBy(groupCol).agg(sum("__c").as("__gt"))
    val ctot = corpus.agg(sum("__cc").as("__ct"))
    gw.join(corpus, "__w")
      .join(broadcast(gtot), Seq(groupCol))
      .crossJoin(broadcast(ctot))
      .withColumn("__term",
        ((col("__c").cast("double") / col("__gt").cast("double")) *
          log((col("__c").cast("double") * col("__ct").cast("double")) /
            (col("__gt").cast("double") * col("__cc").cast("double"))))
          .cast("decimal(28,18)"))
      .groupBy(col(groupCol))
      .agg(sum("__c").cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("vocab"),
        round(sum(col("__term")).cast("double"), 4).as("kl_nats"))
  }

  /** Frequent token-pair association rules (Apriori depth 2): which word
    * pairs co-occur in more documents than their marginals predict —
    * topic/template structure discovery, boilerplate clustering, feature
    * co-occurrence audits. For every pair passing `minSupport` document
    * co-occurrence: support counts, both conditional confidences
    * P(b|a), P(a|b), and lift = P(ab)·N / (P(a)P(b)).
    *
    * Scale shape — the Apriori invariant does the heavy lifting: no pair
    * can be frequent unless BOTH items are, so the corpus first collapses
    * to DISTINCT (doc, item) and infrequent items are pruned by a
    * semi-join BEFORE the pair self-join. The pair generation is one
    * id-keyed equi-join of that pruned frame with itself (item_a < item_b
    * halves the grid); per-doc cost is (frequent items per doc)², bounded
    * by the pruning threshold, never vocabulary². Marginals attach by
    * broadcast (the frequent-item table is small BY CONSTRUCTION — it
    * passed a count threshold). All rule metrics are INTEGER (bps / ppm
    * via exact decimal div), so the gate replays bit-exactly; top-k by
    * (pair support, pair) keeps the output bounded and deterministic. */
  def associationRules(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minSupport: Long = 50,
      topK: Int = 100): org.apache.spark.sql.DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    val w = df.select(col(idCol).as("__id"),
        explode(Dedup.words(col(textCol))).as("__w"))
      .distinct()
    val supp = w.groupBy("__w").agg(count(lit(1)).as("__supp"))
    val freq = supp.filter(col("__supp") >= minSupport)
    val n = df.agg(count(lit(1)).as("__n"))
    val wf = w.join(broadcast(freq.select("__w")), "__w")
    val pairs = wf.select(col("__id"), col("__w").as("item_a"))
      .join(wf.select(col("__id"), col("__w").as("item_b")), "__id")
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("pair_support"))
      .filter(col("pair_support") >= minSupport)
    pairs
      .join(broadcast(freq.select(col("__w").as("item_a"),
        col("__supp").as("supp_a"))), "item_a")
      .join(broadcast(freq.select(col("__w").as("item_b"),
        col("__supp").as("supp_b"))), "item_b")
      .crossJoin(broadcast(n))
      .select(col("item_a"), col("item_b"), col("pair_support"),
        col("supp_a"), col("supp_b"), col("__n").as("n_docs"),
        expr("CAST((CAST(pair_support AS DECIMAL(38,0)) * 10000) DIV " +
          "CAST(supp_a AS DECIMAL(38,0)) AS BIGINT)").as("conf_ab_bps"),
        expr("CAST((CAST(pair_support AS DECIMAL(38,0)) * 10000) DIV " +
          "CAST(supp_b AS DECIMAL(38,0)) AS BIGINT)").as("conf_ba_bps"),
        expr("CAST((CAST(pair_support AS DECIMAL(38,0)) * __n * 1000000) " +
          "DIV (CAST(supp_a AS DECIMAL(38,0)) * supp_b) AS BIGINT)")
          .as("lift_ppm"))
      .orderBy(desc("pair_support"), col("item_a"), col("item_b"))
      .limit(topK)
  }

  /** Jelinek–Mercer interpolated trigram perplexity — the LM-quality
    * family completed: [[unigramPerplexity]] (order 1) and
    * [[bigramModelScore]] (coverage) get the standard smoothed-LM scorer
    * used for CCNet-style corpus filtering:
    * p(w₃|w₁w₂) = λ₃·c(w₁w₂w₃)/c(w₁w₂) + λ₂·c(w₂w₃)/c(w₂) + λ₁·c(w₃)/N,
    * trained on the corpus itself (the self-scoring convention of
    * unigramPerplexity — every trigram being scored has count ≥ 1, so no
    * zero-prob guard is needed; contexts use PLAIN n-gram counts, the
    * common simplification that sidesteps doc-boundary bookkeeping).
    * High-perplexity docs are the unusual ones (garbled, off-domain);
    * low-perplexity docs are templated/repetitive — both tails are
    * filter targets.
    *
    * Scale shape: three count tables (unigram, bigram, trigram) built by
    * hash aggregates over exploded n-gram streams (map-side combine), then
    * ONE pass over the trigram stream with five token-keyed equi-joins
    * attaches every count; the corpus total broadcasts. Each −ln p term is
    * DECIMAL-quantized before the per-doc sum, so summation order can't
    * flip the gate. λ spelled as exact decimal literals in both engines. */
  def jmTrigramPerplexity(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val base = df.select(col(idCol), Dedup.words(col(textCol)).as("__ws"))
      .withColumn("__n", size(col("__ws")))
    val uni = base.select(explode(col("__ws")).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__cu"))
    val tot = base.agg(sum(col("__n")).cast("double").as("__tot"))
    val bi = base.filter(col("__n") >= 2)
      .select(explode(expr(
        "zip_with(slice(__ws, 1, __n - 1), slice(__ws, 2, __n - 1), " +
          "(a, b) -> concat(a, ' ', b))")).as("__bg"))
      .groupBy("__bg").agg(count(lit(1)).as("__cb"))
    val tris = base.filter(col("__n") >= 3)
      .select(col(idCol), explode(expr(
        "zip_with(zip_with(slice(__ws, 1, __n - 2), " +
          "slice(__ws, 2, __n - 2), (a, b) -> concat(a, ' ', b)), " +
          "slice(__ws, 3, __n - 2), (p, c) -> struct(p, c))")).as("__t"))
      .select(col(idCol),
        concat(col("__t.p"), lit(" "), col("__t.c")).as("__tg"),
        col("__t.p").as("__ctx12"),
        concat(element_at(split(col("__t.p"), " "), 2), lit(" "),
          col("__t.c")).as("__bg23"),
        element_at(split(col("__t.p"), " "), 2).as("__w2"),
        col("__t.c").as("__w3"))
    val tri = tris.groupBy("__tg").agg(count(lit(1)).as("__ct"))
    tris
      .join(tri, "__tg")
      .join(bi.select(col("__bg").as("__ctx12"), col("__cb").as("__c12")),
        "__ctx12")
      .join(bi.select(col("__bg").as("__bg23"), col("__cb").as("__c23")),
        "__bg23")
      .join(uni.select(col("__w").as("__w2"), col("__cu").as("__c2")),
        "__w2")
      .join(uni.select(col("__w").as("__w3"), col("__cu").as("__c3")),
        "__w3")
      .crossJoin(broadcast(tot))
      .withColumn("__p",
        lit(0.6) * (col("__ct").cast("double") / col("__c12").cast("double")) +
          lit(0.3) * (col("__c23").cast("double") / col("__c2").cast("double")) +
          lit(0.1) * (col("__c3").cast("double") / col("__tot")))
      .withColumn("__term", (-log(col("__p"))).cast("decimal(28,18)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("__term")).as("__nll"))
      .select(col(idCol), col("n_trigrams"),
        round(col("__nll").cast("double"), 4).as("nll"),
        round(exp(col("__nll").cast("double") /
          col("n_trigrams").cast("double")), 4).as("perplexity"))
  }

  /** Tokenizer fertility per group — subwords emitted per whitespace word
    * (the pre-tokenizer regex shape of [[subwordCount]] over
    * [[tokenCount]]): the cross-language cost metric of a tokenizer. A
    * language whose fertility is 2× the corpus mean pays 2× the context
    * budget per sentence — the number that drives per-language vocab
    * allocation. One hash aggregate with map-side combine (integer sums
    * per group); ratios are single double divisions. */
  def tokenizerFertility(df: org.apache.spark.sql.DataFrame,
      groupCol: String, textCol: String): org.apache.spark.sql.DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol)).cast("long")).as("n_tokens"),
        sum(subwordCount(col(textCol)).cast("long")).as("n_subwords"))
      .select(col(groupCol), col("n_docs"), col("n_tokens"),
        col("n_subwords"),
        when(col("n_tokens") === 0, lit(null)).otherwise(
          round(col("n_subwords").cast("double") /
            col("n_tokens").cast("double"), 6)).as("fertility"),
        round(col("n_tokens").cast("double") /
          col("n_docs").cast("double"), 6).as("tokens_per_doc"))
      .orderBy(groupCol)

  /** Padding-waste table for length-bucketed batching — the batching-
    * efficiency question "how many pad tokens does this bucket layout
    * burn": docs bucket by token count against sorted boundaries
    * (bucket = #boundaries ≤ length), each bucket pads to its own max,
    * waste = (n·max − Σlen)/(n·max). The complement of sequence packing
    * (x38): packing concatenates into a fixed context, padding batches
    * pad up — this table says when the bucket boundaries are wrong.
    * ONE hash aggregate with map-side combine; integer-exact counts. */
  def paddingWaste(df: org.apache.spark.sql.DataFrame, textCol: String,
      boundaries: Seq[Int]): org.apache.spark.sql.DataFrame = {
    require(boundaries.nonEmpty && boundaries == boundaries.sorted &&
      boundaries.forall(_ > 0), "boundaries must be sorted positive")
    val len = tokenCount(col(textCol)).cast("long")
    val bucket = boundaries.foldLeft(lit(0L)) {
      (acc, b) => acc + when(len >= b, 1L).otherwise(0L)
    }
    df.select(bucket.as("bucket"), len.as("__len"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), max(col("__len")).as("max_len"),
        sum(col("__len")).as("sum_len"))
      .withColumn("padded", col("n_docs") * col("max_len"))
      .withColumn("waste_pct",
        when(col("padded") === 0, lit(null)).otherwise(
          round((col("padded") - col("sum_len")).cast("double") /
            col("padded").cast("double"), 6)))
      .orderBy("bucket")
  }

  /** Vocabulary coverage curve — the tokenizer-sizing question "what share
    * of the corpus token mass does a top-V vocabulary cover" answered at
    * each candidate V: rank tokens by corpus frequency (descending, token
    * tie-break) and report the covered mass and coverage ratio per size.
    * The elbow of this curve is where BPE/vocab growth stops paying.
    *
    * Scale shape: ONE corpus tokenization pass collapses to the
    * vocabulary-sized frequency frame; ranking uses
    * [[graft.operators.Indexing.globalIndexBy]] (range shuffle + broadcast
    * offsets — no single-partition window over the vocabulary, which at
    * corpus scale is itself large); only the max(sizes)-row HEAD of the
    * ranked frame joins the ≤|sizes|-row size list. Covered masses are
    * exact integer sums; the ratio is one double division. */
  def vocabCoverage(df: org.apache.spark.sql.DataFrame, textCol: String,
      sizes: Seq[Int]): org.apache.spark.sql.DataFrame = {
    require(sizes.nonEmpty && sizes.forall(_ >= 1),
      "sizes must be non-empty positive")
    val freq = df.select(explode(Dedup.words(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .withColumn("__neg", -col("cnt"))
    val ranked = graft.operators.Indexing.globalIndexBy(freq,
      Seq("__neg", "token"))
    val tot = ranked.agg(sum(col("cnt")).as("__total"),
      count(lit(1)).as("__n_vocab"))
    val sizesDf = df.sparkSession.range(1).select(
      explode(array(sizes.map(v => lit(v.toLong)): _*)).as("vocab_size"))
    ranked.filter(col("global_idx") <= lit(sizes.max.toLong))
      .crossJoin(broadcast(sizesDf))
      .filter(col("global_idx") <= col("vocab_size"))
      .groupBy("vocab_size")
      .agg(sum(col("cnt")).as("covered"))
      .crossJoin(broadcast(tot))
      .select(col("vocab_size"), col("__n_vocab").as("n_vocab"),
        col("__total").as("total_tokens"), col("covered"),
        round(col("covered").cast("double") / col("__total").cast("double"),
          6).as("coverage"))
      .orderBy("vocab_size")
  }
}
