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
}
