package graft

import graft.functions.GraftExtensions
import graft.functions.expr.DurationSeconds
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Native DurationSeconds expression: interpreted + codegen parity, SQL
  * registration via SparkSessionExtensions. */
class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    "PT1H2M3S" -> 3723L, "P1DT1S" -> 86401L, "P2D" -> 172800L,
    "PT45S" -> 45L, "P" -> 0L, "bogus" -> 0L, "" -> 0L)

  test("static parse matches the reference semantics") {
    cases.foreach { case (in, want) =>
      assert(DurationSeconds.parse(UTF8String.fromString(in)) == want, in)
    }
    assert(DurationSeconds.parse(null) == 0L)
  }

  test("interpreted and codegen paths agree on a real frame") {
    val df = cases.map(_._1).toDF("d")
    // codegen on (default)
    val gen = df.select(graft.operators.Summaries.durationSeconds($"d"))
      .collect().map(_.getLong(0))
    assert(gen.toSeq == cases.map(_._2))
    // force interpreted eval
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(graft.operators.Summaries.durationSeconds($"d"))
        .collect().map(_.getLong(0))
      assert(interp.toSeq == cases.map(_._2))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("dot_product: bit-parity with the HOF fold, null elements, SQL registration") {
    val hof = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val df = Seq(
      (Seq(1.5, -2.25, 3.125), Seq(0.5, 4.0, -1.0)),
      (Seq(0.1, 0.2, 0.3), Seq(0.3, 0.2, 0.1)))
      .toDF("a", "b")
    val native = df.select(graft.operators.Similarity.dot($"a", $"b"))
      .collect().map(_.getDouble(0))
    val folded = df.select(hof($"a", $"b")).collect().map(_.getDouble(0))
    // same fold order → identical bits, not just approximately equal
    assert(native.toSeq.map(java.lang.Double.doubleToLongBits) ==
      folded.toSeq.map(java.lang.Double.doubleToLongBits))

    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(viaSql == 11.0)
  }

  test("duration_seconds registers as a SQL function") {
    GraftExtensions.register(spark)
    val r = spark
      .sql("SELECT duration_seconds('PT2M3S') AS s, duration_seconds(NULL) AS n")
      .head()
    assert(r.getLong(0) == 123L)
    assert(r.isNullAt(1)) // raw expression is null-intolerant; wrapper adds the 0
  }

  test("type check rejects non-string input") {
    val e = intercept[Exception] {
      Seq(1, 2).toDF("n")
        .select(org.apache.spark.sql.graftbridge.Bridge.column(
          DurationSeconds(org.apache.spark.sql.graftbridge.Bridge.expression($"n"))))
        .collect()
    }
    assert(e.getMessage.contains("duration_seconds") ||
      e.getMessage.toLowerCase.contains("data type"))
  }

  test("nfc_normalize: composes decomposed text, fast-path identity, SQL registration") {
    import graft.functions.expr.NfcNormalize
    val decomposed = "cafe\u0301" // e + combining acute (NFD)
    val composed = "caf\u00e9"    // precomposed (NFC)
    // static semantics
    assert(NfcNormalize.normalize(UTF8String.fromString(decomposed)).toString == composed)
    assert(NfcNormalize.normalize(UTF8String.fromString("plain ascii")).toString == "plain ascii")
    assert(NfcNormalize.normalize(null) == null)
    // NFC keeps compatibility chars (ligature U+FB01 -- NFKC would expand it)
    assert(NfcNormalize.normalize(UTF8String.fromString("\ufb01le")).toString == "\ufb01le")
    // idempotence + already-NFC fast path returns the same object
    val once = NfcNormalize.normalize(UTF8String.fromString("A\u030angstro\u0308m"))
    assert(once.toString == "\u00c5ngstr\u00f6m")
    assert(NfcNormalize.normalize(once) eq once)
    // SQL registration + codegen path over a frame
    GraftExtensions.register(spark)
    val r = spark.sql(
      s"SELECT nfc_normalize('$decomposed') AS c, length(nfc_normalize('$decomposed')) AS n, " +
        "nfc_normalize(CAST(NULL AS STRING)) AS z")
      .head()
    assert(r.getString(0) == composed && r.getInt(1) == 4 && r.isNullAt(2))
    // interpreted parity
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val i = spark.sql(s"SELECT nfc_normalize('$decomposed') AS c").head().getString(0)
      assert(i == composed)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("luhn_valid: checksum, separators, length bounds, SQL + codegen parity") {
    import graft.functions.expr.LuhnValid
    def chk(s: String) = LuhnValid.check(UTF8String.fromString(s))
    // classic valid test numbers — bare, spaced, dashed
    assert(chk("4111111111111111"))
    assert(chk("4111 1111 1111 1111"))
    assert(chk("5500-0055-5555-5559"))
    assert(chk("4222222222222"))          // 13-digit Visa test number
    // single-digit corruption flips the checksum
    assert(!chk("4111111111111112"))
    // length bounds: 12 digits too short even when mod-10 holds (all-zero
    // sums to 0), 20 digits too long
    assert(!chk("000000000000"))          // 12 digits, sum 0
    assert(!chk("41111111111111111111")) // 20 digits
    // non-separator characters make it a non-card, and null is false
    assert(!chk("4111a111111111111"))
    assert(!chk(""))
    assert(!LuhnValid.check(null))

    // SQL registration + codegen/interpreted parity on a frame
    GraftExtensions.register(spark)
    val sql = "SELECT luhn_valid('4111 1111 1111 1111') AS a, " +
      "luhn_valid('4111111111111112') AS b, " +
      "luhn_valid(CAST(NULL AS STRING)) AS z"
    val g = spark.sql(sql).head()
    assert(g.getBoolean(0) && !g.getBoolean(1) && g.isNullAt(2))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val i = spark.sql(sql).head()
      assert(i.getBoolean(0) && !i.getBoolean(1) && i.isNullAt(2))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
