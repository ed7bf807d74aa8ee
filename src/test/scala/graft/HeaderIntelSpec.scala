package graft

import graft.functions.{AutoMapper, SchemaCandidates}
import java.nio.file.Files

/** H1-H8 header intelligence (reference: src/core.py:241-282,
  * src/services/schema_candidates.py, webapp/pages/02_Mapping.py). */
class HeaderIntelSpec extends SparkSpec {
  import spark.implicits._

  test("ratio matches Python difflib.SequenceMatcher on reference pairs") {
    // golden values computed with CPython difflib
    val golden = Seq(
      ("vendor name", "vendor") -> 0.705882,
      ("quantity", "qty") -> 0.545455,
      ("sales amount", "amount") -> 0.666667,
      ("prod", "product") -> 0.727273,
      ("po number", "po num") -> 0.8,
      ("abcxyz", "xyzabc") -> 0.5,
      ("report date", "date") -> 0.533333,
      ("unit price", "unit_price") -> 0.9)
    golden.foreach { case ((a, b), expect) =>
      assert(math.abs(AutoMapper.ratio(a, b) - expect) < 1e-6, s"ratio($a, $b)")
    }
  }

  test("auto-mapping: substring first, fuzzy fallback, snake_case default, one use per target") {
    val m = AutoMapper.autoMapColumns(Seq(
      "Vendor Name",       // substring 'vendor' → provider_id
      "Item SKU",          // substring 'sku' → article_sku
      "Total Amount",      // substring 'amount' → sales_amount
      "Second Vendor",     // provider_id already used → snake_case
      "Random Header"))    // no match → snake_case
    assert(m("Vendor Name") == "provider_id")
    assert(m("Item SKU") == "article_sku")
    assert(m("Total Amount") == "sales_amount")
    assert(m("Second Vendor") == "second_vendor")
    assert(m("Random Header") == "random_header")
  }

  test("bestTarget accepts normalized fuzzy ≥ 0.6, rejects below") {
    assert(AutoMapper.bestTarget("Unit-Price!").contains("unit_price"))
    assert(AutoMapper.bestTarget("qqqq zzzz").isEmpty)
  }

  test("synonym config: base + user overlay merge and learn persists") {
    val dir = Files.createTempDirectory("cfg")
    val base = dir.resolve("config.yaml")
    val user = dir.resolve("config.user.yaml")
    Files.writeString(base,
      "synonyms:\n  provider_id:\n    - lieferant\n  custom_field:\n    - special\n")
    val c1 = AutoMapper.loadConfig(base, user)
    assert(c1.synonyms("provider_id") == List("lieferant"))
    AutoMapper.learnMapping(user, "provider_id", "Firma")
    val c2 = AutoMapper.loadConfig(base, user)
    assert(c2.synonyms("provider_id") == List("lieferant", "firma"))
    val schema = c2.toTargetSchema.toMap
    assert(schema("provider_id").contains("lieferant"))
    assert(schema("custom_field") == List("special"))
  }

  test("type sniffing labels from Spark schema") {
    import org.apache.spark.sql.types._
    assert(AutoMapper.sniffType(TimestampType) == "Date")
    assert(AutoMapper.sniffType(LongType) == "Number")
    assert(AutoMapper.sniffType(BooleanType) == "Boolean")
    assert(AutoMapper.sniffType(StringType) == "Text")
  }

  private def preview = Seq(
    ("a very long descriptive product name 1", "10", "1999", "5.5", "x"),
    ("another quite long product description", "20", "2001", "6.5", "y"),
    ("third long text value for the key field", "30", "2020", "7.5", "z"))
    .toDF("desc", "qty", "year", "price", "code")

  test("column classifiers: numeric ratio, year-like, texty (one agg)") {
    val stats = SchemaCandidates.columnStats(preview)
    val byName = stats.map(s => s.name -> s).toMap
    assert(byName("desc").isTextyCol && !byName("desc").isNumericCol)
    assert(byName("qty").isNumericCol)
    assert(byName("year").isYearLike && !byName("year").isNumericCol)
    assert(byName("price").isNumericCol)
    assert(!byName("code").isNumericCol && !byName("code").isTextyCol)
  }

  test("numeric blocks split on the year-like column") {
    val blocks = SchemaCandidates.findNumericBlocks(SchemaCandidates.columnStats(preview))
    assert(blocks.map(_.columns) == List(List("qty"), List("price")))
  }

  test("month normalization across languages + year-month merge") {
    assert(SchemaCandidates.normalizeMonth("tammikuu").contains("jan"))
    assert(SchemaCandidates.normalizeMonth("Dezember").contains("dec"))
    assert(SchemaCandidates.normalizeMonth("OCTOBER").contains("oct"))
    assert(SchemaCandidates.normalizeMonth("notamonth").isEmpty)
    val (combined, changed) = SchemaCandidates.combineYearMonth(
      Seq("2020 tammikuu", "SKU", "2021-maj", "plain"))
    assert(changed)
    assert(combined == List("2020-jan", "SKU", "2021-may", "plain"))
  }

  test("ranked candidates: as-detected + year-month + numeric-block with key col") {
    val cands = SchemaCandidates.buildCandidates(preview,
      Seq("desc", "2020 Jan", "year", "price", "code"),
      targetFields = Seq("desc", "qty"))
    val labels = cands.map(_.label)
    assert(labels.contains("As detected"))
    assert(labels.contains("Combined year+month headers"))
    assert(labels.contains("Numeric block ordering"))
    val block = cands.find(_.label == "Numeric block ordering").get
    assert(block.headers.head == "desc") // texty key col pulled in from the left
    assert(block.score > 0.6)
    val detected = cands.find(_.label == "As detected").get
    assert(detected.missing == List("qty"))
    assert(detected.extra.contains("price"))
  }
}
