package graft

import graft.functions.AutoMapper
import graft.model.{Template, TemplateCodec}
import graft.operators.TransformEngine
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck property tests (SURVEY §5 plan): codec round-trips, coercion
  * laws, and string-util invariants hold for arbitrary inputs, not just the
  * fixtures. (The scalatest-scalacheck bridge isn't in the offline cache,
  * so generators are driven with deterministic seeded sampling.) */
class PropertySpec extends AnyFunSuite {

  /** Run `f` over `n` deterministic samples of `gen`. */
  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 4) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(produced > n / 2, s"generator too sparse: $produced/$n")
  }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 200)(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb), n) { case (a, b) => f(a, b) }

  private val ident: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(24))

  private val templates: Gen[Template] = for {
    sheet <- Gen.option(ident)
    cols <- Gen.listOf(ident).map(_.distinct.take(8))
    maps <- Gen.mapOf(Gen.zip(ident, ident)).map(_.take(5))
    header <- Gen.choose(0, 10)
    skips <- Gen.listOf(Gen.choose(0, 20)).map(_.distinct.sorted.take(5))
    delim <- Gen.oneOf(",", ";", "\t", "|")
    unpivot <- Gen.oneOf(true, false)
    trim <- Gen.oneOf(true, false)
    strip <- Gen.oneOf(true, false)
    thr <- Gen.option(Gen.choose(0.0, 1.0))
    combine <- Gen.listOf(ident).map(_.distinct.take(3))
    provider <- Gen.option(ident)
  } yield {
    val sheets = sheet.toList // fromMap promotes sheet into sheets
    // columns back-fill from mappings when empty — generate consistently
    val columns = if (cols.nonEmpty) cols else maps.keys.toList
    Template(sheet = sheet, sheets = sheets, headerRow = header,
      columns = columns, columnMappings = maps, skiprows = skips,
      delimiter = delim, unpivot = unpivot, trimStrings = trim,
      stripThousands = strip, dropNullColumnsThreshold = thr,
      combineOn = combine, providerName = provider)
  }

  test("template JSON and YAML round-trips preserve every field") {
    forAll(templates) { t =>
      assert(TemplateCodec.parse(TemplateCodec.toJson(t)) == t)
      assert(TemplateCodec.parse(TemplateCodec.toYaml(t)) == t)
    }
  }

  test("snakeCase is idempotent and emits only [a-z0-9_]") {
    forAll(Gen.asciiPrintableStr) { s =>
      val once = TransformEngine.snakeCase(s)
      assert(TransformEngine.snakeCase(once) == once)
      assert(once.matches("[a-z0-9_]*"))
      assert(!once.startsWith("_") && !once.endsWith("_"))
    }
  }

  test("ratio is bounded in [0,1] and 1.0 on self") {
    val short = Gen.listOf(Gen.alphaLowerChar).map(_.mkString.take(12))
    forAll2(short, short) { (a, b) =>
      val r = AutoMapper.ratio(a, b)
      assert(r >= 0.0 && r <= 1.0)
      // NOTE: like difflib's SequenceMatcher, ratio is order-DEPENDENT in
      // tie cases (Ratcliff-Obershelp picks the earliest longest match in
      // `a`), so no symmetry law holds — faithful to the reference.
    }
    forAll(short) { a =>
      if (a.nonEmpty) assert(AutoMapper.ratio(a, a) == 1.0)
    }
  }

  test("effectiveHeaderRow is monotone in skiprows before the header") {
    import graft.sources.HeaderNormalizer.effectiveHeaderRow
    forAll2(Gen.choose(0, 10), Gen.listOf(Gen.choose(0, 30))) { (h, skips) =>
      val eff = effectiveHeaderRow(h, skips)
      assert(eff >= h)
      assert(eff == h + skips.count(_ <= h))
    }
  }

  test("month normalization always lands in the 12 canonical months") {
    val canon = Set("jan", "feb", "mar", "apr", "may", "jun", "jul", "aug",
      "sep", "oct", "nov", "dec")
    forAll(Gen.asciiPrintableStr) { s =>
      graft.functions.SchemaCandidates.normalizeMonth(s)
        .foreach(m => assert(canon(m)))
    }
  }
}
