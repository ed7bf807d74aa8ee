package graft

import graft.model.{HeaderCell, Template, TemplateCodec}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Template codec round-trip + from_dict back-compat aliases
  * (reference: tests/test_templates_roundtrip.py; src/templates.py:167-296). */
class TemplateCodecSpec extends AnyFunSuite {

  private val full = Template(
    sheet = Some("Sales"),
    sheets = List("Sales"),
    headerRow = 3,
    columns = List("sku", "Jan", "Feb"),
    columnMappings = Map("sku" -> "article_sku"),
    headers = List(HeaderCell("sku", 0, 3, alias = Some("article_sku"))),
    skiprows = List(0, 1),
    delimiter = ";",
    encoding = "latin-1",
    sourceType = "csv",
    providerName = Some("acme"),
    combineOn = List("article_sku"),
    dedupeOn = List("article_sku", "report_date"),
    trimStrings = true, dropEmptyRows = true, stripThousands = true,
    dropNullColumnsThreshold = Some(0.25),
    unpivot = true, varName = "period", valueName = "amount",
    requiredFields = List("article_sku"),
    fieldTypes = Map("amount" -> "float", "report_date" -> "date"))

  test("JSON round-trip preserves every field") {
    assert(TemplateCodec.parse(TemplateCodec.toJson(full)) == full)
  }

  test("YAML round-trip preserves every field") {
    assert(TemplateCodec.parse(TemplateCodec.toYaml(full)) == full)
  }

  test("from_dict back-compat aliases map to canonical fields") {
    val t = TemplateCodec.parse(
      """{"sheet_name": "S1", "header": 2, "selected_headers": ["a", "b"],
        |"header_mapping": {"a": "x"}, "excel_file": "in.xlsx",
        |"combine_on": "a, b", "dedupe_on": "a"}""".stripMargin)
    assert(t.sheet.contains("S1"))
    assert(t.headerRow == 2)
    assert(t.columns == List("a", "b"))
    assert(t.columnMappings == Map("a" -> "x"))
    assert(t.sourceFile.contains("in.xlsx"))
    assert(t.combineOn == List("a", "b")) // comma-split string form
    assert(t.dedupeOn == List("a"))
  }

  test("single sheet promotes into sheets; >1 sheets set combine_sheets") {
    assert(TemplateCodec.parse("""{"sheet": "Only"}""").sheets == List("Only"))
    assert(TemplateCodec.parse("""{"sheets": ["A", "B"]}""").combineSheets)
  }

  test("headers back-fill columns when columns absent") {
    val t = TemplateCodec.parse(
      """{"headers": [{"name": "h1", "column": 0, "row": 1}]}""")
    assert(t.columns == List("h1"))
  }

  test("save + locate find templates next to the source file") {
    val dir = Files.createTempDirectory("tplspec")
    val src = dir.resolve("data.xlsx")
    Files.writeString(src, "")
    TemplateCodec.save(full, dir.resolve("data" + TemplateCodec.TemplateSuffixJson))
    val located = TemplateCodec.locate(src)
    assert(located.isDefined)
    assert(TemplateCodec.load(located.get) == full)
  }
}
