package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** H5-H8 schema-candidate heuristics (reference: src/services/schema_candidates.py).
  * Column statistics come from ONE fused aggregation over the preview frame
  * (3 stats × N columns in a single job, SURVEY §7.4.8); the ranking logic is
  * driver-side over those stats.
  */
object SchemaCandidates {

  /** Per-column stats: numeric parse ratio, year-like ratio (of parsed),
    * mean stringified length (nulls count as ""). */
  final case class ColStats(name: String, numericRatio: Double,
      yearRatio: Double, meanLen: Double) {
    def isYearLike: Boolean = yearRatio > 0.6
    def isNumericCol: Boolean = numericRatio > 0.6 && !isYearLike
    def isTextyCol: Boolean = meanLen > 12 && numericRatio < 0.3
  }

  /** H5 classifiers, one agg job (reference: src/services/schema_candidates.py:10-33). */
  def columnStats(df: DataFrame): Seq[ColStats] = {
    val cols = df.columns
    if (cols.isEmpty) return Nil
    val aggs = cols.flatMap { c =>
      val q = col(s"`$c`")
      val num = q.cast("string").try_cast("double")
      Seq(
        coalesce(avg(num.isNotNull.cast("double")), lit(0.0)).as(s"nr_$c"),
        coalesce(avg(when(num.isNotNull, num.between(1900, 2100).cast("double"))),
          lit(0.0)).as(s"yr_$c"),
        coalesce(avg(length(coalesce(q.cast("string"), lit("")))), lit(0.0)).as(s"ml_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      ColStats(c, row.getDouble(3 * i), row.getDouble(3 * i + 1), row.getDouble(3 * i + 2))
    }.toSeq
  }

  /** H6 contiguous numeric (non-year) column blocks
    * (reference: src/services/schema_candidates.py:36-68). */
  final case class NumericBlock(columns: List[String], startIdx: Int, endIdx: Int)

  def findNumericBlocks(stats: Seq[ColStats]): List[NumericBlock] = {
    val blocks = scala.collection.mutable.ListBuffer[NumericBlock]()
    var current = List.empty[Int]
    stats.zipWithIndex.foreach { case (st, idx) =>
      if (st.isNumericCol) current = current :+ idx
      else if (current.nonEmpty) {
        blocks += NumericBlock(current.map(stats(_).name), current.head, current.last)
        current = Nil
      }
    }
    if (current.nonEmpty)
      blocks += NumericBlock(current.map(stats(_).name), current.head, current.last)
    blocks.toList
  }

  /** H7 multi-language month normalization
    * (reference: src/services/schema_candidates.py:71-117). */
  private val MonthMap: Map[String, String] = Map(
    "tammikuu" -> "jan", "helmikuu" -> "feb", "maaliskuu" -> "mar",
    "huhtikuu" -> "apr", "toukokuu" -> "may", "kesäkuu" -> "jun",
    "heinäkuu" -> "jul", "elokuu" -> "aug", "syyskuu" -> "sep",
    "lokakuu" -> "oct", "marraskuu" -> "nov", "joulukuu" -> "dec",
    "januaari" -> "jan", "january" -> "jan", "february" -> "feb",
    "march" -> "mar", "april" -> "apr", "may" -> "may", "june" -> "jun",
    "july" -> "jul", "august" -> "aug", "september" -> "sep",
    "october" -> "oct", "november" -> "nov", "december" -> "dec",
    "januari" -> "jan", "februari" -> "feb", "mars" -> "mar", "maj" -> "may",
    "juni" -> "jun", "juli" -> "jul", "augusti" -> "aug", "oktober" -> "oct",
    "maerz" -> "mar", "märz" -> "mar", "mai" -> "may", "dezember" -> "dec")

  private val EngMonths =
    Seq("jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sep", "oct", "nov", "dec")

  def normalizeMonth(token: String): Option[String] = {
    val lower = token.toLowerCase
    MonthMap.get(lower).orElse(EngMonths.find(lower.contains))
  }

  /** `2020 Jan`-style header merge into `2020-jan` period labels
    * (reference: src/services/schema_candidates.py:145-158). */
  def combineYearMonth(headers: Seq[String]): (List[String], Boolean) = {
    var changed = false
    val combined = headers.map { h =>
      val parts = h.replace("/", " ").replace("-", " ").split("\\s+").filter(_.nonEmpty)
      val year = parts.find(p => p.length == 4 && p.forall(_.isDigit))
      val month = parts.flatMap(normalizeMonth).headOption
      (year, month) match {
        case (Some(y), Some(m)) => changed = true; s"$y-$m"
        case _ => h
      }
    }
    (combined.toList, changed)
  }

  /** One ranked header-layout candidate (reference shape). */
  final case class Candidate(label: String, headers: List[String], score: Double,
      note: String, missing: List[String], extra: List[String])

  /** H8 ranked schema candidates with H9-style diff annotations
    * (reference: src/services/schema_candidates.py:128-236). */
  def buildCandidates(df: DataFrame, headers: Seq[String],
      dataType: String = "generic",
      targetFields: Seq[String] = Nil): List[Candidate] = {
    val stats = columnStats(df)
    val byName = stats.map(s => s.name -> s).toMap
    val numericCols = stats.filter(_.isNumericCol).map(_.name).toList
    val textCols = stats.filter(_.isTextyCol).map(_.name).toList

    var cands = List((("As detected", headers.toList, 0.20,
      "Headers as read from file.")))

    val (combined, changed) = combineYearMonth(headers)
    if (changed)
      cands :+= (("Combined year+month headers", combined, 0.35,
        "Merged year + month tokens into single period labels."))

    findNumericBlocks(stats).foreach { block =>
      var note = s"Numeric block cols ${block.startIdx}-${block.endIdx} (size ${block.columns.length})"
      var ordered = block.columns
      var score = 0.5 + 0.05 * block.columns.length
      if (block.startIdx > 0) {
        val left = stats(block.startIdx - 1).name
        if (textCols.contains(left) && !ordered.contains(left)) {
          ordered = left +: ordered
          note += s"; key column '$left' on the left."
          score = 0.6 + 0.05 * block.columns.length
        }
      }
      cands :+= (("Numeric block ordering", ordered, math.min(score, 0.9), note))
    }

    if (dataType == "product_sales")
      textCols.headOption.filter(_ => numericCols.nonEmpty).foreach { key =>
        cands :+= (("Product key + numeric measures",
          key +: df.columns.filter(numericCols.contains).toList,
          0.55 + 0.05 * numericCols.length,
          s"Text key '$key' with numeric measures."))
      }
    if (dataType == "product_descriptions")
      textCols.headOption.foreach { key =>
        cands :+= (("Description-first ordering",
          key +: df.columns.filterNot(_ == key).toList, 0.45,
          s"Longest text column '$key' first."))
      }
    if (dataType == "sales" && numericCols.nonEmpty)
      cands :+= (("Numeric-first (sales) ordering",
        numericCols ++ df.columns.filterNot(numericCols.contains).toList,
        0.5 + 0.05 * numericCols.length,
        "Prioritized numeric columns (likely amounts/quantities)."))

    cands
      .filter { case (label, _, score, _) => label == "As detected" || score >= 0.25 }
      .map { case (label, hdrs, score, note) =>
        val missing = (targetFields.toSet -- hdrs.toSet).toList.sorted
        val extra = (hdrs.toSet -- targetFields.toSet).toList.sorted
        val annotated =
          if (missing.nonEmpty || extra.nonEmpty) {
            val missTxt = if (missing.nonEmpty)
              s" missing vs current schema: ${missing.take(5).mkString(", ")}" +
                (if (missing.length > 5) "..." else "") else ""
            val extraTxt = if (extra.nonEmpty)
              s" extra: ${extra.take(5).mkString(", ")}" +
                (if (extra.length > 5) "..." else "") else ""
            s"$note |$missTxt $extraTxt".trim
          } else note
        Candidate(label, hdrs, score, annotated, missing, extra)
      }
  }
}
