package graft.sources

/** S3 merged-header normalization + S4 header-row guessing — driver-side
  * header intelligence over tiny previews, not distributed operators.
  */
object HeaderNormalizer {

  /** Translate a pandas-style header row into a 0-indexed worksheet row:
    * skiprows at-or-before the header shift it down
    * (reference: src/templates.py:395-403, which returns 1-indexed). */
  def effectiveHeaderRow(headerRow: Int, skiprows: Seq[Int]): Int =
    headerRow + skiprows.count(_ <= headerRow)

  /** S3: normalized headers for a worksheet, expanding merged regions
    * (reference: src/templates.py:406-465). Returns (headers, mergedDetected).
    *
    * A merged range intersecting the header row propagates its anchor value
    * to every spanned column; an empty anchor becomes a
    * `merged_<COL><ROW>` placeholder, suffixed `_<COL>` per column when the
    * range spans multiple columns.
    */
  def normalize(sheet: XlsxMini.Sheet, headerRow: Int,
      skiprows: Seq[Int]): (List[String], Boolean) = {
    val target = effectiveHeaderRow(headerRow, skiprows)
    if (target >= sheet.grid.length) return (Nil, false)

    val headers = scala.collection.mutable.ArrayBuffer[String](
      sheet.grid(target).map(v => if (v == null) "" else cellStr(v)): _*)

    var mergedDetected = false
    sheet.merged.foreach { case (r1, c1, r2, c2) =>
      if (r1 <= target && target <= r2) {
        mergedDetected = true
        val base = sheet.grid.lift(r1).flatMap(_.lift(c1)).orNull
        val baseEmpty = base == null || base == ""
        val placeholderBase =
          if (!baseEmpty) cellStr(base)
          else s"merged_${XlsxMini.colLetter(c1)}${r1 + 1}"
        (c1 to c2).foreach { c =>
          val value =
            if (baseEmpty && c2 > c1) s"${placeholderBase}_${XlsxMini.colLetter(c)}"
            else placeholderBase
          while (headers.length <= c) headers += ""
          headers(c) = value
        }
      }
    }
    (headers.toList, mergedDetected)
  }

  /** S4: guess the header row of a preview grid — the first row (of the
    * first 12) where >80% of the non-empty cells are non-numeric strings and
    * they fill >50% of the sheet width
    * (reference: src/services/header_detection.py:16-26). */
  def guessHeaderRow(grid: Seq[Seq[Any]]): Int = {
    val width = if (grid.isEmpty) 0 else grid.map(_.length).max
    grid.take(12).zipWithIndex.foreach { case (row, i) =>
      val nonEmpty = row.filter(v => v != null && v != "")
      if (nonEmpty.nonEmpty && width > 0) {
        val stringish = nonEmpty.count {
          case _: String => true
          case _ => false
        }
        if (stringish.toDouble / nonEmpty.length > 0.8 &&
          nonEmpty.length.toDouble / width > 0.5) return i
      }
    }
    0
  }

  private def cellStr(v: Any): String = v match {
    case d: Double if d == d.floor && math.abs(d) < 1e15 => d.toLong.toString
    case other => other.toString
  }
}
