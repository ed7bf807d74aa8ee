package graft.operators

import graft.model.Template

/** H9 header diff: expected-vs-actual column sets with warn/fail flags
  * (reference: src/api/v1/engine.py:83-110; src/pipeline.py:143-153).
  */
object HeaderDiff {

  /** Best-effort expected headers from a template: pinned headers win, then
    * mapping targets, then raw columns (reference: src/api/v1/engine.py:86-94). */
  def expectedHeaders(t: Template): Set[String] =
    if (t.headers.nonEmpty) t.headers.map(h => h.alias.getOrElse(h.name)).toSet
    else if (t.columnMappings.nonEmpty) t.columnMappings.values.toSet
    else if (t.columns.nonEmpty) t.columns.toSet
    else Set.empty

  /** Returns (missing, extra), both sorted. Empty expectations diff to nothing. */
  def diff(actual: Seq[String], t: Template): (List[String], List[String]) = {
    val expected = expectedHeaders(t)
    if (expected.isEmpty) (Nil, Nil)
    else {
      val cols = actual.toSet
      ((expected -- cols).toList.sorted, (cols -- expected).toList.sorted)
    }
  }

  /** Drift gate: throws when a fail flag is set and the diff is non-empty
    * (reference: src/cli.py:133-139). */
  def check(actual: Seq[String], t: Template,
      failOnMissing: Boolean = false, failOnExtra: Boolean = false): (List[String], List[String]) = {
    val (missing, extra) = diff(actual, t)
    if (failOnMissing && missing.nonEmpty)
      throw new IllegalStateException(s"Missing columns vs template: ${missing.mkString(", ")}")
    if (failOnExtra && extra.nonEmpty)
      throw new IllegalStateException(s"Extra columns vs template: ${extra.mkString(", ")}")
    (missing, extra)
  }
}
