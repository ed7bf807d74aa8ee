package graft.functions

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** H1/H2/H3/H4 header auto-mapping (reference: src/core.py:16-25,241-282;
  * webapp/pages/02_Mapping.py:29-57; src/core/config_loader.py:18-51).
  * Driver-side string work over header lists — never a distributed op.
  */
object AutoMapper {

  /** Canonical target schema + synonyms (reference: src/core.py:16-25). */
  val TargetSchema: Seq[(String, List[String])] = Seq(
    "provider_id" -> List("provider", "vendor", "supplier", "source", "partner"),
    "article_sku" -> List("sku", "item", "material", "product"),
    "report_date" -> List("date", "period", "month", "time", "year"),
    "sales_qty" -> List("qty", "quantity", "units", "volume"),
    "sales_amount" -> List("amount", "total", "revenue", "sales", "net", "gross"),
    "order_id" -> List("order", "po number", "reference"),
    "region" -> List("region", "area", "location"),
    "unit_price" -> List("unit_price", "price", "unit cost", "rate"))

  /** Ratcliff-Obershelp similarity — a port of difflib.SequenceMatcher
    * .ratio(): 2·M / (|a|+|b|) where M sums recursively-found longest
    * matching blocks. Header strings are short, so no autojunk handling. */
  def ratio(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    def matches(a: String, b: String): Int = {
      if (a.isEmpty || b.isEmpty) return 0
      // longest common substring, lowest index on ties (difflib behavior)
      var bi, bj, bs = 0
      val prev = Array.ofDim[Int](b.length + 1)
      val cur = Array.ofDim[Int](b.length + 1)
      var i = 0
      while (i < a.length) {
        var j = 0
        while (j < b.length) {
          cur(j + 1) = if (a(i) == b(j)) prev(j) + 1 else 0
          if (cur(j + 1) > bs) { bs = cur(j + 1); bi = i - bs + 1; bj = j - bs + 1 }
          j += 1
        }
        System.arraycopy(cur, 0, prev, 0, cur.length)
        i += 1
      }
      if (bs == 0) 0
      else bs + matches(a.substring(0, bi), b.substring(0, bj)) +
        matches(a.substring(bi + bs), b.substring(bj + bs))
    }
    2.0 * matches(a, b) / (a.length + b.length)
  }

  /** difflib.get_close_matches(n=1): best candidate with ratio ≥ cutoff. */
  def closeMatch(word: String, candidates: Seq[String],
      cutoff: Double = 0.82): Option[String] = {
    val scored = candidates.map(c => c -> ratio(word, c)).filter(_._2 >= cutoff)
    if (scored.isEmpty) None else Some(scored.maxBy(_._2)._1)
  }

  /** H1 synonym auto-mapping: substring match against field+synonyms first,
    * then fuzzy (cutoff .82), else snake_case; each target used at most once
    * (reference: src/core.py:253-282). */
  def autoMapColumns(fileHeaders: Seq[String],
      targetSchema: Seq[(String, List[String])] = TargetSchema): Map[String, String] = {
    val mapping = scala.collection.mutable.LinkedHashMap[String, String]()
    val used = scala.collection.mutable.Set[String]()
    fileHeaders.foreach { header =>
      val headerLower = header.toLowerCase.trim
      var best: Option[String] = None
      val it = targetSchema.iterator
      while (best.isEmpty && it.hasNext) {
        val (target, synonyms) = it.next()
        if (!used(target)) {
          val pool = target +: synonyms
          if (pool.exists(c => c.nonEmpty && headerLower.contains(c.toLowerCase)))
            best = Some(target)
          else if (closeMatch(headerLower, pool).isDefined)
            best = Some(target)
        }
      }
      best match {
        case Some(t) => mapping(header) = t; used += t
        case None => mapping(header) = graft.operators.TransformEngine.snakeCase(header)
      }
    }
    mapping.toMap
  }

  private def normalize(text: String): String =
    text.toLowerCase.replaceAll("[^a-z0-9]+", " ").replaceAll("\\s+", " ").trim

  /** H2 fuzzy best-target (UI variant): max SequenceMatcher ratio over
    * normalized strings, accepted at ≥ 0.6 (reference: webapp/pages/02_Mapping.py:29-47). */
  def bestTarget(source: String,
      synonyms: Seq[(String, List[String])] = TargetSchema): Option[String] = {
    val srcNorm = normalize(source)
    var bestScore = 0.0
    var best: Option[String] = None
    synonyms.foreach { case (target, terms) =>
      (target +: terms).foreach { term =>
        val score = ratio(srcNorm, normalize(term))
        if (score > bestScore) { bestScore = score; best = Some(target) }
      }
    }
    if (bestScore >= 0.6) best else None
  }

  // ------------------------------------------------- H3 synonym config

  /** H3 synonym config: base + user overlay, learned mappings persist to the
    * user file (reference: src/core.py:102-235; src/core/config_loader.py:18-51). */
  final case class SynonymConfig(synonyms: Map[String, List[String]]) {
    def toTargetSchema: Seq[(String, List[String])] =
      TargetSchema.map { case (t, defaults) =>
        t -> (defaults ++ synonyms.getOrElse(t, Nil)).distinct
      } ++ synonyms.view.filterKeys(k => !TargetSchema.exists(_._1 == k))
        .map { case (k, v) => k -> v }.toSeq
  }

  private def loadYamlMap(p: Path): Map[String, Any] =
    if (!Files.exists(p)) Map.empty
    else {
      val yaml = new org.yaml.snakeyaml.Yaml(new org.yaml.snakeyaml.constructor.SafeConstructor(
        new org.yaml.snakeyaml.LoaderOptions()))
      yaml.load[Any](Files.readString(p)) match {
        case m: java.util.Map[_, _] =>
          m.asScala.map { case (k, v) => k.toString -> (v: Any) }.toMap
        case _ => Map.empty
      }
    }

  private def synonymsOf(m: Map[String, Any]): Map[String, List[String]] =
    m.get("synonyms") match {
      case Some(s: java.util.Map[_, _]) =>
        s.asScala.map { case (k, v) =>
          k.toString -> (v match {
            case l: java.util.List[_] => l.asScala.map(_.toString).toList
            case other => List(other.toString)
          })
        }.toMap
      case _ => Map.empty
    }

  /** Base config + user overlay (user lists extend base lists). */
  def loadConfig(baseFile: Path, userFile: Path): SynonymConfig = {
    val base = synonymsOf(loadYamlMap(baseFile))
    val user = synonymsOf(loadYamlMap(userFile))
    SynonymConfig((base.keySet ++ user.keySet).map { k =>
      k -> (base.getOrElse(k, Nil) ++ user.getOrElse(k, Nil)).distinct
    }.toMap)
  }

  /** Persist a learned header→field pair into the user overlay. */
  def learnMapping(userFile: Path, field: String, header: String): SynonymConfig = {
    val existing = synonymsOf(loadYamlMap(userFile))
    val updated = existing.updated(field,
      (existing.getOrElse(field, Nil) :+ header.toLowerCase.trim).distinct)
    val sb = new StringBuilder("synonyms:\n")
    updated.toSeq.sortBy(_._1).foreach { case (k, vs) =>
      sb ++= s"  $k:\n"
      vs.foreach(v => sb ++= s"    - ${v}\n")
    }
    Files.createDirectories(userFile.toAbsolutePath.getParent)
    Files.writeString(userFile, sb.toString)
    SynonymConfig(updated)
  }

  /** H4 type sniffing for display (reference: webapp/pages/02_Mapping.py:50-57). */
  def sniffType(dt: org.apache.spark.sql.types.DataType): String = dt match {
    case org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType |
         org.apache.spark.sql.types.DateType => "Date"
    case _: org.apache.spark.sql.types.NumericType => "Number"
    case org.apache.spark.sql.types.BooleanType => "Boolean"
    case _ => "Text"
  }
}
