package graft.model

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

/** Load/save `Template` documents as `<stem>.df-template.{json,yaml}`,
  * mirroring the reference's template I/O (reference: src/templates.py:302-384).
  *
  * YAML is a strict superset of JSON, so a single SnakeYAML safe-load parses
  * both formats (SnakeYAML ships on Spark's classpath). Writing emits
  * hand-rolled JSON (stable key order, no extra deps) or SnakeYAML YAML.
  */
object TemplateCodec {

  val TemplateSuffixJson = ".df-template.json"
  val TemplateSuffixYaml = ".df-template.yaml"

  // --- parse ---

  def parse(text: String): Template = {
    val yaml = new org.yaml.snakeyaml.Yaml(new org.yaml.snakeyaml.constructor.SafeConstructor(
      new org.yaml.snakeyaml.LoaderOptions()))
    val loaded = yaml.load[Any](text)
    loaded match {
      case m: java.util.Map[_, _] =>
        import scala.jdk.CollectionConverters._
        Template.fromMap(m.asScala.map { case (k, v) => k.toString -> (v: Any) }.toMap)
      case _ => throw new IllegalArgumentException("Template file must contain a JSON/YAML object")
    }
  }

  def load(path: Path): Template =
    parse(new String(Files.readAllBytes(path), StandardCharsets.UTF_8))

  def load(path: String): Template = load(Paths.get(path))

  /** Resolve `<stem>.df-template.json` / `.yaml` next to a source file, like the
    * reference's `locate_template` (reference: src/templates.py:308-351). */
  def locate(sourcePath: Path): Option[Path] = {
    val name = sourcePath.getFileName.toString
    val stem = name.lastIndexOf('.') match {
      case -1 => name
      case i => name.substring(0, i)
    }
    val dir = Option(sourcePath.getParent).getOrElse(Paths.get("."))
    Seq(TemplateSuffixJson, TemplateSuffixYaml)
      .map(sfx => dir.resolve(stem + sfx))
      .find(Files.exists(_))
  }

  // --- write ---

  def toJson(t: Template): String = renderJson(sortedMap(t.toMap), 0)

  def toYaml(t: Template): String = {
    val opts = new org.yaml.snakeyaml.DumperOptions()
    opts.setDefaultFlowStyle(org.yaml.snakeyaml.DumperOptions.FlowStyle.BLOCK)
    new org.yaml.snakeyaml.Yaml(opts).dump(toJava(t.toMap))
  }

  def save(t: Template, path: Path): Unit = {
    val text = if (path.toString.endsWith(".yaml") || path.toString.endsWith(".yml"))
      toYaml(t)
    else toJson(t)
    Files.write(path, text.getBytes(StandardCharsets.UTF_8))
  }

  // --- helpers ---

  private def sortedMap(m: Map[String, Any]): Seq[(String, Any)] = m.toSeq.sortBy(_._1)

  private def toJava(v: Any): AnyRef = v match {
    case m: Map[_, _] =>
      val jm = new java.util.LinkedHashMap[String, AnyRef]()
      m.foreach { case (k, x) => jm.put(k.toString, toJava(x)) }
      jm
    case s: Seq[_] =>
      val jl = new java.util.ArrayList[AnyRef]()
      s.foreach(x => jl.add(toJava(x)))
      jl
    case null => null
    case i: Int => Int.box(i)
    case l: Long => Long.box(l)
    case d: Double => Double.box(d)
    case b: Boolean => Boolean.box(b)
    case other => other.toString
  }

  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  private def renderJson(v: Any, indent: Int): String = v match {
    case pairs: Seq[_] if pairs.nonEmpty && pairs.head.isInstanceOf[(_, _)] =>
      val pad = "  " * (indent + 1)
      pairs.asInstanceOf[Seq[(String, Any)]]
        .map { case (k, x) => s"$pad${jsonEscape(k)}: ${renderValue(x, indent + 1)}" }
        .mkString("{\n", ",\n", "\n" + ("  " * indent) + "}")
    case other => renderValue(other, indent)
  }

  private def renderValue(v: Any, indent: Int): String = v match {
    case null => "null"
    case m: Map[_, _] =>
      if (m.isEmpty) "{}"
      else renderJson(m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1), indent)
    case s: Seq[_] =>
      if (s.isEmpty) "[]" else s.map(renderValue(_, indent)).mkString("[", ", ", "]")
    case s: String => jsonEscape(s)
    case b: Boolean => b.toString
    case i: Int => i.toString
    case l: Long => l.toString
    case d: Double => if (d == d.floor && !d.isInfinite) f"$d%.1f" else d.toString
    case other => jsonEscape(other.toString)
  }
}
