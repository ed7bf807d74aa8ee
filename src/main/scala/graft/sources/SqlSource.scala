package graft.sources

import graft.model.Template
import graft.operators.QueryBuilder
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** S7 SQL table/query scan over Spark's JDBC source
  * (reference: src/connectors.py:24-151).
  *
  * The connection registry stays a YAML-backed config (`connections.yaml`),
  * but execution is `spark.read.format("jdbc")` — Catalyst pushes filters,
  * projections, and limits into the database, which is strictly stronger
  * than the reference's hand-rolled `LIMIT` injection (kept for the
  * raw-query preview path, O4).
  */
object SqlSource {

  final case class Connection(url: String, user: Option[String] = None,
      password: Option[String] = None, driver: Option[String] = None)

  /** Load `connections.yaml`: `connections: {name: {url, user, password,
    * driver}}` (reference: src/connectors.py:24-79). */
  def loadConnections(path: Path): Map[String, Connection] = {
    if (!Files.exists(path)) return Map.empty
    val yaml = new org.yaml.snakeyaml.Yaml(new org.yaml.snakeyaml.constructor.SafeConstructor(
      new org.yaml.snakeyaml.LoaderOptions()))
    yaml.load[Any](Files.readString(path)) match {
      case m: java.util.Map[_, _] =>
        m.asScala.map { case (k, v) => k.toString -> (v: Any) }.get("connections") match {
          case Some(cs: java.util.Map[_, _]) =>
            cs.asScala.map { case (name, spec) =>
              val s = spec.asInstanceOf[java.util.Map[Any, Any]].asScala
                .map { case (k, v) => k.toString -> Option(v).map(_.toString) }
              name.toString -> Connection(
                url = s.getOrElse("url", None).getOrElse(""),
                user = s.getOrElse("user", None),
                password = s.getOrElse("password", None),
                driver = s.getOrElse("driver", None))
            }.toMap
          case _ => Map.empty
        }
      case _ => Map.empty
    }
  }

  /** Template scan: `sql_query` wins over `sql_table`
    * (reference: src/connectors.py:124-142). `previewLimit` caps a raw query
    * via O4 LIMIT injection; table scans use `.limit` (pushed down). */
  def read(spark: SparkSession, t: Template, conns: Map[String, Connection],
      previewLimit: Option[Int] = None): DataFrame = {
    val name = t.connectionName.getOrElse(
      throw new IllegalArgumentException("template has no connection_name"))
    val conn = conns.getOrElse(name,
      throw new IllegalArgumentException(s"unknown connection '$name'"))
    val reader = spark.read.format("jdbc").option("url", conn.url)
    conn.user.foreach(reader.option("user", _))
    conn.password.foreach(reader.option("password", _))
    conn.driver.foreach(reader.option("driver", _))
    val df = (t.sqlQuery, t.sqlTable) match {
      case (Some(q), _) =>
        val sql = previewLimit.map(n => QueryBuilder.injectLimit(q, n)).getOrElse(q)
        reader.option("query", sql).load()
      case (None, Some(tbl)) =>
        val base = reader.option("dbtable", tbl).load()
        previewLimit.map(base.limit).getOrElse(base)
      case _ => throw new IllegalArgumentException("template has neither sql_query nor sql_table")
    }
    graft.operators.TransformEngine.filterAndRename(df, t)
  }

  /** Connection probe (reference's `SELECT 1` test,
    * src/connectors.py:145-151); Derby needs `VALUES 1`. */
  def testConnection(spark: SparkSession, conn: Connection,
      probe: String = "VALUES 1"): Boolean =
    try {
      val r = spark.read.format("jdbc").option("url", conn.url)
      conn.driver.foreach(r.option("driver", _))
      r.option("query", probe).load().count() == 1
    } catch { case _: Exception => false }
}
