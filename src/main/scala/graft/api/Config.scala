package graft.api

import scala.jdk.CollectionConverters._

/** Thin typed view over snakeyaml output (java maps/lists) — the engine's
  * config model. YAML layout mirrors the reference DSL (reference
  * docetl/runner.py:118-224, plan/lift.py:30-171):
  *
  * {{{
  * datasets:
  *   docs: { type: file, path: /data/documents.parquet }
  * operations:
  *   - { name: stats, type: code_map, outputs: { n_tok: "size(split(text,' '))" } }
  * pipeline:
  *   steps:
  *     - { name: s1, input: docs, operations: [stats] }
  *   output: { type: file, path: /tmp/out.parquet }
  * }}}
  */
final case class Conf(value: Any) {
  def asMap: Map[String, Conf] = value match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, v) => k.toString -> Conf(v) }.toMap
    case m: Map[_, _] => m.map { case (k, v) => k.toString -> Conf(v) }
    case null => Map.empty
    case other => throw new IllegalArgumentException(s"expected map, got $other")
  }
  /** Insertion-ordered entries (snakeyaml uses LinkedHashMap). */
  def asOrderedMap: Seq[(String, Conf)] = value match {
    case m: java.util.Map[_, _] =>
      m.asScala.toSeq.map { case (k, v) => k.toString -> Conf(v) }
    case null => Seq.empty
    case other => throw new IllegalArgumentException(s"expected map, got $other")
  }
  def asList: Seq[Conf] = value match {
    case l: java.util.List[_] => l.asScala.toSeq.map(Conf(_))
    case l: Seq[_] => l.map(Conf(_))
    case null => Seq.empty
    case other => throw new IllegalArgumentException(s"expected list, got $other")
  }
  def str: String = value.toString
  def int: Int = value match {
    case n: Number => n.intValue()
    case s: String => s.toInt
  }
  def long: Long = value match {
    case n: Number => n.longValue()
    case s: String => s.toLong
  }
  def dbl: Double = value match {
    case n: Number => n.doubleValue()
    case s: String => s.toDouble
  }
  def bool: Boolean = value match {
    case b: java.lang.Boolean => b
    case s: String => s.toBoolean
  }
  def strList: Seq[String] = value match {
    case s: String => Seq(s)
    case _ => asList.map(_.str)
  }
  def dblList: Seq[Double] = value match {
    case n: Number => Seq(n.doubleValue())
    case _ => asList.map(_.dbl)
  }
  def get(key: String): Option[Conf] = asMap.get(key)
  def apply(key: String): Conf = asMap.getOrElse(key,
    throw new IllegalArgumentException(s"missing config key: $key"))
  def strOr(key: String, default: String): String = get(key).map(_.str).getOrElse(default)
  def intOr(key: String, default: Int): Int = get(key).map(_.int).getOrElse(default)
  def dblOr(key: String, default: Double): Double = get(key).map(_.dbl).getOrElse(default)
  def boolOr(key: String, default: Boolean): Boolean = get(key).map(_.bool).getOrElse(default)
}

object Conf {
  def fromYaml(yaml: String): Conf =
    Conf(new org.yaml.snakeyaml.Yaml().load[Any](yaml))
  def fromYamlFile(path: String): Conf =
    fromYaml(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
