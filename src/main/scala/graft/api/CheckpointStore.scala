package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet checkpoint store keyed by a rolling config hash — the analog of
  * the reference's per-(step, op) checkpointing (reference
  * docetl/checkpoint.py:10-91, runner.py:241-282): each op's key is
  * SHA-256(upstream key + canonical op config), so any upstream config edit
  * invalidates every downstream checkpoint automatically, while untouched
  * prefixes are reused across runs.
  */
final class CheckpointStore(dir: String) {

  private val base = java.nio.file.Paths.get(dir)
  java.nio.file.Files.createDirectories(base)

  def pathFor(key: String): String = base.resolve(s"$key.parquet").toString

  def contains(key: String): Boolean =
    java.nio.file.Files.exists(
      base.resolve(s"$key.parquet").resolve("_SUCCESS"))

  def load(spark: SparkSession, key: String): Option[DataFrame] =
    if (contains(key)) Some(spark.read.parquet(pathFor(key))) else None

  def save(df: DataFrame, key: String): DataFrame = {
    df.write.mode("overwrite").parquet(pathFor(key))
    df.sparkSession.read.parquet(pathFor(key))
  }
}

object CheckpointStore {

  /** Rolling hash: SHA-256 over the upstream hash + canonical config. */
  def rollingHash(upstream: String, opConfig: Conf): String =
    sha256(upstream + "|" + canonical(opConfig))

  def sha256(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Canonical, order-insensitive rendering of a config tree (map keys
    * sorted) so semantically identical YAML hashes identically. */
  def canonical(c: Conf): String = c.value match {
    case m: java.util.Map[_, _] =>
      Conf(m).asMap.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k:${canonical(v)}" }.mkString("{", ",", "}")
    case l: java.util.List[_] =>
      Conf(l).asList.map(canonical).mkString("[", ",", "]")
    case other => String.valueOf(other)
  }
}
