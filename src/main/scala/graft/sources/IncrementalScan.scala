package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-ledger incremental scan: read only the input files a previous run
  * has not already ingested — the batch counterpart of a streaming
  * source's checkpoint, for pipelines re-run per dump/day over a growing
  * directory. Pairs with [[graft.dedup.MinHashDedup.crossPairs]]-style
  * incremental dedup: the ledger bounds WHICH FILES are re-read, the
  * signature table bounds which DOCUMENTS re-pair.
  *
  * The ledger is a tiny parquet table `(path, size, mtime, ingested_at)` —
  * one row per data FILE, metadata-scale (a 100 TB corpus is ~10^5-10^6
  * files; the ledger is MBs). A file re-appears as new when its (size,
  * mtime) changes — overwritten files re-ingest, the conservative choice.
  *
  * Scale notes: the directory listing is driver-side filesystem METADATA
  * (the same listing `spark.read` itself performs); unseen files are
  * selected by a driver-side set difference against the collected ledger
  * (bounded by file count, never data size), and the read plans ONLY the
  * unseen paths — pruning happens at plan time, not as a post-scan filter
  * on `input_file_name()`, so already-ingested bytes are never opened. */
object IncrementalScan {

  /** Files under `dir` (non-recursive, hidden/_* files skipped) minus
    * those already in the ledger at the same (size, mtime). */
  def newFiles(spark: SparkSession, dir: String, ledgerPath: String): Seq[String] = {
    val all = listDataFiles(dir)
    val seen: Set[(String, Long, Long)] =
      if (!new java.io.File(ledgerPath).exists()) Set.empty
      else spark.read.parquet(ledgerPath)
        .select("path", "size", "mtime").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    all.collect { case f if !seen(
      (f.getAbsolutePath, f.length(), f.lastModified())) => f.getAbsolutePath }
  }

  /** DataFrame over only the unseen files (empty schema-less frame when
    * nothing is new — callers should check `newPaths.nonEmpty` first when
    * the schema matters). */
  def readNew(spark: SparkSession, dir: String, ledgerPath: String,
      format: String = "parquet"): (DataFrame, Seq[String]) = {
    val paths = newFiles(spark, dir, ledgerPath)
    val df =
      if (paths.isEmpty) spark.emptyDataFrame
      else spark.read.format(format).load(paths: _*)
    (df, paths)
  }

  /** Record `paths` as ingested (append). Call AFTER the run's outputs
    * commit, so a failed run re-reads its files — at-least-once, the safe
    * side for ingest (downstream exact/near dedup absorbs the repeats). */
  def commit(spark: SparkSession, ledgerPath: String, paths: Seq[String]): Unit = {
    if (paths.isEmpty) return
    val now = System.currentTimeMillis()
    val rows = paths.map { p =>
      val f = new java.io.File(p)
      (p, f.length(), f.lastModified(), now)
    }
    import spark.implicits._
    rows.toDF("path", "size", "mtime", "ingested_at")
      .coalesce(1).write.mode("append").parquet(ledgerPath)
  }

  private def listDataFiles(dir: String): Seq[java.io.File] = {
    val d = new java.io.File(dir)
    require(d.isDirectory, s"IncrementalScan: $dir is not a directory")
    Option(d.listFiles()).toSeq.flatten
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".") && !f.getName.endsWith(".crc"))
      .sortBy(_.getAbsolutePath)
  }
}
