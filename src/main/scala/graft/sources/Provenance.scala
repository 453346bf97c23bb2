package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level source provenance — the lineage column every audited corpus
  * release carries (publicly standard practice: C4/Dolma rows keep their
  * crawl file/segment id; Delta/Iceberg expose `_metadata.file_path`; the
  * reference has no lineage story — §2.14 engine extension next to
  * [[graft.ops.SnapshotDiff]] and the file-ledger incremental scan).
  *
  * `input_file_name()` is evaluated inside the scan (zero cost, no
  * shuffle); the default keeps only the basename — at 100 TB the full URI
  * repeats a long common prefix across billions of rows, and the basename
  * is what ledgers and manifests key on. Pass `basenameOnly = false` when
  * distinct directories carry meaning (e.g. hive partitions, which Spark
  * already surfaces as columns anyway).
  */
object Provenance {

  /** Append the source-file column to a freshly-scanned frame. Must be
    * applied BEFORE any shuffle/join boundary — `input_file_name()` is
    * defined only while rows are still scan-attached. */
  def withSourceFile(df: DataFrame, outCol: String = "_source_file",
      basenameOnly: Boolean = true): DataFrame = {
    val name =
      if (basenameOnly) regexp_extract(input_file_name(), "([^/]+)$", 1)
      else input_file_name()
    df.withColumn(outCol, name)
  }
}
