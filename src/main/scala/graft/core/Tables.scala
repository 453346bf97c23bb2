package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-provided benchmark tables (TESTDATA.md).
  *
  * Mirrors the reference's `scan` op (reference docetl/operations/scan.py:4-26):
  * a named dataset resolved against a directory of sources. Parquet scans give
  * Catalyst column pruning + predicate pushdown for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
