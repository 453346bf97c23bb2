package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sharded training-data export with a manifest — the layout
  * a training loader consumes (shard files it can open independently, plus
  * per-shard row/token totals for scheduling and an order-free checksum
  * for integrity). The reference's sink is a single file per run
  * (reference docetl/runner.py:91-113); sharding is the extension a 100 TB
  * corpus needs.
  *
  * Shard routing is `pmod(xxhash64(idExpr), numShards)` — a pure function
  * of the ROW, so assignment is stable across runs, cluster sizes, and
  * input partitioning (a `repartition(n)` round-robin would move rows
  * between shards on every re-run and silently invalidate any
  * resume/diff). Layout:
  *
  *   path/data/_shard=NNN/part-*.parquet   (hive-partitioned, prunable)
  *   path/manifest/part-*.parquet          (one row per shard)
  *
  * Manifest columns: `_shard`, `n_rows`, `n_tokens` (sum of `tokenExpr`),
  * `checksum` (bit_xor of xxhash64(id) — order-independent, so any
  * reader can re-derive it without a sort).
  *
  * Scale shape: ONE hash repartition by shard (so each shard writes from
  * one task's stream — small bounded files, no tiny-file explosion), one
  * keyed aggregation bounded by numShards for the manifest. Nothing
  * driver-side beyond the manifest row count.
  */
object ShardedSink {

  def write(
      df: DataFrame,
      path: String,
      idExpr: String,
      tokenExpr: String,
      numShards: Int,
      mode: String = "overwrite"): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val shard = pmod(xxhash64(expr(idExpr)), lit(numShards)).cast("int")
    // Persisted across the two actions (data write, manifest agg): without
    // it the input plan evaluates twice, and any nondeterministic upstream
    // (unseeded sample, live LLM) would write shards from evaluation #1
    // while the manifest checksums evaluation #2 — validate() would then
    // flag every shard corrupt. Also saves the second full scan.
    val withShard = graft.core.PersistScope.register(
      df.withColumn("_shard", shard).persist())
    withShard
      .repartition(numShards, col("_shard"))
      .write.mode(mode).partitionBy("_shard").parquet(s"$path/data")
    // In append mode the manifest must describe the UNION of all exports,
    // so it is recomputed from the written data dir (one scan of the
    // export) and always fully overwritten — appending per-run manifest
    // rows would leave two partial rows per shard and validate() would
    // flag an intact export as corrupt.
    val manifestSource =
      if (mode == "append") df.sparkSession.read.parquet(s"$path/data")
      else withShard
    val manifest = manifestSource.groupBy("_shard").agg(
      count(lit(1)).as("n_rows"),
      sum(expr(tokenExpr).cast("long")).as("n_tokens"),
      expr(s"bit_xor(xxhash64($idExpr))").as("checksum"))
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$path/manifest")
    manifest
  }

  def readData(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/data")

  def readManifest(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/manifest")

  /** Integrity check: recompute each shard's (rows, checksum) from the
    * data files and anti-join against the manifest — returns the
    * mismatching shards (empty = intact). Catches partial writes, manual
    * file edits, and lost shards; linear scan, no driver state. */
  def validate(spark: SparkSession, path: String, idExpr: String): DataFrame = {
    val actual = readData(spark, path).groupBy("_shard").agg(
      count(lit(1)).as("n_rows"),
      expr(s"bit_xor(xxhash64($idExpr))").as("checksum"))
    val expected = readManifest(spark, path)
      .select("_shard", "n_rows", "checksum")
    expected.except(actual).withColumn("status", lit("manifest_only"))
      .unionByName(
        actual.except(expected.select("_shard", "n_rows", "checksum"))
          .withColumn("status", lit("data_only")))
  }
}
