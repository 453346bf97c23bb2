package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Length-bucketed batch assembly — the training-efficiency pass between
  * curation and the data loader: group sequences of similar length into
  * fixed-size batches so per-batch padding (every row pads to its
  * batch's max) stays small. Publicly standard (bucketed batching in
  * fairseq/HF `group_by_length`); the padding report quantifies the win
  * and the waste. Complements [[PackOp]] (packing concatenates samples
  * into one sequence; bucketing keeps samples separate but co-sizes
  * them).
  *
  * Scale shape: ONE global length sort via [[RankOp.withGlobalRank]]'s
  * range-partitioned sort + per-partition offsets (never a
  * single-partition window), then batch id is closed-form rank
  * arithmetic; the report is one batch-keyed aggregation of integer
  * sums — exact, order-independent, oracle-replayable.
  */
object LengthBucket {

  /** Append `outCol`: 0-based batch id, batches of `batchSize` rows in
    * (length desc, tieBreak asc) order — longest sequences batch
    * together first. */
  def assignBatches(df: DataFrame, lenCol: String, batchSize: Int,
      tieBreak: String, outCol: String = "batch_id"): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    RankOp.withGlobalRank(df,
      Seq(col(lenCol).desc, col(tieBreak).asc))
      .withColumn(outCol, ((col("_rank") - 1) / batchSize).cast("bigint"))
      .drop("_rank")
  }

  /** Per-batch padding report: (batch_id, n_rows, max_len, sum_len,
    * pad_tokens, pad_frac) — pad_tokens = n_rows×max_len − sum_len, the
    * tokens the collator pads; pad_frac = pad_tokens / (n_rows×max_len),
    * 6 decimals. */
  def paddingReport(df: DataFrame, lenCol: String, batchSize: Int,
      tieBreak: String): DataFrame =
    assignBatches(df, lenCol, batchSize, tieBreak)
      .groupBy("batch_id")
      .agg(count(lit(1)).as("n_rows"),
        max(col(lenCol)).cast("bigint").as("max_len"),
        sum(col(lenCol)).cast("bigint").as("sum_len"))
      .withColumn("pad_tokens",
        col("n_rows") * col("max_len") - col("sum_len"))
      .withColumn("pad_frac",
        round(col("pad_tokens").cast("double") /
          greatest(col("n_rows") * col("max_len"), lit(1)), 6))
}
