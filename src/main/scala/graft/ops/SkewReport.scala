package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join/groupBy key-skew diagnostics — the pre-flight check before
  * shuffling 100 TB on a key: per-key counts, share of the table, and a
  * salting recommendation for the heavy hitters, plus a one-row corpus
  * summary. Skewed keys are THE operational hazard of large shuffles
  * (one reducer gets a hot key's entire partition); the repo's own
  * invariants prescribe salting or AQE skew-join — this op tells you
  * WHICH keys need it and how many salts, from data instead of folklore.
  *
  * Scale shape: ONE key-keyed count aggregation (map-side combinable),
  * then the heavy-hitter cut rides [[RankOp.withGlobalRank]]'s
  * range-partitioned sort (never a single-task window); the table total
  * is one driver scalar. The summary is a second aggregation OVER THE
  * COUNTS (keys, not rows). Nothing here exceeds the shuffle the
  * diagnosed join would itself perform.
  */
object SkewReport {

  /** Top-`k` heaviest keys: (key, cnt, share, recommended_salt) where
    * `recommended_salt` = ceil(cnt / targetPerKey) (1 = no salting
    * needed). Keys render as strings so any key type reports. */
  def heavyKeys(df: DataFrame, keyCol: String, k: Int,
      targetPerKey: Long): DataFrame = {
    require(k >= 1 && targetPerKey >= 1,
      s"k and targetPerKey must be >= 1, got k=$k target=$targetPerKey")
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(coalesce(sum(col("cnt")), lit(0L))).head.getLong(0)
    val ranked = RankOp.withGlobalRank(counts,
      Seq(col("cnt").desc, col("key").asc))
    ranked.filter(col("_rank") <= k)
      .select(col("key"), col("cnt"),
        round(col("cnt").cast("double") / math.max(total, 1L), 6)
          .as("share"),
        ceil(col("cnt").cast("double") / targetPerKey).cast("bigint")
          .as("recommended_salt"),
        col("_rank").as("rank"))
  }

  /** One-row distribution summary: n_rows, n_keys, max_cnt, mean_cnt,
    * max_share, and skew_factor = max/mean — 1.0 means perfectly
    * uniform; a join key with skew_factor 1000 needs salting. */
  def summary(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    counts.agg(
      coalesce(sum(col("cnt")), lit(0L)).as("n_rows"),
      count(lit(1)).as("n_keys"),
      coalesce(max(col("cnt")), lit(0L)).as("max_cnt"))
      .select(col("n_rows"), col("n_keys"), col("max_cnt"),
        when(col("n_keys") > 0,
          round(col("n_rows").cast("double") / col("n_keys"), 6))
          .as("mean_cnt"),
        when(col("n_rows") > 0,
          round(col("max_cnt").cast("double") / col("n_rows"), 6))
          .as("max_share"),
        when(col("n_keys") > 0 && col("n_rows") > 0,
          round(col("max_cnt").cast("double") * col("n_keys") /
            col("n_rows"), 6)).as("skew_factor"))
  }
}
