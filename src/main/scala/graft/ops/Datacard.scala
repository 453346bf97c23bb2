package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Corpus release datacard — the one-call summary table a dataset release
  * publishes (publicly standard practice: HuggingFace dataset cards, the
  * Dolma/RedPajama release reports; composes this engine's own metric
  * families into one artifact; the reference has no reporting story —
  * §2.14 engine extension capping [[CorpusStats]]/[[Diversity]]/PII).
  *
  * Output: (metric, value) rows — documents, tokens, slice concentration,
  * exact-duplicate rate, PII totals, global distinct-3gram diversity.
  *
  * Scale shape: three linear aggregations (row stats + PII fused into one
  * scan pass; a (slice) keyed agg for concentration; a gram explode + agg
  * for diversity), unioned as single-row frames — no pass is ever
  * quadratic, and the report's row count is a constant. Exact distincts
  * plan as two-phase partial dedups; `approx = true` swaps every distinct
  * for `approx_count_distinct(rsd)` (HyperLogLog++), turning the dedup
  * shuffles into fixed-size sketch merges — the trade the 100 TB run
  * takes when a ±rsd estimate of dup-rate/diversity is acceptable.
  */
object Datacard {

  /** `approx`/`rsd`: estimate the distinct counts (dup rate, gram
    * diversity) with HLL++ at relative std-dev `rsd` instead of exact
    * two-phase dedup — reachable from YAML (`approx: true`) and Frame. */
  def apply(df: DataFrame, textCol: String, sliceCol: String,
      approx: Boolean = false, rsd: Double = 0.02): DataFrame = {
    val t = col(textCol)
    def nDistinct(c: org.apache.spark.sql.Column) =
      if (approx) approx_count_distinct(c, rsd) else countDistinct(c)
    val piiTotal = TF.piiCounts(t)
      .map(_._2).reduce(_ + _)
    // Pass 1 (one scan): row stats + exact-dup rate + PII totals.
    val base = df.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum(TF.tokenCount(t)).cast("double").as("n_tokens"),
      round(avg(TF.tokenCount(t)), 6).as("avg_doc_tokens"),
      round(lit(1.0) - nDistinct(md5(t)).cast("double") / count(lit(1)), 6)
        .as("exact_dup_rate"),
      sum(piiTotal).cast("double").as("pii_total"))
    // Pass 2: slice concentration (how much of the corpus the largest
    // slice holds — the mixture-skew headline number).
    val slices = df.groupBy(col(sliceCol)).agg(count(lit(1)).as("_n"))
      .agg(count(lit(1)).cast("double").as("n_slices"),
        round(max(col("_n")).cast("double") / sum(col("_n")), 6)
          .as("top_slice_share"))
    // Pass 3: global distinct-3gram diversity.
    val grams = df.select(explode(TF.shingles(t, 3)).as("_g"))
      .agg(round(nDistinct(col("_g")).cast("double") / count(lit(1)), 6)
        .as("distinct_3gram_ratio"))

    def melt(d: DataFrame): DataFrame = {
      val cols = d.columns
      d.select(explode(array(cols.toIndexedSeq.map(c =>
        struct(lit(c).as("metric"), col(c).as("value"))): _*)).as("kv"))
        .select(col("kv.metric").as("metric"), col("kv.value").as("value"))
    }
    melt(base).union(melt(slices)).union(melt(grams))
  }

  /** Dataset reproducibility fingerprint: one row of (n_rows, n_cols,
    * content_checksum) where the checksum is an ORDER-FREE SUM (mod 2^64)
    * of an md5-prefix hash over the listed content columns — identical
    * regardless of partitioning or row order, and MULTIPLICITY-SENSITIVE
    * (an xor would cancel rows of even multiplicity, letting two
    * different exports stamp alike — duplicated documents are exactly
    * what corpora contain). The corpus-level analog of
    * [[graft.sources.ShardedSink]]'s per-shard checksums and the number a
    * release manifest pins. One linear aggregation; the sum runs in
    * decimal(38) (exact to ~10^19 rows of 60-bit hashes) and the checksum
    * emits as a STRING so the 64-bit modulus survives every engine's
    * integer semantics; md5-based so the DuckDB oracle replays it
    * bit-exactly; null columns fold as empty strings. */
  def fingerprint(df: DataFrame, contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "fingerprint needs at least one column")
    val joined = concat_ws("\u0001",
      contentCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
    val rowHash = conv(substring(md5(joined), 1, 15), 16, 10)
      .cast("decimal(38,0)")
    val mod = lit(new java.math.BigDecimal("18446744073709551616")) // 2^64
    df.agg(
      count(lit(1)).as("n_rows"),
      sum(rowHash).as("_sum"))
      .select(col("n_rows"),
        lit(contentCols.size).as("n_cols"),
        coalesce(col("_sum") % mod, lit(java.math.BigDecimal.ZERO))
          .cast("decimal(38,0)").cast("string").as("content_checksum"))
  }

  /** Per-slice breakdown of the headline metrics — the table that locates
    * WHICH source is the duplication/template-spam problem the global
    * [[apply]] numbers only hint at. Two keyed aggregations (row stats;
    * gram diversity), both linear, output bounded by slice count. */
  def perSlice(df: DataFrame, textCol: String, sliceCol: String,
      approx: Boolean = false, rsd: Double = 0.02): DataFrame = {
    val t = col(textCol)
    def nDistinct(c: org.apache.spark.sql.Column) =
      if (approx) approx_count_distinct(c, rsd) else countDistinct(c)
    val rowStats = df.groupBy(col(sliceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(TF.tokenCount(t)).cast("bigint").as("n_tokens"),
        round(lit(1.0) -
          nDistinct(md5(t)).cast("double") / count(lit(1)), 6)
          .as("exact_dup_rate"))
    val diversity = df
      .select(col(sliceCol), explode(TF.shingles(t, 3)).as("_g"))
      .groupBy(col(sliceCol))
      .agg(round(nDistinct(col("_g")).cast("double") / count(lit(1)), 6)
        .as("distinct_3gram_ratio"))
    rowStats.join(diversity, Seq(sliceCol))
  }
}
