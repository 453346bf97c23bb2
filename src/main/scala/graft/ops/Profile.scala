package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Numeric column profiler — the structured-column companion to the
  * text-centric [[Datacard]]: one row per profiled column with count,
  * nulls, distincts, min/max, mean/stddev, and quartiles. This is the
  * standard pre-training data-quality audit for metadata columns (lengths,
  * scores, timestamps, label ids): skewed or constant columns, null
  * explosions, and out-of-range values all surface here before they skew a
  * mixture or a filter threshold downstream.
  *
  * Scale shape: ONE aggregation computes every metric for every profiled
  * column in a single scan (map-side partials throughout), melted to
  * per-column rows from a constant-width struct array — output is
  * O(#columns), never row-sized. Mean and stddev are computed from
  * sum / sum-of-squares (Welford-free): for integer-valued columns the
  * double sums are EXACT (order-independent under 2^53), so the report is
  * bit-stable across partitionings and engines — a running-variance
  * aggregate's float merges are not. Exact percentiles buffer per-column
  * values (Spark's `percentile`), fine to ~10^8 rows per executor;
  * `approx = true` swaps percentile → `approx_percentile` (GK sketch) and
  * distinct → HLL++, the constant-memory 100 TB path (same knob
  * convention as [[Datacard]]/[[Diversity]]).
  */
object Profile {

  /** Profile `cols` (numeric) of `df`: one output row per column with
    * n, n_null, n_distinct, min, max, mean, stddev (sample), p25/p50/p75.
    * Doubles round to 6 decimals. */
  def numeric(df: DataFrame, cols: Seq[String], approx: Boolean = false,
      rsd: Double = 0.02, percentileAccuracy: Int = 10000): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    def nDistinct(c: Column) =
      if (approx) approx_count_distinct(c, rsd) else countDistinct(c)
    def quartiles(c: Column) =
      if (approx)
        approx_percentile(c, array(lit(0.25), lit(0.5), lit(0.75)),
          lit(percentileAccuracy))
      else percentile(c, array(lit(0.25), lit(0.5), lit(0.75)))

    val aggs = cols.flatMap { name =>
      val c = col(name).cast("double")
      val n = count(c)
      val s = sum(c)
      val s2 = sum(c * c)
      Seq(
        count(lit(1)).as(s"${name}__rows"),
        n.as(s"${name}__n"),
        nDistinct(col(name)).cast("bigint").as(s"${name}__nd"),
        min(c).as(s"${name}__min"),
        max(c).as(s"${name}__max"),
        s.as(s"${name}__sum"),
        s2.as(s"${name}__sum2"),
        quartiles(col(name).cast("double")).as(s"${name}__q"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { name =>
      val n = col(s"${name}__n")
      val s = col(s"${name}__sum")
      val s2 = col(s"${name}__sum2")
      // sample variance from exact sums: (Σx² − (Σx)²/n) / (n − 1)
      val variance = (s2 - s * s / n) / (n - lit(1))
      struct(
        lit(name).as("column"),
        n.cast("bigint").as("n"),
        (col(s"${name}__rows") - n).cast("bigint").as("n_null"),
        col(s"${name}__nd").as("n_distinct"),
        round(col(s"${name}__min"), 6).as("min"),
        round(col(s"${name}__max"), 6).as("max"),
        round(s / n, 6).as("mean"),
        when(n >= 2, round(sqrt(greatest(variance, lit(0.0))), 6))
          .as("stddev"),
        round(element_at(col(s"${name}__q"), 1), 6).as("p25"),
        round(element_at(col(s"${name}__q"), 2), 6).as("p50"),
        round(element_at(col(s"${name}__q"), 3), 6).as("p75"))
    }
    one.select(explode(array(rows: _*)).as("_p")).select("_p.*")
  }
}
