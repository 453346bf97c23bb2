package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** N-gram diversity report per corpus slice — distinct-over-total n-gram
  * ratio, the corpus-level type/token ratio used to compare generation and
  * curation outputs for mode collapse (the "distinct-n" metric publicly
  * described in Li et al. 2016's diversity-promoting objective; corpus-slice
  * self-repetition rates are also part of the published Gopher/MassiveText
  * analysis; the reference has no corpus-statistics story — §2.14 engine
  * extension alongside [[CorpusStats]] and [[CorpusDrift]]).
  *
  * Scale shape: grams explode in the scan stage (fused with the shingle
  * expression the dedup family already uses), then ONE keyed aggregation per
  * slice computes `count` + `count(distinct)`. The distinct count is exact —
  * Spark plans it as a two-phase (slice, gram)-keyed partial dedup, so no
  * executor ever holds a slice's full gram set; swap in
  * `approx_count_distinct` when a ±2% HLL estimate is acceptable and the
  * extra shuffle round-trip is not. Low-diversity slices are the boilerplate
  * / template-spam signal a curation pipeline down-weights.
  */
object Diversity {

  /** Per-`sliceCol` distinct-n report on word `n`-grams: total grams,
    * distinct grams, and their ratio (rounded to 6 decimals; an empty slice
    * of sub-n-word docs still reports its single truncated shingle, matching
    * [[graft.functions.TextFunctions.shingles]]). */
  def distinctN(df: DataFrame, sliceCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(sliceCol), explode(TF.shingles(col(textCol), n)).as("_g"))
      .groupBy(sliceCol)
      .agg(count(lit(1)).as("n_grams"),
        countDistinct(col("_g")).as("n_distinct"),
        round(countDistinct(col("_g")).cast("double") / count(lit(1)), 6)
          .as("distinct_ratio"))
}
