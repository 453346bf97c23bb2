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
  * slice computes `count` + `count(distinct)`. The default distinct count
  * is exact — Spark plans it as a two-phase (slice, gram)-keyed partial
  * dedup, so no executor ever holds a slice's full gram set; `approx = true`
  * swaps in `approx_count_distinct(rsd)` (HyperLogLog++), turning the dedup
  * shuffle into fixed-size sketch merges — the trade the 100 TB run takes
  * when a ±rsd diversity estimate is acceptable. Low-diversity slices are
  * the boilerplate / template-spam signal a curation pipeline down-weights.
  */
object Diversity {

  /** Per-`sliceCol` distinct-n report on word `n`-grams: total grams,
    * distinct grams, and their ratio (rounded to 6 decimals; an empty slice
    * of sub-n-word docs still reports its single truncated shingle, matching
    * [[graft.functions.TextFunctions.shingles]]).
    *
    * `approx`/`rsd`: estimate the distinct-gram count with HLL++ at relative
    * std-dev `rsd` instead of exact two-phase dedup — same knob as
    * [[Datacard]], reachable from YAML (`approx: true`) and Frame. */
  def distinctN(df: DataFrame, sliceCol: String, textCol: String,
      n: Int, approx: Boolean = false, rsd: Double = 0.02): DataFrame = {
    def nDistinct(c: org.apache.spark.sql.Column) =
      if (approx) approx_count_distinct(c, rsd) else countDistinct(c)
    df.select(col(sliceCol), explode(TF.shingles(col(textCol), n)).as("_g"))
      .groupBy(sliceCol)
      .agg(count(lit(1)).as("n_grams"),
        nDistinct(col("_g")).as("n_distinct"),
        round(nDistinct(col("_g")).cast("double") / count(lit(1)), 6)
          .as("distinct_ratio"))
  }
}
