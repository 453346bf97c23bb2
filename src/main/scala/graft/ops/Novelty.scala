package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram novelty vs a reference corpus — the crawl-freshness /
  * duplication-pressure signal continuous ingestion needs: of this
  * dump's DISTINCT word n-grams, what fraction was never seen in the
  * reference (last month's corpus, the training mix)? High novelty =
  * genuinely new content worth keeping; novelty collapsing toward 0 =
  * the crawler is re-fetching what the corpus already holds. The
  * gram-level complement of [[graft.dedup.Decontaminate]] (which flags
  * DOCUMENTS sharing grams) and [[CorpusDrift]] (which measures
  * distribution shift, not novelty mass).
  *
  * Scale shape: distinct n-grams per side (gram-keyed aggregations),
  * one LEFT ANTI join on the gram hash, and slice-keyed counts —
  * never document pairs, never gram lists on the driver. Grams travel
  * as 8-byte xxhash64 keys (NOT oracle-replayable hashes — the q224
  * oracle compares the gram STRINGS instead, and the counts are exact
  * up to a ≤ n²/2⁶⁴ collision error, negligible at any corpus size).
  */
object Novelty {

  /** Per-`sliceCol` novelty report over word `n`-grams of `textCol`:
    * (slice, n_grams, novel_grams, novelty_rate) where n_grams counts
    * the slice's DISTINCT grams and novel_grams those absent from
    * `reference`'s `refTextCol` grams. `sliceCol` = a constant column
    * for a corpus-level row. Every DISTINCT slice of `current` gets a
    * row — a slice whose documents are all shorter than `n` tokens
    * reports (slice, 0, 0, null) instead of silently vanishing, so
    * consumers can tell "no grams" from "slice missing". */
  def report(current: DataFrame, sliceCol: String, textCol: String,
      reference: DataFrame, refTextCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val slices = current.select(col(sliceCol).as("slice")).distinct()
    val cur = grams(current, textCol, n)
      .select(col(sliceCol).as("slice"), col("_g"))
      .distinct()
    val ref = grams(reference, refTextCol, n)
      .select(col("_g")).distinct()
    // ONE gram-keyed left join carries the membership flag, so total
    // and novel counts come out of a single slice-keyed aggregation —
    // a NULL slice (missing source metadata) is a native group here,
    // no null-safe join gymnastics (and none of their plan cost)
    val counts = cur
      .join(ref.withColumn("_inref", lit(1)), Seq("_g"), "left")
      .groupBy("slice")
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(when(col("_inref").isNull, 1L).otherwise(0L)),
          lit(0L)).as("novel_grams"))
    // gramless slices: set-difference (exceptAll treats NULL slices as
    // equal, unlike an equi-join) appends their zero rows
    val missing = slices.exceptAll(counts.select("slice"))
      .withColumn("n_grams", lit(0L))
      .withColumn("novel_grams", lit(0L))
    counts.unionByName(missing)
      .select(col("slice"), col("n_grams"), col("novel_grams"),
        when(col("n_grams") === 0, lit(null).cast("double"))
          .otherwise(round(col("novel_grams") /
            col("n_grams").cast("double"), 6)).as("novelty_rate"))
  }

  /** Word n-gram hash rows: input columns + `_g` (xxhash64 of the
    * space-joined lowercase gram) — 8 bytes per gram through every
    * downstream shuffle instead of the gram text. */
  private def grams(df: DataFrame, textCol: String, n: Int): DataFrame = {
    val toks = filter(split(lower(coalesce(col(textCol), lit(""))),
      "[^a-z0-9]+"), t => length(t) > 0)
    val slots = df.withColumn("_toks", toks)
      .filter(size(col("_toks")) >= n)
      .withColumn("_i", explode(sequence(lit(0),
        size(col("_toks")) - n)))
    slots.withColumn("_g",
      xxhash64(concat_ws(" ", slice(col("_toks"), col("_i") + 1, lit(n)))))
      .drop("_toks", "_i")
  }
}
