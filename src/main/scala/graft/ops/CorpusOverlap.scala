package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Corpus-level overlap estimation between slices — "how much does source
  * A share with source B?" via per-slice MinHash signatures: for each of
  * `numHashes` seeds, keep the slice's MINIMUM gram hash; the fraction of
  * seeds on which two slices agree is an unbiased estimate of the Jaccard
  * similarity of their GRAM SETS (the classic Broder 1997 estimator,
  * applied per-corpus instead of per-document). The inter-SLICE companion
  * of [[CorpusDrift]]'s distribution distance: drift compares histogram
  * SHAPES, overlap estimates shared CONTENT mass — e.g. "is this new crawl
  * slice mostly a re-crawl of an existing one?".
  *
  * Scale shape: ONE linear pass explodes (gram × seed) rows — narrow,
  * and the (slice, seed) min() partial-aggregates map-side, so the shuffle
  * carries at most |slices| × numHashes rows per mapper. No distinct is
  * needed (min is duplicate-insensitive). The pairwise matrix joins the
  * SIGNATURE table (slices × seeds rows) with itself — never corpus data.
  * Hashing is the engine's md5-prefix chain, so the DuckDB oracle replays
  * estimates bit-exactly. §2.14 engine extension in the dedup family.
  */
object CorpusOverlap {

  /** Per-slice MinHash signature table: (slice, seed, min_hash). */
  def signatures(df: DataFrame, sliceCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 16): DataFrame = {
    require(numHashes >= 1 && numHashes <= 512,
      s"numHashes must be in [1, 512], got $numHashes")
    df.select(col(sliceCol).as("slice"),
      explode(TF.shingles(col(textCol), shingleSize)).as("_g"))
      .select(col("slice"),
        posexplode(transform(sequence(lit(0), lit(numHashes - 1)), s =>
          conv(substring(md5(concat_ws(":", s, col("_g"))), 1, 13), 16, 10)
            .cast("bigint"))).as(Seq("seed", "h")))
      .groupBy(col("slice"), col("seed").cast("bigint").as("seed"))
      .agg(min(col("h")).as("min_hash"))
  }

  /** Pairwise Jaccard-estimate matrix over slices: (slice_a, slice_b,
    * jaccard_est) for slice_a < slice_b. */
  def jaccardMatrix(df: DataFrame, sliceCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 16): DataFrame = {
    val sig = signatures(df, sliceCol, textCol, shingleSize, numHashes)
    val a = sig.select(col("slice").as("slice_a"), col("seed"),
      col("min_hash").as("_ha"))
    val b = sig.select(col("slice").as("slice_b"), col("seed"),
      col("min_hash").as("_hb"))
    a.join(b, Seq("seed"))
      .filter(col("slice_a") < col("slice_b"))
      .groupBy("slice_a", "slice_b")
      .agg(round(avg(when(col("_ha") === col("_hb"), 1.0d).otherwise(0.0d)), 6)
        .as("jaccard_est"))
  }
}
