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

  /** Per-slice MinHash signature table: (slice, seed, min_hash).
    *
    * Hash family is Kirsch–Mitzenmacher double hashing (ONE md5 per gram;
    * seed s's hash = h1 + s·h2) — 16× fewer digests than hashing
    * (seed, gram) pairs. The per-DOCUMENT minimum folds inside the row
    * (gram arrays never explode); only numHashes (seed, doc-min) rows per
    * document enter the partial-aggregating shuffle. */
  def signatures(df: DataFrame, sliceCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 16): DataFrame = {
    require(numHashes >= 1 && numHashes <= 512,
      s"numHashes must be in [1, 512], got $numHashes")
    // one digest per gram -> (h1, h2) pairs
    val hs = transform(TF.shingles(col(textCol), shingleSize), g => {
      val digest = md5(g)
      struct(
        conv(substring(digest, 1, 13), 16, 10).cast("bigint").as("h1"),
        conv(substring(digest, 14, 13), 16, 10).cast("bigint")
          .bitwiseOR(lit(1L)).as("h2"))
    })
    // per-document min per seed, folded in-row
    val sigs = transform(sequence(lit(0), lit(numHashes - 1)), s =>
      array_min(transform(col("_hs"), p =>
        p.getField("h1") + s.cast("bigint") * p.getField("h2"))))
    df.select(col(sliceCol).as("slice"), hs.as("_hs"))
      .filter(size(col("_hs")) > 0)
      .select(col("slice"), posexplode(sigs).as(Seq("seed", "h")))
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
