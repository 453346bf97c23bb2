package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  * Hash family: each gram digests ONCE (md5 prefix -> 31-bit x), then
  * seed s applies an affine 2-universal transform `(a_s·x + b_s) mod p`
  * with per-seed pseudo-random coefficients — the same construction
  * Spark's own MinHashLSH uses. (A Kirsch–Mitzenmacher `h1 + s·h2`
  * WITHOUT the per-seed multiplier is fine for bloom bit positions but
  * WRONG for min-wise hashing: large seeds all elect the minimum-h2 gram,
  * collapsing the signature's independence — caught by the
  * estimate-vs-exact property spec.)
  *
  * Scale shape: one digest per gram, per-DOCUMENT minima fold in-row
  * (gram arrays never explode); only numHashes (seed, doc-min) rows per
  * document enter the partial-aggregating shuffle, which reduces to
  * ≤ slices × numHashes rows per mapper. min is duplicate-insensitive so
  * no distinct pass is needed. The pairwise matrix joins only the
  * signature table. The DuckDB oracle replays coefficients as literals,
  * bit-exactly.
  */
object CorpusOverlap {

  /** Largest prime below 2^31 (Spark MinHashLSH's HASH_PRIME): products
    * a·x with a, x < p stay under 2^62 — no 64-bit overflow. */
  val HashPrime: Long = 2038074743L

  /** Deterministic per-seed affine coefficients (a in [1, p), b in [0, p)).
    * java.util.Random's LCG is JVM-specified, so these are stable. */
  def coefficients(seed: Int): (Long, Long) = {
    val r = new java.util.Random(seed.toLong * 0x9E3779B97F4A7C15L + 41L)
    def next(lo: Long): Long = {
      val v = r.nextLong() % (HashPrime - lo)
      lo + math.abs(v)
    }
    (next(1L), next(0L))
  }

  /** Per-slice MinHash signature table: (slice, seed, min_hash). */
  def signatures(df: DataFrame, sliceCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 16): DataFrame = {
    require(numHashes >= 1 && numHashes <= 512,
      s"numHashes must be in [1, 512], got $numHashes")
    // one digest per gram -> x in [0, p)
    val xs = transform(TF.shingles(col(textCol), shingleSize), g =>
      conv(substring(md5(g), 1, 8), 16, 10).cast("bigint") % HashPrime)
    // per-document min per seed, folded in-row under the affine family
    val sigs = array((0 until numHashes).map { s =>
      val (a, b) = coefficients(s)
      array_min(transform(col("_xs"), x => (lit(a) * x + lit(b)) % HashPrime))
    }: _*)
    df.select(col(sliceCol).as("slice"), xs.as("_xs"))
      .filter(size(col("_xs")) > 0)
      .select(col("slice"), posexplode(sigs).as(Seq("seed", "h")))
      .groupBy(col("slice"), col("seed").cast("bigint").as("seed"))
      .agg(min(col("h")).as("min_hash"))
  }

  /** Pairwise Jaccard-estimate matrix over slices: (slice_a, slice_b,
    * jaccard_est) for slice_a < slice_b. */
  def jaccardMatrix(df: DataFrame, sliceCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 16): DataFrame =
    matrixFromSignatures(
      signatures(df, sliceCol, textCol, shingleSize, numHashes))

  /** [[jaccardMatrix]] over an ALREADY-COMPUTED signature table — the
    * deployment shape: signatures are a per-corpus artifact (store per
    * dump), every pairwise report reads them. */
  def matrixFromSignatures(sig: DataFrame): DataFrame = {
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

  /** Merge signature tables from SEPARATE dumps of the same corpus —
    * element-wise minima per (slice, seed). EXACT, not approximate: min is
    * associative, so `merge(signatures(A), signatures(B)) ==
    * signatures(A ∪ B)` bit-for-bit (property-tested). The incremental
    * shape: store one signature table per ingest, merge on read — history
    * is never re-shingled. */
  def mergeSignatures(tables: DataFrame*): DataFrame = {
    require(tables.nonEmpty, "mergeSignatures needs at least one table")
    tables.reduce(_.unionByName(_))
      .groupBy("slice", "seed")
      .agg(min(col("min_hash")).as("min_hash"))
  }

  /** The (seed, a, b) coefficient rows as a SQL VALUES list — the oracle
    * replay seam (both engines must use identical coefficients). */
  def coefficientSql(numHashes: Int): String =
    (0 until numHashes).map { s =>
      val (a, b) = coefficients(s)
      s"($s, ${a}, ${b})"
    }.mkString(", ")
}
