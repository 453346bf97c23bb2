package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8-style) of an embedding column — the standard
  * vector-index compression step (publicly described for FAISS
  * `ScalarQuantizer`, Lucene/Elasticsearch `int8_hnsw`, and pgvector
  * `halfvec`/scalar codes; the reference has no vector-compression story —
  * §2.14 engine extension alongside [[Ann]]).
  *
  * Why at 100 TB: a float32 corpus of 1e10 × 768-dim vectors is ~30 TB of
  * embedding payload alone; 8-bit codes cut that 4× (and the shuffle/cache
  * footprint of every ANN probe with it) at a recall cost that asymmetric
  * scoring (float query vs dequantized corpus) keeps small.
  *
  * Scale shape: training is ONE narrow (dim)-keyed aggregation — posexplode
  * to (dim, value), min/max per dim, collect `dim` rows (driver state =
  * 2×dim doubles). Encoding and asymmetric scoring are pure codegen'd
  * `transform` expressions over broadcast literal arrays — no UDF, no
  * shuffle, fused into the scan. Search reuses [[Ann.bruteForce]]'s
  * broadcast-queries shape (or IVF cells for the sub-linear path): quantize
  * composes with, not replaces, the index.
  *
  * Determinism / oracle portability: codes are `floor(round(t, 6))` of the
  * affine-scaled value — the round-before-floor pins the engine-boundary
  * case, so DuckDB replays the identical integer codes; dequantization is
  * the closed-form bucket midpoint.
  */
object VectorQuantize {

  /** Per-dimension (min, max) over the corpus: one narrow keyed agg,
    * driver state = 2×dim doubles. */
  def trainSq(df: DataFrame, embCol: String): (Array[Double], Array[Double]) = {
    val rows = df
      .select(posexplode(col(embCol)).as(Seq("_d", "_v")))
      .groupBy("_d")
      .agg(min(col("_v").cast("double")).as("_mn"),
        max(col("_v").cast("double")).as("_mx"))
      .orderBy("_d")
      .collect()
    (rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  private def constArray(v: Array[Double]): Column =
    array(v.toIndexedSeq.map(lit): _*)

  /** Quantized code of each component: `floor(round((x-mn)/(mx-mn)*levels, 6))`
    * clamped to [0, levels-1]; a zero-width dimension codes to 0. Pure
    * codegen'd transform over broadcast literal min/max arrays. */
  def codesCol(emb: Column, mins: Array[Double], maxs: Array[Double],
      levels: Int = 256): Column = {
    val mnA = constArray(mins)
    val mxA = constArray(maxs)
    transform(emb, (x, i) => {
      val mn = element_at(mnA, i + 1)
      val mx = element_at(mxA, i + 1)
      val w = mx - mn
      val t = round((x.cast("double") - mn) / w * levels, 6)
      when(w <= 0d, lit(0L))
        .otherwise(greatest(lit(0L), least(lit(levels - 1L), floor(t))))
        .cast("bigint")
    })
  }

  /** Bucket-midpoint reconstruction: `mn + (code + 0.5) * (mx-mn) / levels`. */
  def dequantizeCol(codes: Column, mins: Array[Double], maxs: Array[Double],
      levels: Int = 256): Column = {
    val mnA = constArray(mins)
    val mxA = constArray(maxs)
    transform(codes, (c, i) => {
      val mn = element_at(mnA, i + 1)
      val mx = element_at(mxA, i + 1)
      mn + (c.cast("double") + 0.5d) * (mx - mn) / levels
    })
  }

  /** Append the code column (array<bigint>, one code per dimension). */
  def sqEncode(df: DataFrame, embCol: String, mins: Array[Double],
      maxs: Array[Double], levels: Int = 256,
      outCol: String = "codes"): DataFrame =
    df.withColumn(outCol, codesCol(col(embCol), mins, maxs, levels))

  /** Asymmetric top-k search: float queries against the DEQUANTIZED corpus
    * codes — [[Ann.bruteForce]]'s broadcast-queries shape on a corpus that
    * ships only its 8-bit codes. */
  def searchSq(
      corpusCodes: DataFrame,
      corpusId: String,
      codesColName: String,
      mins: Array[Double],
      maxs: Array[Double],
      queries: DataFrame,
      queryId: String,
      queryEmb: String,
      k: Int,
      levels: Int = 256): DataFrame = {
    val deq = corpusCodes.withColumn("_deq",
      dequantizeCol(col(codesColName), mins, maxs, levels))
    Ann.bruteForce(deq, corpusId, "_deq", queries, queryId, queryEmb, k)
  }
}
