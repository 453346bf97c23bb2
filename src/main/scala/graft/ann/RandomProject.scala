package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection — reduce an embedding column to
  * `outDim` dimensions with a seeded ±1 sign matrix (the database-friendly
  * JL construction publicly analyzed by Achlioptas 2001: ±1 entries
  * preserve pairwise distances in expectation exactly like Gaussians).
  * The cheap pre-reduction in front of ANN / dedup when 100 TB of 768-dim
  * float32 won't fit the shuffle budget: project once, index/search in
  * the small space, re-rank survivors in the original space.
  *
  * The sign matrix is DERIVED, not stored: sign(j, i) = ±1 from the
  * parity of an md5 prefix of "seed_j_i" — computed once on the driver
  * (outDim × dim ints, config-bounded), broadcast as a literal nested
  * array, and reproducible ANYWHERE md5 exists (the DuckDB oracle
  * re-derives the identical matrix in SQL — no weights ship between
  * engines). Projection itself is a pure codegen'd array expression: per
  * row, outDim dot products over the input dims, each a fixed-order fold
  * (deterministic float sum), scaled by 1/√outDim and rounded to 6
  * decimals.
  */
object RandomProject {

  /** ±1 from the md5-prefix parity of "seed_j_i" — the engine-portable
    * sign derivation (DuckDB: ('0x' || substr(md5(...), 1, 13))::UBIGINT
    * % 2). */
  private[graft] def sign(seed: String, j: Int, i: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${seed}_${j}_$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 13)
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1 else -1
  }

  /** The outDim × dim sign matrix for `seed` (driver-side, bounded). */
  def signMatrix(dim: Int, outDim: Int, seed: String): Array[Array[Int]] =
    Array.tabulate(outDim)(j => Array.tabulate(dim)(i => sign(seed, j, i)))

  /** Projected column: array<double> of length `outDim`,
    * y_j = (Σ_i x_i · sign_ji) / √outDim, rounded to 6 decimals. */
  def projectCol(emb: Column, signs: Array[Array[Int]]): Column = {
    val outDim = signs.length
    val signsLit = array(signs.toIndexedSeq.map(row =>
      array(row.toIndexedSeq.map(s => lit(s.toDouble)): _*)): _*)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    transform(sequence(lit(1), lit(outDim)), j =>
      round(aggregate(
        zip_with(transform(emb, _.cast("double")), element_at(signsLit, j),
          (x, s) => x * s),
        lit(0.0d), (acc, v) => acc + v) * scale, 6))
  }

  /** Append the projected embedding (`outCol`, array<double> length
    * `outDim`). `dim` is read from the first row when not given. */
  def project(df: DataFrame, embCol: String, outDim: Int,
      seed: String = "jl", outCol: String = "embedding_jl"): DataFrame = {
    require(outDim >= 1, s"outDim must be >= 1, got $outDim")
    val dimRow = df.agg(min(size(col(embCol))), max(size(col(embCol)))).head()
    require(!dimRow.isNullAt(0), "randomProject: corpus is empty")
    require(dimRow.getInt(0) == dimRow.getInt(1),
      s"randomProject: ragged embedding lengths " +
        s"(min=${dimRow.getInt(0)}, max=${dimRow.getInt(1)})")
    val dim = dimRow.getInt(1)
    require(outDim <= dim,
      s"randomProject: outDim $outDim exceeds input dim $dim")
    df.withColumn(outCol, projectCol(col(embCol), signMatrix(dim, outDim, seed)))
  }
}
