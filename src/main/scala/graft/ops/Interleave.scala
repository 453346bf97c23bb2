package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stratified round-robin interleave — the training-order step that spreads
  * each stratum (source, language, domain) evenly through the global
  * sequence so no batch is dominated by one domain (anti-clustering;
  * complements the mixture samplers, which fix WHAT is kept, by fixing the
  * ORDER it is consumed in).
  *
  * Row r of every stratum sorts before row r+1 of any stratum; within a
  * round, strata order lexicographically — fully deterministic. The global
  * 1-based position lands in `outCol`.
  *
  * Scale shape: one keyed window ranks rows within their stratum, then the
  * global position is a range-partitioned sort + per-partition offset
  * ([[RankOp.withGlobalRank]]'s zipWithIndex) — NOT a row_number over an
  * empty window, which would serialize the table through one task.
  */
object InterleaveOp {

  def apply(
      df: DataFrame,
      stratifyCol: String,
      orderExpr: String,
      outCol: String = "interleave_rank"): DataFrame = {
    require(!df.columns.contains(outCol), s"input already has $outCol")
    val w = Window.partitionBy(col(stratifyCol)).orderBy(expr(orderExpr))
    val ranked = df.withColumn("_graft_sr", row_number().over(w))
    RankOp.withGlobalRank(ranked,
      Seq(col("_graft_sr").asc, col(stratifyCol).asc))
      .withColumnRenamed("_rank", outCol)
      .drop("_graft_sr")
  }

  /** Curriculum training order: sort by a difficulty score (easy -> hard),
    * cut the sorted stream into `nBuckets` equal-frequency difficulty
    * bands, and shuffle deterministically WITHIN each band — the standard
    * curriculum-learning order (monotone difficulty at the band level,
    * decorrelated examples inside a band so batches are not sorted runs).
    * Adds `difficulty_bucket` (0-based) and `curriculum_rank` (1-based).
    *
    * Scale shape: two range-partitioned sorts ([[RankOp.withGlobalRank]]'s
    * zipWithIndex — never a row_number over an empty window, which would
    * serialize the corpus through one task) plus one count scalar on the
    * driver; bucket membership is closed-form rank arithmetic, so bands are
    * exactly equal-frequency without any quantile sketch. */
  def curriculum(
      df: DataFrame,
      scoreExpr: String,
      idExpr: String,
      nBuckets: Int,
      seed: Long = 0): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    Seq("difficulty_bucket", "curriculum_rank").foreach(c =>
      require(!df.columns.contains(c), s"input already has $c"))
    val total = df.count()
    val ranked = RankOp.withGlobalRank(df,
      Seq(expr(scoreExpr).asc, expr(idExpr).asc))
      .withColumn("difficulty_bucket",
        expr(s"CAST(((_rank - 1) * $nBuckets) DIV ${math.max(total, 1L)} AS INT)"))
      .drop("_rank")
    val key = md5(concat(expr(idExpr).cast("string"), lit(":" + seed)))
    RankOp.withGlobalRank(
      ranked.withColumn("_graft_cur", key),
      Seq(col("difficulty_bucket").asc, col("_graft_cur").asc,
        expr(idExpr).asc))
      .withColumnRenamed("_rank", "curriculum_rank")
      .drop("_graft_cur")
  }

  /** Deterministic global shuffle — the epoch-seeded random training order.
    * Position = 1-based rank of md5(idExpr ":" seed), id as tie-break, so
    * the permutation is reproducible from (data, seed) alone and changes
    * completely between epochs by bumping the seed; md5 hex is engine-stable
    * (same SQL on DuckDB orders identically).
    *
    * Scale shape: one range-partitioned sort on the hash key
    * ([[RankOp.withGlobalRank]]) — never a row_number over an empty window,
    * which would serialize the corpus through one task. Hash keys are
    * uniform by construction, so the range partitioner cannot skew. */
  def shuffle(
      df: DataFrame,
      idExpr: String,
      seed: Long,
      outCol: String = "shuffle_rank"): DataFrame = {
    require(!df.columns.contains(outCol), s"input already has $outCol")
    val key = md5(concat(expr(idExpr).cast("string"), lit(":" + seed)))
    RankOp.withGlobalRank(
      df.withColumn("_graft_shuf", key),
      Seq(col("_graft_shuf").asc, expr(idExpr).asc))
      .withColumnRenamed("_rank", outCol)
      .drop("_graft_shuf")
  }
}
