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
}
