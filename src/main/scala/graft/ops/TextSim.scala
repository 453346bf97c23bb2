package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram overlap F1 (ROUGE-N with clipped counts — Lin 2004) between a
  * candidate and a reference text column: the standard gate for
  * summary/answer quality AND the instruction-dedup filter self-instruct
  * style pipelines apply (drop a generated instruction when its ROUGE
  * overlap with an existing one exceeds a threshold).
  *
  * Scale shape: grams build as per-row array expressions fused into the
  * scan; clipped-overlap counting then runs as TWO keyed aggregations
  * and ONE (id, gram)-keyed join — count candidate grams per (id, gram),
  * count reference grams per (id, gram), join, sum least(c, r) per id.
  * All shuffles key on (id, gram), so a book-length document costs its
  * gram count, never gram² — the row-local alternative (fold over
  * distinct grams × filter per gram) is quadratic per row and banned by
  * the HOF invariant. Totals ride the same aggregations; every metric is
  * a ratio of exact BIGINT counts.
  */
object TextSim {

  /** Lowercased alphanumeric word tokens (shared with [[Cooccur]]). */
  private def tokens(c: Column): Column =
    graft.functions.TextFunctions.alnumTokens(c)

  /** Word n-grams as space-joined strings; empty array when the text has
    * fewer than n tokens (guarding Spark's descending sequence(1, 0)). */
  private[graft] def grams(c: Column, n: Int): Column = {
    val toks = tokens(c)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-row ROUGE-N: (idCols..., cand_grams, ref_grams, overlap,
    * precision, recall, f1) at gram order `n`. `overlap` is the clipped
    * multiset intersection size: Σ over distinct grams of
    * least(count_in_candidate, count_in_reference). Rows where either
    * side has no grams report 0.0 metrics (not null — a gate-friendly
    * sentinel; an empty candidate genuinely earns zero). */
  def ngramF1(df: DataFrame, idCols: Seq[String], candCol: String,
      refCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val ids = idCols.map(col)
    val base = df.select(ids :+ grams(col(candCol), n).as("_cg") :+
      grams(col(refCol), n).as("_rg"): _*)
    val totals = base.select(ids :+ size(col("_cg")).cast("bigint")
      .as("cand_grams") :+ size(col("_rg")).cast("bigint")
      .as("ref_grams"): _*)
    def counted(gramsCol: String, out: String) = base
      .select(ids :+ explode(col(gramsCol)).as("_g"): _*)
      .groupBy(ids :+ col("_g"): _*)
      .agg(count(lit(1)).as(out))
    val overlap = counted("_cg", "_cc")
      .join(counted("_rg", "_rc"), idCols :+ "_g")
      .groupBy(ids: _*)
      .agg(sum(least(col("_cc"), col("_rc"))).as("overlap"))
    val joined = totals.join(overlap, idCols, "left")
      .withColumn("overlap", coalesce(col("overlap"), lit(0L)))
    val p = when(col("cand_grams") > 0,
      col("overlap").cast("double") / col("cand_grams")).otherwise(0.0)
    val r = when(col("ref_grams") > 0,
      col("overlap").cast("double") / col("ref_grams")).otherwise(0.0)
    joined
      .withColumn("precision", round(p, 6))
      .withColumn("recall", round(r, 6))
      .withColumn("f1",
        round(when(p + r > 0, lit(2.0) * p * r / (p + r)).otherwise(0.0), 6))
  }
}
