package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classifier evaluation — the metrics loop that closes the train-your-own
  * filter cycle ([[NaiveBayes]], [[LinearScore]]): confusion counts,
  * precision/recall/F1 at a threshold, exact ROC-AUC, and a reliability
  * (calibration) table. Publicly standard ML evaluation (AUC as the
  * Mann–Whitney U statistic with mid-rank tie handling — the same number
  * sklearn's `roc_auc_score` produces).
  *
  * Scale shape: confusion metrics are ONE aggregation of per-row flag
  * expressions. AUC needs a global score order — assigned with
  * [[RankOp.withGlobalRank]]'s range-partitioned sort + per-partition
  * offsets (never a single-partition window); ties then collapse to
  * mid-ranks via one (score)-keyed agg joined back (score-keyed shuffle,
  * bounded by distinct scores ≤ rows). Everything reduces to exact BIGINT
  * sums — 2×mid-rank = min+max of a consecutive rank run is an integer —
  * so AUC is order-independent at any n and the DuckDB oracle replays it
  * to the last decimal. Calibration is one bin-keyed agg.
  */
object ClassifierEval {

  /** One-row report: n, n_pos, n_neg, tp/fp/tn/fn at `threshold`
    * (predict positive when score >= threshold), accuracy, precision,
    * recall, f1, and exact mid-rank ROC-AUC. `labelCol` must be 0/1.
    * Degenerate corpora (no positives or no negatives) report null AUC
    * rather than a misleading number. NULL-SCORE rows are excluded from
    * EVERY metric consistently (n included) — a row the scorer failed on
    * must not sit in the AUC denominator while its rank is missing from
    * the numerator, which would silently understate AUC. */
  def report(dfIn: DataFrame, labelCol: String, scoreCol: String,
      threshold: Double = 0.5): DataFrame = {
    val df = dfIn.filter(col(scoreCol).isNotNull)
    val lbl = col(labelCol).cast("long")
    val score = col(scoreCol).cast("double")
    val pred = score >= threshold

    // Global row number over (score asc, label, then arbitrary-but-fixed
    // order is unnecessary — per-score averaging erases within-tie order).
    val ranked = RankOp.withGlobalRank(
      df.select(lbl.as("_lbl"), score.as("_s")), Seq(col("_s").asc))
    // Mid-rank per distinct score: ties share avg(rank) — the Mann-Whitney
    // tie correction. Ranks within a tie group are consecutive, so
    // 2×mid-rank = min(rank) + max(rank) is an INTEGER: summing it as
    // BIGINT keeps AUC exact and order-independent at any n (a float
    // mid-rank sum drifts past ~1e8 rows). The positive doubled rank sum
    // lands as ONE driver scalar (bounded) rather than a 1×1 cross join —
    // the suite-wide plan audit bans nested-loop joins, and a literal is
    // cheaper anyway.
    val midrank = ranked.groupBy("_s")
      .agg((min(col("_rank")) + max(col("_rank"))).as("_mid2"))
    val prsRow = ranked.join(midrank, "_s")
      .agg(sum(when(col("_lbl") === 1, col("_mid2")))).head()
    val prs2 = if (prsRow.isNullAt(0)) 0L else prsRow.getLong(0)

    val counts = df.agg(
      count(lit(1)).as("n"),
      sum(lbl).as("n_pos"),
      sum(lit(1L) - lbl).as("n_neg"),
      sum(when(pred && lbl === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(pred && lbl === 0, 1L).otherwise(0L)).as("fp"),
      sum(when(!pred && lbl === 0, 1L).otherwise(0L)).as("tn"),
      sum(when(!pred && lbl === 1, 1L).otherwise(0L)).as("fn"))

    counts.select(
      col("n"), col("n_pos"), col("n_neg"),
      col("tp"), col("fp"), col("tn"), col("fn"),
      round((col("tp") + col("tn")).cast("double") / col("n"), 6)
        .as("accuracy"),
      when(col("tp") + col("fp") > 0,
        round(col("tp").cast("double") / (col("tp") + col("fp")), 6))
        .as("precision"),
      when(col("n_pos") > 0,
        round(col("tp").cast("double") / col("n_pos"), 6)).as("recall"),
      when(col("tp") * 2 + col("fp") + col("fn") > 0,
        round(col("tp") * 2.0 / (col("tp") * 2 + col("fp") + col("fn")), 6))
        .as("f1"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        // AUC = (Σ2·midrank − n_pos(n_pos+1)) / (2·n_pos·n_neg): every
        // term integer until the one final division.
        round((lit(prs2) - col("n_pos") * (col("n_pos") + 1)).cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as("auc"))
  }

  /** Reliability table: scores bucketed into `bins` equal-width bins over
    * [0, 1] — (bin, n, mean_score, pos_rate). A calibrated classifier has
    * pos_rate ≈ mean_score per bin. Scores outside [0, 1] clamp to the
    * edge bins. One bin-keyed aggregation. */
  def calibrationBins(df: DataFrame, labelCol: String, scoreCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val score = col(scoreCol).cast("double")
    val bin = least(greatest(floor(score * bins), lit(0)), lit(bins - 1))
      .cast("bigint")
    df.select(bin.as("bin"), score.as("_s"),
      col(labelCol).cast("long").as("_l"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        round(avg(col("_s")), 6).as("mean_score"),
        round(avg(col("_l")), 6).as("pos_rate"))
  }

  /** EQUAL-MASS (quantile-binned) calibration table — the standard ECE
    * companion to the fixed-width [[calibrationBins]]: scores are
    * ranked globally and cut into `bins` equal-count bins (sizes differ
    * by at most 1), so sparse score regions can't produce empty or
    * single-row bins that make the reliability diagram lie. Ranking
    * rides [[RankOp.withGlobalRank]]'s range-partitioned sort (never a
    * single-task window); `tieBreak` makes equal scores cut
    * deterministically, so the table is oracle-replayable. The row
    * count is one scalar aggregate (O(1) driver state). */
  def calibrationBinsEqualMass(df: DataFrame, labelCol: String,
      scoreCol: String, bins: Int, tieBreak: String): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    // persisted (PersistScope — runner flush points release it): the
    // scalar count and the rank sort are TWO actions over the same
    // projection, which would otherwise re-run the upstream plan twice
    val proj = graft.core.PersistScope.register(
      df.select(col(scoreCol).cast("double").as("_s"),
        col(labelCol).cast("long").as("_l"), expr(tieBreak).as("_tb"))
        .persist())
    val n = proj.count()
    val ranked = RankOp.withGlobalRank(proj,
      Seq(col("_s").asc, col("_tb").asc))
    ranked
      .withColumn("bin",
        floor((col("_rank") - 1) * bins / lit(math.max(n, 1L))))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        round(avg(col("_s")), 6).as("mean_score"),
        round(avg(col("_l")), 6).as("pos_rate"))
  }
}
