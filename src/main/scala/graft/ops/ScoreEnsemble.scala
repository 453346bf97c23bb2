package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quality-score ensembling — combine several per-document quality
  * signals ([[LinearScore]], [[LmScore]], [[QualityRules]] counts,
  * classifier probabilities…) into ONE selection key. Two publicly
  * standard combiners:
  *
  *  - **Borda** rank fusion: each signal contributes its global rank
  *    (1 = best); the sum of ranks is the ensemble. Scale-free — immune
  *    to signals with wildly different ranges/distributions — and
  *    INTEGER-exact, so the result is bit-stable at any corpus size.
  *  - **z-score** averaging: each signal standardizes to
  *    (x − mean)/stddev and the (optionally weighted) mean of z-scores
  *    is the ensemble. Preserves magnitude information ranks discard.
  *
  * Scale shape: Borda pays one [[RankOp.withGlobalRank]]
  * range-partitioned sort PER SIGNAL (k honest global sorts — the price
  * of exact ranks; ties break on the id column, deterministic).
  * z-score pays ONE aggregation: moments come from integer-scaled
  * (×10⁶, DECIMAL-summed) values, so mean/stddev are exact and
  * order-independent — the float-sum nondeterminism the repo's
  * invariants ban never enters; the per-row standardization is then a
  * pure expression fused into the scan.
  */
object ScoreEnsemble {

  /** Append `_rank_<col>` per signal (1 = best, direction `desc`) and
    * their sum `outCol` (lower = better overall). */
  def borda(df: DataFrame, scoreCols: Seq[String], tieBreak: String,
      outCol: String = "borda_sum"): DataFrame = {
    require(scoreCols.nonEmpty, "borda needs at least one score column")
    val ranked = scoreCols.foldLeft(df) { (acc, c) =>
      RankOp.withGlobalRank(acc,
        Seq(col(c).desc, col(tieBreak).asc))
        .withColumnRenamed("_rank", s"_rank_$c")
    }
    ranked.withColumn(outCol,
      scoreCols.map(c => col(s"_rank_$c")).reduce(_ + _).cast("bigint"))
  }

  /** Append `_pct_<col>` per signal — the percentile rank
    * (rank − 1)/(n − 1) ∈ [0, 1], 1 = best — and their mean `outCol`.
    * The distribution-free normalization between [[borda]]'s integer
    * ranks and [[zscore]]'s moment scaling: comparable across signals
    * with arbitrary (even heavy-tailed) distributions, monotone, and
    * exactly replayable (rank arithmetic, no moments). Same
    * range-partitioned global sorts as borda; n is one scalar. */
  def percentile(df: DataFrame, scoreCols: Seq[String], tieBreak: String,
      outCol: String = "ensemble_pct"): DataFrame = {
    require(scoreCols.nonEmpty, "percentile needs at least one score column")
    // persisted (PersistScope — bench/pipeline flush points release it):
    // the count plus k rank sorts would otherwise re-run the upstream
    // plan k+1 times
    val base = graft.core.PersistScope.register(df.persist())
    val n = base.count()
    val denom = math.max(n - 1L, 1L).toDouble
    val ranked = scoreCols.foldLeft(base) { (acc, c) =>
      RankOp.withGlobalRank(acc, Seq(col(c).asc, col(tieBreak).asc))
        .withColumn(s"_pct_$c", round((col("_rank") - 1) / denom, 6))
        .drop("_rank")
    }
    ranked.withColumn(outCol,
      round(scoreCols.map(c => col(s"_pct_$c")).reduce(_ + _) /
        scoreCols.length, 6))
  }

  /** Append `_rank_<col>` per signal and their reciprocal-rank-fusion
    * sum `outCol` = Σ 1/(k + rank_i) — Cormack & Clarke's RRF, the
    * standard hybrid-retrieval combiner (BM25 + vector ranks) every
    * current search stack ships: rank-based like [[borda]] but
    * top-heavy (depth beyond ~k barely moves the score), so one
    * signal's deep tail can't swamp another's strong head. Same
    * distributed global sorts; k = 60 is the published default. */
  def rrf(df: DataFrame, scoreCols: Seq[String], tieBreak: String,
      k: Int = 60, outCol: String = "rrf_score"): DataFrame = {
    require(scoreCols.nonEmpty, "rrf needs at least one score column")
    require(k >= 0, s"rrf k must be >= 0, got $k")
    val ranked = scoreCols.foldLeft(df) { (acc, c) =>
      RankOp.withGlobalRank(acc, Seq(col(c).desc, col(tieBreak).asc))
        .withColumnRenamed("_rank", s"_rank_$c")
    }
    ranked.withColumn(outCol,
      round(scoreCols.map(c => lit(1.0) / (lit(k) + col(s"_rank_$c")))
        .reduce(_ + _), 6))
  }

  /** Append `_z_<col>` per signal and their weighted mean `outCol`
    * (6 decimals). Signals scale to ×10⁶ integers before the moment
    * sums (DECIMAL(38,0) — exact at any row count); a constant signal
    * (stddev 0) contributes z = 0. */
  def zscore(df: DataFrame, scoreCols: Seq[String],
      weights: Seq[Double] = Nil,
      outCol: String = "ensemble_z"): DataFrame = {
    require(scoreCols.nonEmpty, "zscore needs at least one score column")
    val w = if (weights.isEmpty) scoreCols.map(_ => 1.0) else weights
    require(w.length == scoreCols.length,
      s"weights (${w.length}) must match score columns (${scoreCols.length})")
    def scaled(c: String) =
      round(col(c).cast("double") * 1e6).cast("decimal(38,0)")
    val aggs = scoreCols.flatMap { c =>
      Seq(count(col(c)).as(s"_n_$c"),
        sum(scaled(c)).as(s"_s_$c"),
        sum(scaled(c) * scaled(c)).as(s"_ss_$c"))
    }
    val m = df.agg(aggs.head, aggs.tail: _*).head()
    def dec(name: String, c: String): Double = {
      val i = m.fieldIndex(s"_${name}_$c")
      // null sum + rows present = DECIMAL(38,0) overflow: fail loudly
      // instead of silently zeroing the moments (see Profile
      // .correlationMatrix, same discipline).
      if (m.isNullAt(i)) {
        if (m.getAs[Long](s"_n_$c") > 0)
          throw new IllegalStateException(
            s"zscore: moment sum ${name}($c) overflowed DECIMAL(38,0) — " +
              "pre-scale the signal (values must stay below ~1e12)")
        0.0
      } else m.getAs[java.math.BigDecimal](i).doubleValue()
    }
    val stats = scoreCols.map { c =>
      val n = m.getAs[Long](s"_n_$c").toDouble
      val s = dec("s", c)
      val ss = dec("ss", c)
      val mean = if (n > 0) s / n else 0.0
      val variance = if (n > 0) math.max(ss / n - mean * mean, 0.0) else 0.0
      c -> (mean, math.sqrt(variance))
    }.toMap
    val withZ = scoreCols.foldLeft(df) { (acc, c) =>
      val (mean, sd) = stats(c)
      val z = if (sd == 0.0) lit(0.0)
        else (round(col(c).cast("double") * 1e6) - lit(mean)) / lit(sd)
      acc.withColumn(s"_z_$c", round(z, 6))
    }
    val totalW = w.sum
    val combined = scoreCols.zip(w).map { case (c, wi) =>
      col(s"_z_$c") * lit(wi)
    }.reduce(_ + _) / lit(totalW)
    withZ.withColumn(outCol, round(combined, 6))
  }
}
