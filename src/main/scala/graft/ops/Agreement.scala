package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-annotator agreement — the labeling/preference-data QA gate
  * every human-feedback pipeline runs before trusting its labels
  * (publicly standard statistics: Cohen 1960 for two raters, Fleiss
  * 1971 for many): how much do raters agree BEYOND chance? Low κ means
  * the rubric, not the model, is the problem. Complements
  * [[BradleyTerry]] (which assumes the comparisons are trustworthy) and
  * the [[Preference]] pair contract (which checks shape, not rater
  * consistency).
  *
  * Everything reduces to INTEGER contingency counts first, so the
  * statistics are exact and order-independent; the final divisions are
  * deterministic double ops over those integers, rounded to 6.
  *
  * Scale shape: one (a, b)-keyed count aggregation (label-vocabulary² —
  * bounded rows), marginals as label-sized aggregations, and a driver
  * assembly of the O(K²) table into the one-row report — model-vocab
  * state, never corpus state.
  */
object Agreement {

  /** Cohen's κ for two raters over (aCol, bCol) label pairs: one row
    * (n, po, pe, kappa) — observed agreement, chance agreement, kappa.
    * Rows where either side is null are excluded (unlabeled items). */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val spark = df.sparkSession
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).cast("string").as("_a"),
        col(bCol).cast("string").as("_b"))
      .agg(count(lit(1)).as("_c"))
      .collect() // label-vocabulary² rows — bounded model state
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val n = cells.map(_._3).sum
    val agree = cells.filter(c => c._1 == c._2).map(_._3).sum
    val rowm = cells.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val colm = cells.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }
    val labels = (rowm.keySet ++ colm.keySet).toSeq.sorted
    val peNum = labels.map(k =>
      rowm.getOrElse(k, 0L) * colm.getOrElse(k, 0L)).sum
    val po = if (n == 0) 0.0 else agree.toDouble / n
    val pe = if (n == 0) 0.0 else peNum.toDouble / n / n
    val kappa = if (pe >= 1.0) 1.0 else (po - pe) / (1.0 - pe)
    import spark.implicits._
    Seq((n, rnd(po), rnd(pe), rnd(kappa)))
      .toDF("n", "po", "pe", "kappa")
  }

  /** Per-label contingency view feeding [[cohenKappa]]: (label_a,
    * label_b, n) counts plus each cell's share — the confusion table a
    * rubric review actually reads. Pure keyed aggregation, no driver
    * state (use this form when the label space is NOT small). */
  def confusion(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    // persisted (PersistScope — runner flush points release it): the
    // scalar count plus the cell aggregation are TWO actions over the
    // same filtered input, which would otherwise re-run its plan
    val filtered = graft.core.PersistScope.register(
      df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
        .select(col(aCol).cast("string").as("label_a"),
          col(bCol).cast("string").as("label_b"))
        .persist())
    val total = filtered.count()
    filtered
      .groupBy(col("label_a"), col("label_b"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share",
        round(col("n") / lit(math.max(total, 1L).toDouble), 6))
  }

  /** Fleiss' κ for MANY raters: input is one row per (itemCol,
    * labelCol) RATING (n_i raters per item, possibly varying); the
    * standard generalization with per-item agreement
    * P_i = (Σ_k n_ik² − n_i) / (n_i (n_i − 1)). Items with fewer than 2
    * ratings are excluded (agreement undefined). Output one row
    * (n_items, n_ratings, p_bar, pe_bar, kappa). Integer sufficient
    * statistics throughout; Σ P_i is accumulated as an EXACT BigInt
    * rational over the per-distinct-n_i integer sums — items with the
    * same n_i share a denominator n_i(n_i−1), so even ragged designs
    * reduce to one exact fraction per distinct n_i (driver state =
    * distinct rater-count values, bounded by max raters per item) and
    * the statistic is bit-identical under any partitioning. */
  def fleissKappa(df: DataFrame, itemCol: String,
      labelCol: String): DataFrame = {
    val spark = df.sparkSession
    // persisted: the sufficient-stats aggregation feeds TWO actions
    // (the per-item head() and the shares collect()) — without the
    // persist each re-scans the ratings input
    val perItemLabel = df
      .filter(col(itemCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(itemCol).as("_i"), col(labelCol).cast("string").as("_k"))
      .agg(count(lit(1)).as("_c"))
      .persist()
    // Per DISTINCT rater count n: item count and Σ n_ik² — items sharing
    // n_i share the P_i denominator n_i(n_i−1), so Σ P_i is one exact
    // fraction per group. Driver state = distinct n_i values (bounded by
    // max raters per item), NOT item count.
    val groups = perItemLabel.groupBy(col("_i"))
      .agg(sum(col("_c")).as("_n"), sum(col("_c") * col("_c")).as("_sq"))
      .filter(col("_n") >= 2)
      .groupBy(col("_n"))
      .agg(count(lit(1)).as("_items"), sum(col("_sq")).as("_sumSq"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val items = groups.map(_._2).sum
    val ratings = groups.map(g => g._1 * g._2).sum
    // Σ P_i = Σ_n (Σ_{i: n_i=n} n_ik² − n·items_n) / (n(n−1)) as an EXACT
    // BigInt rational — order-independent and ulp-stable by construction
    // (the ragged float-sum fallback this replaces flipped the 6th
    // rounded decimal with shuffle partitioning).
    var pNum = BigInt(0)
    var pDen = BigInt(1)
    groups.foreach { case (n, cnt, sq) =>
      val tn = BigInt(sq) - BigInt(n) * cnt
      val td = BigInt(n) * BigInt(n - 1)
      pNum = pNum * td + tn * pDen
      pDen = pDen * td
    }
    // chance agreement from the label shares over the SAME rating pool
    val shares = perItemLabel
      .join(perItemLabel.groupBy("_i").agg(sum("_c").as("_n"))
        .filter(col("_n") >= 2).select("_i"), Seq("_i"))
      .groupBy("_k").agg(sum("_c").as("_ck"))
      .collect().map(_.getLong(1)).sorted // label-sized; sorted so the
    // driver-side float sum below adds in one fixed order every run
    val peBar =
      if (ratings == 0) 0.0
      else shares.map(c => (c.toDouble / ratings) * (c.toDouble / ratings)).sum
    perItemLabel.unpersist()
    val pBar =
      if (items == 0) 0.0
      else new java.math.BigDecimal(pNum.bigInteger).divide(
        new java.math.BigDecimal((pDen * items).bigInteger),
        java.math.MathContext.DECIMAL64).doubleValue()
    val kappa = if (peBar >= 1.0) 1.0 else (pBar - peBar) / (1.0 - peBar)
    import spark.implicits._
    Seq((items, ratings, rnd(pBar), rnd(peBar), rnd(kappa)))
      .toDF("n_items", "n_ratings", "p_bar", "pe_bar", "kappa")
  }

  private def rnd(x: Double): Double = math.rint(x * 1e6) / 1e6
}
