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

  /** [[cohenKappa]] with NOTHING on the driver — po/pe assembled from
    * marginal joins, for label spaces too large for the κ-table collect
    * (free-text labels, "labels are user ids" misuse): the cell table
    * feeds one totals aggregation and two label-keyed marginal
    * aggregations (persisted — three actions over one plan), pe's
    * Σ row_k·col_k rides an inner label join (absent-side products are
    * 0), and the two one-row frames combine through a data-derived
    * always-equal key (`pmod(n, 1)` — a literal key would constant-fold
    * into the nested-loop plan the suite audit bans). Output is
    * bit-equal to [[cohenKappa]] (Round14Spec pins it; bround = the
    * same half-even rounding as the driver form's rint). */
  def cohenKappaDistributed(df: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val cells = graft.core.PersistScope.register(df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).cast("string").as("_a"),
        col(bCol).cast("string").as("_b"))
      .agg(count(lit(1)).as("_c"))
      .persist())
    val totals = cells.agg(
      coalesce(sum(col("_c")), lit(0L)).as("n"),
      coalesce(sum(when(col("_a") === col("_b"), col("_c"))
        .otherwise(0L)), lit(0L)).as("_agree"))
    val rowm = cells.groupBy(col("_a").as("_k"))
      .agg(sum(col("_c")).as("_r"))
    val colm = cells.groupBy(col("_b").as("_k"))
      .agg(sum(col("_c")).as("_cc"))
    val peNum = rowm.join(colm, Seq("_k"))
      .agg(coalesce(sum(col("_r") * col("_cc")), lit(0L)).as("_penum"))
    val joined = totals.withColumn("_j", pmod(col("n"), lit(1L)))
      .join(peNum.withColumn("_j", pmod(col("_penum"), lit(1L))), Seq("_j"))
    val nD = col("n").cast("double")
    val po = when(col("n") === 0, lit(0.0))
      .otherwise(col("_agree") / nD)
    val pe = when(col("n") === 0, lit(0.0))
      .otherwise(col("_penum") / nD / nD)
    joined.select(col("n"), bround(po, 6).as("po"), bround(pe, 6).as("pe"),
      bround(when(pe >= 1.0, lit(1.0)).otherwise((po - pe) / (lit(1.0) - pe)),
        6).as("kappa"))
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

  /** Krippendorff's α (nominal metric) — the agreement statistic for
    * RAGGED designs with missing labels (Krippendorff 1970/2004,
    * public): any number of raters, any number of ratings per item;
    * Cohen is 2-rater and Fleiss wants the constant-n design. Items
    * with fewer than 2 ratings are unpairable and excluded (the
    * standard treatment of missing data). Output one row (n_items,
    * n_values, d_o, d_e, alpha) with observed/expected disagreement
    * from the coincidence-matrix form:
    * A_obs = Σ_u (Σ_k n_uk² − n_u)/(n_u − 1), D_o = (n − A_obs)/n,
    * D_e = (n² − Σ_c n_c²)/(n(n−1)), α = 1 − D_o/D_e.
    *
    * Everything reduces to integer sufficient statistics; A_obs is
    * accumulated per DISTINCT n_u as an exact BigInt rational (the
    * [[fleissKappa]] machinery), so α is bit-identical under any
    * partitioning. α := 1.0 when D_e = 0 (every pairable value carries
    * one label — no disagreement is possible, and none is observed).
    *
    * Scale shape: one (item, label) count aggregation, a
    * distinct-n_u-sized collect, and a label-sized collect — model
    * state, never corpus state. */
  def krippendorffAlpha(df: DataFrame, itemCol: String,
      labelCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // persisted: feeds the per-item stats AND the label totals
    val perItemLabel = df
      .filter(col(itemCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(itemCol).as("_i"), col(labelCol).cast("string").as("_k"))
      .agg(count(lit(1)).as("_c"))
      .persist()
    val groups = perItemLabel.groupBy(col("_i"))
      .agg(sum(col("_c")).as("_n"), sum(col("_c") * col("_c")).as("_sq"))
      .filter(col("_n") >= 2)
      .groupBy(col("_n"))
      .agg(count(lit(1)).as("_items"), sum(col("_sq")).as("_sumSq"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val items = groups.map(_._2).sum
    val n = groups.map(g => g._1 * g._2).sum
    // A_obs = Σ_n (Σ sq − n·items_n)/(n − 1) as an exact rational
    var aNum = BigInt(0)
    var aDen = BigInt(1)
    groups.foreach { case (nu, cnt, sq) =>
      val tn = BigInt(sq) - BigInt(nu) * cnt
      val td = BigInt(nu - 1)
      aNum = aNum * td + tn * aDen
      aDen = aDen * td
    }
    // label totals over PAIRABLE items only (n_u >= 2)
    val sumSqLabels = perItemLabel
      .join(perItemLabel.groupBy("_i").agg(sum("_c").as("_n"))
        .filter(col("_n") >= 2).select("_i"), Seq("_i"))
      .groupBy("_k").agg(sum("_c").as("_ck"))
      .collect().map(r => BigInt(r.getLong(1)) * r.getLong(1)).sum
    perItemLabel.unpersist()
    def div(num: BigInt, den: BigInt): Double =
      if (den == 0) 0.0
      else new java.math.BigDecimal(num.bigInteger).divide(
        new java.math.BigDecimal(den.bigInteger),
        java.math.MathContext.DECIMAL64).doubleValue()
    // D_o = (n·aDen − aNum)/(n·aDen); D_e = (n² − Σn_c²)/(n(n−1))
    val doNum = BigInt(n) * aDen - aNum
    val doDen = BigInt(n) * aDen
    val deNum = BigInt(n) * n - sumSqLabels
    val deDen = BigInt(n) * (n - 1)
    val dO = if (n == 0) 0.0 else div(doNum, doDen)
    val dE = if (n < 2) 0.0 else div(deNum, deDen)
    // α = 1 − D_o/D_e exactly: 1 − doNum·deDen / (doDen·deNum)
    val alpha =
      if (deNum == 0 || n < 2) 1.0
      else 1.0 - div(doNum * deDen, doDen * deNum)
    Seq((items, n, rnd(dO), rnd(dE), rnd(alpha)))
      .toDF("n_items", "n_values", "d_o", "d_e", "alpha")
  }

  private def rnd(x: Double): Double = graft.core.Num.rnd6(x)
}
