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
    val filtered = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
    val total = filtered.count()
    filtered
      .groupBy(col(aCol).cast("string").as("label_a"),
        col(bCol).cast("string").as("label_b"))
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
    * statistics throughout; P_i's rational sum is accumulated as an
    * EXACT per-item double only when all n_i are equal (the classic
    * design) — with ragged n_i it is the standard unweighted mean. */
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
    val perItem = perItemLabel.groupBy(col("_i"))
      .agg(sum(col("_c")).as("_n"), sum(col("_c") * col("_c")).as("_sq"))
      .filter(col("_n") >= 2)
      .select(
        count(lit(1)).as("items"),
        sum(col("_n")).as("ratings"),
        sum(col("_sq")).as("sumSq"),
        min(col("_n")).as("minN"), max(col("_n")).as("maxN"),
        // ragged-design fallback only: a float sum (order-dependent in
        // the last ulp) — the constant-n path below never reads it
        sum((col("_sq") - col("_n")) /
          (col("_n") * (col("_n") - 1))).as("pSum"))
      .head()
    val items = perItem.getLong(0)
    val ratings = if (perItem.isNullAt(1)) 0L else perItem.getLong(1)
    val sumSq = if (perItem.isNullAt(2)) 0L else perItem.getLong(2)
    val constN = items > 0 && perItem.getLong(3) == perItem.getLong(4)
    // Constant raters-per-item (the classic design): Σ P_i collapses to
    // (Σ n_ik² − Σ n_i) / (n (n−1)) — INTEGER sums, one exact division,
    // order-independent. Ragged designs take the float-sum mean.
    val pSum =
      if (constN) {
        val nc = perItem.getLong(3)
        (sumSq - ratings).toDouble / (nc * (nc - 1))
      } else if (perItem.isNullAt(5)) 0.0
      else perItem.getDouble(5)
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
    val pBar = if (items == 0) 0.0 else pSum / items
    val kappa = if (peBar >= 1.0) 1.0 else (pBar - peBar) / (1.0 - peBar)
    import spark.implicits._
    Seq((items, ratings, rnd(pBar), rnd(peBar), rnd(kappa)))
      .toDF("n_items", "n_ratings", "p_bar", "pe_bar", "kappa")
  }

  private def rnd(x: Double): Double = math.rint(x * 1e6) / 1e6
}
