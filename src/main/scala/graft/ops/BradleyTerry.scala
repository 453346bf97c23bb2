package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bradley–Terry pairwise-preference strengths — the arena-style rating
  * behind model leaderboards and preference-data audits: given (a, b,
  * winner) comparison rows, estimate each item's strength p_i such that
  * P(i beats j) = p_i / (p_i + p_j). Fitted with the standard MM
  * iteration (Hunter 2004, "MM algorithms for generalized
  * Bradley-Terry models"): p_i ← W_i / Σ_j n_ij / (p_i + p_j). The
  * post-training sibling of [[Preference]]: validate pairs, THEN check
  * the comparison graph actually orders your models/checkpoints/prompts.
  *
  * Scale shape: comparisons reduce ONCE to per-pair sufficient
  * statistics (n_ij, wins) — everything after is vocabulary-of-items
  * sized, not comparison-count sized. Each MM iteration is one keyed
  * join of ratings onto the pair table + one item-keyed agg (the
  * [[graft.graph.PageRank]] shape), localCheckpoint'ed to keep lineage
  * flat. Driver state = one item count. MM preserves each connected
  * component's total mass, so no renormalization step is needed.
  *
  * Determinism note: the per-item denominator is a float sum over the
  * item's opponents, so last-ulp results can vary with partitioning
  * when an item has MANY opponents — fine for a rating/ranking
  * diagnostic, and the oracle gate uses 2-item components whose sums
  * have one term (exactly reproducible). Items outside any comparison
  * are absent from the output; a component never beaten/never losing
  * converges toward 0/∞ as BT theory says — feed balanced data.
  */
object BradleyTerry {

  /** Fit ratings from comparison rows (`aCol`, `bCol`, `winnerCol` —
    * winner must equal the a or b value; ties are dropped). Returns
    * (item, wins, comparisons, rating, rank): rating is the BT strength
    * (mean 1.0 per 2-item component; 6 dp), rank orders by rating desc
    * with item-asc ties. */
  def fit(df: DataFrame, aCol: String, bCol: String, winnerCol: String,
      nIter: Int = 20): DataFrame = {
    require(nIter >= 1 && nIter <= 200,
      s"nIter must be in [1, 200], got $nIter")
    // Canonical pair key (x < y) + win counts for each side.
    val valid = df.select(col(aCol).cast("string").as("_a"),
      col(bCol).cast("string").as("_b"),
      col(winnerCol).cast("string").as("_w"))
      .filter(col("_w") === col("_a") || col("_w") === col("_b"))
      .filter(col("_a") =!= col("_b"))
    val pairs = graft.core.PersistScope.register(valid
      .select(least(col("_a"), col("_b")).as("_x"),
        greatest(col("_a"), col("_b")).as("_y"),
        when(col("_w") === least(col("_a"), col("_b")), 1L).otherwise(0L)
          .as("_wx"))
      .groupBy("_x", "_y")
      .agg(count(lit(1)).as("_n"), sum(col("_wx")).as("_wx"))
      .persist())

    val wins = pairs.select(col("_x").as("item"), col("_wx").as("_w"),
      col("_n").as("_c"))
      .unionByName(pairs.select(col("_y").as("item"),
        (col("_n") - col("_wx")).as("_w"), col("_n").as("_c")))
      .groupBy("item")
      .agg(sum(col("_w")).as("wins"), sum(col("_c")).as("comparisons"))
      .localCheckpoint()

    var ratings = wins.select(col("item"), lit(1.0).as("_p"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (iter < nIter && !converged) {
      val withP = pairs
        .join(ratings.select(col("item").as("_x"), col("_p").as("_px")),
          "_x")
        .join(ratings.select(col("item").as("_y"), col("_p").as("_py")),
          "_y")
        .withColumn("_den", col("_n") / (col("_px") + col("_py")))
      val dens = withP
        .select(col("_x").as("item"), col("_den"))
        .unionByName(withP.select(col("_y").as("item"), col("_den")))
        .groupBy("item").agg(sum(col("_den")).as("_d"))
      val next = wins.join(dens, "item")
        .select(col("item"),
          when(col("_d") > 0, col("wins").cast("double") / col("_d"))
            .otherwise(lit(0.0)).as("_p"))
        .localCheckpoint()
      // Early stop at the fixed point: one cheap agg over the two
      // checkpointed rating tables per iteration buys skipping every
      // remaining (2-join + agg + checkpoint) round — MM on 2-item
      // components converges after ONE step, and well-separated graphs
      // converge in a handful.
      val delta = next.join(ratings.select(col("item"),
        col("_p").as("_prev")), "item")
        .agg(coalesce(max(abs(col("_p") - col("_prev"))), lit(0.0)))
        .head().getDouble(0)
      ratings = next
      converged = delta < 1e-9
      iter += 1
    }
    val ranked = RankOp.withGlobalRank(
      wins.join(ratings, "item")
        .select(col("item"), col("wins"), col("comparisons"),
          round(col("_p"), 6).as("rating")),
      Seq(col("rating").desc, col("item").asc))
    ranked.withColumnRenamed("_rank", "rank")
  }
}
