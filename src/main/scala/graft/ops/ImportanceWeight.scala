package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-selection importance weighting (public DSIR recipe, Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): score
  * each corpus document by how much more likely its tokens are under a
  * TARGET distribution (the high-quality set you want more of) than under
  * the corpus's own distribution. Downstream, feed the weight into
  * [[SampleOp]] top-k / weighted sampling to retarget the mixture.
  *
  * weight(doc) = mean over token instances of
  *   ln p_target(tok) - ln p_corpus(tok),
  * with add-one (Laplace) smoothing over the JOINT vocabulary so unseen
  * tokens stay finite on both sides. Positive = looks like the target.
  *
  * Scale shape: two token-count aggregations (shuffle keyed by token), a
  * full-outer vocab join, then the corpus token stream joins the
  * vocab-sized weight table (hash join; AQE broadcasts it when it fits) and
  * reduces per document. The only driver state is ONE row of global scalars
  * (vocab size, total counts) fetched from the persisted vocab frame — the
  * same O(1) class as [[UnigramScore]]'s token total, and it keeps the
  * weight projection a pure literal expression (no cross join for the plan
  * auditor to flag). Everything else is codegen'd Column arithmetic.
  */
object ImportanceWeightOp {

  def logRatio(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      target: DataFrame,
      targetTextCol: String,
      outCol: String = "importance_weight"): DataFrame = {
    val cToks = corpus.select(
      col(idCol), explode(split(col(textCol), " ")).as("_tok"))
    val tToks = target.select(
      explode(split(col(targetTextCol), " ")).as("_tok"))
    val cCnt = cToks.groupBy("_tok").agg(count(lit(1)).as("_c"))
    val tCnt = tToks.groupBy("_tok").agg(count(lit(1)).as("_t"))
    // The vocab table feeds BOTH the scalar stats and the weight projection;
    // persisting it halves the corpus scans (2 instead of 4) — without it
    // Catalyst re-derives the full-outer count join in each branch.
    val vocab = graft.core.PersistScope.register(
      cCnt.join(tCnt, Seq("_tok"), "full_outer")
        .select(col("_tok"),
          coalesce(col("_c"), lit(0L)).as("_c"),
          coalesce(col("_t"), lit(0L)).as("_t"))
        .persist())
    val stats = vocab.agg(
      count(lit(1)).cast("double").as("_v"),
      sum("_c").cast("double").as("_nc"),
      sum("_t").cast("double").as("_nt")).collect()(0)
    val (v, nc, nt) = (stats.getDouble(0), stats.getDouble(1), stats.getDouble(2))
    val weights = vocab
      .select(col("_tok"),
        (log((col("_t") + 1).cast("double") / (nt + v)) -
          log((col("_c") + 1).cast("double") / (nc + v)))
          .as("_w"))
    cToks.join(weights, Seq("_tok"))
      .groupBy(col(idCol))
      .agg(round(avg("_w"), 6).as(outCol))
  }
}
