package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classification, trained AND applied as
  * pure Spark aggregations — the train-your-own-classifier loop of corpus
  * curation (fastText-style quality filters and language identifiers are
  * trained exactly this way at corpus scale; NB is the aggregation-only
  * member of that family: McCallum & Nigam 1998). Complements
  * [[LinearScore]] (which APPLIES an externally-trained binary model):
  * here the model is FIT on labeled slices — e.g. "label wiki vs crawl,
  * train, score everything" — and the learned table is itself the
  * external-model seam (same (token, weight) convention, plus label).
  *
  * Model = one DataFrame of (label, token, weight) rows with two reserved
  * pseudo-tokens per label: `__prior__` (log class prior) and
  * `__default__` (the Laplace-smoothed log-probability of an UNSEEN
  * token, applied per missing token at scoring time). One table keeps the
  * YAML/dataset surface trivial (save as parquet, load anywhere).
  *
  * Scale shape: training is three keyed aggregations over the exploded
  * token stream ((label, token) counts, label totals, global vocab size)
  * — vocab-sized results, map-side partials everywhere. Scoring explodes
  * tokens once, broadcast-joins the (vocab × labels)-sized weight table,
  * reduces to one row per (doc, label), and fans the per-doc row out to
  * the label list via an explode of the COLLECTED label set (O(labels)
  * driver state — never a cross join, same convention as the centroid
  * matrix). Argmax is a per-doc max_by struct — no window over a global
  * order. Everything is count+log arithmetic, so the DuckDB oracle
  * replays scores to 6 decimals.
  */
object NaiveBayes {

  val PriorToken = "__prior__"
  val DefaultToken = "__default__"

  private def tokens(df: DataFrame, cols: Seq[String],
      textCol: String): DataFrame =
    df.select(cols.map(col) :+
      explode(filter(split(col(textCol), " "), w => length(w) > 0))
        .as("token"): _*)

  /** Fit the model table from labeled rows. `alpha` is the Laplace
    * smoothing mass. Labels stringify (type-stable across surfaces).
    *
    * The vocab-sized `counts` table is persisted (PersistScope-released),
    * so the corpus is TOKENIZED EXACTLY ONCE: the vocab-count action
    * materializes it, and totals/conds/defaults reuse the cached blocks
    * instead of re-running the explode (the unpersisted lineage ran the
    * tokenization three times). Priors come from one count-only scan of
    * the labeled rows, collected label-sized to the driver (`nDocs` is
    * the sum — no second full-table count). */
  def train(df: DataFrame, labelCol: String, textCol: String,
      alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, s"alpha must be > 0, got $alpha")
    val spark = df.sparkSession
    import spark.implicits._
    val labeled = df.withColumn("_lbl", col(labelCol).cast("string"))
    val tok = tokens(labeled, Seq("_lbl"), textCol)
    val counts = graft.core.PersistScope.register(
      tok.groupBy("_lbl", "token").agg(count(lit(1)).as("cnt")).persist())
    val totals = counts.groupBy("_lbl").agg(sum(col("cnt")).as("total"))
    val vocab = counts.select("token").distinct().count()
    // Label-sized doc counts: O(labels) driver state; nDocs = their sum.
    val labelDocs = labeled.groupBy("_lbl").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toSeq
    val nDocs = labelDocs.map(_._2).sum
    val priors = labelDocs.toDF("label", "n")
      .select(col("label"), lit(PriorToken).as("token"),
        round(log(col("n").cast("double") / nDocs), 9).as("weight"))
    val defaults = totals
      .select(col("_lbl").as("label"), lit(DefaultToken).as("token"),
        round(log(lit(alpha) / (col("total") + lit(alpha * vocab))), 9)
          .as("weight"))
    val conds = counts.join(totals, "_lbl")
      .select(col("_lbl").as("label"), col("token"),
        round(log((col("cnt") + alpha) / (col("total") + lit(alpha * vocab))), 9)
          .as("weight"))
    conds.unionByName(defaults).unionByName(priors)
  }

  /** Per-(doc, label) log-likelihood scores: `prior + Σ matched token
    * weights + (unseen token count) × default`. Output: one row per
    * (id, label) with `nb_score`.
    *
    * The token-weight sum runs over NANO-SCALED INTEGERS (weights are
    * trained rounded to 9 decimals, so ×1e9 is exact): integer addition
    * is order-independent, which makes scores bit-identical across
    * partitionings, re-runs, and engines — a floating sum's last-ulp
    * noise can flip the final rounding on some row of a large corpus. */
  def scores(df: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    def nano(c: Column): Column = round(c * 1e9d).cast("bigint")
    val weights = model.filter(!col("token").isin(PriorToken, DefaultToken))
      .select(col("label"), col("token"), nano(col("weight")).as("_w9"))
    val specials = model.filter(col("token").isin(PriorToken, DefaultToken))
      .groupBy("label")
      .agg(max(when(col("token") === PriorToken, nano(col("weight"))))
        .as("_prior9"),
        max(when(col("token") === DefaultToken, nano(col("weight"))))
          .as("_default9"))
    val labelVals = specials.select("label").collect()
      .map(_.getString(0)).toSeq.sorted
    require(labelVals.nonEmpty, "model has no __prior__/__default__ rows")
    val tok = tokens(df, Seq(idCol), textCol)
    // Token counts come from df itself (not the exploded stream): a
    // null/empty-text row yields ZERO exploded rows, and deriving the id
    // set from the explode would silently drop it from scores/classify —
    // every id must score `prior + n_tok × default` even at n_tok = 0.
    val nTok = df.groupBy(col(idCol)).agg(
      sum(size(filter(split(coalesce(col(textCol), lit("")), " "),
        w => length(w) > 0))).as("_n_tok"))
    val matched = tok
      .join(broadcast(weights), Seq("token"))
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("_w9")).as("_msum9"), count(lit(1)).as("_mcnt"))
    nTok.withColumn("label", explode(typedlit(labelVals)))
      .join(matched, Seq(idCol, "label"), "left")
      .join(broadcast(specials), Seq("label"))
      .select(col(idCol), col("label"),
        round((col("_prior9") + coalesce(col("_msum9"), lit(0L)) +
          (col("_n_tok") - coalesce(col("_mcnt"), lit(0L))) * col("_default9"))
          .cast("double") / 1e9d, 6).as("nb_score"))
  }

  /** Argmax classification: appends `pred_label` + its `nb_score` per id
    * (ties break label-ascending — deterministic). */
  def classify(df: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame =
    scores(df, idCol, textCol, model)
      .groupBy(col(idCol))
      // min_by over (-score, label): highest score wins, ties break to the
      // smallest label — deterministic, no window over a global order
      .agg(min_by(struct(col("label"), col("nb_score")),
        struct((col("nb_score") * -1).as("s"), col("label"))).as("_b"))
      .select(col(idCol), col("_b.label").as("pred_label"),
        col("_b.nb_score").as("nb_score"))
}
