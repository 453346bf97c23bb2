package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Linear text-classifier scoring against an EXTERNAL weights table — the
  * fastText/logistic-regression quality-classifier stand-in every curation
  * pipeline runs (GPT-3's WebText-vs-Common-Crawl filter, CCNet's quality
  * buckets, FineWeb-Edu's educational scorer). The model is a (token,
  * weight) table + bias; the score is `sigmoid(bias + Σ w(tok) · x(tok))`
  * with the standard feature modes:
  *
  *   - `binary`: x = 1 if the token occurs (bag-of-words presence);
  *   - `tf`:     x = the token's occurrence count;
  *   - `mean`:   x = count / doc length (fastText's normalized average).
  *
  * Tokens absent from the weights table contribute 0 — exactly how a
  * hashed/pruned production model treats out-of-vocabulary tokens.
  *
  * Intercept: beyond the `bias` scalar, a weights row with the RESERVED
  * token `__bias__` is served as an intercept — the registry's
  * `train_classifier` exports the trained intercept exactly so, and the
  * declarative train → score chain must not drop it. It is applied
  * in-plan (a synthetic per-doc sentinel row through the same join —
  * x ≡ 1 in every feature mode), never collected; `__bias__` is
  * filtered from document tokens so a document that literally contains
  * the string can never double-count it.
  *
  * Scale shape: one explode → per-(doc, token) count aggregation → weights
  * join (the model table is vocab-sized — Catalyst broadcasts it under the
  * threshold, and AQE converts to broadcast at runtime otherwise) → one
  * per-doc sum. Linear in token count, no driver state at all; scoring a
  * 100 TB corpus is three keyed single-pass stages. Docs with zero
  * in-vocabulary tokens still score (sigmoid of the bias alone) via the
  * final left join.
  */
object LinearScore {

  def apply(
      df: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame, // (token: string, weight: double)
      bias: Double = 0.0,
      mode: String = "binary",
      outCol: String = "quality_score"): DataFrame = {
    require(Set("binary", "tf", "mean").contains(mode),
      s"unknown feature mode '$mode' (binary | tf | mean)")
    require(!df.columns.contains(outCol), s"input already has $outCol")
    val w = weights.toDF("_tok", "_w")
    val toks = df.select(col(idCol),
      explode(split(col(textCol), " ")).as("_tok"),
      size(split(col(textCol), " ")).cast("double").as("_len"))
      .filter(col("_tok") =!= "__bias__")
    val counts = toks
      .groupBy(col(idCol), col("_tok"))
      .agg(count(lit(1)).cast("double").as("_tf"), first(col("_len")).as("_len"))
      // The reserved intercept row: x = 1 in every mode (tf 1, len 1),
      // contributing w(__bias__) per document IFF the model has one.
      .unionByName(df.select(col(idCol), lit("__bias__").as("_tok"),
        lit(1.0).as("_tf"), lit(1.0).as("_len")))
    val x = mode match {
      case "binary" => lit(1.0)
      case "tf"     => col("_tf")
      case "mean"   => col("_tf") / col("_len")
    }
    val dots = counts
      .join(w, Seq("_tok"))
      .groupBy(col(idCol))
      .agg(sum(col("_w") * x).as("_dot"))
    df.select(col(idCol))
      .join(dots, Seq(idCol), "left")
      .select(col(idCol),
        round(lit(1.0) / (lit(1.0) +
          exp(-(coalesce(col("_dot"), lit(0.0)) + lit(bias)))), 6).as(outCol))
  }

  /** Pipeline-composable shape: appends `outCol` to the input rows. */
  def withScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame,
      bias: Double = 0.0,
      mode: String = "binary",
      outCol: String = "quality_score"): DataFrame =
    df.join(apply(df, idCol, textCol, weights, bias, mode, outCol), Seq(idCol))
}
