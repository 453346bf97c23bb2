package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenizer-vocabulary coverage — "how much of this corpus does my vocab
  * actually cover?": per-document OOV rates and the corpus's top
  * out-of-vocabulary tokens. The acceptance check run after inducing a
  * vocabulary ([[BpeTrain]]) or before committing to an external
  * tokenizer; publicly standard tokenizer-eval practice (fertility/OOV
  * audits). The vocab enters as a TABLE (same external-model seam as the
  * unigram-LM and linear-score ops), so any tokenizer's word list drops
  * in unchanged.
  *
  * Scale shape: one token explode (narrow) + a BROADCAST left join of the
  * vocab (model-sized, ≤ a few hundred k rows) + one id-keyed agg with
  * map-side partials; `topOovTokens` is one (token) keyed agg + sort-limit
  * (per-partition top-k, k-row driver merge). No vocab-sized shuffle of
  * corpus data anywhere.
  */
object VocabCoverage {

  private def tokens(df: DataFrame, idCols: Seq[String],
      textCol: String): DataFrame =
    df.select(idCols.map(col) :+
      explode(filter(split(col(textCol), " "), w => length(w) > 0))
        .as("_tok"): _*)

  /** Per-document coverage: (id, n_tokens, n_oov, oov_rate). */
  def oovReport(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    require(vocab.columns.length == 1,
      s"vocab must have exactly one column, got ${vocab.columns.toSeq}")
    val v = broadcast(
      vocab.select(col(vocab.columns.head).as("_tok")).distinct()
        .withColumn("_in_vocab", lit(1)))
    tokens(df, Seq(idCol), textCol)
      .join(v, Seq("_tok"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 6))
  }

  /** The corpus's `k` most frequent out-of-vocabulary tokens — the list
    * that drives vocab extension. Deterministic order (count desc, token
    * asc). */
  def topOovTokens(df: DataFrame, textCol: String, vocab: DataFrame,
      k: Int = 100): DataFrame = {
    require(vocab.columns.length == 1,
      s"vocab must have exactly one column, got ${vocab.columns.toSeq}")
    val v = broadcast(
      vocab.select(col(vocab.columns.head).as("_tok")).distinct()
        .withColumn("_in_vocab", lit(1)))
    tokens(df, Seq.empty, textCol)
      .join(v, Seq("_tok"), "left")
      .filter(col("_in_vocab").isNull)
      .groupBy(col("_tok").as("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)
  }
}
