package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-language-model quality scoring: per-document average token
  * surprisal -ln p(token) under the corpus's own unigram distribution —
  * the CCNet-style "LM perplexity" filter with a unigram model standing in
  * for KenLM in this offline container. The seam is identical either way: a
  * (token, log-prob) table joined to the exploded corpus; swapping in an
  * externally-trained model is a different left side of the same join.
  * Low-surprisal docs are repetitive boilerplate; high-surprisal docs are
  * noise/garble — both ends are the usual pretraining-filter targets.
  *
  * Scale shape: one explode → vocabulary count aggregation (vocab-sized,
  * broadcast-able) → token join → per-doc average. The only driver value is
  * the total token count, which is exact in both engines (a sum of integer
  * counts). Everything else is keyed aggregation — linear in token count.
  */
object UnigramScore {

  /** (idCol, nll): average -ln p(w) over the doc's tokens, rounded to 6dp. */
  def perDoc(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(split(col(textCol), " ")).as("_t"))
    val freq = toks.groupBy(col("_t")).agg(count(lit(1)).cast("double").as("_c"))
    val total = freq.agg(sum("_c")).collect()(0).getDouble(0)
    toks.join(freq, Seq("_t"))
      .groupBy(col(idCol))
      .agg(round(avg(-log(col("_c") / total)), 6).as("nll"))
  }

  /** The input rows with `nll` attached (passthrough join on `idCol`). */
  def apply(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.join(perDoc(df, idCol, textCol), Seq(idCol))
}
