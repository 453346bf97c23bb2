package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus drift: Jensen-Shannon divergence between the unigram
  * distributions of two corpora — the "did this month's crawl shift under
  * us" check curation pipelines run between corpus versions (and the
  * gate for retraining quality classifiers fit on the old distribution).
  *
  * Both distributions are Laplace-smoothed over the JOINT vocabulary, so
  * each sums to exactly 1 and the divergence is finite even on disjoint
  * vocabularies; JSD is symmetric and bounded by ln 2. Output is one row:
  * `js_divergence` (6 dp), plus the vocab/token scalars the number was
  * computed from.
  *
  * Scale shape: two token-count aggregations (vocab-sized) full-outer
  * joined into one vocab frame; the three global scalars (token totals +
  * vocab size) come to the driver as ONE row (the importance-weight
  * convention — never a cross join); the contribution sum is one more
  * aggregation. Linear in token count, O(1) driver state.
  */
object CorpusDrift {

  def jensenShannon(
      a: DataFrame, textColA: String,
      b: DataFrame, textColB: String): DataFrame = {
    val ca = a.select(explode(split(col(textColA), " ")).as("_tok"))
      .groupBy("_tok").agg(count(lit(1)).cast("double").as("_ca"))
    val cb = b.select(explode(split(col(textColB), " ")).as("_tok"))
      .groupBy("_tok").agg(count(lit(1)).cast("double").as("_cb"))
    val vocab = ca.join(cb, Seq("_tok"), "full_outer")
      .select(
        coalesce(col("_ca"), lit(0.0)).as("_ca"),
        coalesce(col("_cb"), lit(0.0)).as("_cb"))
      .persist()
    graft.core.PersistScope.register(vocab)
    val s = vocab.agg(
      sum("_ca").as("na"), sum("_cb").as("nb"), count(lit(1)).as("v"))
      .collect()(0)
    val na = s.getDouble(0); val nb = s.getDouble(1); val v = s.getLong(2).toDouble
    val p = (col("_ca") + 1.0) / (na + v)
    val q = (col("_cb") + 1.0) / (nb + v)
    val m = (p + q) / 2.0
    vocab.agg(
      round(sum(p * log(p / m) * 0.5 + q * log(q / m) * 0.5), 6)
        .as("js_divergence"))
      .withColumn("vocab_size", lit(s.getLong(2)))
      .withColumn("tokens_a", lit(na.toLong))
      .withColumn("tokens_b", lit(nb.toLong))
  }
}
