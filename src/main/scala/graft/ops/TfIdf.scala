package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document top-k terms by TF-IDF (tf = raw in-doc term count, idf =
  * ln(N / df)) — the classic corpus-level keyword/feature extractor for
  * training-data analytics (complements the per-row signals in
  * [[graft.functions.TextFunctions]]).
  *
  * Scale shape: explode to (doc, term) → two keyed aggregations (term
  * frequency per doc, document frequency per term) → one keyed join on the
  * term → per-doc top-k window. Everything is linear in token count; the
  * only driver value is the corpus row count. The rank filter is a plain
  * row_number window on purpose — Catalyst's InferWindowGroupLimit turns it
  * into a partial map-side top-k before the exchange, so the shuffle
  * carries k·docs rows, not every (doc, term) pair. Ranking uses the
  * ROUNDED score (6 dp) with the term as tie-break, making the result
  * deterministic and engine-portable (sub-1e-6 float noise cannot reorder).
  */
object TfIdfOp {

  def topTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val nDocs = df.count().toDouble // one scalar to the driver
    val tf = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("_t"))
      .groupBy(col(idCol), col("_t"))
      .agg(count(lit(1)).cast("double").as("_tf"))
    val dfreq = tf.groupBy(col("_t"))
      .agg(count(lit(1)).cast("double").as("_df"))
    val scored = tf.join(dfreq, Seq("_t"))
      .withColumn("tfidf", round(col("_tf") * log(lit(nDocs) / col("_df")), 6))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("_t").asc)
    scored
      .withColumn("term_rank", row_number().over(w).cast("long"))
      .filter(col("term_rank") <= k)
      .select(col(idCol), col("_t").as("term"), col("tfidf"), col("term_rank"))
  }
}
