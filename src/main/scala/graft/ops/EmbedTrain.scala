package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Word-embedding TRAINING (skip-gram Word2Vec, Mikolov et al. 2013) —
  * the in-engine source of the embedding column every vector operator
  * downstream consumes ([[graft.ann.Ann]], [[graft.dedup.SemDedup]],
  * [[graft.dedup.EmbeddingDedup]], retriever vector arms): train on the
  * corpus itself instead of importing vectors. Training uses Spark
  * MLlib's distributed Word2Vec (ships with Spark); like
  * [[TextClassifier]], the EXPORT is a plain (token, vector) table —
  * serving and pooling never touch MLlib types.
  *
  * Scale shape: training is MLlib's partition-parallel skip-gram.
  * Mean pooling is explode → vocab-sized vector join → ONE
  * (id, dim)-keyed average + one id-keyed re-assembly — fan-out is
  * tokens × dim, the true compute size of mean pooling, all keyed
  * shuffles (never per-doc vector collections in one buffer).
  */
object EmbedTrain {

  /** Train Word2Vec on whitespace tokens; returns the (token,
    * vector: array<double>) table. `minCount` drops rare tokens. */
  def word2vec(df: DataFrame, textCol: String, dim: Int = 64,
      minCount: Int = 2, maxIter: Int = 1, seed: Long = 42L,
      windowSize: Int = 5): DataFrame = {
    import org.apache.spark.ml.feature.Word2Vec
    val prepped = df.select(
      filter(split(coalesce(col(textCol), lit("")), " "),
        t => length(t) > 0).as("_toks"))
    val w2v = new Word2Vec()
      .setInputCol("_toks").setOutputCol("_vec")
      .setVectorSize(dim).setMinCount(minCount)
      .setMaxIter(maxIter).setSeed(seed).setWindowSize(windowSize)
    val model = w2v.fit(prepped)
    model.getVectors.select(col("word").as("token"),
      org.apache.spark.ml.functions.vector_to_array(col("vector"))
        .cast("array<double>").as("vector"))
  }

  /** Mean-pooled document vectors from a (token, vector) table:
    * (idCols..., embedding: array<double>, n_tokens). Documents whose
    * tokens are all out-of-vocabulary are absent (no vector exists —
    * emit-and-coalesce upstream if zero vectors are wanted). */
  def docVectors(df: DataFrame, idCol: String, textCol: String,
      vectors: DataFrame): DataFrame = {
    val toks = df.select(col(idCol),
      explode(filter(split(coalesce(col(textCol), lit("")), " "),
        t => length(t) > 0)).as("token"))
    val dims = toks.join(vectors, "token")
      .select(col(idCol), posexplode(col("vector")).as(Seq("_d", "_v")))
    dims.groupBy(col(idCol), col("_d"))
      .agg(avg(col("_v")).as("_m"), count(lit(1)).as("_n"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("_d"), col("_m"))))
        .as("_pairs"), first(col("_n")).as("n_tokens"))
      .select(col(idCol),
        transform(col("_pairs"), p => p.getField("_m")).as("embedding"),
        col("n_tokens"))
  }
}
