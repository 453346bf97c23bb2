package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Logistic-regression text-classifier TRAINING — the stronger sibling
  * of [[NaiveBayes]] in the train-your-own-quality-filter loop
  * (GPT-3's WebText-vs-CommonCrawl filter and FineWeb-Edu's educational
  * scorer are exactly this model class). Trains with Spark MLlib
  * (in-distribution: the ml jars ship with Spark — L-BFGS over
  * treeAggregate gradients, the canonical distributed fit) but EXPORTS
  * a plain (token, weight) table + bias: inference then runs through
  * the existing pure-aggregation [[LinearScore]] — no MLlib, no vector
  * types, no model objects at serving time, and the weights table is
  * engine-portable like the NaiveBayes model.
  *
  * Features are binary bag-of-words over whitespace tokens — chosen to
  * MATCH `LinearScore(mode = "binary")` exactly, so
  * sigmoid(bias + Σ w·x) at inference reproduces the trained model's
  * probability. Vocabulary comes from CountVectorizer (top `vocabSize`
  * by document frequency), so the export is vocabulary-sized — model
  * state, never corpus state.
  */
object TextClassifier {

  final case class Model(weights: DataFrame, bias: Double)

  /** Fit on (labelCol ∈ {0, 1}, textCol); returns the portable model.
    * `regParam` is L2 (0 = none), `maxIter` caps L-BFGS. */
  def train(df: DataFrame, labelCol: String, textCol: String,
      vocabSize: Int = 65536, maxIter: Int = 50,
      regParam: Double = 0.0): Model = {
    import org.apache.spark.ml.feature.CountVectorizer
    import org.apache.spark.ml.classification.LogisticRegression
    // "__bias__" is the RESERVED intercept token of the exported model
    // (registry train_classifier appends it; LinearScore serves it) —
    // exclude it from the vocabulary so the export is never ambiguous.
    val prepped = df.select(col(labelCol).cast("double").as("label"),
      filter(split(coalesce(col(textCol), lit("")), " "),
        t => length(t) > 0 && t =!= "__bias__").as("_toks"))
    val cv = new CountVectorizer()
      .setInputCol("_toks").setOutputCol("features")
      .setVocabSize(vocabSize).setBinary(true)
    val cvModel = cv.fit(prepped)
    val featured = cvModel.transform(prepped)
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setStandardization(false) // raw weights — they must transfer as-is
    val m = lr.fit(featured)
    val spark = df.sparkSession
    import spark.implicits._
    val rows = cvModel.vocabulary.toIndexedSeq
      .zip(m.coefficients.toArray.toIndexedSeq)
    Model(rows.toDF("token", "weight"), m.intercept)
  }
}
