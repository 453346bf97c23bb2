package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skip-gram training-pair export with negative sampling — the
  * (center, context, label) rows an EXTERNAL embedding trainer consumes
  * (word2vec SGNS, Mikolov et al. 2013: positives from a ±window, k
  * negatives per positive drawn ∝ count^0.75). [[EmbedTrain]] trains
  * in-engine; this op EXPORTS the training set itself — the remaining
  * member of the embedding family, and a template for any
  * contrastive-pair prep.
  *
  * Determinism: a negative sample is a pure function of
  * (id, position, offset, sample-index, seed) — an md5 hash lands in
  * the unigram^α cumulative-weight table — so every row replays across
  * partitionings, retries, and engines (the DuckDB oracle reproduces
  * the exact sampled tokens; the [[Fim]]/[[SpanCorrupt]] discipline).
  *
  * Scale shape: positives are row-local position × offset explodes
  * (the [[Cooccur]] slot shape — element_at into the row's own array,
  * never a self-join); the sampling table is VOCABULARY-sized driver
  * state broadcast once (the [[VocabCoverage.toIds]] bound), probed by
  * a binary-search UDF. Output = slots × (1+k), the true training-set
  * size.
  */
object SkipGram {

  private def tokens(c: Column): Column =
    graft.functions.TextFunctions.alnumTokens(c)

  /** (id, pos, off, j, center, context, label): j = 0 is the positive
    * (context from the text), j in 1..negatives are sampled negatives
    * (label 0). `alpha` smooths the unigram distribution (0.75 is the
    * published default); weights floor to >= 1 so every vocab token is
    * sampleable. */
  def pairs(df: DataFrame, idCol: String, textCol: String,
      window: Int = 2, negatives: Int = 2, seed: Long = 0L,
      alpha: Double = 0.75): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(negatives >= 0, s"negatives must be >= 0, got $negatives")
    val toks = graft.core.PersistScope.register(
      df.select(col(idCol).as("_id"), tokens(col(textCol)).as("_toks"))
        .filter(size(col("_toks")) >= 2).persist())
    // Unigram^alpha sampling table: vocabulary-sized driver state,
    // deterministic (token asc) cumulative ranges.
    val weights = toks.select(explode(col("_toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .select(col("tok"),
        greatest(floor(pow(col("cnt").cast("double"), alpha)), lit(1.0))
          .cast("long").as("w"))
      .orderBy("tok").collect()
    val vocab = weights.map(_.getString(0))
    val cumLo = new Array[Long](vocab.length)
    var acc = 0L
    weights.zipWithIndex.foreach { case (r, i) =>
      cumLo(i) = acc; acc += r.getLong(1)
    }
    val total = acc
    require(total > 0, "skipgram: empty corpus")
    val sc = df.sparkSession.sparkContext
    val vocabB = sc.broadcast(vocab)
    val cumB = sc.broadcast(cumLo)
    val pick = udf((h: Long) => {
      val lo = cumB.value
      var a = 0; var b = lo.length - 1
      while (a < b) { // last index with lo(i) <= h
        val m = (a + b + 1) >>> 1
        if (lo(m) <= h) a = m else b = m - 1
      }
      vocabB.value(a)
    })

    val slots = toks
      .select(col("_id"), col("_toks"),
        posexplode(col("_toks")).as(Seq("_p", "center")))
      .select(col("_id"), col("_toks"), col("_p"), col("center"),
        explode(filter(
          sequence(lit(-window), lit(window)), o => o =!= 0)).as("off"))
      .filter(col("_p") + col("off") >= 0 &&
        col("_p") + col("off") < size(col("_toks")))
      .select(col("_id").as("id"), col("_p").cast("bigint").as("pos"),
        col("off").cast("bigint").as("off"), col("center"),
        element_at(col("_toks"), (col("_p") + col("off") + 1).cast("int"))
          .as("_ctx"))
    val positives = slots.select(col("id"), col("pos"), col("off"),
      lit(0L).as("j"), col("center"), col("_ctx").as("context"),
      lit(1L).as("label"))
    if (negatives == 0) positives
    else {
      val h = pmod(
        conv(substring(md5(concat_ws(":", col("id"), col("pos"),
          col("off"), col("j"), lit(seed))), 1, 15), 16, 10)
          .cast("bigint"), lit(total))
      val negs = slots
        .select(col("id"), col("pos"), col("off"), col("center"),
          explode(sequence(lit(1L), lit(negatives.toLong))).as("j"))
        .withColumn("context", pick(h))
        .select(col("id"), col("pos"), col("off"), col("j"),
          col("center"), col("context"), lit(0L).as("label"))
      positives.unionByName(negs)
    }
  }
}
