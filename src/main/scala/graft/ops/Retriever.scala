package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{CosineSimilarity, VectorFunctions}

/** RAG context injection (reference `retriever` on any op, base.py:212-233 +
  * docetl/retrievers/lancedb.py): for each input row, the top-k most relevant
  * corpus rows are rendered and attached under `_{name}_retrieved_context`,
  * which prompts can then reference with `{{ input._name_retrieved_context }}`.
  *
  * Spark-first shapes (no external index service):
  *   - `byEmbedding`: input and corpus both carry embedding columns; the
  *     corpus is broadcast (an index is small relative to the data being
  *     processed), scored with the native cosine expression, top-k per row
  *     via a window.
  *   - `byTermOverlap`: lexical retrieval — score = |query tokens ∩ doc
  *     tokens|, the degenerate-but-cheap BM25 cousin that needs no corpus
  *     statistics at plan time.
  *
  * Both are a broadcast join + window — linear in the input, never a
  * collect of the input side.
  */
object RetrieverOp {

  def byEmbedding(
      df: DataFrame,
      name: String,
      queryEmbCol: String,
      corpus: DataFrame,
      corpusEmbCol: String,
      corpusRenderExpr: String,
      k: Int = 3): DataFrame = {
    val outKey = s"_${name}_retrieved_context"
    val rowId = s"_graft_rid_$name"
    val withId = df.withColumn(rowId, monotonically_increasing_id())
    val c = corpus.select(
      col(corpusEmbCol).as("_ce"),
      expr(corpusRenderExpr).cast("string").as("_ctext"))
    val scored = graft.core.Joins.boundedCrossBroadcast(withId, c, col(rowId), col("_ctext"))
      .withColumn("_score", CosineSimilarity(col(queryEmbCol), col("_ce")))
    attachTopK(withId, scored, rowId, outKey, k)
  }

  def byTermOverlap(
      df: DataFrame,
      name: String,
      queryTextCol: String,
      corpus: DataFrame,
      corpusTextCol: String,
      corpusRenderExpr: String,
      k: Int = 3): DataFrame = {
    val outKey = s"_${name}_retrieved_context"
    val rowId = s"_graft_rid_$name"
    val withId = df.withColumn(rowId, monotonically_increasing_id())
    val c = corpus.select(
      split(col(corpusTextCol), " ").as("_ctoks"),
      expr(corpusRenderExpr).cast("string").as("_ctext"))
    val scored = graft.core.Joins.boundedCrossBroadcast(withId, c, col(rowId), col("_ctext"))
      .withColumn("_score",
        size(array_intersect(split(col(queryTextCol), " "), col("_ctoks"))).cast("double"))
    attachTopK(withId, scored, rowId, outKey, k)
  }

  /** Hybrid retrieval (reference lancedb.py hybrid mode): convex blend of
    * the cosine score and a min-max-normalized term-overlap score. One
    * broadcast join computes both scores; weights sum to 1. */
  def byHybrid(
      df: DataFrame,
      name: String,
      queryEmbCol: String,
      queryTextCol: String,
      corpus: DataFrame,
      corpusEmbCol: String,
      corpusTextCol: String,
      corpusRenderExpr: String,
      k: Int = 3,
      vectorWeight: Double = 0.5): DataFrame = {
    require(vectorWeight >= 0 && vectorWeight <= 1, "vectorWeight in [0,1]")
    val outKey = s"_${name}_retrieved_context"
    val rowId = s"_graft_rid_$name"
    val withId = df.withColumn(rowId, monotonically_increasing_id())
    val c = corpus.select(
      col(corpusEmbCol).as("_ce"),
      split(col(corpusTextCol), " ").as("_ctoks"),
      expr(corpusRenderExpr).cast("string").as("_ctext"))
    val qToks = split(col(queryTextCol), " ")
    val overlap = size(array_intersect(qToks, col("_ctoks"))).cast("double")
    val scored = graft.core.Joins.boundedCrossBroadcast(withId, c, col(rowId), col("_ctext"))
      .withColumn("_score",
        lit(vectorWeight) * CosineSimilarity(col(queryEmbCol), col("_ce")) +
          lit(1 - vectorWeight) * overlap / greatest(size(qToks).cast("double"), lit(1.0)))
    attachTopK(withId, scored, rowId, outKey, k)
  }

  private def attachTopK(
      base: DataFrame, scored: DataFrame, rowId: String,
      outKey: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(rowId))
      .orderBy(col("_score").desc, col("_ctext").asc)
    val topk = scored
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .groupBy(col(rowId))
      .agg(concat_ws("\n---\n",
        sort_array(collect_list(struct(col("_rn"), col("_ctext"))))
          .getField("_ctext")).as(outKey))
    base.join(topk, Seq(rowId), "left").drop(rowId)
  }
}
