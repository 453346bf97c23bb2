package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hard-negative mining for retrieval / embedding training data — the
  * public DPR recipe (Karpukhin et al. 2020 §4.2: "top passages
  * returned by BM25 which don't contain the answer"), also the
  * sentence-transformers / Contriever fine-tuning prep: for every
  * (query, known-positive) pair, the strongest-scoring corpus
  * documents that are NOT positives become the contrastive negatives.
  * The reference has no training-pair story — §2.14 engine extension,
  * closing the loop the retrievers open: [[RetrieverOp]] serves
  * queries, this MINES the data that trains the model behind them.
  *
  * Scale shape: the corpus pays one tokenize+postings pass (the
  * inverted index every BM25 op here builds — optional
  * `maxPostingSize` stopword pruning caps hot terms); query terms join
  * the postings keyed by term (never query × corpus); scoring is one
  * (query, doc)-keyed aggregation; positives leave via a keyed
  * anti-join; and the per-query top-n is `row_number() <= n` over a
  * query-partitioned window, which plans as WindowGroupLimit —
  * map-side pruning before the rank shuffle. Driver state = two
  * corpus scalars (N, avgdl). Same Robertson/Lucene BM25 variant as
  * [[RetrieverOp.byBm25]]/q17 (idf = ln((N−df+0.5)/(df+0.5)+1)).
  */
object HardNegatives {

  /** Mine `negPerQuery` hard negatives per query: (qid, neg_id,
    * neg_rank, neg_score). `positives` rows (qid, doc) are excluded
    * from the candidates — multiple positives per query are fine.
    * Only documents sharing at least one term with the query are
    * candidates (a zero-overlap document scores 0 and is not a HARD
    * negative by definition). Ties break on neg_id ascending. */
  def mine(queries: DataFrame, qidCol: String, qtextCol: String,
      positives: DataFrame, pQidCol: String, pDocCol: String,
      corpus: DataFrame, docIdCol: String, textCol: String,
      negPerQuery: Int = 5, k1: Double = 1.2, b: Double = 0.75,
      maxPostingSize: Option[Int] = None): DataFrame = {
    require(negPerQuery >= 1 && negPerQuery <= 1000,
      s"negPerQuery must be in [1, 1000], got $negPerQuery")
    val c = corpus.select(col(docIdCol).as("_did"),
      split(col(textCol), " ").as("_toks"))
    // two driver doubles: corpus size and average doc length
    val statsRow = c.agg(count(lit(1)).cast("double"),
      avg(size(col("_toks")).cast("double"))).head()
    val n = statsRow.getDouble(0)
    val avgdl = statsRow.getDouble(1)
    val postings = c
      .select(col("_did"), size(col("_toks")).cast("double").as("_dl"),
        explode(col("_toks")).as("_term"))
      .filter(col("_term") =!= "")
      .groupBy("_term", "_did", "_dl")
      .agg(count(lit(1)).cast("double").as("_tf"))
    // Per-term posting counts from a map-side-combinable keyed agg —
    // NEVER a Window over `_term`: the hot stopword keys a posting cap
    // exists to prune are exactly the skewed partitions such a window
    // would materialize. The cap is instead a filter on this (vocab-
    // sized) table; joining it FIRST below prunes capped terms before
    // any query term touches their postings. Surviving terms keep
    // their full count (count <= cap), so idf values are unchanged.
    val docfreq0 = postings.groupBy("_term")
      .agg(count(lit(1)).cast("double").as("_df"))
    val docfreq = maxPostingSize.fold(docfreq0)(cap =>
      docfreq0.filter(col("_df") <= cap))
    val qterms = queries
      .select(col(qidCol).as("_qid"),
        explode(array_distinct(split(col(qtextCol), " "))).as("_term"))
      .filter(col("_term") =!= "")
    val contrib = qterms
      .join(docfreq, Seq("_term"))
      .join(postings, Seq("_term"))
      .withColumn("_c", RetrieverOp.bm25Contribution(col("_tf"),
        col("_df"), col("_dl"), n, avgdl, k1, b))
    val scored = contrib.groupBy(col("_qid"), col("_did"))
      .agg(sum(col("_c")).as("_score"))
    val nonPos = scored.join(
      positives.select(col(pQidCol).as("_qid"), col(pDocCol).as("_did")),
      Seq("_qid", "_did"), "left_anti")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_qid"))
      .orderBy(col("_score").desc, col("_did"))
    nonPos.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= negPerQuery)
      .select(col("_qid").as("qid"), col("_did").as("neg_id"),
        col("_rk").cast("bigint").as("neg_rank"),
        round(col("_score"), 5).as("neg_score"))
  }
}
