package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation — the metrics loop that closes the
  * retriever/ANN cycle ([[Retriever]], [[graft.ann.Ann]]) the way
  * [[ClassifierEval]] closes the classifier one: per-query
  * precision@k / recall@k / hit@k / reciprocal rank / nDCG@k over a
  * (query, candidate, score, relevance) table, plus a macro-averaged
  * corpus summary. Publicly standard IR evaluation (Järvelin &
  * Kekäläinen 2002 for DCG with the 2^rel − 1 gain; MRR as in TREC).
  *
  * Scale shape: candidate ranks come from QUERY-PARTITIONED windows
  * (state bounded by one query's result list — the natural unit; never
  * an unpartitioned sort), then ONE query-keyed aggregation. DCG terms
  * are rounded to integer micro-units per row BEFORE summing, so every
  * per-query metric is a ratio of exact BIGINT sums — order-independent
  * and replayable cross-engine — per the repo invariant that float sums
  * over shuffled groups are banned from gates. The summary macro-average
  * is one more aggregation of the same integer-scaled values.
  */
object RankingEval {

  /** Per-query metrics at cutoff `k`. Input rows are retrieval
    * candidates: `qidCol` the query id, `scoreCol` the retrieval score
    * (higher = better, ties broken by `tieCol` asc for determinism),
    * `relCol` a graded relevance (0 = irrelevant; binary corpora use
    * 0/1). Emits (qid, n_results, n_rel, hits, precision_k, recall_k,
    * hit_k, rr, ndcg_k):
    *  - precision@k = relevant-in-top-k / k (fixed k denominator)
    *  - recall@k    = relevant-in-top-k / n_rel (null when n_rel = 0)
    *  - hit@k       = 1 when any relevant doc ranks <= k
    *  - rr          = 1 / rank of the first relevant candidate (0 when
    *                  the query retrieves none — the TREC convention)
    *  - ndcg@k      = DCG@k / IDCG@k with gain 2^rel − 1 and log2(rank+1)
    *                  discount (null when the query has no relevance
    *                  mass). Both sides accumulate as micro-unit BIGINTs.
    */
  def perQuery(df: DataFrame, qidCol: String, scoreCol: String,
      relCol: String, k: Int, tieCol: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val byScore = Window.partitionBy(col(qidCol))
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    val byRel = Window.partitionBy(col(qidCol))
      .orderBy(col(relCol).desc, col(tieCol).asc)
    val rel = col(relCol).cast("long")
    // Gain/discount terms are deterministic per (rel, rank) pair; the
    // ×1e6 rounding fixes them to integers so their sums are exact.
    def dcgTerm(rank: org.apache.spark.sql.Column) =
      when(rank <= k,
        round((pow(lit(2.0), col("_rel").cast("double")) - 1.0) /
          log2(rank.cast("double") + 1.0) * 1e6).cast("bigint"))
        .otherwise(0L)
    val ranked = df.select(col(qidCol).as("qid"), rel.as("_rel"),
      row_number().over(byScore).as("_rank"),
      row_number().over(byRel).as("_irank"))
    val aggd = ranked
      .withColumn("_dcg", dcgTerm(col("_rank")))
      .withColumn("_idcg", dcgTerm(col("_irank")))
      .groupBy("qid")
      .agg(count(lit(1)).as("n_results"),
        sum(when(col("_rel") > 0, 1L).otherwise(0L)).as("n_rel"),
        sum(when(col("_rank") <= k && col("_rel") > 0, 1L).otherwise(0L))
          .as("hits"),
        min(when(col("_rel") > 0, col("_rank"))).as("_first_rel"),
        sum(col("_dcg")).as("_dcg"),
        sum(col("_idcg")).as("_idcg"))
    aggd.select(col("qid"), col("n_results"), col("n_rel"), col("hits"),
      round(col("hits").cast("double") / k, 6).as("precision_k"),
      when(col("n_rel") > 0,
        round(col("hits").cast("double") / col("n_rel"), 6)).as("recall_k"),
      when(col("hits") > 0, 1L).otherwise(0L).as("hit_k"),
      coalesce(round(lit(1.0) / col("_first_rel"), 6), lit(0.0)).as("rr"),
      when(col("_idcg") > 0,
        round(col("_dcg").cast("double") / col("_idcg"), 6)).as("ndcg_k"))
  }

  /** Macro-averaged corpus summary of a [[perQuery]] frame: one row —
    * n_queries, mean precision/recall/hit-rate/MRR/nDCG. Queries with
    * null recall/ndcg (no relevant docs) are excluded from those two
    * means only, per standard practice. Metrics re-scale to micro-unit
    * BIGINTs before the sum so the average is order-independent. */
  def summary(perQueryDf: DataFrame): DataFrame = {
    def micro(c: String) = round(col(c) * 1e6).cast("bigint")
    perQueryDf.agg(
      count(lit(1)).as("n_queries"),
      round(sum(micro("precision_k")).cast("double") /
        (count(lit(1)) * 1e6), 6).as("mean_precision_k"),
      round(sum(micro("recall_k")).cast("double") /
        (count(col("recall_k")) * 1e6), 6).as("mean_recall_k"),
      round(sum(col("hit_k")).cast("double") / count(lit(1)), 6)
        .as("hit_rate_k"),
      round(sum(micro("rr")).cast("double") / (count(lit(1)) * 1e6), 6)
        .as("mrr"),
      round(sum(micro("ndcg_k")).cast("double") /
        (count(col("ndcg_k")) * 1e6), 6).as("mean_ndcg_k"))
  }
}
