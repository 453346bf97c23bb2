package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key quota selection — keep the top `n` rows of every key by a
  * quality order: the per-domain cap every crawl-curation pipeline applies
  * so that no single host dominates the corpus (the public C4/RefinedWeb
  * recipes cap per-domain page counts exactly this way). The key is
  * usually a registered domain ([[UrlOps]]) or a source slice; the order
  * is usually a quality score ([[LinearScore]], surprisal, length).
  *
  * Complements [[BudgetSelect.grouped]] (per-group TOKEN budgets — spend
  * semantics) and stratified sampling (RANDOM per-group picks): quota is
  * the deterministic best-N-by-rank form.
  *
  * Scale shape: one keyed shuffle. The `row_number <= n` filter is the
  * shape Spark's WindowGroupLimit optimization recognizes (3.5+): each map
  * task keeps only its partial top-n per key BEFORE the shuffle, so a
  * skewed key (one host with 10^8 pages) ships `n × #maps` rows, not its
  * full posting. Ties break on `tieBreak` ascending — deterministic,
  * oracle-replayable.
  */
object QuotaSelect {

  /** Keep at most `n` rows per `keyCol`, best-first by `orderExpr`
    * (descending when `desc`), ties broken by `tieBreak` ascending. */
  def apply(df: DataFrame, keyCol: String, n: Int, orderExpr: String,
      desc: Boolean = true, tieBreak: String = ""): DataFrame = {
    require(n >= 1, s"quota must be >= 1, got $n")
    val ord = if (desc) expr(orderExpr).desc else expr(orderExpr).asc
    val ords = if (tieBreak.nonEmpty) Seq(ord, expr(tieBreak).asc) else Seq(ord)
    val w = Window.partitionBy(col(keyCol)).orderBy(ords: _*)
    df.withColumn("_graft_qrank", row_number().over(w))
      .filter(col("_graft_qrank") <= n)
      .drop("_graft_qrank")
  }
}
