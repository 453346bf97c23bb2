package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group corpus report — the token/length distribution summary every
  * curation pipeline prints before and after each filter stage (docs per
  * domain, total tokens, and length quantiles; the numbers mixture
  * weights and packing budgets are derived from).
  *
  * Quantiles use Spark's EXACT `percentile` aggregate (linear
  * interpolation at rank (n-1)·q — the same definition as DuckDB/Postgres
  * `quantile_cont`/`percentile_cont`, so an external oracle agrees to the
  * rounding digit). Exact percentile holds a per-group value histogram:
  * bounded here because token counts are small integers with a bounded
  * domain, NOT corpus-sized — for unbounded-domain metrics swap in
  * `percentile_approx`, which trades exactness for a fixed-size sketch.
  * Everything is ONE keyed aggregation — no shuffle beyond the groupBy,
  * no driver state.
  */
object CorpusStats {

  def apply(
      df: DataFrame,
      groupCols: Seq[String],
      tokenExpr: String,
      quantiles: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall(q => q > 0 && q < 1),
      s"quantiles must lie in (0, 1), got ${quantiles.mkString(",")}")
    val tok = s"cast($tokenExpr as double)"
    val qCols: Seq[Column] = quantiles.map { q =>
      round(expr(s"percentile($tok, $q)"), 4).as(label(q))
    }
    val aggs = Seq(
      count(lit(1)).as("n_docs"),
      expr(s"cast(sum($tok) as bigint)").as("total_tokens"),
      round(expr(s"avg($tok)"), 4).as("mean_tokens")) ++ qCols
    if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** 0.5 -> p50, 0.999 -> p99_9 — stable, SQL-identifier-safe names. */
  def label(q: Double): String =
    "p" + BigDecimal(q * 100).underlying.stripTrailingZeros.toPlainString
      .replace(".", "_")
}
