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

  /** Vocabulary distribution report — the Zipf/heaps-style numbers a
    * corpus datacard quotes (publicly standard: Zipf 1949; the hapax
    * share is the classic OCR-noise / boilerplate-contamination
    * signal): ONE row with token/type totals, hapax (frequency-1) type
    * count and share, the top token's probability mass, and the OLS
    * slope of ln(freq) vs ln(rank) over the top `topK` types (clean
    * natural-language corpora sit near −1; noise pushes it shallow).
    *
    * Scale shape: one corpus-sized token count (the same shuffle every
    * vocabulary op pays), then integer totals plus a top-K collect
    * (rank ties broken token-ascending, so the table — and the slope —
    * is deterministic). The OLS runs on the DRIVER over the sorted
    * top-K rows: K is bounded config, and a fixed summation order
    * makes the slope bit-stable where a distributed float sum is not. */
  def zipfReport(df: DataFrame, textCol: String,
      topK: Int = 100): DataFrame = {
    require(topK >= 2 && topK <= 10000,
      s"topK must be in [2, 10000], got $topK")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = graft.core.PersistScope.register(
      df.select(explode(filter(split(lower(coalesce(col(textCol),
        lit(""))), "[^a-z0-9]+"), t => length(t) > 0)).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
        .persist())
    val tot = counts.agg(
      coalesce(sum(col("c")), lit(0L)).as("n"),
      count(lit(1)).as("types"),
      coalesce(sum(when(col("c") === 1, 1L).otherwise(0L)), lit(0L))
        .as("hapax")).head()
    val (nTokens, nTypes, hapax) =
      (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    val top = counts.orderBy(col("c").desc, col("tok"))
      .limit(topK).select("c").collect().map(_.getLong(0))
    val k = top.length
    val slope =
      if (k < 2) 0.0
      else {
        var sx = 0.0; var sy = 0.0; var sxx = 0.0; var sxy = 0.0
        var i = 0
        while (i < k) { // fixed rank-ascending order: bit-stable
          val x = math.log(i + 1.0)
          val y = math.log(top(i).toDouble)
          sx += x; sy += y; sxx += x * x; sxy += x * y
          i += 1
        }
        val den = k * sxx - sx * sx
        if (den == 0.0) 0.0 else (k * sxy - sx * sy) / den
      }
    val top1 = if (top.nonEmpty) top(0) else 0L
    Seq((nTokens, nTypes, hapax,
      rnd6(if (nTypes == 0) 0.0 else hapax.toDouble / nTypes),
      rnd6(if (nTokens == 0) 0.0 else top1.toDouble / nTokens),
      rnd6(slope)))
      .toDF("n_tokens", "n_types", "hapax_types", "hapax_share",
        "top1_share", "zipf_slope")
  }

  private def rnd6(x: Double): Double = graft.core.Num.rnd6(x)
}
