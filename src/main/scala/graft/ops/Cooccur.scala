package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowed word co-occurrence counts + pointwise mutual information —
  * the count statistics GloVe-style embedding training and collocation
  * mining consume (Church & Hanks 1990 for PMI; Pennington et al. 2014
  * for the co-occurrence matrix). For every unordered token pair within
  * `window` positions of each other: the pair count, both unigram
  * counts, and PMI = ln(p(x,y) / (p(x)·p(y))).
  *
  * Scale shape: pair generation is ROW-LOCAL — positions × offsets
  * explode from pure expressions and the partner token is an
  * `element_at` into the row's own token array (never a self-join on
  * doc id, which would be quadratic per document). Fan-out is
  * window × tokens, the true size of the co-occurrence relation. Then
  * TWO keyed count aggregations (pairs, unigrams — both map-side
  * combinable), one keyed join to attach unigram counts, and two driver
  * scalars. PMI's doubles derive from integer counts, so the rounded
  * values replay identically cross-engine.
  */
object Cooccur {

  private def tokens(c: Column): Column =
    graft.functions.TextFunctions.alnumTokens(c)

  /** Co-occurrence PMI table: (x, y, n_xy, n_x, n_y, pmi) for unordered
    * pairs (x <= y) with n_xy >= minCount, counting each (position,
    * offset 1..window) slot once. */
  def pmi(df: DataFrame, textCol: String, window: Int,
      minCount: Long = 1L): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    // Tokenize ONCE (persisted): pair counts, unigram counts, and the
    // scalars all read the cached arrays — without this the corpus is
    // re-scanned and re-tokenized per consumer (3 extra full passes).
    val toks = graft.core.PersistScope.register(
      df.select(tokens(col(textCol)).as("_toks"))
        .filter(size(col("_toks")) >= 2).persist())
    // (pos, d) slots: partner = toks[pos + d]; row-local indexing.
    val slots = toks
      .select(col("_toks"), posexplode(col("_toks")).as(Seq("_p", "_x")))
      .select(col("_toks"), col("_p"), col("_x"),
        explode(sequence(lit(1), lit(window))).as("_d"))
      .filter(col("_p") + col("_d") < size(col("_toks")))
      .select(col("_x"),
        element_at(col("_toks"), col("_p") + col("_d") + 1).as("_y"))
    val pairs = slots
      .select(least(col("_x"), col("_y")).as("x"),
        greatest(col("_x"), col("_y")).as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minCount)
    val uni = toks.select(explode(col("_toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n_tok"))
    // Both scalars from ONE action: slot count has the closed form
    // Σ_d max(0, len − d), so no separate pass over the exploded slots.
    val slotsPerRow = (1 to window)
      .map(d => greatest(size(col("_toks")) - d, lit(0)).cast("long"))
      .reduce(_ + _)
    val scalars = toks.agg(
      coalesce(sum(slotsPerRow), lit(0L)).as("_np"),
      coalesce(sum(size(col("_toks"))), lit(0L)).as("_nt")).head()
    val nPairs = math.max(scalars.getLong(0), 1L)
    val nToks = math.max(scalars.getLong(1), 1L)
    pairs
      .join(uni.select(col("tok").as("x"), col("n_tok").as("n_x")), "x")
      .join(uni.select(col("tok").as("y"), col("n_tok").as("n_y")), "y")
      .select(col("x"), col("y"), col("n_xy"), col("n_x"), col("n_y"),
        round(log(
          (col("n_xy").cast("double") / nPairs) /
            ((col("n_x").cast("double") / nToks) *
              (col("n_y").cast("double") / nToks))), 6).as("pmi"))
  }
}
