package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Consecutive-repeat collapse — rewrite "buy now buy now buy now" to
  * "buy now": the cleanup pass for degenerate self-repetition, the most
  * common artifact in model-generated text and scraped spam (the Gopher
  * repetition SIGNALS ([[graft.functions.TextFunctions]]) detect it;
  * this op repairs it when dropping the whole document wastes the
  * non-degenerate prefix). A token is dropped when it lies inside a
  * word n-gram (n ≤ maxGram) that verbatim-repeats the n-gram
  * immediately before it — evaluated against ORIGINAL positions, so
  * runs of any length ("a a a a") keep exactly their first copy and
  * phrase loops ("x y x y x y") collapse to one phrase.
  *
  * Scale shape: pure per-row expressions — the token array binds ONCE
  * through a projection boundary (the HOF invariant: a lambda
  * re-evaluates closed-over EXPRESSIONS per element, but an attribute
  * reference is free), then each position checks a CONSTANT number of
  * bounded window comparisons (Σ g² ≤ 14 element_at probes at
  * maxGram=3). O(maxGram² · words) per document; no fold-accumulator
  * array copies, no UDF, no shuffle.
  */
object RepeatCollapse {

  /** Append `outCol`: the text with consecutive repeated 1..maxGram word
    * runs collapsed to a single copy. Whitespace normalizes to single
    * spaces (the pass is token-based). */
  def collapse(df: DataFrame, textCol: String, maxGram: Int = 3,
      outCol: String = "text_collapsed"): DataFrame = {
    require(maxGram >= 1, s"maxGram must be >= 1, got $maxGram")
    val toksExpr = filter(split(coalesce(col(textCol), lit("")), "\\s+"),
      t => length(t) > 0)
    val staged = df.withColumn("_rc_toks", toksExpr)
    val toks = col("_rc_toks")
    // Drop token at 0-based position i iff some window ending at e=i+o
    // (o < g) of length g equals the g tokens before it. element_at is
    // 1-based; e-j ranges over the window, e-j-g over its predecessor.
    def dropAt(i: Column): Column = {
      val conds = for {
        g <- 1 to maxGram
        o <- 0 until g
      } yield {
        val e = i + o
        val inBounds = e < size(toks) && (e - (2 * g - 1)) >= 0
        val eq = (0 until g).map { j =>
          element_at(toks, e - j + 1) === element_at(toks, e - j - g + 1)
        }.reduce(_ && _)
        inBounds && eq
      }
      conds.reduce(_ || _)
    }
    staged
      .withColumn(outCol, array_join(
        filter(toks, (t, i) => !dropAt(i)), " "))
      .drop("_rc_toks")
  }
}
