package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-budget truncation — the context-window fitting step every
  * training/eval pipeline runs before packing (publicly standard:
  * HuggingFace `truncation` strategies `only_first`/`longest_first`, the
  * "middle-out" truncation of long-document QA). Token = whitespace word,
  * consistent with the engine's token counter; swap in BPE tokens via
  * [[BpeTrain.encode]] upstream when budgets are model-exact.
  *
  * Modes: `head` keeps the first `maxTokens`, `tail` the last, `head_tail`
  * splits the budget ceil/floor around the dropped middle (optionally
  * marked). Everything is a pure slice/concat expression — no UDF, no
  * shuffle, fused into the scan. §2.14 engine extension next to
  * split/gather (split REDISTRIBUTES long documents; truncate BOUNDS them).
  */
object Truncate {

  /** `text` truncated to `maxTokens` whitespace tokens. */
  def truncateCol(text: Column, maxTokens: Int, mode: String = "head",
      marker: String = ""): Column = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    val words = filter(split(text, " "), w => length(w) > 0)
    val n = size(words)
    val kept = mode match {
      case "head" => slice(words, 1, maxTokens)
      case "tail" =>
        when(n <= maxTokens, words).otherwise(slice(words, -maxTokens, maxTokens))
      case "head_tail" =>
        val h = (maxTokens + 1) / 2
        val t = maxTokens / 2
        val mid =
          if (marker.isEmpty) array().cast("array<string>")
          else array(lit(marker))
        when(n <= maxTokens, words)
          .otherwise(concat(slice(words, 1, h), mid,
            if (t == 0) array().cast("array<string>")
            else slice(words, -t, t)))
      case other => throw new IllegalArgumentException(
        s"mode must be head|tail|head_tail, got '$other'")
    }
    concat_ws(" ", kept)
  }

  /** Append `outCol` (truncated text) and `outCol_tokens` (token count
    * after truncation; the marker, when inserted, counts like any token). */
  def apply(df: DataFrame, textCol: String, maxTokens: Int,
      mode: String = "head", marker: String = "",
      outCol: String = "text_trunc"): DataFrame = {
    val truncated = truncateCol(col(textCol), maxTokens, mode, marker)
    df.withColumn(outCol, truncated)
      .withColumn(s"${outCol}_tokens",
        size(filter(split(col(outCol), " "), w => length(w) > 0))
          .cast("bigint"))
  }
}
