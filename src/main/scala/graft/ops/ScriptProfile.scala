package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unicode script profiling — the writing-system counterpart of n-gram
  * language ID: per-document character counts for the major scripts plus
  * the dominant script label. Crawl pipelines use it to (a) route
  * documents to script-appropriate tokenizers, (b) catch lang-id
  * disagreements (a "de" page that is 90% Cyrillic is mislabeled or
  * spam), and (c) quantify script mixing (transliteration spam). The
  * heuristic is publicly standard — Unicode block ranges, the same
  * families fastText/CLD3 feature on.
  *
  * Scale shape: each count is ONE codegen'd regexp_replace-and-length
  * expression fused into the scan — per-row, no UDF, no shuffle, zero
  * driver state; `main_script` is a greatest-count CASE chain with a
  * deterministic tie order. Block ranges are BMP-only (astral scripts
  * count under `other`), so Spark's UTF-16 `length` and DuckDB's
  * codepoint `len` agree and the oracle replays every count exactly.
  */
object ScriptProfile {

  /** (name, character-class regex) in deterministic tie-break order.
    * Ranges are the core Unicode blocks of each script family. */
  val Scripts: Seq[(String, String)] = Seq(
    "latin" -> "A-Za-z\\u00C0-\\u024F",
    "cyrillic" -> "\\u0400-\\u04FF",
    "greek" -> "\\u0370-\\u03FF",
    "arabic" -> "\\u0600-\\u06FF",
    "hebrew" -> "\\u0590-\\u05FF",
    "devanagari" -> "\\u0900-\\u097F",
    "cjk" -> "\\u4E00-\\u9FFF\\u3040-\\u30FF",
    "hangul" -> "\\uAC00-\\uD7AF\\u1100-\\u11FF")

  /** Count of characters of `cls` (a character-class body) in `c`. */
  private def countClass(c: Column, cls: String): Column =
    (length(c) - length(regexp_replace(c, s"[$cls]", ""))).cast("bigint")

  /** Append `n_<script>` counts, `n_letters` (sum over scripts), and
    * `main_script` (argmax count; "none" when no script characters —
    * string gate columns stay null-free). Ties break in [[Scripts]]
    * order, so the label is deterministic and engine-portable. */
  def apply(df: DataFrame, textCol: String): DataFrame = {
    val c = col(textCol)
    val counts = Scripts.map { case (name, cls) => name -> countClass(c, cls) }
    val total = counts.map(_._2).reduce(_ + _)
    // argmax with first-wins ties: the first name (in Scripts order)
    // whose count equals the max.
    val maxCount = greatest(counts.map(_._2): _*)
    val mainFirstWins = counts.reverse.foldLeft(lit("none")) {
      case (rest, (name, cnt)) =>
        when(cnt === maxCount && cnt > 0, lit(name)).otherwise(rest)
    }
    val withCounts = counts.foldLeft(df) { case (d, (name, cnt)) =>
      d.withColumn(s"n_$name", cnt)
    }
    withCounts
      .withColumn("n_script_chars", total)
      .withColumn("main_script", mainFirstWins)
  }
}
