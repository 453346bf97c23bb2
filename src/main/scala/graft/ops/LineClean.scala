package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style LINE-level cleaning — the intra-document pass every web-crawl
  * pipeline runs between boilerplate extraction and document-level quality
  * rules: drop the navigation stubs, cookie banners, and code fragments
  * that survive HTML extraction as short junk lines, keep the prose.
  * Publicly standard (Raffel et al. 2020 C4 §2.2's line rules — ≥ N words,
  * terminal punctuation, no "javascript"/"cookies" boilerplate;
  * RefinedWeb and Dolma run the same shape). Complements the
  * DOCUMENT-level [[QualityRules]]: that op scores or drops whole rows,
  * this one rewrites each row's text.
  *
  * Rules (each toggleable):
  *  - a line must have at least `minWords` whitespace words;
  *  - when `requireTerminalPunct`, it must end in `. ! ?` (optionally
  *    followed by closing quotes/brackets — [[Segment.sentenceBoundary]]'s
  *    convention);
  *  - it must not contain any of `blockedSubstrings` (case-insensitive) —
  *    C4 uses {javascript, cookie, ...} to kill enable-JS banners.
  *
  * Scale shape: one split on newlines + a per-line filter lambda + one
  * array_join — pure per-row expressions fused into the scan, no UDF, no
  * shuffle, O(|text|) per row; the report columns (n_lines,
  * n_kept_lines) are sizes of the same arrays. Oracle-replayable in
  * DuckDB as list_filter over the identical predicates.
  */
object LineClean {

  final case class Config(
      minWords: Int = 3,
      requireTerminalPunct: Boolean = true,
      blockedSubstrings: Seq[String] =
        Seq("javascript", "cookie policy", "lorem ipsum"))

  /** True iff `line` survives the C4 line rules under `cfg`. */
  def lineKeep(line: Column, cfg: Config): Column = {
    val words = size(filter(split(line, " "), w => length(w) > 0))
    val punctOk =
      if (cfg.requireTerminalPunct) Segment.sentenceBoundary(rtrim(line))
      else lit(true)
    val blockedOk = cfg.blockedSubstrings.foldLeft(lit(true)) { (acc, b) =>
      acc && !lower(line).contains(b.toLowerCase(java.util.Locale.ROOT))
    }
    words >= cfg.minWords && punctOk && blockedOk
  }

  /** Rewrite `textCol` keeping only passing lines (newline-joined), plus
    * `n_lines` / `n_kept_lines` audit counts. */
  def apply(df: DataFrame, textCol: String, cfg: Config = Config(),
      outCol: String = "text_clean"): DataFrame = {
    // null text coalesces to '' so text_clean/n_lines never go null
    val lines = split(coalesce(col(textCol), lit("")), "\n")
    val kept = filter(lines, l => lineKeep(l, cfg))
    df.withColumn(outCol, array_join(kept, "\n"))
      .withColumn("n_lines", size(lines).cast("bigint"))
      .withColumn("n_kept_lines", size(kept).cast("bigint"))
  }
}
