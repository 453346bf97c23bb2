package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Readability scoring — Flesch Reading Ease and Flesch–Kincaid grade
  * level (publicly standard formulas; used by curation pipelines as a
  * complexity/quality prior, e.g. selecting textbook-grade prose). The
  * syllable counter is the classic vowel-group heuristic (runs of
  * `aeiouy` after lowercasing), documented as such: exact dictionary
  * syllabification is neither needed nor possible at corpus scale, and
  * the heuristic's bias is uniform enough for ranking.
  *
  * All three inputs (words, sentences, syllables) are counts of pure
  * regexp/fold expressions fused into the scan — vowel GROUPS over the
  * whole lowercased text equal the per-word sum because the space between
  * words always breaks a group. No UDF, no shuffle; DuckDB replays the
  * same regex counts.
  */
object Readability {

  /** Total vowel-group count of lowercased `c` — the syllable heuristic. */
  def syllables(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[aeiouy]+"), lit(0)))
      .cast("bigint")

  /** Append n_words, n_sentences, n_syllables, flesch_reading_ease
    * (206.835 − 1.015·w/s − 84.6·syl/w) and fk_grade
    * (0.39·w/s + 11.8·syl/w − 15.59), 6 decimals; rows with no words
    * report null scores. A text with words but no terminal punctuation
    * counts as ONE sentence (the trailing unterminated run). */
  def report(df: DataFrame, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val words = size(filter(split(t, " "), w => length(w) > 0)).cast("bigint")
    val sents = greatest(size(Segment.sentencesCol(t)).cast("bigint"), lit(1L))
    val syl = syllables(t)
    val wps = words.cast("double") / sents
    val spw = syl.cast("double") / words
    df.withColumn("n_words", words)
      .withColumn("n_sentences", sents)
      .withColumn("n_syllables", syl)
      .withColumn("flesch_reading_ease",
        when(words > 0,
          round(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 6)))
      .withColumn("fk_grade",
        when(words > 0,
          round(lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 6)))
  }
}

/** Compression-ratio quality signal — deflate the text and report
  * compressed/raw size: highly repetitive or templated documents compress
  * far below prose (a published curation heuristic — RedPajama-v2 ships
  * it as a quality signal; it catches machine-generated spam that token
  * statistics miss). A per-row `Deflater` UDF by necessity (no SQL
  * deflate) — deterministic for a fixed level/strategy in a JVM, but not
  * cross-engine replayable, so coverage is spec-based like the streaming
  * family. Per-row cost is linear in the document's own bytes; no
  * shuffle, no driver state.
  */
object CompressionRatio {

  /** deflate(level 6) size / raw UTF-8 size, 6 decimals; empty/null rows
    * report null. Typical prose lands ~0.3–0.6; heavy repetition sinks
    * well below. */
  def ratio(text: String): Option[Double] = {
    if (text == null || text.isEmpty) return None
    val raw = text.getBytes("UTF-8")
    val d = new java.util.zip.Deflater(6)
    try {
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](1024)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      Some(math.rint(n.toDouble / raw.length * 1e6) / 1e6)
    } finally d.end()
  }

  /** Append `compression_ratio` (+ `is_repetitive` = ratio < threshold). */
  def report(df: DataFrame, textCol: String,
      threshold: Double = 0.25): DataFrame = {
    val f = udf((t: String) => ratio(t))
    df.withColumn("compression_ratio", f(col(textCol)))
      .withColumn("is_repetitive",
        coalesce(col("compression_ratio") < threshold, lit(false)))
  }
}

/** Code-vs-prose detection — the heuristic that separates source code
  * from natural language in web scrapes (a standard crawl-curation
  * routing decision: code goes to the code subset, prose to the text
  * subset; the public StarCoder/CodeParrot pipelines apply exactly this
  * class of signal). Three codegen'd signals + a weighted score:
  *
  *  - `symbol_density`: code punctuation (`{}();=<>[]#`) per char;
  *  - `indent_ratio`: lines starting with two spaces or a tab, over
  *    non-empty lines (code is indented, prose is not);
  *  - `keyword_hits`: whitespace tokens matching a fixed cross-language
  *    keyword list (def/val/var/let/return/import/class/func/fn/...).
  *
  * Pure expressions fused into the scan; RE2-safe; DuckDB-replayable.
  */
object CodeDetect {

  private val Keywords = Seq("def", "val", "var", "let", "return", "import",
    "class", "func", "fn", "pub", "const", "void", "int", "elif", "lambda",
    "static", "struct", "impl", "public", "private")

  /** Append symbol_density, indent_ratio, keyword_hits, code_score
    * (0–1-ish weighted combination, 6 decimals) and `is_code`
    * (score > threshold). */
  def report(df: DataFrame, textCol: String,
      threshold: Double = 0.25): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val symbols = size(regexp_extract_all(t,
      lit("[{}();=<>\\[\\]#]"), lit(0))).cast("double")
    val symbolDensity = round(symbols / greatest(length(t), lit(1)), 6)
    val lines = filter(split(t, "\n"), l => length(l) > 0)
    val indented = size(filter(lines,
      l => l.startsWith("  ") || l.startsWith("\t")))
    val indentRatio =
      round(indented.cast("double") / greatest(size(lines), lit(1)), 6)
    val kwArray = array(Keywords.map(lit): _*)
    val kwHits = size(filter(split(lower(t), "[ \\n\\t]+"),
      w => array_contains(kwArray, w))).cast("bigint")
    val score = round(
      least(symbolDensity * 4, lit(1.0)) * 0.4 +
        indentRatio * 0.3 +
        least(kwHits.cast("double") / 5, lit(1.0)) * 0.3, 6)
    df.withColumn("symbol_density", symbolDensity)
      .withColumn("indent_ratio", indentRatio)
      .withColumn("keyword_hits", kwHits)
      .withColumn("code_score", score)
      .withColumn("is_code", score > threshold)
  }
}
