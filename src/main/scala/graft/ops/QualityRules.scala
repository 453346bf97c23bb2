package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Gopher/MassiveText-style rule-based document quality filter — the cheap
  * deterministic pre-filter every pretraining corpus pipeline runs before any
  * model-based scoring (publicly described in the Gopher paper's MassiveText
  * filters, C4, and the open Dolma toolkit; the reference has no equivalent —
  * this is a §2.14 engine extension alongside `LinearScore`/`LmScore`).
  *
  * Rules (each individually toggleable via its threshold):
  *  - word count within `[minWords, maxWords]`
  *  - mean word length within `[minAvgWordLen, maxAvgWordLen]`
  *  - duplicate-word fraction `<= maxDupWordFrac`
  *  - most-common-2gram share `<= maxTop2gramFrac`
  *  - at least `minDistinctStopwords` distinct stopwords present (the
  *    "natural language, not a keyword list" test)
  *
  * Scale shape: every signal is a pure codegen'd `Column` over
  * [[graft.functions.TextFunctions]] — per-row, no shuffle, fused into the
  * corpus scan. At 100 TB this runs at scan speed on every executor with zero
  * driver state; the per-row cost is bounded by document length.
  *
  * Determinism: signals are rounded to 6 decimals BEFORE threshold
  * comparison, and the DuckDB oracle replays the identical rounded
  * arithmetic, so the keep decision can never diverge on float noise.
  */
object QualityRules {

  case class Config(
      minWords: Long = 50L,
      maxWords: Long = 100000L,
      minAvgWordLen: Double = 3.0,
      maxAvgWordLen: Double = 10.0,
      maxDupWordFrac: Double = 0.95,
      maxTop2gramFrac: Double = 0.2,
      minDistinctStopwords: Int = 2,
      stopwords: Seq[String] = TF.EnglishStopwords)

  /** Distinct stopwords present as whitespace tokens (case-insensitive). */
  def distinctStopwordCount(c: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    size(array_intersect(array_distinct(split(lower(c), " ")), sw))
      .cast("bigint")
  }

  /** Append the five signal columns plus the composite `keep` flag. */
  /** The columns [[signals]] appends (and [[filter]] consumes + drops). */
  val SignalColumns: Seq[String] = Seq("n_words", "avg_word_len",
    "dup_word_frac", "top_2gram_frac", "n_stopwords", "keep")

  def signals(df: DataFrame, textKey: String, cfg: Config = Config()): DataFrame = {
    // Same guard convention as InterleaveOp/LinearScore/PackOp: silently
    // clobbering (then, in filter, DROPPING) a user column named `keep`
    // would destroy data.
    SignalColumns.foreach(n => require(!df.columns.contains(n),
      s"quality_rules: input already has a column named '$n'"))
    val c = col(textKey)
    val nWords = TF.tokenCount(c).cast("bigint")
    val awl = round(TF.avgWordLength(c), 6)
    val dup = TF.dupTokenFraction(c) // already round-6
    val top2 = TF.topNgramFraction(c, 2) // already round-6
    val nSw = distinctStopwordCount(c, cfg.stopwords)
    val keep = nWords.between(cfg.minWords, cfg.maxWords) &&
      awl.between(cfg.minAvgWordLen, cfg.maxAvgWordLen) &&
      dup <= cfg.maxDupWordFrac && top2 <= cfg.maxTop2gramFrac &&
      nSw >= cfg.minDistinctStopwords
    df.withColumn("n_words", nWords)
      .withColumn("avg_word_len", awl)
      .withColumn("dup_word_frac", dup)
      .withColumn("top_2gram_frac", top2)
      .withColumn("n_stopwords", nSw)
      .withColumn("keep", keep)
  }

  /** Keep only passing rows, dropping the signal columns (the filter shape
    * used inside pipelines; use [[signals]] for the audit-report shape). */
  def filter(df: DataFrame, textKey: String, cfg: Config = Config()): DataFrame =
    signals(df, textKey, cfg).filter(col("keep"))
      .drop("n_words", "avg_word_len", "dup_word_frac", "top_2gram_frac",
        "n_stopwords", "keep")
}
