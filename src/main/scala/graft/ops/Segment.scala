package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sentence segmentation — the unit-of-analysis splitter upstream of
  * per-sentence quality scoring, sentence-level dedup, and sliding-window
  * RAG chunking (publicly standard: NLTK punkt's job, done here with the
  * deterministic punctuation heuristic the big crawl pipelines use at
  * scale, e.g. C4's "end in terminal punctuation" line rule). A sentence
  * boundary falls after every word that ends in `. ! ?` (optionally
  * followed by closing quotes/brackets).
  *
  * Shares [[CdcChunk.chunksByBoundary]]'s marked-word fold: a pure
  * per-row expression — no UDF, no shuffle, no explode round-trip; the
  * regex is a character class + anchors, RE2-safe, so the DuckDB oracle
  * replays segmentation exactly. §2.14 engine extension next to the
  * split/gather reshape family (split budgets TOKENS; segment respects
  * sentence STRUCTURE).
  */
object Segment {

  /** True iff a sentence boundary falls after `word`. */
  def sentenceBoundary(word: Column): Column =
    word.rlike("[.!?][\"')\\]]*$")

  /** `text` as an array of sentences (space-joined word runs). */
  def sentencesCol(text: Column): Column =
    CdcChunk.chunksByBoundary(text, sentenceBoundary)

  /** One row per sentence: (id, sent_idx, n_words, sentence). */
  def sentences(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      posexplode(sentencesCol(col(textCol))).as(Seq("sent_idx", "sentence")))
      .select(col(idCol), col("sent_idx").cast("bigint").as("sent_idx"),
        size(split(col("sentence"), " ")).cast("bigint").as("n_words"),
        col("sentence"))

  /** Per-document sentence statistics: count, mean/max length — the
    * sentence-shape quality signals (one narrow projection, no shuffle). */
  def sentenceStats(df: DataFrame, textCol: String): DataFrame = {
    val sents = sentencesCol(col(textCol))
    val lens = transform(sents, s => size(split(s, " ")))
    df.withColumn("n_sentences", size(sents).cast("bigint"))
      .withColumn("mean_sentence_words",
        when(size(lens) === 0, lit(null).cast("double"))
          .otherwise(round(
            aggregate(lens, lit(0L), (a, x) => a + x).cast("double") /
              size(lens), 6)))
      .withColumn("max_sentence_words",
        when(size(lens) === 0, lit(null).cast("bigint"))
          .otherwise(array_max(lens).cast("bigint")))
  }
}
