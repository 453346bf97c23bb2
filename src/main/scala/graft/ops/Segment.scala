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

  /** Sentence-ALIGNED chunking with a word budget and optional sentence
    * overlap — the RAG/sft context-window prep that never cuts inside a
    * sentence (vs the fixed-window `chunk_fixed`, which does): greedy
    * packing of whole sentences into chunks of at most `maxWords` words (a
    * chunk always takes at least one sentence, so an oversize sentence
    * becomes its own oversize chunk rather than being split), with the
    * last `overlap` sentences of each chunk re-opening the next (retrieval
    * context continuity, the standard overlapping-chunk recipe).
    *
    * Pure per-row fold, no shuffle: sentences within a building chunk stay
    * separated by a unit marker so the overlap tail is recoverable by
    * array slicing; per-row cost is O(sentences × chunk length) — bounded
    * by the document's own size, like every fold in this family. The
    * overlap = 0 path is a plain string fold the DuckDB oracle replays
    * (q157); overlap > 0 is spec-covered. */
  def chunkBySentences(df: DataFrame, idCol: String, textCol: String,
      maxWords: Int, overlap: Int = 0): DataFrame = {
    require(maxWords >= 1, s"maxWords must be >= 1, got $maxWords")
    require(overlap >= 0, s"overlap must be >= 0, got $overlap")
    val RS = "\u001e" // chunk separator
    val US = "\u001f" // sentence separator within a building chunk
    val folded = aggregate(sentencesCol(col(textCol)), lit(""), (acc, s) => {
      val tail = element_at(split(acc, RS), -1)
      val tailWords = size(filter(split(regexp_replace(tail, US, " "), " "),
        w => length(w) > 0))
      val sWords = size(split(s, " "))
      val tailSents = filter(split(tail, US), x => length(x) > 0)
      val ovStart = greatest(lit(1), size(tailSents) - lit(overlap) + 1)
      val ovTail = array_join(
        slice(tailSents, ovStart, lit(math.max(overlap, 1))), US)
      val newChunkHead =
        if (overlap == 0) s
        else when(length(ovTail) > 0, concat(ovTail, lit(US), s)).otherwise(s)
      when(acc === "", s)
        .when(tailWords + sWords <= maxWords, concat(acc, lit(US), s))
        .otherwise(concat(acc, lit(RS), newChunkHead))
    })
    val chunks = transform(
      filter(split(folded, RS), c => length(c) > 0),
      c => regexp_replace(c, US, " "))
    df.select(col(idCol), posexplode(chunks).as(Seq("chunk_idx", "chunk")))
      .select(col(idCol), col("chunk_idx").cast("bigint").as("chunk_idx"),
        size(split(col("chunk"), " ")).cast("bigint").as("n_words"),
        col("chunk"))
  }

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
