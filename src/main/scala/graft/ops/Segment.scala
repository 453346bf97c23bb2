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
  * Shares [[CdcChunk.chunksByBoundary]]'s marked-word split: a pure
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
    * Pure per-row fold, no shuffle. The accumulator is
    * `struct(chunks: array<string>, tail: array<string>, tw: int)` —
    * closed chunks, the building chunk's sentences, and the building
    * chunk's word count — so each step touches only the incoming
    * sentence and the budget-bounded tail: a sentence append copies
    * array REFERENCES (higher-order functions evaluate interpreted, so
    * struct/array rebuilds carry string pointers, not characters), and
    * a chunk close space-joins the tail ONCE. Total per-row char work is
    * O(|text|) + O(chunks²) pointer copies — a 10⁶-char EPUB book with
    * 10⁴ sentences costs ~10⁶ char ops, where a flat string accumulator
    * re-split per sentence would cost ~10¹⁰. The overlap = 0 path is
    * oracle-replayed (q157); overlap > 0 is spec-covered. */
  def chunkBySentences(df: DataFrame, idCol: String, textCol: String,
      maxWords: Int, overlap: Int = 0): DataFrame = {
    require(maxWords >= 1, s"maxWords must be >= 1, got $maxWords")
    require(overlap >= 0, s"overlap must be >= 0, got $overlap")
    val emptyArr = array().cast("array<string>")
    val zero = struct(emptyArr.as("chunks"), emptyArr.as("tail"),
      lit(0).as("tw"))
    val folded = aggregate(sentencesCol(col(textCol)), zero, (acc, s) => {
      val chunks = acc.getField("chunks")
      val tail = acc.getField("tail")
      val tw = acc.getField("tw")
      val sWords = size(split(s, " "))
      val appended = struct(chunks.as("chunks"),
        concat(tail, array(s)).as("tail"), (tw + sWords).as("tw"))
      val closed = array_join(tail, " ")
      val ovSents =
        if (overlap == 0) emptyArr
        else slice(tail, greatest(lit(1), size(tail) - overlap + 1),
          lit(overlap))
      val ovWords =
        if (overlap == 0) lit(0)
        else aggregate(ovSents, lit(0), (a, x) => a + size(split(x, " ")))
      val reopened = struct(concat(chunks, array(closed)).as("chunks"),
        concat(ovSents, array(s)).as("tail"), (ovWords + sWords).as("tw"))
      when(size(tail) === 0, appended)
        .when(tw + sWords <= maxWords, appended)
        .otherwise(reopened)
    }, acc =>
      when(size(acc.getField("tail")) === 0, acc.getField("chunks"))
        .otherwise(concat(acc.getField("chunks"),
          array(array_join(acc.getField("tail"), " ")))))
    df.select(col(idCol), posexplode(folded).as(Seq("chunk_idx", "chunk")))
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
