package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE-style tokenizer-training statistics — the corpus-wide
  * counting step of byte-pair-encoding vocabulary induction (publicly
  * described in Sennrich et al. 2016 and the open SentencePiece /
  * HuggingFace-tokenizers trainers; the reference has no tokenizer story —
  * §2.14 engine extension next to the BPE-ish token COUNTER `q69`, which
  * consumes a vocabulary this op helps build).
  *
  * What makes BPE trainable at 100 TB: after the first aggregation the
  * working set is the WORD VOCABULARY (millions of rows), not the corpus.
  * [[wordCounts]] is that one corpus-sized shuffle; [[pairCounts]] then
  * explodes each distinct word into its adjacent symbol pairs weighted by
  * the word's count — cost `O(vocab × word_len)`, corpus-size-independent.
  * A full training loop (merge → re-explode → recount) iterates on the
  * vocab table only; the corpus is never rescanned.
  *
  * Everything is codegen'd `transform`/`explode` expressions (dynamic
  * `substr` over a `sequence`, no UDF), so the DuckDB oracle replays counts
  * exactly.
  */
object BpeTrain {

  /** Whitespace word-frequency table: the ONE corpus-sized aggregation. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Adjacent character pairs of `word` as (left, right) structs. */
  private def charPairs(word: Column): Column =
    transform(sequence(lit(1), length(word) - 1), i =>
      struct(word.substr(i, lit(1)).as("left"),
        word.substr(i + 1, lit(1)).as("right")))

  /** One BPE merge iteration's statistics: corpus-weighted counts of every
    * adjacent symbol pair, from a (word, cnt) vocabulary table. The merge
    * winner is the max-count row; ties broken (left, right) ascending for
    * determinism. */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .filter(length(col("word")) >= 2)
      .select(col("cnt"), explode(charPairs(col("word"))).as("pair"))
      .groupBy(col("pair.left").as("left"), col("pair.right").as("right"))
      .agg(sum(col("cnt")).as("pair_cnt"))

  /** End-to-end: corpus text column -> pair statistics. */
  def pairCounts(df: DataFrame, textCol: String): DataFrame =
    pairCounts(wordCounts(df, textCol))

  /** The winning merge of this iteration. */
  def topMerge(vocab: DataFrame): (String, String, Long) = {
    val r = pairCounts(vocab)
      .orderBy(col("pair_cnt").desc, col("left"), col("right"))
      .head()
    (r.getString(0), r.getString(1), r.getLong(2))
  }
}
