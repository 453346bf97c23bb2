package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenizer-vocabulary coverage — "how much of this corpus does my vocab
  * actually cover?": per-document OOV rates and the corpus's top
  * out-of-vocabulary tokens. The acceptance check run after inducing a
  * vocabulary ([[BpeTrain]]) or before committing to an external
  * tokenizer; publicly standard tokenizer-eval practice (fertility/OOV
  * audits). The vocab enters as a TABLE (same external-model seam as the
  * unigram-LM and linear-score ops), so any tokenizer's word list drops
  * in unchanged.
  *
  * Scale shape: one token explode (narrow) + a BROADCAST left join of the
  * vocab (model-sized, ≤ a few hundred k rows) + one id-keyed agg with
  * map-side partials; `topOovTokens` is one (token) keyed agg + sort-limit
  * (per-partition top-k, k-row driver merge). No vocab-sized shuffle of
  * corpus data anywhere.
  */
object VocabCoverage {

  private def tokens(df: DataFrame, idCols: Seq[String],
      textCol: String): DataFrame =
    df.select(idCols.map(col) :+
      explode(filter(split(col(textCol), " "), w => length(w) > 0))
        .as("_tok"): _*)

  /** Per-document coverage: (id, n_tokens, n_oov, oov_rate). */
  def oovReport(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    require(vocab.columns.length == 1,
      s"vocab must have exactly one column, got ${vocab.columns.toSeq}")
    val v = broadcast(
      vocab.select(col(vocab.columns.head).as("_tok")).distinct()
        .withColumn("_in_vocab", lit(1)))
    tokens(df, Seq(idCol), textCol)
      .join(v, Seq("_tok"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 6))
  }

  /** Build the coverage-target vocabulary: the count-descending token
    * prefix whose cumulative occurrence share stays ≤ `coverage` — "the
    * smallest word list covering ~95% of running text", the classic
    * frequency-cut vocabulary construction (and the word-level analog of
    * choosing a BPE vocab size). Output: (token, cnt), count desc.
    *
    * Scale shape: one corpus-sized word-count agg, then the cumulative cut
    * runs through [[BudgetSelect]]'s distributed prefix machinery (range-
    * partitioned sort + per-partition offsets) — never a global
    * single-partition window. Ties at the cut break token-ascending, so
    * the vocabulary is deterministic and oracle-replayable. */
  def buildVocab(df: DataFrame, textCol: String,
      coverage: Double): DataFrame = {
    require(coverage > 0 && coverage <= 1,
      s"coverage must be in (0, 1], got $coverage")
    val counts = BpeTrain.wordCounts(df, textCol)
    val total = counts.agg(sum(col("cnt"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val budget = math.floor(coverage * total).toLong
    BudgetSelect(counts, "cnt", "cnt", budget, "word")
      .select(col("word").as("token"), col("cnt"))
  }

  /** Assign dense ids (0-based, count desc / token asc) to a
    * `(token, cnt)` vocabulary — the id layout every encode step
    * downstream ([[toIds]], embedding tables) assumes.
    *
    * Scale shape: rides [[RankOp.withGlobalRank]]'s sort +
    * per-partition-offset `zipWithIndex`, NOT a single-partition
    * `row_number()` window — a 90%-coverage web vocab is millions of
    * rows, and an unpartitioned window would drag all of them through
    * one task. */
  def withIds(vocab: DataFrame): DataFrame =
    RankOp.withGlobalRank(vocab, Seq(col("cnt").desc, col("token").asc))
      .withColumn("id", col("_rank") - 1L)
      .drop("_rank")

  /** Map an `array<string>` token column to vocabulary ids — the encode
    * side of the vocab family and the step between tokenization
    * ([[BpeTrain]]) and fixed-length packing ([[PackOp.chunkFixed]]):
    * text → tokens → ids → sequences is the full pretraining
    * tensorization path. OOV tokens map to `unkId`.
    *
    * Scale shape: the vocab is MODEL-sized (≤ a few M rows), so it rides
    * as one broadcast map inside a single UDF — no per-token explode
    * shuffle, order trivially preserved. (For a vocab too big to
    * broadcast, posexplode + join + re-collect by position is the
    * fallback shape — at that point the vocab is the corpus and the
    * shuffle is honest.) */
  def toIds(df: DataFrame, tokensCol: String, vocab: DataFrame,
      tokenColName: String = "token", idColName: String = "id",
      unkId: Long = -1L, outCol: String = "ids"): DataFrame = {
    val m = vocab.select(col(tokenColName).cast("string"),
      col(idColName).cast("long")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = df.sparkSession.sparkContext.broadcast(m)
    val f = udf((ts: Seq[String]) =>
      if (ts == null) null else ts.map(t => b.value.getOrElse(t, unkId)))
    df.withColumn(outCol, f(col(tokensCol)))
  }

  /** Map an `array<bigint>` id column back to tokens — the DECODE side of
    * [[toIds]], completing the round-trip the tensorization path needs
    * for validation and sample inspection (decode(encode(x)) must equal
    * x wherever x is in-vocabulary). Unknown ids render as `unkToken`.
    * Same broadcast-map shape and bound as [[toIds]]. */
  def fromIds(df: DataFrame, idsCol: String, vocab: DataFrame,
      tokenColName: String = "token", idColName: String = "id",
      unkToken: String = "<unk>", outCol: String = "tokens"): DataFrame = {
    val m = vocab.select(col(idColName).cast("long"),
      col(tokenColName).cast("string")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = df.sparkSession.sparkContext.broadcast(m)
    val f = udf((ids: Seq[Long]) =>
      if (ids == null) null else ids.map(i => b.value.getOrElse(i, unkToken)))
    df.withColumn(outCol, f(col(idsCol)))
  }

  /** The corpus's `k` most frequent out-of-vocabulary tokens — the list
    * that drives vocab extension. Deterministic order (count desc, token
    * asc). */
  def topOovTokens(df: DataFrame, textCol: String, vocab: DataFrame,
      k: Int = 100): DataFrame = {
    require(vocab.columns.length == 1,
      s"vocab must have exactly one column, got ${vocab.columns.toSeq}")
    val v = broadcast(
      vocab.select(col(vocab.columns.head).as("_tok")).distinct()
        .withColumn("_in_vocab", lit(1)))
    tokens(df, Seq.empty, textCol)
      .join(v, Seq("_tok"), "left")
      .filter(col("_in_vocab").isNull)
      .groupBy(col("_tok").as("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)
  }
}
