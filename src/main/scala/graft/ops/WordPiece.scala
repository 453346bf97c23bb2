package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WordPiece tokenizer training + MaxMatch encoding — the THIRD public
  * subword-vocabulary family (Schuster & Nakajima 2012; the BERT
  * tokenizer; the open HuggingFace `tokenizers` WordPiece trainer
  * contract), completing the tokenizer-parity story next to
  * [[BpeTrain]] (merge by raw pair count) and [[UnigramLm]] (seed +
  * EM-prune). The reference has no tokenizer story — §2.14 engine
  * extension. Two public distinctions from BPE:
  *
  *  - merges are scored by the LIKELIHOOD RATIO
  *    `count(l,r) / (count(l) · count(r))` — the pair that gains the
  *    most corpus likelihood when fused, not the most frequent pair;
  *  - word-internal continuation symbols carry the `##` prefix, and
  *    fusing `l` with `##r` yields `l·r` (the prefix survives only at
  *    the fused symbol's own word-internal position).
  *
  * Encoding is BERT's greedy longest-match-first ("MaxMatch") per
  * word; a word with any uncoverable span becomes one `[UNK]` token
  * (the published WordPiece behavior, unlike [[UnigramLm]]'s per-char
  * fallback).
  *
  * Scale shape (the [[BpeTrain]] discipline): the corpus pays ONE
  * word-count aggregation ([[UnigramLm.wordCounts]] — the shared
  * CorpusStats word model); every training iteration runs on the
  * distinct-word vocabulary table only (pair + unigram aggs, two
  * vocab-sized shuffles, broadcast-sized join; argmax = one driver
  * row). Driver state = the merge list. Encoding is one broadcast of
  * the piece set + one mapPartitions kernel — no join, no shuffle.
  * Scores are IEEE-deterministic: one division of exact integer
  * counts, identical bit pattern under any partitioning (no float
  * SUM ordering anywhere).
  */
object WordPiece {

  /** `word` as WordPiece initial symbols: first character plain,
    * continuations `##`-prefixed (codegen'd, no UDF — the DuckDB
    * oracle replays it). */
  def initialSymbols(word: Column): Column =
    transform(sequence(lit(1), length(word)), i =>
      when(i === 1, word.substr(i, lit(1)))
        .otherwise(concat(lit("##"), word.substr(i, lit(1)))))

  /** The (symbols, cnt) vocabulary table training iterates on. */
  def initialVocab(df: DataFrame, textCol: String): DataFrame =
    UnigramLm.wordCounts(df, textCol)
      .select(initialSymbols(col("word")).as("symbols"), col("cnt"))

  /** One iteration's statistics: every adjacent symbol pair with its
    * corpus-weighted count, both unigram symbol counts, and the
    * WordPiece score. The winner is the max-score row; ties break
    * (left, right) ascending for determinism.
    *
    * The plan references the vocab THREE times (pair agg + both
    * unigram join sides) — materialize it first so a corpus-derived
    * input pays its word count once, not three times (the training
    * loop's vocab is already a localCheckpoint and skips this). */
  def pairScores(vocab: DataFrame): DataFrame =
    pairScoresOn(vocab.localCheckpoint())

  private def pairScoresOn(vocab: DataFrame): DataFrame = {
    val pairs = BpeTrain.pairCountsSym(vocab)
    val uni = vocab
      .select(col("cnt"), explode(col("symbols")).as("sym"))
      .groupBy("sym").agg(sum(col("cnt")).as("sym_cnt"))
    pairs
      .join(uni.select(col("sym").as("left"),
        col("sym_cnt").as("left_cnt")), "left")
      .join(uni.select(col("sym").as("right"),
        col("sym_cnt").as("right_cnt")), "right")
      .withColumn("score", col("pair_cnt").cast("double") /
        (col("left_cnt").cast("double") * col("right_cnt").cast("double")))
      .select("left", "right", "pair_cnt", "left_cnt", "right_cnt",
        "score")
  }

  /** `l` + `##r` fuse to `l·r`: the continuation prefix belongs to the
    * POSITION, not the piece content, so it survives only on the left
    * edge of the fused symbol. */
  private[graft] def fusedSym(l: String, r: String): String =
    l + r.stripPrefix("##")

  /** Left-to-right non-overlapping application of merge (l, r) — the
    * [[BpeTrain.applyMergeCol]] scan with the `##`-aware fusion. The
    * fused symbol can never re-equal `l` within the same scan (`r`
    * always carries at least one content character), preserving the
    * non-overlap argument. */
  def applyMergeCol(symbols: Column, l: String, r: String): Column = {
    val f = fusedSym(l, r)
    aggregate(symbols, array().cast("array<string>"), (acc, s) =>
      when(size(acc) >= 1 && element_at(acc, -1) === lit(l) && s === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(f))))
        .otherwise(concat(acc, array(s))))
  }

  /** One learned merge with the statistics that chose it. */
  final case class Merge(left: String, right: String, fused: String,
      pairCnt: Long, leftCnt: Long, rightCnt: Long, score: Double)

  /** Full WordPiece induction: `numMerges` × (score pairs -> argmax ->
    * fuse). `mergesPerRound` batches symbol-DISJOINT picks per round
    * exactly as [[BpeTrain.trainFromVocab]] does (disjointness keeps
    * every picked pair's own pair AND unigram counts exact; lower
    * picks of a round use between-round statistics — the same
    * documented approximation). Stops early when no pair remains. */
  def trainFromVocab(vocab0: DataFrame, numMerges: Int,
      mergesPerRound: Int = 1): Seq[Merge] = {
    require(numMerges >= 1 && numMerges <= 65536,
      s"numMerges must be in [1, 65536], got $numMerges")
    require(mergesPerRound >= 1 && mergesPerRound <= 1024,
      s"mergesPerRound must be in [1, 1024], got $mergesPerRound")
    var vocab = vocab0.localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    while (!exhausted && merges.size < numMerges) {
      val want = math.min(mergesPerRound, numMerges - merges.size)
      val top = pairScoresOn(vocab)
        .orderBy(col("score").desc, col("left"), col("right"))
        .limit(math.max(want * 4, 16)).collect()
      if (top.isEmpty) exhausted = true
      else {
        val chosen = scala.collection.mutable.ArrayBuffer.empty[Merge]
        val used = scala.collection.mutable.Set.empty[String]
        top.iterator.takeWhile(_ => chosen.size < want).foreach { r =>
          val (l, rr) = (r.getString(0), r.getString(1))
          val f = fusedSym(l, rr)
          if (!used(l) && !used(rr) && !used(f)) {
            chosen += Merge(l, rr, f, r.getLong(2), r.getLong(3),
              r.getLong(4), r.getDouble(5))
            used ++= Seq(l, rr, f)
          }
        }
        merges ++= chosen
        vocab = vocab
          .select(chosen.foldLeft(col("symbols"))((s, m) =>
            applyMergeCol(s, m.left, m.right)).as("symbols"), col("cnt"))
          .localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** Corpus text -> learned merges. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      mergesPerRound: Int = 1): Seq[Merge] =
    trainFromVocab(initialVocab(df, textCol), numMerges, mergesPerRound)

  /** The full encodable piece set: every initial symbol observed in
    * the corpus (single chars + their `##` forms — full coverage, so
    * [[encode]] emits zero `[UNK]` on the training corpus) plus the
    * fused symbols, as a (piece) table. */
  def vocabTable(df: DataFrame, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val base = UnigramLm.wordCounts(df, textCol)
      .select(explode(initialSymbols(col("word"))).as("piece"))
      .distinct()
    val spark = df.sparkSession
    import spark.implicits._
    base.unionByName(merges.map(_.fused).toDF("piece")).distinct()
  }

  /** The learned merges as a deterministic (rank, left, right, fused,
    * pair_cnt, left_cnt, right_cnt, score) table — the oracle/export
    * surface (score rounded to 6, the display convention; ordering
    * used raw doubles). */
  def mergeTable(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex.map { case (m, i) =>
      (i.toLong, m.left, m.right, m.fused, m.pairCnt, m.leftCnt,
        m.rightCnt, graft.core.Num.rnd6(m.score))
    }.toDF("rank", "left", "right", "fused", "pair_cnt", "left_cnt",
      "right_cnt", "score")
  }

  /** BERT's greedy longest-match-first segmentation of one word: the
    * longest vocab prefix wins at each position (continuations probe
    * their `##` form); any uncoverable span collapses the WHOLE word
    * to `unk`, as does a word longer than `maxChars` (the published
    * max_input_chars_per_word guard). */
  private[graft] def encodeWord(word: String,
      vocab: java.util.HashSet[String], maxChars: Int,
      unk: String): Array[String] = {
    if (word.length > maxChars) return Array(unk)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    val n = word.length
    while (start < n) {
      var end = n
      var found: String = null
      while (end > start && found == null) {
        val sub =
          (if (start > 0) "##" else "") + word.substring(start, end)
        if (vocab.contains(sub)) found = sub else end -= 1
      }
      if (found == null) return Array(unk)
      out += found
      start = end
    }
    out.toArray
  }

  /** MaxMatch-encode `textCol` against a (piece) vocabulary table:
    * normalize like [[UnigramLm.wordCounts]], segment each word, emit
    * the flattened piece array, the `##`-stripped `decoded` round-trip
    * string (equal to the normalized input whenever no word went
    * `[UNK]`) and the `n_unk` count. One broadcast of the piece set +
    * one mapPartitions kernel — the [[UnigramLm.encode]] shape. */
  def encode(df: DataFrame, textCol: String, vocab: DataFrame,
      unk: String = "[UNK]", maxChars: Int = 100,
      piecesOut: String = "pieces", decodedOut: String = "decoded",
      unkOut: String = "n_unk"): DataFrame = {
    val pieces = vocab.select(col("piece"))
      .collect().map(_.getString(0))
    require(pieces.nonEmpty, "empty wordpiece vocabulary")
    val bc = df.sparkSession.sparkContext.broadcast(pieces)
    val idx = df.schema.fieldIndex(textCol)
    val (u, mc) = (unk, maxChars)
    val newSchema = df.schema
      .add(StructField(piecesOut, ArrayType(StringType), nullable = false))
      .add(StructField(decodedOut, StringType, nullable = false))
      .add(StructField(unkOut, LongType, nullable = false))
    df.mapPartitions { it =>
      val set = new java.util.HashSet[String](bc.value.length * 2)
      bc.value.foreach(set.add)
      it.map { row =>
        val text = if (row.isNullAt(idx)) "" else row.getString(idx)
        val wordsArr = text.toLowerCase(java.util.Locale.ROOT)
          .split("[^a-z0-9]+").filter(_.nonEmpty)
        val segs = wordsArr.map(w => encodeWord(w, set, mc, u))
        val nUnk = segs.iterator.map(s =>
          s.count(_ == u).toLong).sum
        val decoded = segs.map(_.iterator
          .map(p => if (p.startsWith("##")) p.substring(2) else p)
          .mkString).mkString(" ")
        Row.fromSeq(row.toSeq :+ segs.flatten.toSeq :+ decoded :+ nUnk)
      }
    }(Encoders.row(newSchema))
  }
}
