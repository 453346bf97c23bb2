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

  // ------------------------------------------------------- full training

  /** One learned merge: `left`+`right` fuse into one symbol; `count` is the
    * corpus-weighted pair frequency at the iteration that chose it. */
  final case class Merge(left: String, right: String, count: Long)

  /** `word` split into single-character symbols (codegen'd, no UDF). */
  private def charSyms(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1)))

  /** Adjacent symbol pairs of a symbol ARRAY (vs [[charPairs]]'s raw
    * word form) — the post-first-iteration pair statistics, where symbols
    * are multi-character. */
  def pairCountsSym(vocab: DataFrame): DataFrame =
    vocab.filter(size(col("symbols")) >= 2)
      .select(col("cnt"), explode(transform(
        sequence(lit(1), size(col("symbols")) - 1), i =>
          struct(element_at(col("symbols"), i).as("left"),
            element_at(col("symbols"), i + 1).as("right")))).as("pair"))
      .groupBy(col("pair.left").as("left"), col("pair.right").as("right"))
      .agg(sum(col("cnt")).as("pair_cnt"))

  /** Left-to-right NON-OVERLAPPING application of merge (l, r) to a symbol
    * array — the standard BPE scan ("aaa" + (a,a) -> [aa, a]): a fold whose
    * accumulator appends, or fuses the current symbol into the previous one
    * when (previous, current) == (l, r). A just-fused symbol is l+r and can
    * never equal l again (r is non-empty), which is exactly what makes the
    * scan non-overlapping. Pure native expression, so the DuckDB oracle
    * replays it (as a sep-joined `list_reduce` string fold). */
  def applyMergeCol(symbols: Column, l: String, r: String): Column =
    aggregate(symbols, array().cast("array<string>"), (acc, s) =>
      when(size(acc) >= 1 && element_at(acc, -1) === lit(l) && s === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(s))))

  /** Full BPE vocabulary induction: `numMerges` iterations of (count pairs
    * -> pick argmax -> fuse) — Sennrich et al. 2016, distributed.
    *
    * Scale shape: the corpus is scanned ONCE ([[wordCounts]]); every
    * iteration after that runs on the word-vocabulary table only (pair agg
    * = vocab-sized shuffle; argmax = single driver row; fuse = narrow
    * map), so training cost is `numMerges × O(vocab)`, corpus-size-
    * independent. Driver state = the merge list (bounded by `numMerges`).
    * The vocab is localCheckpoint'ed each iteration to keep the loop's
    * lineage flat (on a real cluster with dynamic allocation, swap for a
    * reliable `checkpoint` dir). Ties break (count desc, left, right asc)
    * so induction is deterministic. Stops early when no pair remains.
    *
    * `mergesPerRound` (default 1 = strict Sennrich order): one Spark job
    * per merge is fine for oracle-scale vocabs but schedules 32k
    * sequential jobs for a production vocabulary. At k > 1 each round
    * applies the top-k pairs whose symbols are PAIRWISE DISJOINT (a
    * candidate sharing a left/right/fused symbol with a higher-count pick
    * of the same round is deferred — its count would change once that
    * pick fuses), cutting the job count ~k× . This is a DOCUMENTED
    * APPROXIMATION of strict rank order: counts are only re-evaluated
    * between rounds, so a round's lower picks use slightly stale
    * statistics; disjointness keeps every picked pair's own count exact. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      mergesPerRound: Int = 1): Seq[Merge] =
    trainFromVocab(wordCounts(df, textCol)
      .select(charSyms(col("word")).as("symbols"), col("cnt")),
      numMerges, mergesPerRound)

  /** The merge loop over an arbitrary (symbols, cnt) vocabulary table —
    * shared by the char-level [[train]] and byte-level
    * [[trainByteLevel]] arms (one loop, two alphabets). */
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
      // Over-fetch candidates: disjointness filtering skips some.
      val top = pairCountsSym(vocab)
        .orderBy(col("pair_cnt").desc, col("left"), col("right"))
        .limit(math.max(want * 4, 16)).collect()
      if (top.isEmpty) exhausted = true
      else {
        val chosen = scala.collection.mutable.ArrayBuffer.empty[Merge]
        val used = scala.collection.mutable.Set.empty[String]
        top.iterator.takeWhile(_ => chosen.size < want).foreach { r =>
          val (l, rr) = (r.getString(0), r.getString(1))
          if (!used(l) && !used(rr) && !used(l + rr)) {
            chosen += Merge(l, rr, r.getLong(2))
            used ++= Seq(l, rr, l + rr)
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

  // ------------------------------------------------ byte-level (GPT-2)

  /** GPT-2's byte→unicode alphabet (the public `bytes_to_unicode`
    * table shipped with the GPT-2 release and tiktoken): printable
    * latin bytes map to themselves; the rest map, byte-ascending, to
    * U+0100.. so every byte is a visible, whitespace-free character
    * (space → 'Ġ' U+0120). Index = byte value. */
  private[graft] val ByteAlphabet: Array[String] = {
    val direct = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = 0
    Array.tabulate(256) { b =>
      if (direct(b)) b.toChar.toString
      else { val s = (256 + n).toChar.toString; n += 1; s }
    }
  }

  /** GPT-2's pre-tokenizer regex (public, from the GPT-2 release):
    * contraction suffixes, space-prefixed letter/digit/punctuation
    * runs, residual whitespace. Java-regex compatible (Spark's
    * `regexp_extract_all` replays it verbatim). The `(?U)` flag makes
    * `\s` Unicode-aware (NBSP, ideographic space, …) — Python's regex
    * module, which GPT-2/tiktoken use, treats them as whitespace, and
    * ASCII-`\s` Java would instead glue them into punctuation runs. */
  val Gpt2PretokenRegex: String =
    "(?U)'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+" +
      "|\\s+(?!\\S)|\\s+"

  /** `word`'s UTF-8 bytes through [[ByteAlphabet]] — the byte-level
    * symbol sequence BPE merges over. */
  private[graft] def byteSymbols(w: String): Seq[String] =
    w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .toSeq.map(b => ByteAlphabet(b & 0xff))

  private val byteSymsUdf = udf { (w: String) =>
    if (w == null) Seq.empty[String] else byteSymbols(w)
  }

  /** GPT-2-style pretoken frequency table — the byte-level analog of
    * [[wordCounts]] and the same ONE corpus-sized shuffle: pretokens
    * keep their leading space (" fast" ≠ "fast"), exactly the
    * published behavior. Pure expression (regexp + explode); the
    * byte mapping runs later, on the VOCAB table only. */
  def pretokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(regexp_extract_all(
      coalesce(col(textCol), lit("")), lit(Gpt2PretokenRegex), lit(0)))
      .as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Byte-level (symbols, cnt) vocabulary: [[pretokenCounts]] mapped
    * through [[ByteAlphabet]]. The mapping UDF runs on the
    * vocabulary-sized table, never the corpus. */
  def byteLevelVocab(df: DataFrame, textCol: String): DataFrame =
    pretokenCounts(df, textCol)
      .select(byteSymsUdf(col("word")).as("symbols"), col("cnt"))

  /** Byte-level BPE training — GPT-2/tiktoken-class parity: regex
    * pre-tokenization + byte alphabet + the SAME merge loop as the
    * word-level arm ([[trainFromVocab]]). Scale shape identical to
    * [[train]]: one corpus shuffle, then numMerges × O(vocab). */
  def trainByteLevel(df: DataFrame, textCol: String, numMerges: Int,
      mergesPerRound: Int = 1): Seq[Merge] =
    trainFromVocab(byteLevelVocab(df, textCol), numMerges, mergesPerRound)

  /** Byte-level greedy encoder: pretokenize with the GPT-2 regex, map
    * each pretoken to byte symbols, fuse by lowest merge rank
    * ([[encodeWordGreedy]]'s loop over a symbol vector) — equivalent to
    * rank-order sequential application for training-ordered merge
    * lists (Round14Spec property-checks it). A Scala UDF by the same
    * necessity as [[encodeGreedy]]: dictionary-driven unbounded-depth
    * fusion; per-row, broadcast rank map, no shuffle. */
  def encodeByteLevelGreedy(df: DataFrame, textCol: String,
      merges: Seq[Merge], outCol: String = "tokens"): DataFrame = {
    val spark = df.sparkSession
    val pairsB = spark.sparkContext.broadcast(
      merges.map(m => (m.left, m.right)).toIndexedSeq)
    val rankB = spark.sparkContext.broadcast(
      merges.zipWithIndex.map { case (m, i) => (m.left, m.right) -> i }.toMap)
    val pattern = java.util.regex.Pattern.compile(Gpt2PretokenRegex)
    val tok = udf { (text: String) =>
      if (text == null) null
      else {
        val m = pattern.matcher(text)
        val out = Vector.newBuilder[String]
        while (m.find()) {
          val w = m.group()
          if (w.nonEmpty) out ++= encodeSymsGreedy(
            byteSymbols(w).toVector, pairsB.value, rankB.value)
        }
        out.result()
      }
    }
    df.withColumn(outCol, tok(col(textCol)))
  }

  /** The learned merges as a (rank, left, right, pair_cnt) table. */
  def mergeTable(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case (m, i) => (i.toLong, m.left, m.right, m.count) }
      .toDF("rank", "left", "right", "pair_cnt")
  }

  /** Tokenize `text` by applying `merges` in rank order to each
    * whitespace word — as a pure expression chain (one [[applyMergeCol]]
    * fold per merge), so a BOUNDED merge list stays codegen'd and
    * oracle-replayable. The expression tree grows linearly with the merge
    * count; past a few hundred merges use [[encodeGreedy]], whose cost is
    * rank-map lookups instead of expression depth. */
  def tokensCol(text: Column, merges: Seq[Merge]): Column = {
    val words = filter(split(text, " "), w => length(w) > 0)
    flatten(transform(words, w =>
      merges.foldLeft(charSyms(w))((syms, m) =>
        applyMergeCol(syms, m.left, m.right))))
  }

  /** Expression-chain tokenizer: appends `outCol` = array of BPE tokens. */
  def encode(df: DataFrame, textCol: String, merges: Seq[Merge],
      outCol: String = "tokens"): DataFrame =
    df.withColumn(outCol, tokensCol(col(textCol), merges))

  /** Tokenizer fertility report — the standard tokenizer-evaluation
    * numbers (tokens/word "fertility", chars/token compression, fraction
    * of words left unsplit) for a merge list over a corpus: ONE row out.
    * High fertility on a language slice means the vocab underserves it
    * (the public multilingual-tokenizer evaluations read exactly these).
    *
    * Scale shape: per-row arrays of per-WORD token counts (the same
    * codegen'd fold chain as [[encode]], evaluated per word inside a
    * `transform` — each lambda element's cost is that word's own encode,
    * nothing shared is re-evaluated), reduced to four INTEGER sums in one
    * aggregation — exact, order-independent, oracle-replayable. */
  def tokenizerStats(df: DataFrame, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val words = filter(split(col(textCol), " "), w => length(w) > 0)
    val tokCounts = transform(words, w =>
      size(merges.foldLeft(charSyms(w))((syms, m) =>
        applyMergeCol(syms, m.left, m.right))))
    val perRow = df.select(
      size(words).cast("bigint").as("_nw"),
      coalesce(aggregate(tokCounts, lit(0L), (a, x) => a + x), lit(0L))
        .as("_nt"),
      coalesce(aggregate(transform(words, w => length(w)), lit(0L),
        (a, x) => a + x), lit(0L)).as("_nc"),
      size(filter(tokCounts, c => c === 1)).cast("bigint").as("_nu"))
    perRow.agg(
      sum(col("_nw")).as("n_words"), sum(col("_nt")).as("n_tokens"),
      sum(col("_nc")).as("n_chars"), sum(col("_nu")).as("n_unsplit"))
      .select(col("n_words"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("n_words"), 6)
          .as("tokens_per_word"),
        round(col("n_chars").cast("double") / col("n_tokens"), 6)
          .as("chars_per_token"),
        round(col("n_unsplit").cast("double") / col("n_words"), 6)
          .as("unsplit_frac"))
  }

  /** Production-size tokenizer: greedy lowest-rank merging per word with
    * the merge RANKS as one broadcast map — the standard BPE encode
    * algorithm (equivalent to applying the merges sequentially in rank
    * order, which Round10bSpec property-checks against [[encode]]). A
    * Scala UDF by necessity: the per-word loop is dictionary-driven and
    * unbounded in depth, which no fixed Catalyst expression tree can
    * express for a 32k-merge vocabulary; cost is O(word_len²·log) worst
    * case per word with a 32k-entry broadcast map, per-row, no shuffle. */
  def encodeGreedy(df: DataFrame, textCol: String, merges: Seq[Merge],
      outCol: String = "tokens"): DataFrame = {
    val spark = df.sparkSession
    val pairsB = spark.sparkContext.broadcast(
      merges.map(m => (m.left, m.right)).toIndexedSeq)
    val rankB = spark.sparkContext.broadcast(
      merges.zipWithIndex.map { case (m, i) => (m.left, m.right) -> i }.toMap)
    val tok = udf { (text: String) =>
      if (text == null) null
      else text.split(" ").filter(_.nonEmpty).toSeq.flatMap { w =>
        encodeWordGreedy(w, pairsB.value, rankB.value)
      }
    }
    df.withColumn(outCol, tok(col(textCol)))
  }

  /** Greedy BPE on one word: repeatedly fuse every left-to-right
    * non-overlapping occurrence of the LOWEST-RANK adjacent pair present. */
  private[graft] def encodeWordGreedy(word: String,
      pairs: IndexedSeq[(String, String)],
      rank: Map[(String, String), Int]): Seq[String] =
    encodeSymsGreedy(word.map(_.toString).toVector, pairs, rank)

  /** Greedy BPE over an arbitrary symbol vector — shared by the
    * char-level and byte-level encoders. */
  private[graft] def encodeSymsGreedy(initial: Vector[String],
      pairs: IndexedSeq[(String, String)],
      rank: Map[(String, String), Int]): Seq[String] = {
    var syms = initial
    var done = syms.size < 2
    while (!done) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.size - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (l, r) = pairs(best)
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.size) {
          if (j < syms.size - 1 && syms(j) == l && syms(j + 1) == r) {
            out += (l + r); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
        done = syms.size < 2
      }
    }
    syms
  }
}
