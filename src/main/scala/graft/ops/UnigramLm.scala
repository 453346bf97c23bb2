package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unigram-language-model tokenizer training — the OTHER public
  * subword-vocabulary family (Kudo 2018, "Subword Regularization";
  * the open SentencePiece trainer's default), complementing
  * [[BpeTrain]]'s merge-based induction (the reference has no
  * tokenizer story — §2.14 engine extension). Where BPE grows a
  * vocabulary bottom-up by fusing pairs, the unigram model starts from
  * a large SEED of candidate substrings and shrinks it: each EM
  * iteration re-estimates piece probabilities from the corpus's best
  * segmentations, then prunes the least-used pieces toward the target
  * size. Encoding picks each word's maximum-likelihood segmentation by
  * Viterbi decoding over the final piece probabilities.
  *
  * Two DOCUMENTED simplifications of the published trainer, chosen for
  * bit-stable distributed behavior (both standard in practice):
  * (1) hard (Viterbi) EM — expected counts come from each word's single
  * best segmentation, not the forward-backward posterior, so the
  * sufficient statistics are INTEGERS (piece-use × word-count) and
  * their distributed sums are exact under any partitioning;
  * (2) count-rank pruning — pieces are pruned lowest-usage-first
  * (ties piece-ascending) rather than by likelihood-loss, so the
  * survivor set is a deterministic function of the usage table.
  *
  * Scale shape (the [[BpeTrain]] discipline): the corpus pays ONE
  * word-count aggregation; seeding explodes the DISTINCT-WORD table
  * into its substring windows (O(vocab × len × maxPieceLen), corpus-
  * size-independent); every EM iteration is one Viterbi pass over the
  * word table against a BROADCAST vocabulary with a vocab-sized usage
  * aggregation. Driver state = the vocabulary (seedSize entries max).
  */
object UnigramLm {

  /** Normalized word-frequency table — the ONE corpus-sized
    * aggregation: lowercase, alnum runs (the [[CorpusStats]]
    * tokenizer, so vocab/zipf/unigram reports share a word model). */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(col(textCol)), "[^a-z0-9]+"))
        .as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Every substring window of `word` with length 1..maxPieceLen —
    * the seed-candidate enumeration (pure expressions, so the DuckDB
    * oracle replays it). */
  private def substrWindows(word: Column, maxPieceLen: Int): Column =
    flatten(transform(sequence(lit(1), length(word)), i =>
      transform(
        sequence(lit(1), least(lit(maxPieceLen), length(word) - i + 1)),
        l => word.substr(i, l))))

  /** Corpus-weighted substring-window counts from a (word, cnt)
    * table: candidate piece -> total occurrence weight. */
  def seedCounts(words: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .select(col("cnt"),
        explode(substrWindows(col("word"), maxPieceLen)).as("piece"))
      .groupBy("piece")
      .agg(sum(col("cnt")).as("cnt"))

  /** Seed vocabulary: ALL single characters (coverage) plus the top
    * multi-character substrings by (count desc, piece asc) up to
    * `seedSize` total, with `logp = ln(cnt / total over the seed)`
    * rounded to 6 (the q254 ln-gate precedent). The multi-char top-k
    * plans as TakeOrderedAndProject — map-side partial top-k, no
    * unpartitioned window, no full sort. */
  def seed(words: DataFrame, maxPieceLen: Int, seedSize: Int): DataFrame =
    seedFrame(words.sparkSession, seedEntries(words, maxPieceLen, seedSize))

  /** The seed selection as ONE bounded collect (guide §1.2: the old
    * form paid three sequential driver actions — a chars count, a
    * selected-total scalar, and the trainer's own collect of the built
    * frame). The collected superset is bounded by construction: every
    * single-char piece (wordCounts normalizes to [a-z0-9], so ≤ 36
    * rows) plus the top `seedSize` multi-char pieces — a superset of
    * the kMulti = seedSize − nChars the selection needs, truncated
    * driver-side under the same (count desc, piece asc) total order
    * the distributed TakeOrdered used (pieces are distinct, so the
    * order is total and the boundary deterministic). logp replicates
    * Spark's round(log(cnt/total), 6) bit-for-bit: the same
    * double division, java.lang.Math.log, and HALF_UP BigDecimal
    * 6-digit rounding that the old Column expression evaluated —
    * pinned old-vs-new in Round19Spec. */
  private[graft] def seedEntries(words: DataFrame, maxPieceLen: Int,
      seedSize: Int): Array[VocabEntry] = {
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    require(seedSize >= 2, s"seedSize must be >= 2, got $seedSize")
    val counts = graft.core.PersistScope.register(
      seedCounts(words, maxPieceLen).persist())
    val picked = counts.filter(length(col("piece")) === 1)
      .unionByName(counts.filter(length(col("piece")) >= 2)
        .orderBy(col("cnt").desc, col("piece")).limit(seedSize))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // an empty selection (no alphanumeric tokens anywhere) must fail
    // with a NAMED error, not an NPE off a null sum
    require(picked.nonEmpty,
      "unigram seed: corpus has no alphanumeric tokens to seed from")
    val (chars, multiAll) = picked.partition(_._1.length == 1)
    val kMulti = math.max(seedSize - chars.length, 0)
    val multi = multiAll.sortBy { case (p, c) => (-c, p) }.take(kMulti)
    val sel = chars ++ multi
    val total = sel.map(_._2).sum
    sel.map { case (p, c) =>
      val logp = java.math.BigDecimal
        .valueOf(math.log(c.toDouble / total.toDouble))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      VocabEntry(p, c, logp)
    }
  }

  /** The (piece, cnt, logp) frame [[seed]] publishes, from collected
    * entries. */
  private def seedFrame(spark: org.apache.spark.sql.SparkSession,
      entries: Array[VocabEntry]): DataFrame = {
    import spark.implicits._
    entries.toSeq.map(v => (v.piece, v.cnt, v.logp))
      .toDF("piece", "cnt", "logp")
  }

  /** One vocabulary entry: surviving piece, its corpus-weighted
    * Viterbi usage from the last EM iteration (seed-window count when
    * `emIters = 0`), and its rounded log-probability. */
  final case class VocabEntry(piece: String, cnt: Long, logp: Double)

  /** Maximum-likelihood segmentation of `word` under (piece -> logp):
    * standard Viterbi DP, O(len × maxPieceLen). A character absent
    * from the vocabulary is emitted as its own piece at `unkLogp`
    * (full coverage — round-trips are always exact). Ties prefer the
    * LONGER final piece, so segmentation is deterministic. */
  private[graft] def viterbi(word: String,
      logps: java.util.HashMap[String, java.lang.Double],
      maxPieceLen: Int, unkLogp: Double): Array[String] = {
    val n = word.length
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1) // length of the piece ending at j
    var j = 1
    while (j <= n) {
      var bs = Double.NegativeInfinity
      var bl = 0
      var l = math.min(maxPieceLen, j)
      // descending l: at equal score the LONGER piece wins
      while (l >= 1) {
        val piece = word.substring(j - l, j)
        val lp = logps.get(piece)
        val sc =
          if (lp != null) best(j - l) + lp.doubleValue()
          else if (l == 1) best(j - 1) + unkLogp // char fallback
          else Double.NegativeInfinity
        if (sc > bs) { bs = sc; bl = l }
        l -= 1
      }
      best(j) = bs
      back(j) = bl
      j += 1
    }
    val out = List.newBuilder[String]
    var p = n
    val rev = scala.collection.mutable.ArrayBuffer.empty[String]
    while (p > 0) { rev += word.substring(p - back(p), p); p -= back(p) }
    out ++= rev.reverseIterator
    out.result().toArray
  }

  // boxed values: a primitive-Double map's get would UNBOX an absent
  // key's null to 0.0 — every substring would read as in-vocab at the
  // best possible score
  private def toLogpMap(vocab: Array[VocabEntry])
      : java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](
      vocab.length * 2)
    vocab.foreach(v => m.put(v.piece, java.lang.Double.valueOf(v.logp)))
    m
  }

  /** Char-indexed piece trie over an all-ASCII vocabulary: flat
    * children array (node·128 + char → node, −1 absent), per-node logp
    * (NaN = prefix only). Lets the Viterbi DP probe pieces with array
    * derefs instead of a substring ALLOCATION + HashMap probe per DP
    * cell — the normalized corpus alphabet is [a-z0-9], so this is the
    * production path; [[segmenter]] falls back to the HashMap kernel
    * for any non-ASCII vocabulary. */
  private[graft] final class AsciiPieceTrie(vocab: Array[VocabEntry]) {
    private val cap = vocab.iterator.map(_.piece.length).sum + 1
    val children: Array[Int] = Array.fill(cap * 128)(-1)
    val logps: Array[Double] = Array.fill(cap)(Double.NaN)
    private var nNodes = 1
    vocab.foreach { v =>
      var node = 0
      var i = 0
      while (i < v.piece.length) {
        val c = v.piece.charAt(i).toInt
        var nxt = children(node * 128 + c)
        if (nxt < 0) { nxt = nNodes; nNodes += 1; children(node * 128 + c) = nxt }
        node = nxt
        i += 1
      }
      logps(node) = v.logp
    }
  }

  /** [[viterbi]] over an [[AsciiPieceTrie]]: the identical forward DP
    * (same float adds, same strict-> relaxation), with candidates for
    * each end position j arriving in the SAME descending-piece-length
    * order the backward kernel scans (i ascending ⟺ l = j−i
    * descending, and the l=1 char/unk fallback is evaluated last), so
    * scores, ties and segmentations are bit-identical — pinned against
    * the HashMap kernel in Round19Spec. A word char outside ASCII
    * simply has no trie edge (an all-ASCII vocabulary cannot contain
    * it) and falls through to the unk single-char piece, exactly like
    * the HashMap miss. */
  private[graft] def viterbiTrie(word: String, trie: AsciiPieceTrie,
      maxPieceLen: Int, unkLogp: Double): Array[String] = {
    val n = word.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    best(0) = 0.0
    var i = 0
    while (i < n) {
      val bi = best(i)
      var node = 0
      var covered1 = false
      val maxL = math.min(maxPieceLen, n - i)
      var l = 1
      var walking = true
      while (walking && l <= maxL) {
        val c = word.charAt(i + l - 1).toInt
        val nxt = if (c < 128) trie.children(node * 128 + c) else -1
        if (nxt < 0) walking = false
        else {
          node = nxt
          val lp = trie.logps(node)
          if (!lp.isNaN) {
            if (l == 1) covered1 = true
            val sc = bi + lp
            if (sc > best(i + l)) { best(i + l) = sc; back(i + l) = l }
          }
          l += 1
        }
      }
      if (!covered1) {
        val sc = bi + unkLogp
        if (sc > best(i + 1)) { best(i + 1) = sc; back(i + 1) = 1 }
      }
      i += 1
    }
    val rev = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) { rev += word.substring(p - back(p), p); p -= back(p) }
    val out = new Array[String](rev.length)
    var k = 0
    while (k < rev.length) { out(k) = rev(rev.length - 1 - k); k += 1 }
    out
  }

  /** The word segmenter for a trained vocabulary: the trie kernel when
    * every piece is ASCII (the normalized-corpus case), the HashMap
    * kernel otherwise. Both return identical segmentations; the trie
    * replaces the per-DP-cell substring+HashMap probe with two array
    * reads (guide §1.2 per-task work — q260's encode kernel). */
  private def segmenter(vocab: Array[VocabEntry],
      maxPieceLen: Int): String => Array[String] = {
    val unk = unkLogpOf(vocab)
    if (vocab.forall(v => v.piece.forall(_ < 128))) {
      val trie = new AsciiPieceTrie(vocab)
      w => viterbiTrie(w, trie, maxPieceLen, unk)
    } else {
      val m = toLogpMap(vocab)
      w => viterbi(w, m, maxPieceLen, unk)
    }
  }

  /** Out-of-vocabulary character penalty: well below the rarest real
    * piece, so an unknown char never outcompetes a vocabulary piece. */
  private def unkLogpOf(vocab: Array[VocabEntry]): Double =
    vocab.iterator.map(_.logp).min - math.log(100.0)

  /** Full training: seed -> `emIters` × (Viterbi E-step over the word
    * table, exact integer usage sums -> re-estimate -> prune to
    * `targetSize` by (usage desc, piece asc), single chars always
    * kept, zero-usage multi-char pieces always dropped). Returns the
    * final (piece, cnt, logp) vocabulary table. `emIters = 0` returns
    * the seed itself (the SQL-replayable configuration gating q259). */
  def train(df: DataFrame, textCol: String, maxPieceLen: Int = 8,
      seedSize: Int = 2000, targetSize: Int = 800,
      emIters: Int = 2): DataFrame = {
    require(emIters >= 0, s"emIters must be >= 0, got $emIters")
    require(targetSize >= 2, s"targetSize must be >= 2, got $targetSize")
    val spark = df.sparkSession
    val words = graft.core.PersistScope.register(
      wordCounts(df, textCol).persist())
    // the seed entries are already driver-resident (one bounded
    // collect) — no round trip through a frame and back
    val entries = seedEntries(words, maxPieceLen, seedSize)
    if (emIters == 0) return seedFrame(spark, entries)
    // vocab-sized driver state from here on — model, never corpus
    var vocab = entries.sortBy(_.piece)
    var it = 0
    while (it < emIters) {
      val bc = spark.sparkContext.broadcast(vocab)
      val maxLen = maxPieceLen
      // E-step: corpus-weighted Viterbi piece usage. INTEGER statistics
      // (uses × word cnt), so the distributed sum is exact under any
      // partitioning — no float accumulation order to drift.
      val usage = words.select(col("word"), col("cnt"))
        .as[(String, Long)](Encoders.tuple(Encoders.STRING,
          Encoders.scalaLong))
        .mapPartitions { rows =>
          val seg = segmenter(bc.value, maxLen)
          rows.flatMap { case (w, c) =>
            seg(w).iterator.map(p => (p, c))
          }
        }(Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
        .toDF("piece", "uses")
        .groupBy("piece").agg(sum(col("uses")).as("uses"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // M-step + prune: single chars survive unconditionally (coverage
      // for later encodes); multi-char pieces need usage, ranked
      // (usage desc, piece asc) into the target budget.
      val chars = vocab.filter(_.piece.length == 1)
        .map(v => v.piece -> usage.getOrElse(v.piece, 0L))
      val multiBudget = math.max(targetSize - chars.length, 0)
      val multi = vocab.filter(_.piece.length >= 2)
        .map(v => v.piece -> usage.getOrElse(v.piece, 0L))
        .filter(_._2 > 0L)
        .sortBy { case (p, u) => (-u, p) }
        .take(multiBudget)
      val survivors = (chars ++ multi).sortBy(_._1)
      val total = math.max(survivors.map(_._2).sum, 1L)
      vocab = survivors.map { case (p, u) =>
        // +1/2 floor keeps never-used single chars finite (they carry
        // no corpus mass but must stay encodable)
        val pr =
          if (u > 0) u.toDouble / total
          else 0.5 / (total + survivors.length)
        VocabEntry(p, u, graft.core.Num.rnd6(math.log(pr)))
      }
      bc.destroy()
      it += 1
    }
    import spark.implicits._
    vocab.toSeq.toDF("piece", "cnt", "logp")
  }

  /** Viterbi-encode `textCol` against a trained (piece, logp) vocab
    * table: normalize like [[wordCounts]], segment each word, emit the
    * flattened piece array plus the word-joined `decoded` round-trip
    * string (pieces concatenated per word, words joined by one space —
    * equal to the normalized input by construction, the q260 gate).
    * One broadcast of the vocab, one mapPartitions kernel — the
    * [[Blocklist]] shape: no join, no shuffle. */
  def encode(df: DataFrame, textCol: String, vocab: DataFrame,
      maxPieceLen: Int = 8, piecesOut: String = "pieces",
      decodedOut: String = "decoded"): DataFrame = {
    val entries = vocab.select(col("piece"), col("logp"))
      .collect().map(r => VocabEntry(r.getString(0), 0L, r.getDouble(1)))
      .sortBy(_.piece)
    require(entries.nonEmpty, "empty unigram vocabulary")
    val bc = df.sparkSession.sparkContext.broadcast(entries)
    val idx = df.schema.fieldIndex(textCol)
    val maxLen = maxPieceLen
    val newSchema = df.schema
      .add(StructField(piecesOut, ArrayType(StringType), nullable = false))
      .add(StructField(decodedOut, StringType, nullable = false))
    df.mapPartitions { it =>
      val seg = segmenter(bc.value, maxLen)
      it.map { row =>
        val text = if (row.isNullAt(idx)) "" else row.getString(idx)
        val wordsArr = text.toLowerCase(java.util.Locale.ROOT)
          .split("[^a-z0-9]+").filter(_.nonEmpty)
        val segs = wordsArr.map(seg)
        Row.fromSeq(row.toSeq :+ segs.flatten.toSeq :+
          segs.map(_.mkString).mkString(" "))
      }
    }(Encoders.row(newSchema))
  }
}
