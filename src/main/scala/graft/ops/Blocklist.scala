package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-pattern substring blocklist at BLOCKLIST scale — the
  * production form of [[Hygiene.blocklistPhrases]]: real curation
  * blocklists (RefinedWeb/UT1-class URL + boilerplate lists) carry
  * 10⁴–10⁶ entries, where the per-phrase expression chain
  * ([[graft.functions.TextFunctions.containsBlockedPhrase]] — kept, and
  * documented, for tens–hundreds of POLICY phrases) degenerates: the
  * codegen tree grows linearly in the phrase count (falling back to
  * interpreted mode past the JIT limit) and every row pays O(P·|text|)
  * scans. Here the phrase list is a DATASET, matched by one
  * Aho–Corasick automaton (Aho & Corasick 1975 — the classic
  * multi-pattern algorithm, one pass over the text regardless of P) in
  * a single `mapPartitions` kernel.
  *
  * Scale shape: ONE broadcast of the distinct lowercased phrase list
  * (the compact form — goto/fail tables are built per executor, once
  * per list CONTENT hash, so the wire carries phrase bytes, not
  * automaton pointers), then a narrow per-partition scan: no join, no shuffle,
  * no per-row expression growth. Driver/broadcast state is the phrase
  * list itself — the documented bound every multi-pattern engine
  * (grep -f, Hyperscan, Spark's own Bloom pushdown) shares. Matching
  * is case-insensitive over `lower(text)`, same contract as the
  * expression form.
  *
  * The automaton itself is stored as flat CSR arrays (~22 bytes per
  * trie state) rather than one hash map per state (~250 bytes with
  * boxed values), and the executor cache is bounded by ESTIMATED BYTES
  * (`graft.blocklist.cacheBytes`, default 512 MiB) rather than an
  * entry count — a 10⁶-entry list (~2·10⁷ states) costs ~450 MB as
  * CSR where the map-per-state form costs 4–6 GB, and an entry-count
  * bound would let eight of those pin tens of GB per executor.
  */
object Blocklist {

  /** Growable primitive int array (ArrayBuffer[Int] boxes). */
  private final class IntBuf(initial: Int) {
    private var a = new Array[Int](math.max(initial, 8))
    private var n = 0
    def +=(v: Int): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, a.length * 2)
      a(n) = v; n += 1
    }
    def apply(i: Int): Int = a(i)
    def update(i: Int, v: Int): Unit = a(i) = v
    def size: Int = n
    def toArray: Array[Int] = java.util.Arrays.copyOf(a, n)
  }

  /** Growable primitive char array. */
  private final class CharBuf(initial: Int) {
    private var a = new Array[Char](math.max(initial, 8))
    private var n = 0
    def +=(v: Char): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, a.length * 2)
      a(n) = v; n += 1
    }
    def apply(i: Int): Char = a(i)
    def update(i: Int, v: Char): Unit = a(i) = v
    def size: Int = n
  }

  /** Aho–Corasick automaton over a fixed lowercase pattern set, frozen
    * into flat CSR arrays: per-state sorted char-edge slices
    * (`edgeStart`/`edgeChar`/`edgeDest`, binary-searched), int
    * `fail`/`dict`/`outId` tables, and a direct-dispatch root row for
    * ASCII (the state every scan spends most of its time in). `find`
    * runs one pass over the text collecting the DISTINCT pattern ids
    * present into a CALLER-OWNED BitSet (reused across rows — a fresh
    * patterns-length BitSet per row is 125 KB of zeroing at 10⁶
    * patterns); `anyMatch` exits on the first hit (the filter fast
    * path).
    *
    * Construction exploits that `patterns` is SORTED: inserting in
    * lexicographic order, the only existing child a walk can follow is
    * each state's LAST-created child (a smaller char would contradict
    * the sort order), so the build needs no per-state map — just flat
    * parallel edge arrays in creation order, which a counting sort by
    * parent turns into CSR with per-state char order preserved. Peak
    * build memory is therefore the same ~O(total chars) flat shape as
    * the frozen form, not a transient map-per-state trie. */
  final class Automaton(patterns: Array[String]) extends Serializable {
    private val (nStates, edgeStart, edgeChar, edgeDest, outId) = {
      var totalChars = 0
      patterns.foreach(p => totalChars += p.length)
      var k = 1
      while (k < patterns.length) { // map-free build needs sorted input
        require(patterns(k - 1) <= patterns(k),
          "Blocklist.Automaton patterns must be sorted")
        k += 1
      }
      val cap = math.max(totalChars / 2, 16)
      // edges in creation order (per-parent char order = sorted order)
      val eParent = new IntBuf(cap)
      val eChar = new CharBuf(cap)
      val eDest = new IntBuf(cap)
      // last-created child per state (the only descendable one)
      val lastChar = new CharBuf(cap)
      val lastDest = new IntBuf(cap)
      val out = new IntBuf(cap)
      lastChar += '\u0000'; lastDest += -1; out += -1 // root
      var n = 1
      patterns.zipWithIndex.foreach { case (p, id) =>
        var cur = 0
        var i = 0
        while (i < p.length) {
          val c = p.charAt(i)
          cur =
            if (lastDest(cur) >= 0 && lastChar(cur) == c) lastDest(cur)
            else {
              eParent += cur; eChar += c; eDest += n
              lastChar(cur) = c; lastDest(cur) = n
              lastChar += '\u0000'; lastDest += -1; out += -1
              n += 1; n - 1
            }
          i += 1
        }
        if (out(cur) < 0) out(cur) = id // duplicate phrases collapse
      }
      // counting sort edges by parent -> CSR (stable, so per-parent
      // sorted char order survives)
      val e = eParent.size
      val start = new Array[Int](n + 1)
      var i = 0
      while (i < e) { start(eParent(i) + 1) += 1; i += 1 }
      i = 0
      while (i < n) { start(i + 1) += start(i); i += 1 }
      val cursor = java.util.Arrays.copyOf(start, n)
      val chars = new Array[Char](e)
      val dests = new Array[Int](e)
      i = 0
      while (i < e) {
        val p = eParent(i)
        chars(cursor(p)) = eChar(i)
        dests(cursor(p)) = eDest(i)
        cursor(p) += 1
        i += 1
      }
      (n, start, chars, dests, out.toArray)
    }

    /** goto(state, c) via binary search of the state's sorted edge
      * slice; -1 when absent. */
    private def edge(state: Int, c: Char): Int = {
      var lo = edgeStart(state)
      var hi = edgeStart(state + 1) - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val mc = edgeChar(mid)
        if (mc == c) return edgeDest(mid)
        else if (mc < c) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }

    // direct root dispatch for ASCII — the state most scan chars hit
    private val rootAscii = {
      val a = new Array[Int](128)
      var c = 0
      while (c < 128) {
        val d = edge(0, c.toChar); a(c) = if (d < 0) 0 else d; c += 1
      }
      a
    }

    private val fail = new Array[Int](nStates)
    private val dict = Array.fill(nStates)(-1) // nearest output via fail
    // BFS failure links over the CSR slices
    locally {
      val queue = new java.util.ArrayDeque[Int]()
      var i = edgeStart(0)
      while (i < edgeStart(1)) { queue.add(edgeDest(i)); i += 1 }
      while (!queue.isEmpty) {
        val u = queue.poll()
        dict(u) = if (outId(fail(u)) >= 0) fail(u) else dict(fail(u))
        var j = edgeStart(u)
        while (j < edgeStart(u + 1)) {
          val c = edgeChar(j)
          val v = edgeDest(j)
          // walk u's fail chain to the deepest state with a c-edge;
          // edge(f, c) is strictly shallower than v, so no self-link
          var f = fail(u)
          while (f != 0 && edge(f, c) < 0) f = fail(f)
          val g = edge(f, c)
          fail(v) = if (g < 0) 0 else g
          queue.add(v)
          j += 1
        }
      }
    }

    private def step(state: Int, c: Char): Int = {
      var s = state
      while (s != 0) {
        val d = edge(s, c)
        if (d >= 0) return d
        s = fail(s)
      }
      if (c < 128) rootAscii(c) else { val d = edge(0, c); if (d < 0) 0 else d }
    }

    /** Distinct pattern ids occurring in `text`, set into the
      * caller-owned `hits` (cleared first; empty for null text). Reuse
      * one BitSet per partition — allocation scales with patterns. */
    def find(text: String, hits: java.util.BitSet): java.util.BitSet = {
      hits.clear()
      if (text == null) return hits
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        var d = if (outId(s) >= 0) s else dict(s)
        while (d >= 0) { hits.set(outId(d)); d = dict(d) }
        i += 1
      }
      hits
    }

    /** Convenience form allocating a fresh BitSet (tests / one-offs). */
    def find(text: String): java.util.BitSet =
      find(text, new java.util.BitSet())

    /** First-hit fast path for flag-only scans. */
    def anyMatch(text: String): Boolean = {
      if (text == null) return false
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        if (outId(s) >= 0 || dict(s) >= 0) return true
        i += 1
      }
      false
    }

    def size: Int = nStates

    /** Estimated heap bytes of the frozen CSR representation — the
      * cache-eviction weight. Int arrays at 4 B/slot, char at 2 B,
      * plus the root dispatch row and array headers. */
    def sizeBytes: Long =
      4L * (edgeStart.length + edgeDest.length + fail.length +
        dict.length + outId.length + rootAscii.length) +
        2L * edgeChar.length + 7L * 16
  }

  /** Per-executor automaton cache keyed by the phrase list's CONTENT
    * hash — never by broadcast id, which restarts from 0 with every
    * SparkContext and could serve a stale automaton built from a
    * DIFFERENT list after a same-JVM session restart. Content keying
    * also means identical lists across broadcasts (bench loops, retry
    * re-submissions) share one build. Bounded by ESTIMATED BYTES
    * (`graft.blocklist.cacheBytes` system property, default 512 MiB) —
    * an entry-count bound is meaningless when one 10⁶-entry automaton
    * is 10⁴× the size of a policy list — evicting least-recently-used
    * BUILT entries first and always retaining the entry being
    * served. */
  /** Lazy per-key holder: the map lock only covers holder insertion
    * and byte accounting; the O(total phrase chars) build runs under
    * the HOLDER's own lazy lock, so one list's construction never
    * blocks cache hits for other lists on the executor. `counted` is
    * guarded by the cache lock. */
  private final class Holder(private var patterns: Array[String]) {
    // release the phrase strings once the CSR form exists — a lazy
    // val's captured constructor param is otherwise retained for the
    // holder's lifetime, pinning ~100 MB of uncounted String heap per
    // 10⁶-entry list on top of the counted CSR bytes
    lazy val automaton: Automaton = {
      val a = new Automaton(patterns)
      patterns = null
      a
    }
    var counted: Boolean = false
  }

  private[graft] var cacheBudgetBytes: Long = java.lang.Long.getLong(
    "graft.blocklist.cacheBytes", 512L * 1024 * 1024)

  private var cachedBytes = 0L
  private val automata =
    new java.util.LinkedHashMap[String, Holder](16, 0.75f, true)

  /** (entries, counted bytes) — test/diagnostic view of the cache. */
  private[graft] def cacheStats: (Int, Long) =
    automata.synchronized((automata.size(), cachedBytes))

  private def automatonFor(key: String,
      patterns: Array[String]): Automaton = {
    val h = automata.synchronized {
      val got = automata.get(key)
      if (got != null) got
      else { val n = new Holder(patterns); automata.put(key, n); n }
    }
    val ac = h.automaton // build outside the cache lock
    automata.synchronized {
      // count this build once, then shed LRU built entries over budget;
      // skip the holder being served, and holders evicted before their
      // build finished (no longer in the map) are never counted.
      if (!h.counted && (automata.get(key) eq h)) {
        h.counted = true
        cachedBytes += ac.sizeBytes
        val it = automata.entrySet().iterator()
        while (cachedBytes > cacheBudgetBytes && it.hasNext) {
          val e = it.next()
          if ((e.getValue ne h) && e.getValue.counted) {
            cachedBytes -= e.getValue.automaton.sizeBytes
            it.remove()
          }
        }
      }
    }
    ac
  }

  /** md5 over the sorted phrase array — the cache identity, computed
    * ONCE on the driver. Each phrase is LENGTH-PREFIXED (4 bytes,
    * big-endian) so no separator byte can be confused with phrase
    * content — ["a<NUL>b"] and ["a", "b"] digest differently. */
  private def contentKey(arr: Array[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    arr.foreach { p =>
      val bytes = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      md.update(java.nio.ByteBuffer.allocate(4).putInt(bytes.length)
        .array())
      md.update(bytes)
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Normalized phrase array: distinct, lowercase, non-empty, SORTED
    * (so phrase ids — and therefore `blocked_list` order — are
    * deterministic regardless of the dataset's partitioning; the
    * sorted order is also what lets construction run map-free). */
  private def phraseArray(phrases: DataFrame, phraseCol: String): Array[String] = {
    val arr = phrases
      .select(lower(trim(col(phraseCol))).as("_p"))
      .filter(col("_p").isNotNull && length(col("_p")) > 0)
      .distinct()
      .collect().map(_.getString(0)).sorted // blocklist-sized driver state
    require(arr.nonEmpty, "blocklist dataset has no usable phrases")
    arr
  }

  /** Append `blocked` (any phrase present) and `blocked_phrases`
    * (DISTINCT phrases present) for `textCol` against a phrase DATASET —
    * the report arm. One mapPartitions kernel; output columns match
    * [[Hygiene.blocklistPhrases]]'s report mode, so consumers can swap
    * forms as the list grows. */
  def report(df: DataFrame, textCol: String, phrases: DataFrame,
      phraseCol: String): DataFrame = {
    val arr = phraseArray(phrases, phraseCol)
    val key = contentKey(arr)
    val bc = df.sparkSession.sparkContext.broadcast(arr)
    val idx = df.schema.fieldIndex(textCol)
    val newSchema = df.schema
      .add(StructField("blocked", BooleanType, nullable = false))
      .add(StructField("blocked_phrases", LongType, nullable = false))
    df.mapPartitions { it =>
      val ac = automatonFor(key, bc.value)
      val hits = new java.util.BitSet() // reused across the partition
      it.map { row =>
        val text = if (row.isNullAt(idx)) null
          else row.getString(idx).toLowerCase(java.util.Locale.ROOT)
        ac.find(text, hits)
        Row.fromSeq(row.toSeq :+ !hits.isEmpty :+ hits.cardinality().toLong)
      }
    }(Encoders.row(newSchema))
  }

  /** Drop every row whose `textCol` contains ANY phrase of the dataset —
    * the filter arm (first-hit early exit per row; null text passes,
    * same three-valued-logic contract as the expression form). */
  def filterBlocked(df: DataFrame, textCol: String, phrases: DataFrame,
      phraseCol: String): DataFrame = {
    val arr = phraseArray(phrases, phraseCol)
    val key = contentKey(arr)
    val bc = df.sparkSession.sparkContext.broadcast(arr)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      val ac = automatonFor(key, bc.value)
      it.filter { row =>
        val text = if (row.isNullAt(idx)) null
          else row.getString(idx).toLowerCase(java.util.Locale.ROOT)
        !ac.anyMatch(text)
      }
    }(Encoders.row(df.schema))
  }

  /** Report arm plus `blocked_list` — the matched phrases themselves
    * (sorted), for rule-tuning rollouts that need WHICH entries fire.
    * Costs the full find() even on clean rows; prefer [[report]] when
    * only the counts matter. */
  def reportMatches(df: DataFrame, textCol: String, phrases: DataFrame,
      phraseCol: String): DataFrame = {
    val arr = phraseArray(phrases, phraseCol)
    val key = contentKey(arr)
    val bc = df.sparkSession.sparkContext.broadcast(arr)
    val idx = df.schema.fieldIndex(textCol)
    val newSchema = df.schema
      .add(StructField("blocked", BooleanType, nullable = false))
      .add(StructField("blocked_phrases", LongType, nullable = false))
      .add(StructField("blocked_list", ArrayType(StringType), nullable = false))
    df.mapPartitions { it =>
      val ac = automatonFor(key, bc.value)
      val pats = bc.value
      val hits = new java.util.BitSet() // reused across the partition
      it.map { row =>
        val text = if (row.isNullAt(idx)) null
          else row.getString(idx).toLowerCase(java.util.Locale.ROOT)
        ac.find(text, hits)
        val list = Vector.newBuilder[String]
        var b = hits.nextSetBit(0)
        while (b >= 0) { list += pats(b); b = hits.nextSetBit(b + 1) }
        Row.fromSeq(row.toSeq :+ !hits.isEmpty :+
          hits.cardinality().toLong :+ list.result())
      }
    }(Encoders.row(newSchema))
  }
}
