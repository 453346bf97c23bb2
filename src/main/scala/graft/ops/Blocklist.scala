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
  */
object Blocklist {

  /** Aho–Corasick automaton over a fixed lowercase pattern set: goto
    * trie + BFS failure links + dictionary (output) links. `find` runs
    * one pass over the text collecting the DISTINCT pattern ids present;
    * `anyMatch` exits on the first hit (the filter fast path). Built
    * per executor from the broadcast phrase array — construction is
    * O(total phrase chars). */
  final class Automaton(patterns: Array[String]) extends Serializable {
    import scala.collection.mutable.{ArrayBuffer, LongMap}
    private val next = ArrayBuffer(LongMap.empty[Int])
    private val outId = ArrayBuffer(-1)
    // trie
    patterns.zipWithIndex.foreach { case (p, id) =>
      var cur = 0
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i).toLong
        cur = next(cur).getOrElse(c, {
          next += LongMap.empty[Int]
          outId += -1
          next(cur).update(c, next.size - 1)
          next.size - 1
        })
        i += 1
      }
      if (outId(cur) < 0) outId(cur) = id // duplicate phrases collapse
    }
    private val fail = Array.fill(next.size)(0)
    private val dict = Array.fill(next.size)(-1) // nearest output via fail
    // BFS failure links
    locally {
      val queue = new java.util.ArrayDeque[Int]()
      next(0).foreach { case (_, v) => queue.add(v) }
      while (!queue.isEmpty) {
        val u = queue.poll()
        dict(u) = if (outId(fail(u)) >= 0) fail(u) else dict(fail(u))
        next(u).foreach { case (c, v) =>
          // walk u's fail chain to the deepest state with a c-edge;
          // next(f)(c) is strictly shallower than v, so no self-link
          var f = fail(u)
          while (f != 0 && !next(f).contains(c)) f = fail(f)
          fail(v) = next(f).getOrElse(c, 0)
          queue.add(v)
        }
      }
    }

    private def step(state: Int, c: Long): Int = {
      var s = state
      while (s != 0 && !next(s).contains(c)) s = fail(s)
      next(s).getOrElse(c, 0)
    }

    /** Distinct pattern ids occurring in `text` (empty set for null). */
    def find(text: String): java.util.BitSet = {
      val hits = new java.util.BitSet(patterns.length)
      if (text == null) return hits
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i).toLong)
        var d = if (outId(s) >= 0) s else dict(s)
        while (d >= 0) { hits.set(outId(d)); d = dict(d) }
        i += 1
      }
      hits
    }

    /** First-hit fast path for flag-only scans. */
    def anyMatch(text: String): Boolean = {
      if (text == null) return false
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i).toLong)
        if (outId(s) >= 0 || dict(s) >= 0) return true
        i += 1
      }
      false
    }

    def size: Int = next.size
  }

  /** Per-executor automaton cache keyed by the phrase list's CONTENT
    * hash — never by broadcast id, which restarts from 0 with every
    * SparkContext and could serve a stale automaton built from a
    * DIFFERENT list after a same-JVM session restart. Content keying
    * also means identical lists across broadcasts (bench loops, retry
    * re-submissions) share one build. LRU-bounded at 8 entries, evicted
    * one-at-a-time (a full clear would thrash rebuilds when >8 lists
    * are live concurrently). Builds run under the map lock so exactly
    * one task pays the O(total phrase chars) construction per list. */
  private val automata =
    new java.util.LinkedHashMap[String, Automaton](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Automaton]): Boolean = size() > 8
    }

  private def automatonFor(key: String,
      patterns: Array[String]): Automaton = automata.synchronized {
    val got = automata.get(key)
    if (got != null) got
    else { val a = new Automaton(patterns); automata.put(key, a); a }
  }

  /** md5 over the sorted phrase array — the cache identity, computed
    * ONCE on the driver. */
  private def contentKey(arr: Array[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    arr.foreach { p =>
      md.update(p.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.update(0.toByte)
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Normalized phrase array: distinct, lowercase, non-empty, SORTED
    * (so phrase ids — and therefore `blocked_list` order — are
    * deterministic regardless of the dataset's partitioning). */
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
      it.map { row =>
        val text = if (row.isNullAt(idx)) null
          else row.getString(idx).toLowerCase(java.util.Locale.ROOT)
        val hits = ac.find(text)
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
      it.map { row =>
        val text = if (row.isNullAt(idx)) null
          else row.getString(idx).toLowerCase(java.util.Locale.ROOT)
        val hits = ac.find(text)
        val list = Vector.newBuilder[String]
        var b = hits.nextSetBit(0)
        while (b >= 0) { list += pats(b); b = hits.nextSetBit(b + 1) }
        Row.fromSeq(row.toSeq :+ !hits.isEmpty :+
          hits.cardinality().toLong :+ list.result())
      }
    }(Encoders.row(newSchema))
  }
}
