package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-15 regressions: the compacted (CSR) blocklist automaton's
  * heap budget and byte-bounded cache, plus this round's advisor
  * items. */
class Round15Spec extends SparkSpec {

  private def textsDf(rows: (Long, String)*): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    df(schema, rows.map { case (i, t) => Row(i, t) }: _*)
  }

  private def phrasesDf(ps: Seq[String]): DataFrame = {
    val schema = StructType(Seq(StructField("phrase", StringType)))
    df(schema, ps.map(Row(_)): _*)
  }

  // ------------------- blocklist CSR compaction (VERDICT r14 item 1)

  test("automaton heap stays within the CSR bound at 10^5 phrases") {
    // the advertised top end is 10^6; at 10^5 the analytic CSR bound
    // (~16 B/state + 6 B/edge, states <= chars + 1) must hold — the
    // map-per-state form this replaces costs ~10x more
    val phrases = (0 until 100000).map { i =>
      f"phrase$i%06d ${(i * 2654435761L % 9973)}%04d tail${i % 613}"
    }.sorted.toArray
    val totalChars = phrases.map(_.length.toLong).sum
    val ac = new graft.ops.Blocklist.Automaton(phrases)
    assert(ac.size <= totalChars + 1)
    val bound = 16L * (ac.size + 1) + 6L * (ac.size - 1) + 4096
    assert(ac.sizeBytes <= bound,
      s"sizeBytes=${ac.sizeBytes} exceeds CSR bound $bound")
    // concretely: ~22 B/state, far under 1 KB/phrase
    assert(ac.sizeBytes < 100L * 1024 * 1024)
    // spot correctness at this scale against driver brute force
    val reuse = new java.util.BitSet()
    val t1 = s"leading ${phrases(77777)} trailing ${phrases(123)}"
    val h1 = ac.find(t1, reuse)
    assert(h1.cardinality() == 2 && h1.get(77777) && h1.get(123))
    // the reused BitSet is CLEARED per call — no carryover hits
    val h2 = ac.find("no hits in here", reuse)
    assert(h2.isEmpty)
    assert(ac.anyMatch(t1) && !ac.anyMatch("still nothing"))
  }

  test("automaton dict links survive compaction (overlapping suffixes)") {
    // the classic set again, driven through the CSR form directly
    val ac = new graft.ops.Blocklist.Automaton(
      Array("he", "hers", "his", "she").sorted)
    val hits = ac.find("ushers")
    assert(hits.cardinality() == 3) // she, he, hers
    assert(!ac.find("uther").isEmpty) // "he" via fail path mid-word
    assert(ac.find("hi h").isEmpty)
  }

  test("automaton construction rejects unsorted pattern input") {
    intercept[IllegalArgumentException] {
      new graft.ops.Blocklist.Automaton(Array("zebra", "apple"))
    }
  }

  test("blocklist cache is bounded by bytes, not entry count") {
    val saved = graft.ops.Blocklist.cacheBudgetBytes
    try {
      val lists = (0 until 3).map(g =>
        (0 until 600).map(i => s"g${g}word${i} unique${i}"))
      // budget sized from the MEASURED automaton: holds 2 lists, not 3
      val per = new graft.ops.Blocklist.Automaton(
        lists.head.sorted.toArray).sizeBytes
      graft.ops.Blocklist.cacheBudgetBytes = (per * 2.5).toLong
      val texts = textsDf((1L, "alpha one"), (2L, "beta two"))
      lists.foreach { ps =>
        graft.ops.Blocklist.report(texts, "text", phrasesDf(ps), "phrase")
          .collect()
      }
      val (entries, bytes) = graft.ops.Blocklist.cacheStats
      assert(entries >= 1, "eviction must retain the entry being served")
      // 3 same-size lists at a 2.5x budget CANNOT all stay resident
      assert(bytes <= graft.ops.Blocklist.cacheBudgetBytes,
        s"cache holds $bytes bytes over the ${(per * 2.5).toLong} budget " +
          s"with $entries entries")
    } finally graft.ops.Blocklist.cacheBudgetBytes = saved
  }
}
