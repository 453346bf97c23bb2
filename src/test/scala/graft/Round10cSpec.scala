package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.CdcChunk

/** Round-10: content-defined chunking + sub-document chunk dedup. */
class Round10cSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def chunkList(text: String, p: Int = 16): Seq[String] =
    CdcChunk.explodeChunks(df(schema, Row(1L, text)), "doc_id", "text", p)
      .orderBy("chunk_idx").collect()
      .map(_.getAs[String]("chunk")).toSeq

  test("cdc: chunks reconstruct the normalized text") {
    val t = "the quick brown fox jumps over the lazy dog again and again " +
      "with many more words to cross several boundaries hopefully"
    val chunks = chunkList(t)
    assert(chunks.mkString(" ") == t.split(" ").filter(_.nonEmpty).mkString(" "))
    assert(chunks.forall(_.nonEmpty))
  }

  test("cdc: boundaries are content-local — prefix edit leaves the tail chunks") {
    // a long pseudo-random word stream guarantees several boundaries at p=4
    val words = (1 to 120).map(i => s"w${i * 7 % 101}")
    val base = chunkList(words.mkString(" "), p = 4)
    val perturbed = chunkList(("INSERTED " + words.mkString(" ")), p = 4)
    assert(base.size >= 3, s"want several chunks, got ${base.size}")
    // every chunk after the first boundary re-synchronizes
    assert(base.tail.forall(perturbed.contains),
      "tail chunks must survive a prefix insertion")
  }

  test("cdc: null and empty text produce no chunks") {
    val d = df(schema, Row(1L, null), Row(2L, ""), Row(3L, "   "))
    assert(CdcChunk.explodeChunks(d, "doc_id", "text").count() == 0)
  }

  test("cdc: duplicateChunkStats finds cross-document shared chunks") {
    val shared = (1 to 40).map(i => s"s${i * 3 % 97}").mkString(" ")
    val d = df(schema,
      Row(1L, shared), Row(2L, shared),
      Row(3L, "totally unrelated content here"))
    val stats = CdcChunk.duplicateChunkStats(d, "doc_id", "text", p = 4)
      .collect()
    assert(stats.nonEmpty)
    assert(stats.forall(r => r.getAs[Long]("n_docs") == 2 &&
      r.getAs[Long]("n_occurrences") == 2))
  }

  test("cdc: removeDuplicateChunks keeps first occurrence, empties full dups") {
    val shared = (1 to 40).map(i => s"s${i * 3 % 97}").mkString(" ")
    val d = df(schema,
      Row(1L, shared), Row(2L, shared), Row(3L, "unique doc text"), Row(4L, null))
    val out = CdcChunk.removeDuplicateChunks(d, "doc_id", "text", p = 4)
      .orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text_dedup")).toMap
    assert(out(1L) == shared)         // first occurrence intact
    assert(out(2L) == "")             // fully duplicated -> empty
    assert(out(3L) == "unique doc text")
    assert(out(4L) == "")             // null text -> empty rewrite
  }

  test("cdc yaml registry: three modes dispatch") {
    val d = df(schema, Row(1L, "a b c d e f g h i j"))
    def run(mode: String) = graft.api.Registry("cdc_chunk")(d,
      graft.api.Conf.fromYaml(
        s"type: cdc_chunk\nid_key: doc_id\ntext_key: text\nmode: $mode"), null)
    assert(run("chunks").columns.contains("chunk_hash"))
    assert(run("dup_stats").columns.contains("n_occurrences"))
    assert(run("rewrite").columns.contains("text_dedup"))
    val bad = intercept[IllegalArgumentException] { run("nope") }
    assert(bad.getMessage.contains("cdc_chunk mode"))
  }
}
