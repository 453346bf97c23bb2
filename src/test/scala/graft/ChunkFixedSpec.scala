package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.PackOp

class ChunkFixedSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("g", StringType), StructField("doc_id", LongType),
    StructField("tok", LongType)))

  private def chunk(seqLen: Long, rows: Row*) =
    PackOp.chunkFixed(df(schema, rows: _*), Seq("g"), "doc_id", "tok", seqLen)
      .select("g", "doc_id", "chunk_id", "tok_start", "tok_len")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))

  test("a straddling document splits across adjacent chunks") {
    // stream: doc1 (6 tokens) fills chunk 0 up to 6; doc2 (8) spans the
    // 10-token cut: 4 tokens into chunk 0, 4 into chunk 1.
    val out = chunk(10L, Row("a", 1L, 6L), Row("a", 2L, 8L)).toSet
    assert(out === Set(
      ("a", 1L, 0L, 0L, 6L),
      ("a", 2L, 0L, 0L, 4L),
      ("a", 2L, 1L, 4L, 4L)))
  }

  test("a document longer than seqLen spans many chunks") {
    val out = chunk(5L, Row("a", 1L, 12L)).toSet
    assert(out === Set(
      ("a", 1L, 0L, 0L, 5L), ("a", 1L, 1L, 5L, 5L), ("a", 1L, 2L, 10L, 2L)))
  }

  test("groups chunk independently; zero-token docs drop") {
    val out = chunk(10L,
      Row("a", 1L, 3L), Row("b", 2L, 4L), Row("a", 3L, 0L))
    assert(out.toSet === Set(("a", 1L, 0L, 0L, 3L), ("b", 2L, 0L, 0L, 4L)))
  }

  test("invariants on a random stream: chunks tile exactly, docs tile exactly") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 40).map(i =>
      Row(if (i % 2 == 0) "a" else "b", i.toLong, rng.nextInt(30).toLong + 1))
    val out = chunk(16L, rows: _*)
    // every doc's slices tile [0, tok) contiguously (tuple fields:
    // _1 g, _2 doc_id, _3 chunk_id, _4 tok_start, _5 tok_len)
    val byDoc = out.groupBy(_._2)
    rows.foreach { r =>
      val slices = byDoc(r.getLong(1)).sortBy(_._4)
      assert(slices.head._4 === 0L)
      assert(slices.map(_._5).sum === r.getLong(2))
      slices.sliding(2).foreach {
        case Array(x, y) => assert(x._4 + x._5 === y._4)
        case _ =>
      }
    }
    // within each group, every chunk except the last holds exactly seqLen
    out.groupBy(_._1).foreach { case (_, rs) =>
      val perChunk = rs.groupBy(_._3).view.mapValues(_.map(_._5).sum).toMap
      val last = perChunk.keys.max
      perChunk.foreach { case (cid, total) =>
        if (cid < last) assert(total === 16L, s"chunk $cid not full")
        else assert(total <= 16L)
      }
    }
  }

  test("reserved output columns are rejected") {
    val bad = df(StructType(Seq(StructField("g", StringType),
      StructField("doc_id", LongType), StructField("chunk_id", LongType))),
      Row("a", 1L, 1L))
    intercept[IllegalArgumentException] {
      PackOp.chunkFixed(bad, Seq("g"), "doc_id", "1", 10L)
    }
  }

  test("Frame and LazyFrame wire chunkFixed with YAML round-trip") {
    val d = df(schema, Row("a", 1L, 6L), Row("a", 2L, 8L))
    assert(graft.api.Graft.fromDF(d)
      .chunkFixed(Seq("g"), "doc_id", "tok", 10L).count() === 3)
    import graft.api.{LazyFrame, Pipeline}
    val dir = java.nio.file.Files.createTempDirectory("cfx").toString
    d.write.mode("overwrite").parquet(s"$dir/d.parquet")
    val lf = LazyFrame.read("d", s"$dir/d.parquet")
      .chunkFixed(Seq("g"), "doc_id", "tok", 10L)
    assert(LazyFrame.fromYaml(lf.toYaml).toYaml == lf.toYaml)
    assert(Pipeline.runYaml(lf.toYaml, spark).count() === 3)
  }
}
