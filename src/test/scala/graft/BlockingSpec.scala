package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.MockLlmClient
import graft.ops.{Blocking, ResolveOp}

class BlockingSpec extends SparkSpec {
  private val client = MockLlmClient()

  test("threshold keeps targetRecall of labeled positives") {
    val labeled = Seq(
      (0.95, true), (0.90, true), (0.85, true), (0.80, true), (0.40, true),
      (0.70, false), (0.30, false))
    // 5 positives, recall 0.8 -> keep ceil(4)=4 best -> threshold = 0.80
    assert(Blocking.calibrateCosineThreshold(labeled, 0.8) == 0.80)
    // recall 1.0 must keep the straggler at 0.40
    assert(Blocking.calibrateCosineThreshold(labeled, 1.0) == 0.40)
    // no positives -> 0.0 (block nothing out)
    assert(Blocking.calibrateCosineThreshold(Seq((0.5, false)), 0.95) == 0.0)
  }

  test("embedding candidates find same-direction vectors") {
    val d = df(StructType(Seq(StructField("id", LongType),
      StructField("e", ArrayType(DoubleType)))),
      Row(1L, Seq(1.0, 0.0, 0.1)), Row(2L, Seq(0.99, 0.01, 0.1)),
      Row(3L, Seq(-1.0, 0.3, 0.0)))
    val cands = Blocking.embeddingCandidates(d, "id", "e", dim = 3, minCosine = 0.9)
    val got = cands.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L)))
  }

  test("resolve with embedding blocking + auto threshold canonicalizes") {
    // Two near-dup embedding groups; renders equal within group so the mock
    // confirms matches; names canonicalize to the lexicographic min.
    val rows = Seq(
      Row(1L, "Acme Corp", "acme", Seq(1.0, 0.0, 0.0)),
      Row(2L, "ACME CORP", "acme", Seq(0.99, 0.01, 0.0)),
      Row(3L, "Beta LLC", "beta", Seq(0.0, 1.0, 0.0)),
      Row(4L, "beta llc", "beta", Seq(0.01, 0.99, 0.0)))
    val d = df(StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("norm", StringType), StructField("e", ArrayType(DoubleType)))),
      rows: _*)
    val out = ResolveOp.withEmbeddingBlocking(d, ResolveOp.Config(
      name = "emb", idKey = "id", blockExpr = "0",
      compareExpr = "norm", resolveKeys = Seq("name")), "e", dim = 3, client)
    val m = out.collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("name")).toMap
    assert(m(1L) == "ACME CORP" && m(2L) == "ACME CORP")
    assert(m(3L) == "Beta LLC" && m(4L) == "Beta LLC")
    assert(out.count() == 4)
  }
}
