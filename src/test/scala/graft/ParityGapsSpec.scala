package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.MockLlmClient
import graft.ops._

class ParityGapsSpec extends SparkSpec {
  private val client = MockLlmClient()

  test("equijoin embedding blocking joins similar vectors across sides") {
    val l = df(StructType(Seq(StructField("lid", LongType),
      StructField("le", ArrayType(DoubleType)))),
      Row(1L, Seq(1.0, 0.0, 0.0)), Row(2L, Seq(0.0, 1.0, 0.0)))
    val r = df(StructType(Seq(StructField("rid", LongType),
      StructField("re", ArrayType(DoubleType)))),
      Row(10L, Seq(0.99, 0.02, 0.0)), Row(20L, Seq(0.0, 0.0, 1.0)))
    val out = EquijoinOp.withEmbeddingBlocking(l, r, EquijoinOp.Config(
      name = "ej_emb", condition = ""), "le", "re", dim = 3,
      cosineThreshold = 0.9, client)
    val got = out.select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(got.toSeq == Seq((1L, 10L))) // only the aligned pair
  }

  test("reduce keeps only the n smallest groups") {
    val out = SemanticReduce(docsDf, SemanticReduce.Config(
      name = "sm", reduceKeys = Seq("lang"), memberExpr = "text",
      orderKey = "doc_id", outputSchema = Seq("summary" -> "str"),
      limitSmallestGroups = Some(1)), client)
    // groups: en(5 docs), de(1 doc) -> keep de
    assert(out.select("lang").collect().map(_.getString(0)).toSeq == Seq("de"))
  }

  test("calibrate mode prepends sample-derived anchors to every prompt") {
    val out = SemanticMap(docsDf, SemanticMapConfig(
      name = "cal", prompt = "{{ input.text }}",
      outputSchema = Seq("sentiment" -> "str"),
      calibrate = true, calibrateSampleSize = 2,
      enableObservability = true), client)
    val prompts = out.select("_observability_cal").collect().map(_.getString(0))
    assert(prompts.forall(_.startsWith("CALIBRATION:\nmock:")))
    // classification still works on the suffix text
    val m = out.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("sentiment")).toMap
    assert(m(1L) == "positive")
  }
}
