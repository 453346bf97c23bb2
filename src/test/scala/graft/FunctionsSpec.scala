package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{CosineSimilarity, TextFunctions, VectorFunctions}
import graft.ops.{RetrieverOp, StubHttpClient, WebFetchOp, WebSearchOp}

class CosineExprSpec extends SparkSpec {
  private lazy val vecs = df(
    StructType(Seq(StructField("id", LongType),
      StructField("a", ArrayType(FloatType)), StructField("b", ArrayType(FloatType)))),
    Row(1L, Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
    Row(2L, Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
    Row(3L, Seq(1.0f, 1.0f), Seq(1.0f, 0.0f)),
    Row(4L, null, Seq(1.0f, 0.0f)))

  test("native expression matches the HOF formulation bit-for-bit") {
    val both = vecs.filter(col("a").isNotNull).select(
      CosineSimilarity(col("a"), col("b")).as("fast"),
      VectorFunctions.cosine(col("a"), col("b")).as("hof"))
    both.collect().foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0)
    }
  }
  test("null input yields null, identical vectors yield 1.0") {
    val rows = vecs.select(col("id"), CosineSimilarity(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(rows(1L) == 1.0)
    assert(rows(2L) == 0.0)
    assert(rows(4L) == null)
  }
  test("SQL registration works") {
    CosineSimilarity.register(spark)
    vecs.createOrReplaceTempView("cs_vecs")
    val r = spark.sql(
      "SELECT cosine_similarity(a, b) FROM cs_vecs WHERE id = 1").collect()(0)
    assert(r.getDouble(0) == 1.0)
  }
}

class RetrieverSpec extends SparkSpec {
  test("term-overlap retriever attaches top-k corpus context") {
    val corpus = df(
      StructType(Seq(StructField("ctext", StringType))),
      Row("spark join facts"), Row("merge sort details"), Row("unrelated banana"))
    val out = RetrieverOp.byTermOverlap(docsDf, "rag", "text", corpus, "ctext", "ctext", k = 1)
    val ctx = out.filter(col("doc_id") === 1)
      .select("_rag_retrieved_context").collect()(0).getString(0)
    assert(ctx == "spark join facts") // doc 1 mentions spark + join
    assert(out.count() == docsDf.count()) // left join: no row loss
  }
  test("embedding retriever uses the native cosine") {
    val base = df(
      StructType(Seq(StructField("id", LongType), StructField("e", ArrayType(DoubleType)))),
      Row(1L, Seq(1.0, 0.0)))
    val corpus = df(
      StructType(Seq(StructField("ce", ArrayType(DoubleType)), StructField("t", StringType))),
      Row(Seq(0.9, 0.1), "close"), Row(Seq(0.0, 1.0), "far"))
    val out = RetrieverOp.byEmbedding(base, "rag", "e", corpus, "ce", "t", k = 1)
    assert(out.select("_rag_retrieved_context").collect()(0).getString(0) == "close")
  }
}

class WebOpsSpec extends SparkSpec {
  test("web search appends capped structured results") {
    val out = WebSearchOp(docsDf, "ws", "{{ input.text }}", maxResults = 2)
    val r = out.filter(col("doc_id") === 1).select("search_results").collect()(0)
      .getSeq[Row](0)
    assert(r.size == 2)
    assert(r.head.getString(0).startsWith("result 1 for: the fast spark"))
    assert(r.head.getString(2).startsWith("https://example.invalid/"))
  }
  test("web fetch appends page content per row") {
    val d = df(StructType(Seq(StructField("url", StringType))),
      Row("https://a.invalid/x"))
    val out = WebFetchOp(d, "wf", "url")
    assert(out.select("wf_content").collect()(0).getString(0)
      .contains("fetched: https://a.invalid/x"))
  }
}
