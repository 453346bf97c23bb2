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
  test("embedding retriever over corpusGate routes through IVF, same result") {
    // 60 corpus vectors on a 2-D circle; 3 query rows. corpusGate=10 forces
    // the IVF path; nProbe = nCentroids makes IVF exhaustive, so its output
    // must equal the small-corpus broadcast path exactly.
    val corpusRows = (0 until 60).map { i =>
      val a = i * 2 * math.Pi / 60
      Row(Seq(math.cos(a), math.sin(a)), f"doc$i%02d")
    }
    val corpus = df(StructType(Seq(
      StructField("ce", ArrayType(DoubleType)), StructField("t", StringType))),
      corpusRows: _*)
    val base = df(
      StructType(Seq(StructField("id", LongType), StructField("e", ArrayType(DoubleType)))),
      Row(1L, Seq(1.0, 0.0)), Row(2L, Seq(0.0, 1.0)), Row(3L, Seq(-1.0, 0.0)))
    def ctx(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("id").select("_rag_retrieved_context").collect().map(_.getString(0)).toSeq
    val viaBroadcast = ctx(RetrieverOp.byEmbedding(base, "rag", "e", corpus, "ce", "t", k = 3))
    val viaIvf = ctx(RetrieverOp.byEmbedding(base, "rag", "e", corpus, "ce", "t", k = 3,
      corpusGate = 10, nCentroids = 4, nProbe = 4))
    assert(viaIvf == viaBroadcast)
  }
  test("term-overlap retriever over corpusGate routes through postings join, same result") {
    // 60 docs, each sharing "common" with every query plus one unique token;
    // corpusGate=10 forces the inverted-index path. Every query overlaps all
    // docs (via "common"), so the indexed path sees the full candidate set
    // and must equal the broadcast path exactly, ties and all.
    val corpus = df(
      StructType(Seq(StructField("ctext", StringType))),
      (0 until 60).map(i => Row(f"w$i%02d common")): _*)
    val base = df(StructType(Seq(
      StructField("id", LongType), StructField("qtext", StringType))),
      Row(1L, "w01 w02 w03 common"), Row(2L, "w10 common"), Row(3L, "common"))
    def ctx(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("id").select("_rag_retrieved_context").collect().map(_.getString(0)).toSeq
    val viaBroadcast = ctx(RetrieverOp.byTermOverlap(
      base, "rag", "qtext", corpus, "ctext", "ctext", k = 3))
    val viaIndex = ctx(RetrieverOp.byTermOverlap(
      base, "rag", "qtext", corpus, "ctext", "ctext", k = 3, corpusGate = 10))
    assert(viaIndex == viaBroadcast)
    assert(viaIndex(0).startsWith("w01 common")) // overlap-2 docs outrank overlap-1
  }
  test("indexed term-overlap maxPostingSize bans stopword postings, keeps rare terms") {
    // "common" appears in all 60 docs; cap 30 bans it. Queries then retrieve
    // only via their rare token: doc w10 for query 2; query 3 ("common"
    // alone) loses all candidates and gets a null context.
    val corpus = df(
      StructType(Seq(StructField("ctext", StringType))),
      (0 until 60).map(i => Row(f"w$i%02d common")): _*)
    val base = df(StructType(Seq(
      StructField("id", LongType), StructField("qtext", StringType))),
      Row(2L, "w10 common"), Row(3L, "common"))
    val out = RetrieverOp.byTermOverlap(base, "rag", "qtext", corpus,
        "ctext", "ctext", k = 1, corpusGate = 10, maxPostingSize = Some(30))
      .orderBy("id").select("_rag_retrieved_context").collect()
    assert(out(0).getString(0) == "w10 common")
    assert(out(1).isNullAt(0))
  }

  test("hybrid retriever over corpusGate routes through postings+IVF union, same result") {
    // Circle embeddings + per-doc unique token + shared "common" token.
    // nProbe = nCentroids makes the IVF arm exhaustive and "common" puts
    // every doc in the lexical arm, so the union candidate set is total and
    // the blended scores must match the broadcast path exactly.
    val corpusRows = (0 until 60).map { i =>
      val a = i * 2 * math.Pi / 60
      Row(Seq(math.cos(a), math.sin(a)), f"w$i%02d common")
    }
    val corpus = df(StructType(Seq(
      StructField("ce", ArrayType(DoubleType)), StructField("ctext", StringType))),
      corpusRows: _*)
    val base = df(StructType(Seq(
      StructField("id", LongType), StructField("e", ArrayType(DoubleType)),
      StructField("qtext", StringType))),
      Row(1L, Seq(1.0, 0.0), "w30 common"), Row(2L, Seq(0.0, 1.0), "w00 w01 common"))
    def ctx(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("id").select("_rag_retrieved_context").collect().map(_.getString(0)).toSeq
    val viaBroadcast = ctx(RetrieverOp.byHybrid(base, "rag", "e", "qtext",
      corpus, "ce", "ctext", "ctext", k = 3, vectorWeight = 0.5))
    val viaIndex = ctx(RetrieverOp.byHybrid(base, "rag", "e", "qtext",
      corpus, "ce", "ctext", "ctext", k = 3, vectorWeight = 0.5,
      corpusGate = 10, nCentroids = 4, nProbe = 4))
    assert(viaIndex == viaBroadcast)
  }
  test("boundedCrossBroadcast refuses an over-budget small side") {
    val big = spark.range(10).toDF("a")
    val small = spark.range(50).toDF("b")
    val err = intercept[IllegalArgumentException] {
      graft.core.Joins.boundedCrossBroadcast(big, small, col("a"), col("b"),
        maxRows = 20, context = "test")
    }
    assert(err.getMessage.contains("maxRows=20"))
  }
  test("bm25 retriever scores with corpus statistics, not raw overlap") {
    // Both corpus docs share one term with the query; "rare" appears in only
    // one corpus doc so its idf dominates the common term's.
    val corpus = df(
      StructType(Seq(StructField("ctext", StringType))),
      Row("common rare"), Row("common common filler"), Row("other words"))
    val base = df(StructType(Seq(
      StructField("id", LongType), StructField("qtext", StringType))),
      Row(1L, "common rare"), Row(2L, "zzz-no-overlap"))
    val out = RetrieverOp.byBm25(base, "rag", "qtext", corpus, "ctext", "ctext", k = 1)
      .orderBy("id").select("_rag_retrieved_context").collect()
    assert(out(0).getString(0) == "common rare") // idf(rare) >> idf(common)
    assert(out(1).isNullAt(0)) // zero overlap -> nothing retrieved
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
