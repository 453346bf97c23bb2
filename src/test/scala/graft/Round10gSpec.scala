package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{EmbeddingStats, VocabCoverage}

/** Round-10: embedding-space diagnostics + vocabulary coverage. */
class Round10gSpec extends SparkSpec {

  private val embSchema = StructType(Seq(
    StructField("id", LongType), StructField("slice", StringType),
    StructField("e", ArrayType(DoubleType))))

  test("embedding stats: centroids are per-slice means") {
    val d = df(embSchema,
      Row(1L, "a", Seq(1.0, 0.0)), Row(2L, "a", Seq(3.0, 2.0)),
      Row(3L, "b", Seq(0.0, 5.0)))
    val c = EmbeddingStats.sliceCentroids(d, "slice", "e")
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Double](1), r.getLong(2))).toMap
    assert(c("a") == (Seq(2.0, 1.0), 2L))
    assert(c("b") == (Seq(0.0, 5.0), 1L))
  }

  test("embedding stats: outlier scores rank the off-centroid vector lowest") {
    val d = df(embSchema,
      Row(1L, "a", Seq(1.0, 0.0)), Row(2L, "a", Seq(1.0, 0.1)),
      Row(3L, "a", Seq(0.9, 0.0)), Row(4L, "a", Seq(-1.0, 0.0)))
    val scores = EmbeddingStats.outlierScores(d, "slice", "e")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("centroid_sim"))
      .toMap
    assert(scores(4L) < scores(1L) && scores(4L) < scores(2L) &&
      scores(4L) < scores(3L))
    // identical-to-centroid direction scores 1
    val solo = df(embSchema, Row(1L, "x", Seq(2.0, 2.0)))
    assert(EmbeddingStats.outlierScores(solo, "slice", "e")
      .head().getAs[Double]("centroid_sim") == 1.0)
  }

  test("embedding stats: zero vectors score null, not NaN") {
    val d = df(embSchema,
      Row(1L, "a", Seq(0.0, 0.0)), Row(2L, "a", Seq(1.0, 1.0)))
    val r = EmbeddingStats.outlierScores(d, "slice", "e")
      .filter(col("id") === 1L).head()
    assert(r.isNullAt(r.fieldIndex("centroid_sim")))
  }

  test("embedding stats: centroid matrix detects aligned slices") {
    val d = df(embSchema,
      Row(1L, "a", Seq(1.0, 0.0)), Row(2L, "b", Seq(2.0, 0.0)),
      Row(3L, "c", Seq(0.0, 1.0)))
    val m = EmbeddingStats.centroidSimilarityMatrix(d, "slice", "e")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(m(("a", "b")) == 1.0)  // same direction
    assert(m(("a", "c")) == 0.0)  // orthogonal
  }

  private val docSchema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  test("vocab coverage: oov report counts and rates") {
    import spark.implicits._
    val d = df(docSchema,
      Row(1L, "the cat sat"), Row(2L, "the dog UNKNOWN words"))
    val vocab = Seq("the", "cat", "sat", "dog").toDF("token")
    val rep = VocabCoverage.oovReport(d, "id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          r.getAs[Double]("oov_rate"))).toMap
    assert(rep(1L) == (3L, 0L, 0.0))
    assert(rep(2L) == (4L, 2L, 0.5))
  }

  test("vocab coverage: topOovTokens is deterministic and capped") {
    import spark.implicits._
    val d = df(docSchema,
      Row(1L, "x x x y y z in in"), Row(2L, "y z z"))
    val vocab = Seq("in").toDF("token")
    val top = VocabCoverage.topOovTokens(d, "text", vocab, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top == Seq(("x", 3L), ("y", 3L))) // count desc, token asc tiebreak
  }

  test("estimate: two-point fit caps saturated group-bys, keeps filters linear") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("r10est").toString
    df(schema, (1L to 400L).map(i => Row(i, s"t$i")): _*)
      .write.mode("overwrite").parquet(s"$dir/d.parquet")
    val yaml =
      s"""datasets:
         |  d: { path: $dir/d.parquet }
         |operations:
         |  - { name: keep_half, type: code_filter, predicate: "id % 2 = 0" }
         |  - { name: grp, type: code_map, outputs: { grp: "id % 3" } }
         |  - name: by_mod
         |    type: code_reduce
         |    reduce_key: [grp]
         |    aggs: { n: "count(1)" }
         |pipeline:
         |  steps:
         |    - { name: s1, input: d, operations: [keep_half, grp, by_mod] }
         |""".stripMargin
    // group key: id % 3 has exactly 3 groups at EVERY sample size -> the
    // half-size pilot sees the same 3 output rows -> alpha == 0 and the
    // full-scale estimate stays 3, where linear scaling would say 3 x scale
    val conf = graft.api.Conf.fromYaml(yaml)
    val rep = graft.api.Estimate(conf, spark, sampleRows = 100)
    val byOp = rep.ops.map(o => o.op -> o).toMap
    assert(byOp("by_mod").alpha == 0.0, rep.render)
    assert(byOp("by_mod").estRowsOut == byOp("by_mod").sampleRowsOut)
    // the filter stays exactly linear (alpha == 1)
    assert(byOp("keep_half").alpha == 1.0)
    assert(byOp("keep_half").estRowsOut == byOp("keep_half").sampleRowsOut * 4)
    // single-run mode falls back to linear everywhere
    val lin = graft.api.Estimate(conf, spark, sampleRows = 100,
      fitExponent = false)
    val linReduce = lin.ops.find(_.op == "by_mod").get
    assert(linReduce.alpha == 1.0 &&
      linReduce.estRowsOut == linReduce.sampleRowsOut * 4)
  }

  test("embedding/vocab LazyFrame builders round-trip and run") {
    import graft.api.{LazyFrame, Pipeline}
    val dir = java.nio.file.Files.createTempDirectory("lf10g").toString
    val path = s"$dir/docs.parquet"
    docsDf.write.mode("overwrite").parquet(path)
    def roundTrips(lf: LazyFrame): Long = {
      val reparsed = LazyFrame.fromYaml(lf.toYaml)
      assert(reparsed.toYaml == lf.toYaml)
      val direct = lf.run(spark).count()
      assert(Pipeline.runYaml(lf.toYaml, spark).count() == direct)
      direct
    }
    assert(roundTrips(LazyFrame.read("docs", path)
      .vocabCoverage("doc_id", "text", Seq("the", "fast"))) == docsDf.count())
    assert(roundTrips(LazyFrame.read("docs", path)
      .topOovTokens("text", Seq("the"), k = 3)) == 3)
  }

  test("embedding_stats + vocab_coverage yaml registry") {
    val d = df(embSchema, Row(1L, "a", Seq(1.0, 0.0)), Row(2L, "b", Seq(0.0, 1.0)))
    val out = graft.api.Registry("embedding_stats")(d, graft.api.Conf.fromYaml(
      "type: embedding_stats\nslice_key: slice\nembedding_key: e\nmode: matrix"),
      null)
    assert(out.columns.toSeq == Seq("slice_a", "slice_b", "centroid_cosine"))
    val docs = df(docSchema, Row(1L, "a b c"))
    val ctx = graft.api.OpContext(spark, graft.llm.MockLlmClient(), Map.empty)
    val rep = graft.api.Registry("vocab_coverage")(docs, graft.api.Conf.fromYaml(
      "type: vocab_coverage\nid_key: id\ntext_key: text\n" +
        "vocab_words: [a, b]"), ctx)
    assert(rep.head().getAs[Long]("n_oov") == 1L)
  }
}
