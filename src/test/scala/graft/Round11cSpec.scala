package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11: classifier evaluation (AUC/confusion/calibration) and JL
  * random projection. */
class Round11cSpec extends SparkSpec {

  private val evalSchema = StructType(Seq(
    StructField("lbl", LongType), StructField("s", DoubleType)))

  test("classifier eval: perfect separation gives AUC 1, confusion exact") {
    val d = df(evalSchema,
      Row(0L, 0.1), Row(0L, 0.2), Row(0L, 0.3),
      Row(1L, 0.7), Row(1L, 0.8), Row(1L, 0.9))
    val r = graft.ops.ClassifierEval.report(d, "lbl", "s").head()
    assert(r.getAs[Long]("tp") == 3 && r.getAs[Long]("tn") == 3)
    assert(r.getAs[Long]("fp") == 0 && r.getAs[Long]("fn") == 0)
    assert(r.getAs[Double]("auc") == 1.0)
    assert(r.getAs[Double]("f1") == 1.0)
  }

  test("classifier eval: mid-rank tie handling matches the closed form") {
    // scores: pos {0.5, 0.9}, neg {0.5, 0.1}; the 0.5 tie contributes 1/2.
    // AUC = (pairs pos>neg + 0.5*ties) / 4 = (3 + 0.5) / 4 = 0.875
    val d = df(evalSchema,
      Row(1L, 0.5), Row(1L, 0.9), Row(0L, 0.5), Row(0L, 0.1))
    val r = graft.ops.ClassifierEval.report(d, "lbl", "s").head()
    assert(r.getAs[Double]("auc") == 0.875)
  }

  test("classifier eval: anti-correlated scores give AUC 0") {
    val d = df(evalSchema,
      Row(1L, 0.1), Row(1L, 0.2), Row(0L, 0.8), Row(0L, 0.9))
    val r = graft.ops.ClassifierEval.report(d, "lbl", "s").head()
    assert(r.getAs[Double]("auc") == 0.0)
  }

  test("classifier eval: degenerate single-class corpus reports null AUC") {
    val d = df(evalSchema, Row(1L, 0.5), Row(1L, 0.9))
    val r = graft.ops.ClassifierEval.report(d, "lbl", "s").head()
    assert(r.isNullAt(r.fieldIndex("auc")))
    assert(r.isNullAt(r.fieldIndex("precision")) ||
      r.getAs[Double]("precision") == 1.0) // all predicted positive
  }

  test("calibration bins: a calibrated score tracks its positive rate") {
    // bin 2 (scores .2x): 1 of 4 positive; bin 7: 3 of 4 positive
    val rows = (0 until 4).map(i => Row(if (i == 0) 1L else 0L, 0.25)) ++
      (0 until 4).map(i => Row(if (i < 3) 1L else 0L, 0.75))
    val d = df(evalSchema, rows: _*)
    val bins = graft.ops.ClassifierEval.calibrationBins(d, "lbl", "s")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n"), r.getAs[Double]("pos_rate"))).toMap
    assert(bins(2L) == ((4L, 0.25)) && bins(7L) == ((4L, 0.75)))
    // out-of-range scores clamp to edge bins
    val e = df(evalSchema, Row(0L, -0.3), Row(1L, 1.7))
    val eb = graft.ops.ClassifierEval.calibrationBins(e, "lbl", "s")
      .select("bin").collect().map(_.getLong(0)).toSet
    assert(eb == Set(0L, 9L))
  }

  test("random projection: JL approximately preserves pairwise distance") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val emb = graft.core.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id") < 60)
    val proj = graft.ann.RandomProject.project(emb, "embedding", outDim = 32)
    val rows = proj.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("e"),
      col("embedding_jl").as("p")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray,
        r.getSeq[Double](2).toArray))
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // squared-distance ratios concentrate near 1 (JL lemma); with k=32 of
    // 64 dims the ±1 construction stays within a loose [0.3, 3] band for
    // every pair of this deterministic fixture
    val ratios = for {
      i <- rows.indices; j <- (i + 1) until rows.length
      orig = d2(rows(i)._2, rows(j)._2) if orig > 0
    } yield d2(rows(i)._3, rows(j)._3) / orig
    assert(ratios.nonEmpty)
    assert(ratios.forall(r => r > 0.3 && r < 3.0),
      s"worst ratios: ${ratios.min} .. ${ratios.max}")
    // and the mean ratio is near 1 (unbiasedness of the ±1 construction)
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"mean ratio $mean")
  }

  test("random projection: seeded matrix is deterministic and portable") {
    val m1 = graft.ann.RandomProject.signMatrix(8, 4, "seed-a")
    val m2 = graft.ann.RandomProject.signMatrix(8, 4, "seed-a")
    val m3 = graft.ann.RandomProject.signMatrix(8, 4, "seed-b")
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
    assert(m1.map(_.toSeq).toSeq != m3.map(_.toSeq).toSeq)
    assert(m1.flatten.forall(s => s == 1 || s == -1))
    // ragged and oversize inputs are rejected up front
    val d = df(StructType(Seq(StructField("e", ArrayType(DoubleType)))),
      Row(Seq(1.0, 2.0)), Row(Seq(1.0, 2.0, 3.0)))
    intercept[IllegalArgumentException] {
      graft.ann.RandomProject.project(d, "e", 2)
    }
  }

  // ------------------------------------------------ pagerank

  private val edgeSchema = StructType(Seq(
    StructField("src", LongType), StructField("dst", LongType)))

  test("pagerank: authority concentrates on the pointed-at vertex") {
    // star: 1,2,3 all point at 0; 0 points at 1
    val e = df(edgeSchema,
      Row(1L, 0L), Row(2L, 0L), Row(3L, 0L), Row(0L, 1L))
    // star mass oscillates between 0 and 1 with decay 0.85² per round —
    // run enough iterations for the converged ordering r0 > r1 > leaves
    val r = graft.graph.PageRank.run(e, nIter = 60)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.keySet == Set(0L, 1L, 2L, 3L))
    assert(r(0L) > r(1L) && r(1L) > r(2L))
    assert(r(2L) == r(3L)) // symmetric leaves tie exactly (integer math)
  }

  test("pagerank: symmetric cycle is uniform, mass stays bounded") {
    val e = df(edgeSchema, Row(0L, 1L), Row(1L, 2L), Row(2L, 0L))
    val r = graft.graph.PageRank.run(e, nIter = 20)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // a 3-cycle is exactly uniform at every iteration
    assert(r.values.toSet.size == 1)
    assert(math.abs(r.values.sum - 1.0) < 1e-3) // integer-truncation leak only
  }

  test("pagerank: deterministic across reruns and partitionings") {
    val e = df(edgeSchema, (0 until 40).map(i =>
      Row((i % 8).toLong, ((i * 3) % 8).toLong)): _*)
    val a = graft.graph.PageRank.run(e, nIter = 5)
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = graft.graph.PageRank.run(e.repartition(7), nIter = 5)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
  }

  // ------------------------------------------------ readability / code

  private val docSchema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  test("readability: known sentence gives the textbook FK numbers") {
    // "the cat sat on the mat." -> 6 words, 1 sentence, 6 syllables
    val d = df(docSchema, Row(1L, "the cat sat on the mat."))
    val r = graft.ops.Readability.report(d, "text").head()
    assert(r.getAs[Long]("n_words") == 6)
    assert(r.getAs[Long]("n_sentences") == 1)
    assert(r.getAs[Long]("n_syllables") == 6)
    // FRE = 206.835 - 1.015*6 - 84.6*1 = 116.145
    assert(r.getAs[Double]("flesch_reading_ease") == 116.145)
    // FK = 0.39*6 + 11.8*1 - 15.59 = -1.45
    assert(math.abs(r.getAs[Double]("fk_grade") - (-1.45)) < 1e-9)
    // empty text: null scores, sentence floor of 1
    val e = graft.ops.Readability.report(
      df(docSchema, Row(2L, "")), "text").head()
    assert(e.getAs[Long]("n_words") == 0)
    assert(e.isNullAt(e.fieldIndex("flesch_reading_ease")))
  }

  test("readability: vowel-group syllables count polysyllabic words") {
    val d = df(docSchema, Row(1L, "un be liev able."))
    // groups: u, e, ie, a+e -> "unbelievable" split visible: u/e/ie/a,e
    val r = graft.ops.Readability.report(d, "text").head()
    assert(r.getAs[Long]("n_syllables") == 5)
  }

  test("code detect: code scores high, prose scores low") {
    val code = "def foo(x):\n  return (x + y);\n  val z = {w}\n\tlet q = [1]"
    val prose = "the quiet afternoon drifted along while children " +
      "played outside near the old oak tree"
    val d = df(docSchema, Row(1L, code), Row(2L, prose))
    val out = graft.ops.CodeDetect.report(d, "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("is_code"))
    assert(!out(2L).getAs[Boolean]("is_code"))
    assert(out(1L).getAs[Long]("keyword_hits") >= 4) // def return val let
    assert(out(1L).getAs[Double]("indent_ratio") > 0.4)
    assert(out(2L).getAs[Double]("symbol_density") == 0.0)
    assert(out(2L).getAs[Long]("keyword_hits") == 0)
  }

  test("round-11c ops run from YAML and LazyFrame") {
    val d = docsDf.select(
      (col("doc_id") % 2).as("lbl"),
      (col("doc_id").cast("double") / 10).as("s"))
    val rep = graft.api.Registry("classifier_eval")(d,
      graft.api.Conf.fromYaml(
        "type: classifier_eval\nlabel_key: lbl\nscore_key: s"), null)
    assert(rep.columns.contains("auc") && rep.count() == 1)
    val cal = graft.api.Registry("classifier_eval")(d,
      graft.api.Conf.fromYaml(
        "type: classifier_eval\nlabel_key: lbl\nscore_key: s\n" +
          "mode: calibration"), null)
    assert(cal.columns.contains("pos_rate"))

    val dir = java.nio.file.Files.createTempDirectory("r11c").toString
    d.write.mode("overwrite").parquet(s"$dir/d.parquet")
    import graft.api.LazyFrame
    val lf = LazyFrame.read("d", s"$dir/d.parquet").classifierEval("lbl", "s")
    assert(LazyFrame.fromYaml(lf.toYaml).toYaml == lf.toYaml)
    assert(lf.run(spark).count() == 1)

    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val emb = graft.core.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val pr = graft.api.Registry("random_project")(emb,
      graft.api.Conf.fromYaml(
        "type: random_project\nembedding_key: embedding\nout_dim: 8"), null)
    assert(pr.select(size(col("embedding_jl"))).head().getInt(0) == 8)

    val edges = df(edgeSchema, Row(0L, 1L), Row(1L, 0L))
    val prk = graft.api.Registry("pagerank")(edges,
      graft.api.Conf.fromYaml(
        "type: pagerank\nsrc_key: src\ndst_key: dst\niterations: 3"), null)
    assert(prk.count() == 2)
    val lpr = LazyFrame.read("d", s"$dir/d.parquet")
      .pagerank("lbl", "lbl", iterations = 2)
    assert(lpr.run(spark).count() > 0)

    val rd = graft.api.Registry("readability")(docsDf,
      graft.api.Conf.fromYaml("type: readability\ntext_key: text"), null)
    assert(rd.columns.contains("fk_grade"))
    val cd = graft.api.Registry("code_detect")(docsDf,
      graft.api.Conf.fromYaml("type: code_detect\ntext_key: text"), null)
    assert(cd.columns.contains("code_score"))
    docsDf.write.mode("overwrite").parquet(s"$dir/docs.parquet")
    assert(LazyFrame.read("docs", s"$dir/docs.parquet")
      .readability("text").run(spark).count() == docsDf.count())
    assert(LazyFrame.read("docs", s"$dir/docs.parquet")
      .codeDetect("text").run(spark).count() == docsDf.count())
  }
}
