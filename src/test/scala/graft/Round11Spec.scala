package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11: IVFPQ residual encoding, NaiveBayes single-pass train +
  * token-less scoring, Diversity approx knob, BPE batched merges, Estimate
  * α noise guard, JPEG fill bytes / single-UDF plan, boundary-safe credit
  * card redaction, inline-merge-list greedy gate. */
class Round11Spec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // --------------------------------------------------- IVFPQ residuals

  test("ivfpq residual: recall vs exact L2 >= raw-vector PQ at equal nProbe") {
    assume(new java.io.File(sfDir).isDirectory)
    val emb = graft.core.Tables(spark, sfDir, "embeddings")
    import graft.ann.{Ann, ProductQuantize => PQ}

    val k = 10
    val nProbe = 2
    val queries = emb.filter(col("vec_id") < 20)
    // Exact L2 ground truth on the driver (sf0.001 corpus is bounded).
    val all = emb.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("_e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val truth: Map[Long, Set[Long]] = (0L until 20L).map { q =>
      q -> all.toSeq.filter(_._1 != q)
        .sortBy { case (id, v) => (l2(all(q), v), id) }
        .take(k).map(_._1).toSet
    }.toMap

    val centroids = Ann.trainCentroids(emb, "embedding", 8)
    val assigned = Ann.ivfAssign(emb, "embedding", centroids)

    def recall(search: => org.apache.spark.sql.DataFrame): Double = {
      val got = search.collect()
        .groupBy(_.getLong(0))
        .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
      truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty[Long]).count(t).toDouble / k
      }.sum / truth.size
    }

    val rawCb = PQ.trainPq(emb, "embedding", nSub = 8, nCodes = 16)
    val rawCoded = PQ.encode(assigned, "embedding", rawCb)
      .select("vec_id", "_cell", "pq_codes")
    val rawRecall = recall(PQ.ivfPqSearch(rawCoded, "vec_id", "pq_codes",
      rawCb, centroids, queries, "vec_id", "embedding", k, nProbe))

    val resCb = PQ.trainPqResidual(assigned, "embedding", "_cell",
      centroids, nSub = 8, nCodes = 16)
    val resCoded = PQ.encodeResidual(assigned, "embedding", "_cell",
      resCb, centroids).select("vec_id", "_cell", "pq_codes")
    val resRecall = recall(PQ.ivfPqSearchResidual(resCoded, "vec_id",
      "pq_codes", resCb, centroids, queries, "vec_id", "embedding", k, nProbe))

    assert(rawRecall > 0.0 && resRecall > 0.0)
    // Residuals recenter each cell on the origin, shrinking the spread the
    // nSub x nCodes budget must cover — quantization error can only drop.
    assert(resRecall >= rawRecall,
      s"residual recall $resRecall < raw recall $rawRecall")
  }

  test("ivfpq residual with nProbe = nCells matches residual ADC exactly") {
    assume(new java.io.File(sfDir).isDirectory)
    val emb = graft.core.Tables(spark, sfDir, "embeddings")
    import graft.ann.{Ann, ProductQuantize => PQ}
    val centroids = Ann.trainCentroids(emb, "embedding", 4)
    val assigned = Ann.ivfAssign(emb, "embedding", centroids)
    val cb = PQ.trainPqResidual(assigned, "embedding", "_cell",
      centroids, nSub = 8, nCodes = 8)
    val coded = PQ.encodeResidual(assigned, "embedding", "_cell",
      cb, centroids).select("vec_id", "_cell", "pq_codes")
    val q = emb.filter(col("vec_id") < 5)
    val full = PQ.ivfPqSearchResidual(coded, "vec_id", "pq_codes", cb,
      centroids, q, "vec_id", "embedding", k = 3, nProbe = centroids.length)
      .collect().map(_.toSeq).sortBy(_.toString)
    // Probing every cell = scoring every candidate with its own cell's
    // query residual; re-running must be deterministic and non-empty.
    val again = PQ.ivfPqSearchResidual(coded, "vec_id", "pq_codes", cb,
      centroids, q, "vec_id", "embedding", k = 3, nProbe = centroids.length)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(full.nonEmpty && full.length == 15) // 5 queries x k=3
    assert(full.toSeq == again.toSeq)
  }

  // ------------------------------------------------- NaiveBayes hygiene

  private val labeledSchema = StructType(Seq(
    StructField("id", LongType), StructField("lbl", StringType),
    StructField("text", StringType)))

  test("nb train: corpus is tokenized exactly once (counts persisted)") {
    val acc = spark.sparkContext.longAccumulator("tokenize-evals")
    val counting = udf { (i: Long) =>
      acc.add(1); s"word$i common shared tokens here"
    }
    val n = 64L
    val d = spark.range(n).select(col("id"),
      (col("id") % 2).cast("string").as("lbl"),
      counting(col("id")).as("text"))
    val model = graft.ops.NaiveBayes.train(d, "lbl", "text")
    model.count() // materialize the full model (conds + defaults + priors)
    graft.core.PersistScope.unpersistAll()
    // One evaluation per row: the counts persist means vocab count, totals,
    // conds, and defaults all read cached blocks instead of re-running the
    // text explode (the unpersisted lineage evaluated it 3x).
    assert(acc.value == n, s"text column evaluated ${acc.value} times for " +
      s"$n rows — tokenization ran ${acc.value / n}x")
  }

  test("nb scores/classify: token-less docs still score prior + 0 tokens") {
    val d = df(labeledSchema,
      Row(1L, "a", "spark spark fast"), Row(2L, "b", "slow merge sort"),
      Row(3L, "a", "fast join"), Row(4L, "b", null),
      Row(5L, "a", ""))
    val model = graft.ops.NaiveBayes.train(
      d.filter(col("text").isNotNull && col("text") =!= ""), "lbl", "text")
    val scores = graft.ops.NaiveBayes.scores(d, "id", "text", model)
      .collect().groupBy(_.getLong(0))
    // every id scores against every label, including null/empty-text rows
    assert(scores.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(scores.values.forall(_.length == 2))
    val classified = graft.ops.NaiveBayes.classify(d, "id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(classified.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // a token-less doc falls back to the prior argmax: label 'a' has 2 of
    // 3 training docs, so both null and empty rows classify as 'a'
    assert(classified(4L) == "a" && classified(5L) == "a")
  }

  // ------------------------------------------------- Diversity approx

  test("diversity distinctN: approx mode lands within tolerance of exact") {
    assume(new java.io.File(sfDir).isDirectory)
    val docs = graft.core.Tables(spark, sfDir, "documents")
    val exact = graft.ops.Diversity.distinctN(docs, "source", "text", 3)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    val approx = graft.ops.Diversity
      .distinctN(docs, "source", "text", 3, approx = true, rsd = 0.02)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (slice, ex) =>
      val ap = approx(slice)
      assert(math.abs(ap - ex) <= math.max(2.0, 5 * 0.02 * ex),
        s"slice $slice: approx $ap vs exact $ex")
    }
  }

  // ------------------------------------------------- BPE batched merges

  test("bpe train: mergesPerRound=1 is the default path; k>1 cuts jobs") {
    val d = df(StructType(Seq(StructField("text", StringType))),
      Row("the quick brown fox jumps over the lazy dog"),
      Row("the quick brown fox"), Row("pack my box with five dozen jugs"),
      Row("the lazy dog sleeps"), Row("quick quick quick brown"))
    val strict = graft.ops.BpeTrain.train(d, "text", numMerges = 8)
    val k1 = graft.ops.BpeTrain.train(d, "text", numMerges = 8,
      mergesPerRound = 1)
    assert(strict == k1) // k=1 IS strict Sennrich order

    def countJobs(body: => Unit): Int = {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      try { body; Thread.sleep(500) } // listener delivery is async
      finally spark.sparkContext.removeSparkListener(l)
      jobs.get()
    }
    val jobsK1 = countJobs {
      graft.ops.BpeTrain.train(d, "text", numMerges = 8, mergesPerRound = 1)
    }
    var k4merges: Seq[graft.ops.BpeTrain.Merge] = Seq.empty
    val jobsK4 = countJobs {
      k4merges = graft.ops.BpeTrain.train(d, "text", numMerges = 8,
        mergesPerRound = 4)
    }
    assert(jobsK4 < jobsK1,
      s"k=4 scheduled $jobsK4 jobs, k=1 scheduled $jobsK1")
    // batched rounds still induce a full-size vocab of valid merges whose
    // round-local picks have pairwise-disjoint symbols
    assert(k4merges.size == 8)
    assert(k4merges.map(m => (m.left, m.right)).distinct.size == 8)
  }

  // ------------------------------------------------- Estimate α guard

  test("estimate: noisy tiny half-sample point falls back to linear") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("r11est").toString
    df(schema, (1L to 400L).map(i => Row(i, s"t$i")): _*)
      .write.mode("overwrite").parquet(s"$dir/d.parquet")
    // keep_three passes ids {1, 51, 99}: the full sample (100 rows) emits
    // 3, the half pilot (50 rows) emits 1 — the raw two-point fit says
    // α = log(3)/log(2) ≈ 1.58 from pure sampling noise, and at a 4x
    // scale-up would claim ~3 × 4^1.58 ≈ 27 rows where the truth is 3.
    val yaml =
      s"""datasets:
         |  d: { path: $dir/d.parquet }
         |operations:
         |  - { name: keep_three, type: code_filter,
         |      predicate: "id = 1 OR id = 51 OR id = 99" }
         |pipeline:
         |  steps:
         |    - { name: s1, input: d, operations: [keep_three] }
         |""".stripMargin
    val rep = graft.api.Estimate(
      graft.api.Conf.fromYaml(yaml), spark, sampleRows = 100)
    val op = rep.ops.find(_.op == "keep_three").get
    assert(op.alpha == 1.0, rep.render)
    assert(op.estRowsOut == op.sampleRowsOut * 4)
    assert(rep.alphaFallbacks.exists(_.contains("keep_three")), rep.render)
    assert(rep.render.contains("NOTICE"), rep.render)
  }

  // ------------------------------------------------- image header edges

  test("jpeg parse: fill bytes before a marker are skipped per ISO 10918") {
    // SOI, padded APP0 (two 0xFF fill bytes before the marker), then a
    // padded SOF0 carrying height=7, width=9.
    val bytes = Array[Int](
      0xFF, 0xD8, // SOI
      0xFF, 0xFF, 0xFF, 0xE0, 0x00, 0x04, 0x00, 0x00, // fill,fill,APP0 len4
      0xFF, 0xFF, 0xC0, 0x00, 0x0B, // fill, SOF0, len 11
      0x08, 0x00, 0x07, 0x00, 0x09, 0x01, 0x00, 0x11, 0x00
    ).map(_.toByte)
    assert(graft.multimodal.ImageHeader.jpegDims(bytes) == Some((9, 7)))
    // fill bytes running into the buffer end: reject, don't crash
    val trunc = Array[Int](0xFF, 0xD8, 0xFF, 0xFF, 0xFF, 0xFF).map(_.toByte)
    assert(graft.multimodal.ImageHeader.jpegDims(trunc).isEmpty)
  }

  test("image header plan evaluates the JPEG UDF once per row") {
    // parquet-backed scan: a literal LocalRelation would be constant-folded
    // away by the optimizer, leaving no plan to inspect
    val dir = java.nio.file.Files.createTempDirectory("r11hdr").toString
    df(StructType(Seq(StructField("b", BinaryType))),
      Row(Array[Byte](0x42, 0x4D)))
      .write.mode("overwrite").parquet(s"$dir/b.parquet")
    val d = spark.read.parquet(s"$dir/b.parquet")
    val plan = d.select(graft.multimodal.ImageHeader.dimsCol(col("b"))
      .as("hdr")).queryExecution.optimizedPlan
    val udfCount = plan.expressions.map(e =>
      e.collect {
        case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u
      }.size).sum
    assert(udfCount == 1, s"expected 1 ScalaUDF node, found $udfCount")
  }

  // ------------------------------------------------- cc redaction edge

  test("redact cc: a card inside a longer digit run is left untouched") {
    val d = df(StructType(Seq(StructField("text", StringType))),
      // 4539578763621486 is Luhn-valid; embedded in a 20-digit run it is
      // NOT a candidate (no word boundary) and must not be rewritten
      Row("ref 45395787636214861234 and card 4539578763621486 end"))
    val out = d.select(graft.functions.TextFunctions
      .redactCreditCards(col("text")).as("t")).head().getString(0)
    assert(out == "ref 45395787636214861234 and card <CC> end", out)
  }

  // ------------------------------------------------- registry gates

  test("bpe_encode: oversize inline merge list requires explicit greedy") {
    val d = df(StructType(Seq(StructField("text", StringType))), Row("ab ab"))
    val merges = (0 until 300).map(i => s"[\"x$i\", \"y$i\"]").mkString(", ")
    val ex = intercept[IllegalArgumentException] {
      graft.api.Registry("bpe_encode")(d, graft.api.Conf.fromYaml(
        s"type: bpe_encode\ntext_key: text\nmerges: [$merges]"), null)
    }
    assert(ex.getMessage.contains("greedy"))
    // explicit greedy: true unblocks it
    val ok = graft.api.Registry("bpe_encode")(d, graft.api.Conf.fromYaml(
      s"type: bpe_encode\ntext_key: text\ngreedy: true\nmerges: [$merges]"),
      null)
    assert(ok.count() == 1)
  }

  test("distinct_ngrams YAML: approx knob reaches the plan") {
    val d = docsDf.withColumn("slice", lit("s"))
    val exact = graft.api.Registry("distinct_ngrams")(d,
      graft.api.Conf.fromYaml(
        "type: distinct_ngrams\nslice_key: slice\ntext_key: text\nn: 2"), null)
    val approx = graft.api.Registry("distinct_ngrams")(d,
      graft.api.Conf.fromYaml(
        "type: distinct_ngrams\nslice_key: slice\ntext_key: text\nn: 2\n" +
          "approx: true\nrsd: 0.01"), null)
    val ex = exact.head().getAs[Long]("n_distinct")
    val ap = approx.head().getAs[Long]("n_distinct")
    assert(math.abs(ap - ex) <= math.max(2.0, 0.05 * ex))
  }
}
