package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 regressions: shared dedup components (one pairs computation
  * serves keepBest AND audit), the de-fattened EditDedup pair shuffle
  * (hash-keyed candidates), plan-shape pins for the r12 ops the verdict
  * called out, RFC 9309 product-token group selection, the
  * train_classifier → linear_score intercept path, md5-ordered
  * stratifiedExact, and Pseudonymize delimiter safety. */
class Round13Spec extends SparkSpec {

  private def tmpParquet(d: DataFrame, name: String): DataFrame = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_$name")
      .resolve("t.parquet").toString
    d.write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  private def editFixture: DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    df(schema,
      Row(1L, "abcdefghij"), Row(2L, "abcdefghijk"),
      Row(3L, "abcdefghix"), Row(4L, "zzzzzzzzzz"),
      Row(5L, "qqqq"), Row(6L, "qqqq"))
  }

  // ------------------------------------- shared components (VERDICT #2)

  test("edit dedup: one components computation serves keepBest AND audit") {
    val d = editFixture
    val comp = graft.dedup.EditDedup.components(d, "id", "s", t = 1)
      .persist()
    comp.count() // materialize the single PassJoin + CC
    val kept = graft.dedup.EditDedup.keepBest(d, "id", "s", comp, "")
    val audit = graft.dedup.EditDedup.audit(d, "id", "s", comp, "")
    // component-accepting overloads agree with the self-computing forms
    val keptDirect = graft.dedup.EditDedup.keepBest(d, "id", "s", t = 1)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept.select("id").collect().map(_.getLong(0)).toSet == keptDirect)
    val auditDirect = graft.dedup.EditDedup.audit(d, "id", "s", t = 1)
      .select("id", "survivor_id", "kept").collect().map(_.toSeq).toSet
    assert(audit.select("id", "survivor_id", "kept")
      .collect().map(_.toSeq).toSet == auditDirect)
    // audit ⊇ keepBest: filtering kept reproduces the dedup exactly
    assert(audit.filter(col("kept")).drop("survivor_id", "kept")
      .collect().map(_.toSeq).toSet ==
      kept.collect().map(_.toSeq).toSet)
    // and the overload really REUSES the handle: no PassJoin/levenshtein
    // anywhere in its plan — just the persisted component table
    val overloadPlan = kept.queryExecution.optimizedPlan.toString
    assert(!overloadPlan.contains("levenshtein"), overloadPlan.take(800))
    assert(overloadPlan.contains("InMemoryRelation"), overloadPlan.take(800))
    comp.unpersist()
  }

  test("minhash dedup: components sharing mirrors the edit arm") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val d = df(schema,
      Row(1L, "the quick brown fox jumps over the lazy dog again"),
      Row(2L, "the quick brown fox jumps over the lazy dog again!"),
      Row(3L, "completely different content with no shared shingles"))
    val comp = graft.dedup.MinHashDedup.components(d, "id", "s",
      jaccardThreshold = 0.5).persist()
    comp.count()
    val kept = graft.dedup.MinHashDedup.keepBestFromComponents(
      d, "id", comp, length(col("s")))
    val audit = graft.dedup.MinHashDedup.auditFromComponents(
      d, "id", comp, length(col("s")))
    val keptDirect = graft.dedup.MinHashDedup.keepBest(d, "id", "s",
      jaccardThreshold = 0.5).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.select("id").collect().map(_.getLong(0)).toSet == keptDirect)
    assert(audit.filter(col("kept")).drop("survivor_id", "kept")
      .collect().map(_.toSeq).toSet == kept.collect().map(_.toSeq).toSet)
    comp.unpersist()
  }

  // --------------------------- de-fattened pair shuffle + plan pins (#1, #3)

  test("edit pairs plan: hash-keyed candidates, no all-pairs operator") {
    val p = tmpParquet(editFixture, "editplan")
    val q = graft.dedup.EditDedup.pairs(p, "id", "s", t = 2)
    val plan = q.queryExecution.executedPlan.toString
    // candidates join on the 8-byte xxhash64 of (len, chunk, segment) —
    // document text never rides the ×75 probe explosion
    assert(plan.contains("xxhash64"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1500))
    // and the result is still exact (brute force cross-check)
    val rows = editFixture.collect().map(r => (r.getLong(0), r.getString(1)))
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val expected = (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && lev(sa, sb) <= 2
    } yield (ia, ib, lev(sa, sb).toLong)).toSet
    val got = q.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("edit pairs short bucket: length-keyed join, unicode-wide corpus") {
    // ADVICE r12: the old always-zero key put every distinct short text
    // on ONE reducer key; the bucket now joins on short-side length.
    // CJK-ish fixture: many distinct 1-2 char strings + fringe 3-4 char.
    val rows = (1L to 60L).map { i =>
      val s = i % 5 match {
        case 0 => s"${(0x4e00 + i).toChar}"
        case 1 => s"${(0x4e00 + i).toChar}${(0x4f00 + i).toChar}"
        case 2 => s"${(0x4e00 + i).toChar}${(0x4f00 + i).toChar}x"
        case 3 => s"${(0x4e00 + (i % 7)).toChar}" // repeats -> dist-0 pairs
        case _ => s"${(0x4e00 + i).toChar}abc"
      }
      Row(i, s)
    }
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val d = df(schema, rows: _*)
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val data = rows.map(r => (r.getLong(0), r.getString(1)))
    val expected = (for {
      (ia, sa) <- data; (ib, sb) <- data
      if ia < ib && lev(sa, sb) <= 2
    } yield (ia, ib, lev(sa, sb).toLong)).toSet
    val got = graft.dedup.EditDedup.pairs(d, "id", "s", t = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
    // plan: the bucket self-join is an equi-join (no nested loop)
    val plan = graft.dedup.EditDedup.pairs(tmpParquet(d, "shortplan"),
      "id", "s", t = 2).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("salted join plan: keyed equi-join on (key, salt)") {
    val big = tmpParquet(spark.range(200)
      .select(col("id"), (col("id") % 3).as("k")), "sjbig")
    val small = tmpParquet(spark.range(3)
      .select(col("id").as("k"), concat(lit("L"), col("id")).as("label")),
      "sjsmall")
    val q = graft.ops.SaltedJoin.inner(big, small, "k", salts = 4,
      saltExpr = "id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1500))
    assert(q.count() == 200)
  }

  test("length bucket plan: global rank rides the range sort, no unpartitioned window") {
    val d = tmpParquet(spark.range(100)
      .select(col("id"), (col("id") % 17 + 1).as("len")), "lb")
    val q = graft.ops.LengthBucket.assignBatches(d, "len", 8, "id")
    val windows = q.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(windows.isEmpty, "unpartitioned Window in LengthBucket plan")
    assert(q.count() == 100)
  }

  // ------------------------------------------ RFC 9309 product tokens

  test("robots: product-token prefix group selection, longest match wins") {
    val schema = StructType(Seq(
      StructField("host", StringType), StructField("body", StringType)))
    val robots = df(schema,
      Row("h1", "User-agent: graftbot\nDisallow: /g\n\n" +
        "User-agent: graftbot-news\nDisallow: /n\n\n" +
        "User-agent: *\nDisallow: /\n"),
      Row("h2", "User-agent: *\nDisallow: /only\n"))
    val rules = graft.ops.RobotsTxt.parseRules(robots, "host", "body")
    val uschema = StructType(Seq(StructField("uid", LongType),
      StructField("host", StringType), StructField("path", StringType)))
    val urls = df(uschema,
      Row(1L, "h1", "/g"), Row(2L, "h1", "/n"), Row(3L, "h1", "/x"),
      Row(4L, "h2", "/only"), Row(5L, "h2", "/free"))
    def verdicts(agent: String): Map[Long, Boolean] =
      graft.ops.RobotsTxt.isAllowed(urls, "uid", "host", "path",
        rules, agent).collect()
        .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("allowed")))
        .toMap
    // versioned UA binds to its product token's group
    val v12 = verdicts("GraftBot/1.2")
    assert(v12 == Map(1L -> false, 2L -> true, 3L -> true,
      4L -> false, 5L -> true))
    // longer product token prefers the LONGEST matching group
    val news = verdicts("graftbot-news")
    assert(news == Map(1L -> true, 2L -> false, 3L -> true,
      4L -> false, 5L -> true))
    // no matching group falls through to *
    val other = verdicts("otherbot/9")
    assert(other == Map(1L -> false, 2L -> false, 3L -> false,
      4L -> false, 5L -> true))
  }

  // ------------------------- train_classifier -> linear_score intercept

  test("registry train->score chain serves the trained intercept") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("label", LongType), StructField("text", StringType)))
    // imbalanced + separable so the intercept is materially non-zero
    val rows = (1L to 40L).map { i =>
      if (i % 4 == 0) Row(i, 1L, "good clean prose here")
      else Row(i, 0L, "spam junk noise words")
    }
    val d = df(schema, rows: _*)
    val m = graft.ops.TextClassifier.train(d, "label", "text",
      maxIter = 30)
    assert(math.abs(m.bias) > 1e-3, s"fixture bias too small: ${m.bias}")
    val exported = graft.api.Registry("train_classifier")(d,
      graft.api.Conf.fromYaml(
        "type: train_classifier\nlabel_key: label\ntext_key: text\n" +
          "max_iter: 30"), null)
    assert(exported.filter(col("token") === "__bias__").count() == 1)
    val ctx = graft.api.OpContext(spark, graft.llm.MockLlmClient(),
      Map("w" -> exported))
    val viaRegistry = graft.api.Registry("linear_score")(d,
      graft.api.Conf.fromYaml(
        "type: linear_score\nid_key: id\ntext_key: text\nweights: w"),
      ctx).select("id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val direct = graft.ops.LinearScore.withScore(d, "id", "text",
      m.weights, m.bias).select("id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaRegistry.keySet == direct.keySet)
    viaRegistry.foreach { case (id, s) =>
      assert(math.abs(s - direct(id)) < 1e-6,
        s"id=$id registry=$s direct=${direct(id)}")
    }
    // the probabilities actually separate the classes (bias included)
    assert(viaRegistry(4L) > 0.5 && viaRegistry(1L) < 0.5)
  }

  test("linear_score: literal __bias__ doc token cannot double-count") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("text", StringType)))
    val d = df(schema, Row(1L, "__bias__ w"), Row(2L, "w"))
    val wschema = StructType(Seq(StructField("token", StringType),
      StructField("weight", DoubleType)))
    val w = df(wschema, Row("__bias__", 2.0), Row("w", 1.0))
    val out = graft.ops.LinearScore(d, "id", "text", w)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // both docs score sigmoid(2 + 1): the literal token is reserved
    val expect = math.rint(1.0 / (1.0 + math.exp(-3.0)) * 1e6) / 1e6
    assert(out(1L) == expect && out(2L) == expect, out.toString)
  }

  // ------------------------------------- stratifiedExact md5 ordering

  test("stratifiedExact: 52-bit md5 order, exact floors, negative ids") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("g", StringType)))
    val rows = (1L to 20L).map(i => Row(i, "a")) ++
      (100L to 109L).map(i => Row(i, "b")) :+ Row(-5L, "b")
    val d = df(schema, rows: _*)
    val got = graft.ops.SampleOp.stratifiedExact(d, "g", 0.5, "id")
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    def h(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:sx".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 13), 16)
    }
    val expected = rows.map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).toSeq.flatMap { case (_, members) =>
        val n = math.floor(0.5 * members.size).toInt
        members.sortBy(m => (h(m._2), m._2)).take(n)
      }.toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
    assert(got.count(_._1 == "a") == 10 && got.count(_._1 == "b") == 5)
  }

  // ------------------------------ LazyFrame round-trips for the r12 ops

  test("LazyFrame r12/r13 builders round-trip through YAML and run") {
    import graft.api.{LazyFrame, Pipeline}
    val dir = java.nio.file.Files.createTempDirectory("lf13").toString
    docsDf.write.mode("overwrite").parquet(s"$dir/docs.parquet")
    docsDf.select(col("lang")).distinct()
      .withColumn("label", concat(lit("L"), col("lang")))
      .write.mode("overwrite").parquet(s"$dir/dim.parquet")
    def roundTrips(lf: LazyFrame): Long = {
      val reparsed = LazyFrame.fromYaml(lf.toYaml)
      assert(reparsed.toYaml == lf.toYaml) // fixpoint
      val direct = lf.run(spark).count()
      assert(Pipeline.runYaml(lf.toYaml, spark).count() == direct)
      direct
    }
    def docs = LazyFrame.read("docs", s"$dir/docs.parquet")
    val n = docsDf.count()
    assert(roundTrips(docs.runsCollapse("lang", "doc_id", "text",
      "doc_id")) > 0)
    assert(roundTrips(docs.skewSummary("lang")) == 1)
    assert(roundTrips(docs.skewHeavyKeys("lang", 2, 3)) == 2)
    assert(roundTrips(docs.stratifiedExact("lang", 0.5, "doc_id")) ==
      math.floor(0.5 * 5) + math.floor(0.5 * 1))
    assert(roundTrips(docs.saltedJoin(
      LazyFrame.read("dim", s"$dir/dim.parquet"), "lang", salts = 2,
      saltExpr = "doc_id")) == n)
    assert(roundTrips(docs.lengthBatches("doc_id", 4, "doc_id")) == n)
    assert(roundTrips(docs
      .codeMap("lbl" -> "cast(doc_id % 2 as bigint)",
        "s" -> "cast(doc_id as double) / 10")
      .calibrationBinsEqualMass("lbl", "s", bins = 3,
        tieBreak = "doc_id")) == 3)
    assert(roundTrips(docs
      .codeMap("payload" -> "cast(text as binary)")
      .byteFeatures("payload", dim = 4)) == n)
    assert(roundTrips(docs.editAudit("doc_id", "text", 2)) == n)
  }

  // ----------------------------------------- multimodal feature seam

  test("byteFeatures: deterministic md5 kernel, null/empty safe, ANN-ready") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("payload", BinaryType)))
    val d = df(schema,
      Row(1L, "alpha".getBytes("UTF-8")),
      Row(2L, "alpha".getBytes("UTF-8")),   // identical bytes
      Row(3L, "beta".getBytes("UTF-8")),
      Row(4L, null),
      Row(5L, Array.empty[Byte]))
    val out = graft.multimodal.BinaryOps.withByteFeatures(d, "payload", 8)
    val vecs = out.collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Double](r.fieldIndex("byte_features")).toVector).toMap
    assert(vecs(1L).length == 8)
    assert(vecs(1L) == vecs(2L))            // pure function of bytes
    assert(vecs(1L) != vecs(3L))
    assert(vecs(4L) == Vector.fill(8)(0.0) && vecs(5L) == vecs(4L))
    assert(vecs(1L).forall(v => v >= -1.0 && v <= 1.0))
    // the seam feeds ANN unchanged: identical payloads are each other's
    // top neighbor at cosine 1
    val nn = graft.ann.Ann.bruteForce(
      out.filter(col("id") <= 3), "id", "byte_features",
      out.filter(col("id") <= 3), "id", "byte_features", k = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(nn(1L) == ((2L, 1.0)) && nn(2L) == ((1L, 1.0)))
  }

  // ------------------------------------ equal-mass calibration bins

  test("calibrationBinsEqualMass: equal-count bins, deterministic ties") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("lbl", LongType), StructField("s", DoubleType)))
    // 12 rows, 3 bins of exactly 4; scores with ties broken by id
    val rows = (1L to 12L).map(i => Row(i, i % 2, (i % 4).toDouble / 4))
    val d = df(schema, rows: _*)
    val out = graft.ops.ClassifierEval
      .calibrationBinsEqualMass(d, "lbl", "s", bins = 3, tieBreak = "id")
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(out.forall(_._2 == 4L)) // equal mass, sizes differ by <= 1
    // rank order: scores 0,0,0 (ids 4,8,12), .25 (1,5,9), .5 (2,6,10),
    // .75 (3,7,11) -> bin0 = {4,8,12,1}, pos_rate = labels {0,0,0,1}/4
    assert(out(0)._3 == 0.25)
    // no unpartitioned Window in the plan (global rank rides the sort)
    val p = java.nio.file.Files.createTempDirectory("ecal")
      .resolve("d.parquet").toString
    d.write.mode("overwrite").parquet(p)
    val windows = graft.ops.ClassifierEval.calibrationBinsEqualMass(
      spark.read.parquet(p), "lbl", "s", 3, "id")
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
    assert(windows.isEmpty)
  }

  // --------------------------------------------- annotator agreement

  test("cohen kappa: perfect, chance-level, and known-value fixtures") {
    val schema = StructType(Seq(StructField("a", StringType),
      StructField("b", StringType)))
    // classic textbook 2x2: 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no
    val rows =
      Seq.fill(20)(Row("y", "y")) ++ Seq.fill(5)(Row("y", "n")) ++
        Seq.fill(10)(Row("n", "y")) ++ Seq.fill(15)(Row("n", "n"))
    val out = graft.ops.Agreement.cohenKappa(df(schema, rows: _*),
      "a", "b").head()
    assert(out.getLong(0) == 50)
    assert(out.getDouble(1) == 0.7)      // po = 35/50
    assert(out.getDouble(2) == 0.5)      // pe = (25*30 + 25*20)/2500
    assert(out.getDouble(3) == 0.4)      // (0.7-0.5)/(1-0.5)
    // perfect agreement -> kappa 1; nulls excluded
    val perfect = graft.ops.Agreement.cohenKappa(
      df(schema, Row("x", "x"), Row("y", "y"), Row(null, "y")),
      "a", "b").head()
    assert(perfect.getLong(0) == 2 && perfect.getDouble(3) == 1.0)
    val conf = graft.ops.Agreement.confusion(df(schema, rows: _*),
      "a", "b").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(conf(("y", "y")) == 20 && conf(("n", "y")) == 10)
    val yaml = graft.api.Registry("agreement")(df(schema, rows: _*),
      graft.api.Conf.fromYaml(
        "type: agreement\nmode: cohen\na_key: a\nb_key: b"), null)
    assert(yaml.head().getDouble(3) == 0.4)
  }

  test("fleiss kappa: unanimous items vs full disagreement") {
    val schema = StructType(Seq(StructField("item", LongType),
      StructField("lbl", StringType)))
    // 2 items x 3 raters: item 1 unanimous 'a', item 2 unanimous 'b'
    val unanimous = df(schema,
      Row(1L, "a"), Row(1L, "a"), Row(1L, "a"),
      Row(2L, "b"), Row(2L, "b"), Row(2L, "b"))
    val u = graft.ops.Agreement.fleissKappa(unanimous, "item", "lbl")
      .head()
    assert(u.getLong(0) == 2 && u.getLong(1) == 6)
    assert(u.getDouble(2) == 1.0 && u.getDouble(4) == 1.0)
    // every rater disagrees on every item: P_i = 0, kappa < 0
    val allDiff = df(schema,
      Row(1L, "a"), Row(1L, "b"), Row(1L, "c"),
      Row(2L, "a"), Row(2L, "b"), Row(2L, "c"))
    val d2 = graft.ops.Agreement.fleissKappa(allDiff, "item", "lbl")
      .head()
    assert(d2.getDouble(2) == 0.0 && d2.getDouble(4) < 0)
    // single-rating items are excluded
    val ragged = graft.ops.Agreement.fleissKappa(
      df(schema, Row(1L, "a"), Row(1L, "a"), Row(2L, "a")),
      "item", "lbl").head()
    assert(ragged.getLong(0) == 1 && ragged.getLong(1) == 2)
  }

  // ------------------------------------------------ IBAN checksum ops

  test("ibanValid: ISO 13616 mod-97 gate; redact only valid candidates") {
    import graft.functions.TextFunctions
    val schema = StructType(Seq(StructField("s", StringType)))
    val d = df(schema,
      Row("DE89370400440532013000"),      // valid (public ISO example)
      Row("GB82WEST12345698765432"),      // valid
      Row("DE89370400440532013001"),      // corrupted check
      Row("GB82WEST1234569876543"),       // wrong length tail
      Row("de89 3704 0044 0532 0130 00"), // lowercase + spaces: valid
      Row("ZZ12NOTANIBANATALL000"))
    val got = d.select(col("s"),
      TextFunctions.ibanValid(col("s")).as("v")).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("DE89370400440532013000"))
    assert(got("GB82WEST12345698765432"))
    assert(got("de89 3704 0044 0532 0130 00"))
    assert(!got("DE89370400440532013001"))
    assert(!got("GB82WEST1234569876543"))
    assert(!got("ZZ12NOTANIBANATALL000"))
    val red = df(schema,
      Row("wire DE89370400440532013000 or DE89370400440532013001 ok"))
      .select(TextFunctions.redactIbans(col("s")).as("r"))
      .head().getString(0)
    assert(red == "wire <IBAN> or DE89370400440532013001 ok", red)
    val yaml = graft.api.Registry("redact_iban")(
      df(schema, Row("a GB82WEST12345698765432 b")),
      graft.api.Conf.fromYaml("type: redact_iban\ntext_key: s"), null)
    assert(yaml.head().getString(0) == "a <IBAN> b")
  }

  // ------------------------------------------------------- novelty

  test("novelty: distinct-gram anti-join rates per slice") {
    val schema = StructType(Seq(StructField("slice", StringType),
      StructField("text", StringType)))
    val cur = df(schema,
      Row("s1", "alpha beta gamma delta"),   // grams: abg, bgd
      Row("s2", "alpha beta gamma"),          // gram: abg (seen in ref)
      Row("s2", "x y z w"))                   // grams: xyz, yzw (novel)
    val ref = df(schema, Row("r", "alpha beta gamma zeta"))
    val got = graft.ops.Novelty.report(cur, "slice", "text", ref,
      "text", n = 3).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    // s1: {abg, bgd} -> abg in ref, bgd novel
    assert(got("s1") == ((2L, 1L, 0.5)))
    // s2: {abg, xyz, yzw} -> 2 novel
    assert(got("s2") == ((3L, 2L, 0.666667)))
    val ctx = graft.api.OpContext(spark, graft.llm.MockLlmClient(),
      Map("ref" -> ref))
    val yaml = graft.api.Registry("novelty")(cur,
      graft.api.Conf.fromYaml(
        "type: novelty\nreference: ref\nslice_key: slice\n" +
          "text_key: text\nn: 3"), ctx)
    assert(yaml.count() == 2)
  }

  // --------------------------------------------------- dedup report

  test("dedup report: component sizes and dup-mass summary") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("component", LongType)))
    val comp = df(schema,
      Row(1L, 1L), Row(2L, 1L), Row(3L, 1L),   // size-3 cluster
      Row(5L, 5L), Row(6L, 5L),                 // size-2
      Row(8L, 8L), Row(9L, 8L))                 // size-2
    val sizes = graft.dedup.DedupReport.componentSizes(comp)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(sizes == Map(3L -> ((1L, 3L)), 2L -> ((2L, 4L))))
    val sum = graft.dedup.DedupReport.summary(comp, corpusRows = 100L)
      .head()
    assert(sum.getLong(0) == 100 && sum.getLong(1) == 7 &&
      sum.getLong(2) == 3 && sum.getLong(3) == 4 &&
      sum.getDouble(4) == 0.04)
    val yaml = graft.api.Registry("dedup_report")(comp,
      graft.api.Conf.fromYaml("type: dedup_report\nmode: sizes"), null)
    assert(yaml.count() == 2)
  }

  // ------------------------------------------------- crawl delays

  test("robots parse survives CRLF bodies and tab separators") {
    val schema = StructType(Seq(StructField("host", StringType),
      StructField("body", StringType)))
    val robots = df(schema, Row("h1",
      "User-agent: graftbot\r\nCrawl-delay:\t2\r\nDisallow: /x\r\n"))
    val delays = graft.ops.RobotsTxt.crawlDelays(robots, "host", "body")
      .collect().map(r => (r.getString(1), r.getDouble(2))).toSet
    assert(delays == Set(("graftbot", 2.0)))
    val rules = graft.ops.RobotsTxt.parseRules(robots, "host", "body")
      .collect().map(r => (r.getString(1), r.getString(3))).toSet
    assert(rules == Set(("graftbot", "/x")))
  }

  test("redactIbans covers print-grouped and lowercase forms") {
    import graft.functions.TextFunctions
    val schema = StructType(Seq(StructField("s", StringType)))
    val grouped = df(schema,
      Row("wire DE89 3704 0044 0532 0130 00 today"))
      .select(TextFunctions.redactIbans(col("s"))).head().getString(0)
    assert(grouped == "wire <IBAN> today", grouped)
    val lower = df(schema, Row("pay de89370400440532013000 ok"))
      .select(TextFunctions.redactIbans(col("s"))).head().getString(0)
    assert(lower == "pay <IBAN> ok", lower)
    // a grouped-but-invalid candidate stays untouched
    val bad = df(schema, Row("ref DE89 3704 0044 0532 0130 01 end"))
      .select(TextFunctions.redactIbans(col("s"))).head().getString(0)
    assert(bad == "ref DE89 3704 0044 0532 0130 01 end", bad)
  }

  test("runFromEdges: mixed-width id columns route to label propagation") {
    val schema = StructType(Seq(StructField("src", IntegerType),
      StructField("dst", LongType)))
    val wide = Int.MaxValue.toLong + 5L
    val edges = df(schema, Row(1, 2L), Row(2, wide))
    val comp = graft.graph.ConnectedComponents.runFromEdges(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(wide) == 1L && comp(2L) == 1L && comp(1L) == 1L)
  }

  test("crawl delays bind to user-agent runs; malformed values drop") {
    val schema = StructType(Seq(StructField("host", StringType),
      StructField("body", StringType)))
    val robots = df(schema, Row("h1",
      "User-agent: a\nUser-agent: b\nCrawl-delay: 1.5\n" +
        "Disallow: /x\nCrawl-delay: 3\n\n" +
        "User-agent: *\ncrawl-delay: 10\n\n" +
        "User-agent: c\nCrawl-delay: fast\n"))
    val got = graft.ops.RobotsTxt.crawlDelays(robots, "host", "body")
      .collect().map(r => (r.getString(1), r.getDouble(2))).toSet
    // the a/b run gets BOTH delay lines (last-write semantics are the
    // fetcher's choice; the parse preserves every directive), * gets 10,
    // c's non-numeric value drops
    assert(got == Set(("a", 1.5), ("b", 1.5), ("a", 3.0), ("b", 3.0),
      ("*", 10.0)))
  }

  // ------------------------------------------------ split leakage

  test("split leakage: cross-boundary near-dup pairs and ids") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType), StructField("split", StringType)))
    val d = df(schema,
      Row(1L, "abcdefghij", "train"),
      Row(2L, "abcdefghix", "test"),    // leaks vs 1 (dist 1)
      Row(3L, "abcdefghiy", "train"),   // leaks vs 2; same-split vs 1
      Row(4L, "zzzzzzzzzz", "test"))    // clean
    val prs = graft.ops.SplitLeakage.pairs(d, "id", "s", "split", t = 2)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    // note: report columns are (id_b joined last) — use field names
    val prs2 = graft.ops.SplitLeakage.pairs(d, "id", "s", "split", 2)
      .collect().map(r => (r.getLong(r.fieldIndex("id_a")),
        r.getLong(r.fieldIndex("id_b")))).toSet
    assert(prs2 == Set((1L, 2L), (2L, 3L)))
    assert(prs.nonEmpty)
    val rep = graft.ops.SplitLeakage.report(d, "id", "s", "split", 2)
      .head()
    assert(rep.getString(0) == "test" && rep.getString(1) == "train")
    assert(rep.getLong(rep.fieldIndex("n_pairs")) == 2)
    assert(rep.getLong(rep.fieldIndex("n_leaked_ids")) == 3)
    val yaml = graft.api.Registry("split_leakage")(d,
      graft.api.Conf.fromYaml(
        "type: split_leakage\nid_key: id\ntext_key: s\n" +
          "split_key: split\nthreshold: 2"), null)
    assert(yaml.count() == 1)
  }

  // --------------------------------------------- matryoshka truncation

  test("truncateNormalize: slice + renorm, zero-prefix safe") {
    import graft.functions.VectorFunctions
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("e", ArrayType(DoubleType))))
    val d = df(schema,
      Row(1L, Seq(3.0, 4.0, 100.0, -100.0)),
      Row(2L, Seq(0.0, 0.0, 5.0, 5.0)))
    val out = d.select(col("id"),
      VectorFunctions.truncateNormalize(col("e"), 2).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out(1L) == Seq(0.6, 0.8))      // 3-4-5 triangle
    assert(out(2L) == Seq(0.0, 0.0))      // zero prefix -> zero vector
    // cosine on truncated vectors is a unit cosine: self-sim 1
    val sim = d.filter(col("id") === 1).select(
      round(VectorFunctions.cosine(
        VectorFunctions.truncateNormalize(col("e"), 2),
        VectorFunctions.truncateNormalize(col("e"), 2)), 6))
      .head().getDouble(0)
    assert(sim == 1.0)
    val yaml = graft.api.Registry("truncate_embedding")(d,
      graft.api.Conf.fromYaml(
        "type: truncate_embedding\nembedding_key: e\ndim: 2"), null)
    assert(yaml.select("e").head().getSeq[Double](0) == Seq(0.6, 0.8))
  }

  // ------------------------------------- conversation pseudonymization

  test("pseudonymize.conversation: numbering consistent across turns") {
    val msgSchema = ArrayType(StructType(Seq(
      StructField("role", StringType), StructField("content", StringType))))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("messages", msgSchema)))
    val d = df(schema, Row(1L, Seq(
      Row("user", "mail bob@x.com and amy@y.org"),
      Row("assistant", "amy@y.org replied to bob@x.com"),
      Row("user", null))))
    val out = graft.ops.Pseudonymize.conversation(d, "messages")
    val row = out.head()
    assert(row.getLong(row.fieldIndex("n_email_entities")) == 2)
    val msgs = row.getSeq[Row](row.fieldIndex("messages_pseudo"))
    // sorted distinct: amy@y.org -> EMAIL_1, bob@x.com -> EMAIL_2 —
    // the SAME numbers in both turns
    assert(msgs(0).getString(1) == "mail EMAIL_2 and EMAIL_1")
    assert(msgs(1).getString(1) == "EMAIL_1 replied to EMAIL_2")
    assert(msgs(2).getString(1) == "") // null content -> empty, kept
    // zero-match conversations pass through
    val none = graft.ops.Pseudonymize.conversation(
      df(schema, Row(2L, Seq(Row("user", "no entities here")))),
      "messages").head()
    assert(none.getLong(none.fieldIndex("n_email_entities")) == 0)
    val yaml = graft.api.Registry("pseudonymize")(d,
      graft.api.Conf.fromYaml(
        "type: pseudonymize\nmessages_key: messages"), null)
    assert(yaml.columns.contains("messages_pseudo"))
  }

  // ------------------------------------------------- schema diff

  test("schemaDiff: added/removed/retyped columns, empty when equal") {
    val a = spark.range(2).select(col("id"), lit("t").as("text"),
      lit(1L).as("keep"))
    val b = spark.range(2).select(col("id").cast("string").as("id"),
      lit(2.0).as("score"), lit(1L).as("keep"))
    val got = graft.ops.SnapshotDiff.schemaDiff(a, b).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).toSeq
    assert(got == Seq(
      ("id", "type_changed", "BIGINT", "STRING"),
      ("score", "added", "", "DOUBLE"),
      ("text", "removed", "STRING", "")))
    assert(graft.ops.SnapshotDiff.schemaDiff(a, a).count() == 0)
  }

  // -------------------------------------------------- histogram

  test("histogram: clamped edge bins conserve the row count") {
    val schema = StructType(Seq(StructField("v", LongType)))
    val d = df(schema, Row(-5L), Row(0L), Row(9L), Row(10L), Row(55L),
      Row(200L), Row(null))
    val out = graft.ops.Profile.histogram(d, "v", bins = 10, lo = 0.0,
      hi = 100.0).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2),
        r.getLong(3))).toMap
    // -5 clamps into bin 0; 200 clamps into bin 9; null drops
    assert(out(0L) == ((0.0, 10.0, 3L)))   // -5, 0, 9
    assert(out(1L) == ((10.0, 20.0, 1L)))  // 10
    assert(out(5L) == ((50.0, 60.0, 1L)))  // 55
    assert(out(9L) == ((90.0, 100.0, 1L))) // 200 clamped
    assert(out.values.map(_._3).sum == 6)  // count conserved (ex null)
    val yaml = graft.api.Registry("histogram")(d,
      graft.api.Conf.fromYaml(
        "type: histogram\ncolumn: v\nbins: 10\nlo: 0\nhi: 100"), null)
    assert(yaml.count() == 4)
  }

  // ------------------------------------------ percentile ensemble

  test("percentile ensemble: rank normalization, deterministic ties") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("a", LongType), StructField("b", LongType)))
    val d = df(schema,
      Row(1L, 10L, 30L), Row(2L, 20L, 20L), Row(3L, 30L, 10L),
      Row(4L, 30L, 5L)) // tie on a: id 3 ranks before id 4
    val out = graft.ops.ScoreEnsemble.percentile(d, Seq("a", "b"), "id")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(r.fieldIndex("_pct_a")),
          r.getDouble(r.fieldIndex("_pct_b")),
          r.getDouble(r.fieldIndex("ensemble_pct")))).toMap
    assert(out(1L) == ((0.0, 1.0, 0.5)))
    assert(math.abs(out(3L)._1 - 0.666667) < 1e-9)
    assert(out(4L)._1 == 1.0 && out(4L)._2 == 0.0)
    // single-row frame: denom clamps, no divide-by-zero
    val one = graft.ops.ScoreEnsemble.percentile(
      df(schema, Row(1L, 5L, 5L)), Seq("a"), "id").head()
    assert(one.getDouble(one.fieldIndex("_pct_a")) == 0.0)
  }

  test("rrf: top-heavy rank fusion, published k=60 default") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("a", LongType), StructField("b", LongType)))
    val d = df(schema,
      Row(1L, 100L, 1L),   // best on a, worst on b
      Row(2L, 50L, 50L),   // middle on both
      Row(3L, 1L, 100L))   // worst on a, best on b
    val out = graft.ops.ScoreEnsemble.rrf(d, Seq("a", "b"), "id")
      .collect().map(r => r.getLong(0) ->
        r.getDouble(r.fieldIndex("rrf_score"))).toMap
    val e13 = math.rint((1.0 / 61 + 1.0 / 63) * 1e6) / 1e6
    val e2 = math.rint((1.0 / 62 + 1.0 / 62) * 1e6) / 1e6
    assert(out(1L) == e13 && out(3L) == e13)
    assert(out(2L) == e2)
    // the symmetric extremes tie; the consistent middle scores between
    assert(out(2L) > 0 && math.abs(out(1L) - out(2L)) < 1e-3)
    val yaml = graft.api.Registry("score_ensemble")(d,
      graft.api.Conf.fromYaml(
        "type: score_ensemble\nmode: rrf\ncolumns: [a, b]\n" +
          "tie_break: id\nk: 0"), null)
      .collect().map(r => r.getLong(0) ->
        r.getDouble(r.fieldIndex("rrf_score"))).toMap
    assert(yaml(1L) == math.rint((1.0 / 1 + 1.0 / 3) * 1e6) / 1e6)
  }

  test("apportion: quotas sum to the budget exactly, Hamilton remainders") {
    val schema = StructType(Seq(StructField("d", StringType),
      StructField("n", LongType)))
    // shares of 10: a=5.33.., b=3.33.., c=1.33.. -> floors 5,3,1,
    // leftover 1 goes to the largest remainder (all tie at 1/3 -> 'a')
    val d = df(schema, Row("a", 16L), Row("b", 10L), Row("c", 4L))
    val got = graft.ops.MixtureSolver.apportion(d, "d", "n", 10L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("a" -> 6L, "b" -> 3L, "c" -> 1L))
    assert(got.values.sum == 10L)
    // zero-total corpus: all quotas zero, no division by zero
    val z = graft.ops.MixtureSolver.apportion(
      df(schema, Row("a", 0L)), "d", "n", 10L).head()
    assert(z.getLong(2) == 0L)
    val yaml = graft.api.Registry("apportion")(d,
      graft.api.Conf.fromYaml(
        "type: apportion\ndomain_key: d\ncount_expr: n\nbudget: 10"),
      null)
    assert(yaml.agg(sum("quota")).head().getLong(0) == 10L)
  }

  test("ngram containment: asymmetric near-dup that Jaccard misses") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType), StructField("blk", StringType)))
    val full = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi"
    val prefix = "alpha beta gamma delta epsilon"
    val d = df(schema,
      Row(1L, full, "b1"), Row(2L, prefix, "b1"),
      Row(3L, "totally different words here now", "b1"))
    val got = graft.dedup.NgramJaccardDedup.containmentPairs(d, "id",
      "s", "blk", n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(4))).toSeq
    // prefix grams are a strict subset: containment 1, contained = 2
    assert(got == Seq((1L, 2L, 1.0, 2L)))
    // the same pair's Jaccard is low — the signal Jaccard misses
    val jac = graft.dedup.NgramJaccardDedup.pairs(d, "id", "s", "blk",
      n = 3, threshold = 0.01)
      .filter(col("id_a") === 1 && col("id_b") === 2)
      .head().getDouble(2)
    assert(jac < 0.5)
    val yaml = graft.api.Registry("dedup")(d,
      graft.api.Conf.fromYaml(
        "type: dedup\nmethod: ngram_containment\nid_key: id\n" +
          "text_key: s\nblock_expr: blk\nthreshold: 0.9"), null)
    assert(yaml.count() == 1)
  }

  // -------------------------------------------- phrase blocklist

  test("phrase blocklist: substring hits, filter and report modes") {
    import graft.functions.TextFunctions
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("t", StringType)))
    val d = df(schema,
      Row(1L, "please CLICK Here to win"),     // case-insensitive hit
      Row(2L, "subclass of words"),            // substring of a token: ok
      Row(3L, "clean prose"),
      Row(4L, null))
    val phrases = Seq("click here", "subclass")
    val flags = d.select(col("id"),
      TextFunctions.containsBlockedPhrase(col("t"), phrases).as("f"),
      TextFunctions.blockedPhraseCount(col("t"), phrases).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2)))
      .toMap
    assert(flags(1L) == ((true, 1L)) && flags(2L) == ((true, 1L)))
    assert(flags(3L) == ((false, 0L)) && flags(4L) == ((false, 0L)))
    val kept = graft.api.Registry("phrase_blocklist")(d,
      graft.api.Conf.fromYaml(
        "type: phrase_blocklist\ntext_key: t\n" +
          "phrases: ['click here', 'subclass']"), null)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L))
  }

  test("LazyFrame r13 builders round-trip through YAML and run") {
    import graft.api.{LazyFrame, Pipeline}
    val dir = java.nio.file.Files.createTempDirectory("lf13b").toString
    docsDf.write.mode("overwrite").parquet(s"$dir/docs.parquet")
    docsDf.select(col("doc_id"), col("text")).write.mode("overwrite")
      .parquet(s"$dir/prev.parquet")
    def roundTrips(lf: LazyFrame): Long = {
      val reparsed = LazyFrame.fromYaml(lf.toYaml)
      assert(reparsed.toYaml == lf.toYaml)
      val direct = lf.run(spark).count()
      assert(Pipeline.runYaml(lf.toYaml, spark).count() == direct)
      direct
    }
    def docs = LazyFrame.read("docs", s"$dir/docs.parquet")
    val n = docsDf.count()
    assert(roundTrips(docs
      .codeMap("a" -> "cast(doc_id % 2 as string)",
        "b" -> "cast(doc_id % 3 as string)")
      .cohenKappa("a", "b")) == 1)
    assert(roundTrips(docs.fleissKappa("lang", "text")) == 1)
    assert(roundTrips(docs.agreementConfusion("lang", "lang")) == 2)
    assert(roundTrips(docs.redactIbans("text")) == n)
    assert(roundTrips(docs.novelty(
      LazyFrame.read("prev", s"$dir/prev.parquet"),
      "lang", "text", "text", n = 3)) > 0)
    assert(roundTrips(docs.editComponents("doc_id", "text", 2)
      .dedupComponentSizes()) > 0)
    assert(roundTrips(docs.editComponents("doc_id", "text", 2)
      .dedupSummary(corpusRows = 6)) == 1)
    assert(roundTrips(docs
      .codeMap("host" -> "'h'", "body" -> "'Crawl-delay: 2'")
      .robotsCrawlDelays("host", "body")) == 0) // no UA run: no rows
    assert(roundTrips(docs
      .codeMap("split" -> "case when doc_id % 2 = 0 then 'a' else 'b' end")
      .splitLeakage("doc_id", "text", "split", 2)) >= 0)
    assert(roundTrips(docs
      .codeMap("e" -> "array(cast(doc_id as double), 1.0d, 2.0d)")
      .truncateEmbedding("e", 2)) == n)
    assert(roundTrips(docs
      .codeMap("n_chars" -> "cast(length(text) as bigint)")
      .histogram("n_chars", 4, 0.0, 100.0)) > 0)
    assert(roundTrips(docs
      .codeMap("n_chars" -> "cast(length(text) as bigint)")
      .scorePercentile(Seq("doc_id", "n_chars"), "doc_id")) == n)
    assert(roundTrips(docs
      .phraseBlocklist("text", Seq("fast spark"), report = true)) == n)
    assert(roundTrips(docs.schemaDiff(
      LazyFrame.read("prev", s"$dir/prev.parquet"))) == 1) // lang added
    assert(roundTrips(docs
      .conversationFromPairs("text", "lang")
      .conversationStats("messages")) == n)
    assert(roundTrips(docs.truncationReport(
      "cast(length(text) as bigint)", 30L)) == 1)
    assert(roundTrips(docs
      .conversationFromPairs("text", "lang")
      .pseudonymizeConversation("messages")) == n)
    // effective delay: the binary-merge step refs + the double default
    // must survive YAML
    docsDf.select(lit("h1").as("host"), lit("graftbot").as("agent"),
      lit(2.0).as("delay_seconds")).limit(1)
      .write.mode("overwrite").parquet(s"$dir/delays.parquet")
    assert(roundTrips(LazyFrame.read("hosts", s"$dir/docs.parquet")
      .codeMap("host" -> "'h1'")
      .effectiveCrawlDelay(
        LazyFrame.read("delays", s"$dir/delays.parquet"),
        "GraftBot/1.0", defaultDelay = 0.25)) == 1)
  }

  test("round-13 invariants: iban single-digit corruption, histogram mass, percentile range") {
    import graft.functions.TextFunctions
    // ANY single-digit change invalidates an IBAN: the mod-97 delta is
    // d·10^k with 0 < d < 97 and gcd(10, 97) = 1, so it is never ≡ 0
    val base = "DE89370400440532013000"
    val variants = for {
      i <- base.indices if base(i).isDigit
      d <- '0' to '9' if d != base(i)
    } yield base.updated(i, d)
    val schema = StructType(Seq(StructField("s", StringType)))
    val flags = df(schema, variants.map(Row(_)): _*)
      .select(TextFunctions.ibanValid(col("s"))).collect()
      .map(_.getBoolean(0))
    assert(flags.forall(!_), s"${flags.count(identity)} corrupted IBANs validated")
    // histogram conserves non-null mass at any bounds
    val vals = spark.range(500).select((col("id") * 7 % 311 - 50).as("v"))
    val mass = graft.ops.Profile.histogram(vals, "v", 7, 0.0, 100.0)
      .agg(sum("n")).head().getLong(0)
    assert(mass == 500)
    // percentile stays in [0,1] and is monotone in the score
    val p = graft.ops.ScoreEnsemble.percentile(
      spark.range(100).select(col("id"), (col("id") * 13 % 97).as("s")),
      Seq("s"), "id")
      .select("s", "_pct_s").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(p.forall { case (_, x) => x >= 0.0 && x <= 1.0 })
    val sorted = p.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
  }

  // -------------------------------------- conversation stats / budgets

  test("conversation stats: turns, role counts, masses, empty-safe") {
    val msgSchema = ArrayType(StructType(Seq(
      StructField("role", StringType), StructField("content", StringType))))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("messages", msgSchema)))
    val d = df(schema,
      Row(1L, Seq(Row("user", "hi"), Row("assistant", "hello!"))),
      Row(2L, Seq(Row("user", "q"), Row("assistant", "a"),
        Row("user", "follow"))),
      Row(3L, Seq.empty[Row]))
    val out = graft.ops.ChatOps.stats(d, "messages").collect()
      .map(r => r.getLong(0) -> (
        r.getLong(r.fieldIndex("n_turns")),
        r.getLong(r.fieldIndex("n_assistant_turns")),
        r.getLong(r.fieldIndex("total_chars")),
        r.getLong(r.fieldIndex("assistant_chars")),
        r.getBoolean(r.fieldIndex("ends_with_assistant")))).toMap
    assert(out(1L) == ((2L, 1L, 8L, 6L, true)))
    assert(out(2L) == ((3L, 1L, 8L, 1L, false)))
    assert(out(3L) == ((0L, 0L, 0L, 0L, false))) // empty conv: no throw
    val yaml = graft.api.Registry("conversation_stats")(d,
      graft.api.Conf.fromYaml(
        "type: conversation_stats\nmessages_key: messages"), null)
    assert(yaml.columns.contains("mean_turn_chars"))
  }

  test("truncation report: exact doc/token loss at the budget") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("l", LongType)))
    val d = df(schema, Row(1L, 10L), Row(2L, 64L), Row(3L, 100L),
      Row(4L, 65L))
    val r = graft.ops.PackOp.truncationReport(d, "l", 64L).head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 2)       // docs, over
    assert(r.getLong(2) == 239 && r.getLong(3) == 37)    // total, lost
    assert(r.getDouble(4) == 0.5)
    assert(r.getDouble(5) == math.rint(37.0 / 239 * 1e6) / 1e6)
  }

  test("effective crawl delay: group selection, max-of-group, default") {
    val dschema = StructType(Seq(StructField("host", StringType),
      StructField("agent", StringType),
      StructField("delay_seconds", DoubleType)))
    val delays = df(dschema,
      Row("h1", "graftbot", 2.0), Row("h1", "graftbot", 5.0),
      Row("h1", "*", 0.5),
      Row("h2", "*", 1.5),
      Row("h3", "otherbot", 9.0))
    val hschema = StructType(Seq(StructField("host", StringType)))
    val hosts = df(hschema, Row("h1"), Row("h2"), Row("h3"), Row("h4"))
    val got = graft.ops.RobotsTxt.effectiveDelay(hosts, delays,
      "GraftBot/2.1", defaultDelay = 0.25).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("h1" -> 5.0,   // specific group, max of its lines
      "h2" -> 1.5,                    // * fallback
      "h3" -> 0.25,                   // otherbot group doesn't apply
      "h4" -> 0.25))                  // no rows at all
  }

  test("mergeConsecutiveRoles: run fusion, extra fields survive, validate accepts") {
    val msgSchema = ArrayType(StructType(Seq(
      StructField("role", StringType), StructField("content", StringType),
      StructField("ts", LongType))))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("messages", msgSchema)))
    val d = df(schema,
      Row(1L, Seq(Row("user", "a", 1L), Row("user", "b", 2L),
        Row("user", "c", 3L), Row("assistant", "r", 4L),
        Row("assistant", "r2", 5L))),
      Row(2L, Seq(Row("user", "x", 1L), Row("assistant", "y", 2L))),
      Row(3L, null))
    val out = graft.ops.ChatOps.mergeConsecutiveRoles(d, "messages")
    val rows = out.collect().map(r => r.getLong(0) ->
      (r.getSeq[Row](r.fieldIndex("messages_merged")),
        r.getLong(r.fieldIndex("n_merged_turns")))).toMap
    val (m1, n1) = rows(1L)
    assert(n1 == 3)
    assert(m1.map(m => (m.getString(0), m.getString(1))) ==
      Seq(("user", "a\nb\nc"), ("assistant", "r\nr2")))
    assert(m1.head.getLong(2) == 1L) // run's FIRST message keeps ts
    assert(rows(2L)._2 == 0 && rows(3L)._2 == 0)
    // the repaired shape passes the alternation validator (the raw
    // 3-user-run shape is exactly what validate rejects)
    val vRow = graft.ops.ChatOps.validate(
      out.filter(col("id") === 1).select(col("id"),
        col("messages_merged").as("messages")), "messages").head()
    assert(vRow.getBoolean(vRow.fieldIndex("conv_valid")),
      vRow.toString)
    val yaml = graft.api.Registry("conversation_merge_roles")(d,
      graft.api.Conf.fromYaml(
        "type: conversation_merge_roles\nmessages_key: messages"), null)
    assert(yaml.columns.contains("messages_merged"))
  }

  // ---------------------------------------------- example pipeline

  test("the eval-integrity example pipeline runs end to end") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val yaml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("examples/eval_integrity_pipeline.yaml")))
    val out = graft.api.Pipeline.runYaml(yaml, spark)
    val row = out.head()
    assert(out.columns.toSet == Set("n", "po", "pe", "kappa"))
    assert(row.getLong(0) > 0)
    val k = row.getDouble(row.fieldIndex("kappa"))
    assert(k > 0.5 && k <= 1.0) // mostly-agreeing planted raters
  }

  // --------------------------------------- pseudonymize delimiter safety

  test("pseudonymize: matches containing ':' and '|' replace correctly") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("t", StringType)))
    val d = df(schema,
      Row(1L, "see foo:12 then bar:7 then foo:12 again"),
      Row(2L, "pipes a|cc and b|d here"))
    val colons = graft.ops.Pseudonymize(d.filter(col("id") === 1), "t",
      pattern = "[a-z]+:[0-9]+", label = "REF")
      .select("text_pseudo").head().getString(0)
    // sorted distinct: [bar:7 -> REF_1, foo:12 -> REF_2]
    assert(colons == "see REF_2 then REF_1 then REF_2 again", colons)
    val pipes = graft.ops.Pseudonymize(d.filter(col("id") === 2), "t",
      pattern = "[ab]\\|[a-z]+", label = "P")
      .select("text_pseudo").head().getString(0)
    // sorted distinct: [a|cc -> P_1, b|d -> P_2]; longest-first replace
    assert(pipes == "pipes P_1 and P_2 here", pipes)
  }
}
