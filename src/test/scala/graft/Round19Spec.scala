package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-19 regressions: the single-job dual-side centroid trainer
  * (VERDICT r18 item 2 — parity must be BIT-identical, since the
  * sample-hash inputs are the risk the r18 builder deferred over), and
  * the t-closeness broadcast plan pin (item 4 — the r18 hint had no
  * checkable plan evidence at testable SFs because auto-broadcast
  * masked it; pinning with auto-broadcast disabled makes the hint
  * itself regression-proof). */
class Round19Spec extends SparkSpec {

  private val embSchema = StructType(Seq(
    StructField("vid", LongType),
    StructField("emb", ArrayType(DoubleType))))

  /** Deterministic pseudo-random embeddings; every 7th row duplicates
    * its predecessor's vector (equal vectors hash equal — the tie case
    * the dual trainer's driver-side re-sort must be insensitive to). */
  private def embDf(n: Int, dim: Int, salt: Long) = {
    def vec(i: Int): Seq[Double] = (0 until dim).map(j =>
      math.rint(math.sin(i * 31 + j * 17 + salt) * 8) / 4.0)
    val rows = (0 until n).map { i =>
      val base = if (i % 7 == 3 && i > 0) i - 1 else i
      Row(i.toLong, vec(base))
    }
    df(embSchema, rows: _*)
  }

  private def assertSameCentroids(
      a: Option[Array[Array[Double]]],
      b: Option[Array[Array[Double]]], hint: String): Unit = {
    assert(a.isDefined == b.isDefined, s"$hint: definedness differs")
    for ((x, y) <- a.zip(b)) {
      assert(x.length == y.length, s"$hint: centroid count differs")
      for (((cx, cy), i) <- x.zip(y).zipWithIndex)
        assert(java.util.Arrays.equals(cx, cy),
          s"$hint: centroid $i differs: ${cx.toSeq} vs ${cy.toSeq}")
    }
  }

  test("trainCentroidsDualOpt: bit-identical to two single-side trains") {
    val a = embDf(30, 4, salt = 1)
    val b = embDf(25, 4, salt = 2)
    for (sampleSize <- Seq(8, 16, 64); nCells <- Seq(3, 8)) {
      val single = (
        graft.ann.Ann.trainCentroidsOpt(a, "emb", nCells,
          sampleSize = sampleSize),
        graft.ann.Ann.trainCentroidsOpt(b, "emb", nCells,
          sampleSize = sampleSize))
      val dual = graft.ann.Ann.trainCentroidsDualOpt(a, "emb", b, "emb",
        nCells, sampleSize = sampleSize)
      assertSameCentroids(dual._1, single._1, s"side a (n=$sampleSize, k=$nCells)")
      assertSameCentroids(dual._2, single._2, s"side b (n=$sampleSize, k=$nCells)")
    }
  }

  test("trainCentroidsDualOpt: per-side dims stay independent") {
    // different embedding dims per side must not cross-contaminate the
    // samples (the union is array<double>-typed, rows vary in length)
    val a = embDf(12, 4, salt = 3)
    val b = embDf(12, 3, salt = 4)
    val dual = graft.ann.Ann.trainCentroidsDualOpt(a, "emb", b, "emb", 4,
      sampleSize = 6)
    assertSameCentroids(dual._1,
      graft.ann.Ann.trainCentroidsOpt(a, "emb", 4, sampleSize = 6), "dim a")
    assertSameCentroids(dual._2,
      graft.ann.Ann.trainCentroidsOpt(b, "emb", 4, sampleSize = 6), "dim b")
    assert(dual._1.get.head.length == 4 && dual._2.get.head.length == 3)
  }

  test("trainCentroidsDualOpt: empty sides return None without poisoning the other") {
    val a = embDf(10, 4, salt = 5)
    val empty = a.filter(lit(false))
    val d1 = graft.ann.Ann.trainCentroidsDualOpt(empty, "emb", a, "emb", 4,
      sampleSize = 6)
    assert(d1._1.isEmpty)
    assertSameCentroids(d1._2,
      graft.ann.Ann.trainCentroidsOpt(a, "emb", 4, sampleSize = 6), "b of (∅, b)")
    val d2 = graft.ann.Ann.trainCentroidsDualOpt(a, "emb", empty, "emb", 4,
      sampleSize = 6)
    assert(d2._2.isEmpty)
    assertSameCentroids(d2._1,
      graft.ann.Ann.trainCentroidsOpt(a, "emb", 4, sampleSize = 6), "a of (a, ∅)")
    val d3 = graft.ann.Ann.trainCentroidsDualOpt(empty, "emb", empty, "emb", 4)
    assert(d3._1.isEmpty && d3._2.isEmpty)
  }

  test("marginIvf through the dual trainer still matches the brute margin at nProbe=nCells") {
    // the q271 drop-in property, re-proven over the new training path
    val emb = embDf(24, 4, salt = 6)
    val src = emb.filter(col("vid") % 2 === 0)
    val tgt = emb.filter(col("vid") % 2 === 1)
    val brute = graft.ops.BitextMine.margin(
      src, "vid", "emb", tgt, "vid", "emb", k = 3, threshold = 0.0)
      .collect().map(_.toSeq).toSet
    val ivf = graft.ops.BitextMine.marginIvf(
      src, "vid", "emb", tgt, "vid", "emb", k = 3, threshold = 0.0,
      nCells = 4, nProbe = 4)
      .collect().map(_.toSeq).toSet
    assert(ivf == brute)
  }

  test("cellDistStructs rejects an empty centroid set loudly") {
    intercept[IllegalArgumentException] {
      graft.ann.Ann.cellDistStructs(col("emb"), Array.empty[Array[Double]])
    }
  }

  // ---------------- shingles: zip_with staging parity

  test("shingles: zip_with form is byte-identical to the sequence-lambda form") {
    // the old O(tokens²) reference form, kept here as the parity oracle
    def oldShingles(c: org.apache.spark.sql.Column, n: Int) = {
      val toks = split(c, " ")
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
    }
    val schema = StructType(Seq(StructField("t", StringType)))
    val rows = Seq(
      "a b c d e f g", "a b c", "a b", "a", "",
      "a  b   c", " leading", "trailing ", "  ", "x y x y x y",
      "one two three four five six seven eight nine ten").map(Row(_)) :+
      Row(null)
    val d = df(schema, rows: _*)
    for (n <- Seq(2, 3, 4, 5)) {
      val got = d.select(
        graft.functions.TextFunctions.shingles(col("t"), n).as("g"),
        oldShingles(col("t"), n).as("o")).collect()
      for (r <- got)
        assert(r.get(0) == r.get(1), s"n=$n: ${r.get(0)} vs ${r.get(1)}")
    }
  }

  test("domainSuffixes: aggregate-fold form matches the sequence-lambda form") {
    def oldSuffixes(c: org.apache.spark.sql.Column) = {
      val labels = split(graft.functions.UrlFunctions.domain(c), "\\.")
      transform(sequence(lit(1), size(labels)),
        i => array_join(slice(labels, i, size(labels)), "."))
    }
    val schema = StructType(Seq(StructField("u", StringType)))
    val rows = Seq(
      "https://a.b.example.org/x", "http://example.com/", "http://org/",
      "https://example.com./trailing-dot", "http://a..b/empty-label",
      "not a url", "").map(Row(_)) :+ Row(null)
    val d = df(schema, rows: _*)
    for (r <- d.select(graft.functions.UrlFunctions.domainSuffixes(col("u"))
        .as("g"), oldSuffixes(col("u")).as("o")).collect())
      assert(r.get(0) == r.get(1), s"${r.get(0)} vs ${r.get(1)}")
  }

  // ---------------- unigram Viterbi: trie kernel parity

  test("viterbiTrie: bit-identical segmentations to the HashMap kernel") {
    val rng = new scala.util.Random(7)
    val alphabet = "abcde01"
    def randPiece(len: Int) =
      (0 until len).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    // vocab: all single chars plus random multi-char pieces (with ties —
    // equal logps force the longer-piece tie rule through both kernels)
    val entries = (alphabet.map(c => graft.ops.UnigramLm.VocabEntry(
        c.toString, 1L, -3.0 - (c % 3))) ++
      (0 until 40).map { i => graft.ops.UnigramLm.VocabEntry(
        randPiece(2 + rng.nextInt(3)), 1L, -2.0 - (i % 4) * 0.5) })
      .distinctBy(_.piece).toArray
    val m = new java.util.HashMap[String, java.lang.Double]()
    entries.foreach(v => m.put(v.piece, java.lang.Double.valueOf(v.logp)))
    val unk = entries.map(_.logp).min - math.log(100.0)
    val trie = new graft.ops.UnigramLm.AsciiPieceTrie(entries)
    val words = (0 until 300).map(_ => randPiece(1 + rng.nextInt(14))) ++
      Seq("", "zzzz", "a0a0a0a0", "ü-nonascii", "x")
    for (w <- words; maxLen <- Seq(2, 4)) {
      val a = graft.ops.UnigramLm.viterbi(w, m, maxLen, unk).toSeq
      val b = graft.ops.UnigramLm.viterbiTrie(w, trie, maxLen, unk).toSeq
      assert(a == b, s"'$w' maxLen=$maxLen: $a vs $b")
    }
  }

  test("unigram seed: one-collect driver selection matches the three-action form") {
    // the old three-action form, kept as the parity oracle: chars count,
    // distributed TakeOrdered for the multi top-k, Column-expression logp
    def oldSeed(words: org.apache.spark.sql.DataFrame, maxPieceLen: Int,
        seedSize: Int) = {
      val counts = graft.ops.UnigramLm.seedCounts(words, maxPieceLen)
      val chars = counts.filter(length(col("piece")) === 1)
      val kMulti = math.max(seedSize - chars.count(), 0L).toInt
      val multi = counts.filter(length(col("piece")) >= 2)
        .orderBy(col("cnt").desc, col("piece")).limit(kMulti)
      val sel = chars.unionByName(multi)
      val total = sel.agg(sum(col("cnt"))).head().getLong(0)
      sel.withColumn("logp",
        round(log(col("cnt").cast("double") / total.toDouble), 6))
    }
    val words = graft.ops.UnigramLm.wordCounts(docsDf, "text")
    for (seedSize <- Seq(2, 10, 400)) {
      val a = oldSeed(words, 4, seedSize).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val b = graft.ops.UnigramLm.seed(words, 4, seedSize).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(a == b, s"seedSize=$seedSize:\nonly old: ${a -- b}\nonly new: ${b -- a}")
    }
  }

  test("q275 restores noDataMicroBatches after its scoped disable") {
    // the gate flips the session conf off for its own run (inner joins
    // emit nothing on the no-data batch) — it must never leak into the
    // next query, which may be a windowed-agg gate that NEEDS the flush
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val before = spark.conf.get(key)
    assert(before == "true", s"unexpected ambient default: $before")
    val fn = graft.SparkEntry.queries("q275_stream_interval_join")
    fn(spark, "/root/testdata/sf0.001").count()
    assert(spark.conf.get(key) == before, "conf leaked")
  }

  // ---------------- t-closeness broadcast plan pin (VERDICT r18 item 4)

  test("q286 shape: the global-distribution join broadcasts even without auto-broadcast") {
    val schema = StructType(Seq(
      StructField("lang", StringType), StructField("n", LongType),
      StructField("source", StringType)))
    val rows = (0 until 40).map(i =>
      Row(if (i % 3 == 0) "en" else "de", (i % 4).toLong, s"s${i % 5}"))
    val d = df(schema, rows: _*)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // with auto-broadcast OFF, only the explicit broadcast(g0) hint can
      // produce a BroadcastHashJoin on the sensitive-value key — the pin
      // fails if the hint is ever dropped (r18 could not show this at any
      // testable SF because the tiny aggregate auto-broadcast anyway)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = graft.ops.Profile.tCloseness(d, Seq("lang", "n"), "source",
        t = 0.2).queryExecution.executedPlan.toString
      val svJoinLines = plan.linesIterator
        .filter(l => l.contains("Join") && l.contains("_sv")).toSeq
      assert(svJoinLines.nonEmpty, s"no _sv join found:\n${plan.take(2000)}")
      assert(svJoinLines.forall(_.contains("BroadcastHashJoin")),
        s"sensitive-key join is not broadcast:\n${svJoinLines.mkString("\n")}")
      // the numeric arm's config-bounded globalBins broadcast, same pin
      val plan2 = graft.ops.Profile.tClosenessNumeric(d, Seq("lang"), "n",
        t = 0.2, bins = 4).queryExecution.executedPlan.toString
      val binJoinLines = plan2.linesIterator
        .filter(l => l.contains("Join") && l.contains("_gbin")).toSeq
      assert(binJoinLines.nonEmpty, s"no _gbin join found:\n${plan2.take(2000)}")
      assert(binJoinLines.forall(_.contains("BroadcastHashJoin")),
        s"global-bins join is not broadcast:\n${binJoinLines.mkString("\n")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
