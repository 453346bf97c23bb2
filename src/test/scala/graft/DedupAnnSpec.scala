package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dedup._
import graft.graph.ConnectedComponents

class DedupSpec extends SparkSpec {
  test("exact dedup keeps min-id per normalized text") {
    val out = ExactDedup(docsDf, "text", "doc_id")
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(4L) && ids.contains(1L) && ids.size == 5)
  }
  test("exact dedup normalizes case and whitespace") {
    val d = df(StructType(Seq(StructField("id", LongType), StructField("t", StringType))),
      Row(1L, "Hello  World"), Row(2L, "hello world"), Row(3L, "other"))
    assert(ExactDedup(d, "t", "id").count() == 2)
  }
  test("crossPairs flags new docs against the reference corpus only") {
    val ref = docsDf.filter("doc_id <= 3")   // holds doc 1
    val fresh = docsDf.filter("doc_id >= 4") // 4 = exact dup, 5 = near dup of 1
    val pairs = MinHashDedup.crossPairs(fresh, "doc_id", "text",
      ref, "doc_id", "text", jaccardThreshold = 0.5)
      .select("id_new", "id_ref").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((4L, 1L)) && pairs.contains((5L, 1L)))
    assert(pairs.forall { case (n, r) => n >= 4L && r <= 3L }) // one-directional
    val clean = MinHashDedup.cleanAgainstReference(fresh, "doc_id", "text",
      ref, "doc_id", "text", jaccardThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean === Set(6L)) // 4 and 5 dropped, unrelated 6 kept
    // Ref-side rows are never dropped; fresh docs with no ref match survive.
    assert(MinHashDedup.cleanAgainstReference(ref, "doc_id", "text",
      fresh, "doc_id", "text", jaccardThreshold = 0.5).count() === 2L)
    // Frame surface delegates with defaulted ref column names.
    assert(graft.api.Graft.fromDF(fresh)
      .dedupAgainst(graft.api.Graft.fromDF(ref), "doc_id", "text",
        threshold = 0.5).count() === 1L)
  }

  test("incremental scan: ledger skips ingested files, sees new and changed ones") {
    import graft.sources.IncrementalScan
    val root = java.nio.file.Files.createTempDirectory("incr").toString
    val data = s"$root/in"
    val ledger = s"$root/ledger"
    docsDf.filter("doc_id <= 3").coalesce(1)
      .write.mode("overwrite").parquet(data)
    // first run sees everything; commit records it
    val (d1, p1) = IncrementalScan.readNew(spark, data, ledger)
    assert(p1.nonEmpty && d1.count() === 3)
    IncrementalScan.commit(spark, ledger, p1)
    // second run: nothing new
    val (_, p2) = IncrementalScan.readNew(spark, data, ledger)
    assert(p2.isEmpty)
    // a new dump file arrives -> only IT is read
    val extra = java.nio.file.Files.createTempDirectory("extra").toString
    docsDf.filter("doc_id >= 4").coalesce(1)
      .write.mode("overwrite").parquet(extra)
    Option(new java.io.File(extra).listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".parquet"))
      .foreach { f => java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(data, "dump2-" + f.getName)) }
    val (d3, p3) = IncrementalScan.readNew(spark, data, ledger)
    assert(p3.length === 1 && d3.count() === 3)
    IncrementalScan.commit(spark, ledger, p3)
    assert(IncrementalScan.newFiles(spark, data, ledger).isEmpty)
  }

  test("sharded sink: stable routing, manifest totals, integrity check") {
    import graft.sources.ShardedSink
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val m1 = ShardedSink.write(docsDf, dir, "doc_id",
      "size(split(text, ' '))", numShards = 4)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    // round-trip: all rows come back, hive-pruned by shard
    val back = ShardedSink.readData(spark, dir)
    assert(back.count() === docsDf.count())
    assert(back.columns.contains("_shard"))
    // manifest totals match the data
    assert(m1.values.map(_._1).sum === docsDf.count())
    val totalTok = docsDf.selectExpr("sum(size(split(text, ' ')))")
      .head().getLong(0)
    assert(m1.values.map(_._2).sum === totalTok)
    // deterministic: a re-write lands every row in the same shard
    val dir2 = java.nio.file.Files.createTempDirectory("shards2").toString
    val m2 = ShardedSink.write(docsDf, dir2, "doc_id",
      "size(split(text, ' '))", numShards = 4)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m2 === m1)
    // integrity: intact export validates clean
    assert(ShardedSink.validate(spark, dir, "doc_id").count() === 0)
  }

  test("the incremental-ingest example pipeline runs end to end") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val yaml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("examples/incremental_ingest_pipeline.yaml")))
    val out = graft.api.Pipeline.runYaml(yaml, spark)
    val langs = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // es has no budget row -> dropped; every budgeted language survives
    assert(!langs.contains("es"))
    assert(Set("en", "de", "fr", "zh").subsetOf(langs.keySet))
    // each language's kept token mass fits its budget
    val budgets = Map("en" -> 3000L, "de" -> 2000L, "fr" -> 1500L, "zh" -> 1500L)
    val toks = out.groupBy("lang")
      .agg(sum(expr("size(split(text, ' '))")).as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    toks.foreach { case (l, t) => assert(t <= budgets(l), s"$l: $t") }
    assert(out.columns.contains("bigram_nll"))
    // the sharded export wrote data + a manifest whose totals agree
    val exported = graft.sources.ShardedSink.readData(
      spark, "/tmp/graft_incremental_ingest")
    assert(exported.count() === out.count())
    assert(graft.sources.ShardedSink.validate(
      spark, "/tmp/graft_incremental_ingest", "doc_id").count() === 0)
  }

  test("precomputed signature table reproduces crossPairs through parquet") {
    val ref = docsDf.filter("doc_id <= 3")
    val fresh = docsDf.filter("doc_id >= 4")
    val dir = java.nio.file.Files.createTempDirectory("sigtab").toString
    MinHashDedup.signatureTable(ref, "doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val direct = MinHashDedup.crossPairs(fresh, "doc_id", "text",
      ref, "doc_id", "text", jaccardThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val precomp = MinHashDedup.crossPairsPrecomputed(fresh, "doc_id", "text",
      spark.read.parquet(dir), jaccardThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(precomp === direct && direct.nonEmpty)
  }

  test("minhash finds the planted near-dup pair") {
    val pairs = MinHashDedup.candidatePairs(docsDf, "doc_id", "text",
      shingleSize = 2, numPerms = 64, numBands = 32, jaccardThreshold = 0.5)
    val got = pairs.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 4L))) // exact dup
    assert(got.contains((1L, 5L)) || got.contains((4L, 5L))) // near dup
    assert(!got.exists { case (a, b) => Set(a, b).contains(6L) }) // unrelated doc
  }
  test("minhash dedup drops the larger-id duplicates") {
    val kept = MinHashDedup(docsDf, "doc_id", "text",
      shingleSize = 2, numPerms = 64, numBands = 32, jaccardThreshold = 0.5)
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(1L) && !ids.contains(4L))
  }
  test("simhash of identical docs is identical; near-dups are close") {
    val sh = docsDf.select(col("doc_id"),
      SimHashDedup.simhash(col("text")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(4L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(5L)) < 16)
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(6L)) >
      java.lang.Long.bitCount(sh(1L) ^ sh(5L)))
  }
  test("simhash candidate pairs catch the exact dup") {
    val pairs = SimHashDedup.candidatePairs(docsDf, "doc_id", "text", maxHamming = 3)
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).contains((1L, 4L)))
  }
  test("ngram jaccard pairs within blocks") {
    val pairs = NgramJaccardDedup.pairs(docsDf, "doc_id", "text", "lang",
      n = 2, threshold = 0.5)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 1.0))
  }
  test("embedding dedup finds duplicate vectors") {
    val d = df(StructType(Seq(StructField("id", LongType),
      StructField("e", ArrayType(FloatType)))),
      Row(1L, Seq(1.0f, 0.0f, 0.5f)), Row(2L, Seq(1.0f, 0.0f, 0.5f)),
      Row(3L, Seq(-1.0f, 0.2f, 0.1f)))
    val pairs = EmbeddingDedup.pairs(d, "id", "e", dim = 3,
      numPlanes = 4, cosineThreshold = 0.99)
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }
}

class ConnectedComponentsSpec extends SparkSpec {
  test("transitive chains collapse; isolated vertices keep their id") {
    val edges = df(StructType(Seq(StructField("src", LongType), StructField("dst", LongType))),
      Row(1L, 2L), Row(2L, 3L), Row(5L, 4L))
    val vertices = spark.range(1, 7).toDF("id")
    val labels = ConnectedComponents.run(edges, vertices)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) == 1L && labels(2L) == 1L && labels(3L) == 1L)
    assert(labels(4L) == 4L && labels(5L) == 4L)
    assert(labels(6L) == 6L)
  }

  test("driver union-find fast path agrees with distributed label propagation") {
    val rng = new scala.util.Random(11)
    val rows = (0 until 300).map(_ =>
      Row(rng.nextInt(120).toLong, rng.nextInt(120).toLong))
    val edges = df(StructType(Seq(
      StructField("src", LongType), StructField("dst", LongType))), rows: _*)
    val vertices = spark.range(0, 140).toDF("id") // includes isolated ids
    def toMap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = toMap(ConnectedComponents.run(edges, vertices))
    val dist = toMap(ConnectedComponents.run(edges, vertices, driverEdgeGate = 0L))
    assert(fast == dist)
    assert(fast.size == 140)
  }

  test("fast path still gates out non-integral ids") {
    val edges = df(StructType(Seq(
      StructField("src", StringType), StructField("dst", StringType))),
      Row("a", "b"), Row("b", "c"))
    val vertices = df(StructType(Seq(StructField("id", StringType))),
      Row("a"), Row("b"), Row("c"), Row("z"))
    val labels = ConnectedComponents.run(edges, vertices)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(labels == Map("a" -> "a", "b" -> "a", "c" -> "a", "z" -> "z"))
  }
}

class AnnSpec extends SparkSpec {
  private lazy val vecs = {
    val rng = new scala.util.Random(7)
    val rows = (0 until 60).map { i =>
      val center = Array.fill(8)(if (i % 3 == 0) 1.0 else if (i % 3 == 1) -1.0 else 0.0)
      Row(i.toLong, center.map(c => (c + rng.nextGaussian() * 0.1).toFloat).toSeq)
    }
    df(StructType(Seq(StructField("id", LongType),
      StructField("e", ArrayType(FloatType)))), rows: _*)
  }

  test("brute force returns k neighbors per query, excluding self") {
    val out = graft.ann.Ann.bruteForce(vecs, "id", "e",
      vecs.filter(col("id") < 3), "id", "e", k = 4)
    assert(out.count() == 12)
    assert(out.filter(col("query_id") === col("neighbor_id")).count() == 0)
    // neighbors of a cluster-0 query should be cluster-0 members (id % 3 == 0)
    val n0 = out.filter(col("query_id") === 0).select("neighbor_id")
      .collect().map(_.getLong(0))
    assert(n0.forall(_ % 3 == 0))
  }
  test("ivf search recalls most brute-force neighbors") {
    val centroids = graft.ann.Ann.trainCentroids(vecs, "e", 3)
    val assigned = graft.ann.Ann.ivfAssign(vecs, "e", centroids)
    val queries = vecs.filter(col("id") < 3)
    val ivf = graft.ann.Ann.ivfSearch(assigned, "id", "e", queries, "id", "e",
      centroids, k = 4, nProbe = 1)
    val bf = graft.ann.Ann.bruteForce(vecs, "id", "e", queries, "id", "e", k = 4)
    val ivfSet = ivf.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bfSet = bf.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivfSet.intersect(bfSet).size >= (bfSet.size * 0.7).toInt)
  }
}
