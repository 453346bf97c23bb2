package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.QualityRules

/** Round 9f: rule-based quality filtering and data-layout ops. */
class Round9fSpec extends SparkSpec {

  // ---------------------------------------------------------- quality rules

  private val cfg = QualityRules.Config(
    minWords = 3, maxWords = 10, minAvgWordLen = 2.0, maxAvgWordLen = 6.0,
    maxDupWordFrac = 0.5, maxTop2gramFrac = 0.6, minDistinctStopwords = 1)

  test("quality rules: each rule prunes its violating doc") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val d = df(schema,
      Row(1L, "the quick brown fox jumps"), // passes all
      Row(2L, "hi the"), // too few words
      Row(3L, "the a b c d e f g h i j k"), // too many words
      Row(4L, "a b c d e"), // avg word len 1 < 2
      Row(5L, "the the the the fox"), // dup frac 0.6 > 0.5, top2gram 0.75
      Row(6L, "quick brown fox jumps high")) // zero stopwords
    val out = QualityRules.signals(d, "text", cfg)
      .select("id", "keep").collect().map(r => r.getLong(0) -> r.getBoolean(1))
      .toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false,
      5L -> false, 6L -> false))
    val kept = QualityRules.filter(d, "text", cfg)
    assert(kept.columns.toSeq == Seq("id", "text"))
    assert(kept.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("quality rules: signal values are the documented formulas") {
    val schema = StructType(Seq(StructField("text", StringType)))
    val d = df(schema, Row("the fox fox ran"))
    val r = QualityRules.signals(d, "text", cfg).head()
    assert(r.getAs[Long]("n_words") == 4L)
    assert(r.getAs[Double]("avg_word_len") == 12.0 / 4) // "thefoxfoxran"
    assert(r.getAs[Double]("dup_word_frac") == 0.25) // 3 distinct / 4
    assert(r.getAs[Double]("top_2gram_frac") == math.rint(1.0 / 3 * 1e6) / 1e6)
    assert(r.getAs[Long]("n_stopwords") == 1L)
  }

  test("quality rules plan has no shuffle") {
    val d = docsDf
    val plan = QualityRules.signals(d, "text", cfg)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  // ---------------------------------------------------------------- z-order

  test("zorder interleave: known bit patterns") {
    val schema = StructType(Seq(
      StructField("x", LongType), StructField("y", LongType)))
    val d = df(schema, Row(3L, 1L), Row(0L, 0L), Row(2L, 3L))
    val out = d.select(graft.ops.ZOrder.interleave(
      Seq(col("x"), col("y")), bits = 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // x bits land at even positions, y at odd:
    // (3,1)=0b0111=7, (0,0)=0, (2,3)=x:_1_0 y:1_1_ =0b1110=14
    assert(out == Seq(7L, 0L, 14L))
  }

  test("zorder zvalue: locality — near points share high bits") {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", LongType)))
    val rows = for (a <- 0L until 16L; b <- 0L until 16L) yield Row(a, b)
    val z = graft.ops.ZOrder.zvalue(df(schema, rows: _*), Seq("a", "b"),
      bits = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // 16 values x 4 bits: bucket = value itself; z is a bijection on
    // [0, 256) and the quadrant (high bit of each dim) is the top 2 bits.
    assert(z.values.toSet.size == 256 && z.values.forall(v => v >= 0 && v < 256))
    for (((a, b), v) <- z)
      assert((v >> 6) == ((b >> 3) << 1 | (a >> 3)), s"($a,$b)")
  }

  test("zorder layout: range-partitioned, sorted, disjoint z ranges") {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", LongType)))
    val rows = (0L until 200L).map(i => Row(i % 17L, (i * 13L) % 23L))
    val laid = graft.ops.ZOrder.layout(df(schema, rows: _*), Seq("a", "b"),
      numFiles = 4, bits = 4)
    val parts = laid.select(spark_partition_id().as("p"), col("zvalue"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
    val byPart = parts.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(byPart.keys.size > 1)
    for ((_, zs) <- byPart) assert(zs == zs.sorted)
    val ranges = byPart.toSeq.sortBy(_._1).map { case (_, zs) => (zs.min, zs.max) }
    for (Seq((_, hi), (lo, _)) <- ranges.sliding(2)) assert(hi <= lo)
  }

  // ------------------------------------------------------------ ppl buckets

  test("ccnet buckets: equal-frequency tertiles ordered by surprisal") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    // 9 docs: common words -> low surprisal, rare words -> high.
    val rows = (1L to 9L).map { i =>
      val word = if (i <= 3) "common" else s"rare$i"
      Row(i, s"$word common common")
    }
    val out = graft.ops.UnigramScore.ccnetBuckets(df(schema, rows: _*),
      "id", "text")
      .select("id", "nll", "ppl_bucket").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val byBucket = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byBucket == Map("head" -> 3, "middle" -> 3, "tail" -> 3))
    // every head nll <= every middle nll <= every tail nll
    val h = out.filter(_._3 == "head").map(_._2).max
    val m = out.filter(_._3 == "middle").map(_._2)
    val t = out.filter(_._3 == "tail").map(_._2).min
    assert(h <= m.min && m.max <= t)
    // the three all-common docs are the head
    assert(out.filter(_._3 == "head").map(_._1).toSet == Set(1L, 2L, 3L))
  }

  // ----------------------------------------------------------- bloom filter

  test("bloom: no false negatives, and probe matches driver-side math") {
    import graft.dedup.BloomFilter
    val schema = StructType(Seq(StructField("k", StringType)))
    val ref = df(schema, (1 to 50).map(i => Row(s"key$i")): _*)
    val f = BloomFilter.build(ref, "k", m = 4096, k = 3)
    // every inserted key must probe true (bloom guarantee)
    val probed = BloomFilter.probe(ref, "k", f).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(probed.values.forall(identity))
    // driver-side probe agrees with the distributed expression
    val novel = df(schema, (100 to 120).map(i => Row(s"other$i")): _*)
    val dist = BloomFilter.probe(novel, "k", f).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    for ((key, hit) <- dist) assert(f.mightContain(key) == hit, key)
    // 21 novel keys in a 4096-bit filter holding 150 positions: expect
    // mostly misses (fp rate ~ (150/4096)^3 ~ 5e-5)
    assert(dist.values.count(!_) >= 20)
  }

  test("bloom probe plan: no join, no shuffle") {
    import graft.dedup.BloomFilter
    val schema = StructType(Seq(StructField("k", StringType)))
    val ref = df(schema, Row("a"), Row("b"))
    val f = BloomFilter.build(ref, "k", m = 256, k = 2)
    val plan = BloomFilter.probe(df(schema, Row("a"), Row("z")), "k", f)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan)
  }

  test("bloom gram clean: contaminated rows drop, disjoint rows survive") {
    import graft.dedup.BloomFilter
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val ref = df(schema, Row(100L, "alpha beta gamma delta epsilon zeta"))
    val corpus = df(schema,
      Row(1L, "alpha beta gamma delta other words here"), // shares a 4-gram
      Row(2L, "totally disjoint vocabulary with novel tokens"))
    val hits = BloomFilter.gramHits(corpus, "id", "text", ref, "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(hits(1L) >= 1L && hits(2L) == 0L)
    val clean = BloomFilter.cleanAgainstReference(corpus, "id", "text",
      ref, "text", n = 4)
    assert(clean.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }
}
