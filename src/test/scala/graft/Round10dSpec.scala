package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sketch.CountMin

/** Round-10: count-min sketch. */
class Round10dSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("w", LongType)))

  test("cms: estimates are one-sided (est >= exact) and tight at low load") {
    val rows = (1 to 300).map(i => Row(s"key${i % 23}", 1L))
    val d = df(schema, rows: _*)
    val sk = CountMin.build(d, "k", width = 1L << 12, depth = 4)
    val exact = d.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) =>
      val est = sk.estimate(k)
      assert(est >= c, s"$k: est $est < exact $c")
      // 23 keys in 4096 counters: collisions are essentially impossible
      assert(est == c, s"$k: est $est != exact $c at trivial load")
    }
  }

  test("cms: width 1 collapses every key to the grand total") {
    val d = df(schema, Row("a", 1L), Row("b", 1L), Row("c", 1L))
    val sk = CountMin.build(d, "k", width = 1L, depth = 2)
    assert(sk.estimate("a") == 3L && sk.estimate("zzz") == 3L)
  }

  test("cms: weighted build sums weights; null keys insert nothing") {
    val d = df(schema, Row("a", 5L), Row("a", 7L), Row("b", 1L), Row(null, 9L))
    val sk = CountMin.build(d, "k", width = 1L << 10, depth = 3,
      weightExpr = "w")
    assert(sk.estimate("a") == 12L)
    assert(sk.estimate("b") == 1L)
  }

  test("cms: estimateCol matches the driver-side estimate") {
    val rows = (1 to 100).map(i => Row(s"t${i % 11}", 1L))
    val d = df(schema, rows: _*)
    val sk = CountMin.build(d, "k", width = 1L << 10, depth = 3)
    val est = CountMin.estimate(d.select("k").distinct(), "k", sk)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { case (k, e) => assert(e == sk.estimate(k)) }
  }

  test("cms: shard sketches merge to the union-stream sketch exactly") {
    val rows = (1 to 200).map(i => Row(s"k${i % 17}", 1L))
    val d = df(schema, rows: _*)
    val left = d.filter(col("w") >= 0 && expr("hash(k) % 2 = 0"))
    val right = d.filter(expr("hash(k) % 2 != 0"))
    def sk(x: org.apache.spark.sql.DataFrame) =
      CountMin.build(x, "k", width = 1L << 10, depth = 3)
    val merged = CountMin.merge(sk(left), sk(right))
    val whole = sk(d)
    (0 until 3).foreach { r =>
      assert(merged.counters(r).toSeq == whole.counters(r).toSeq)
    }
    val bad = intercept[IllegalArgumentException] {
      CountMin.merge(whole, CountMin.build(d, "k", width = 512, depth = 3))
    }
    assert(bad.getMessage.contains("shapes differ"))
  }

  test("cms: build is partition-order invariant") {
    val rows = (1 to 300).map(i => Row(s"p${i % 29}", 1L))
    val d = df(schema, rows: _*)
    val a = CountMin.build(d, "k", width = 1L << 10, depth = 3)
    val b = CountMin.build(d.repartition(7), "k", width = 1L << 10, depth = 3)
    (0 until 3).foreach { r =>
      assert(a.counters(r).toSeq == b.counters(r).toSeq)
    }
  }

  test("cms yaml registry: self-estimation appends est_count") {
    val d = df(schema, Row("x", 1L), Row("x", 1L), Row("y", 1L))
    val out = graft.api.Registry("cms_estimate")(d, graft.api.Conf.fromYaml(
      "type: cms_estimate\nkey_key: k\nwidth: 1024\ndepth: 3"), null)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est_count"))
    assert(out.toSet == Set("x" -> 2L, "y" -> 1L))
  }
}
