package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.dedup.SemDedup

class SemDedupSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("emb", ArrayType(DoubleType)),
    StructField("len", LongType)))

  // Two tight groups on opposite axes plus one isolated vector: k-means
  // with k=2 must separate the axes; near-dups live within each group.
  private def rows = Seq(
    Row(1L, Array(1.0, 0.0, 0.0), 10L),
    Row(2L, Array(0.999, 0.01, 0.0), 20L),  // near-dup of 1
    Row(3L, Array(0.0, 1.0, 0.0), 30L),
    Row(4L, Array(0.01, 0.999, 0.0), 5L),   // near-dup of 3
    Row(5L, Array(0.5, 0.5, 0.7), 99L))     // isolated (cos < 0.99 to all)

  test("keepBest drops one of each near-dup pair, keeps isolated vectors") {
    val out = SemDedup.keepBest(df(schema, rows: _*), "id", "emb",
      nClusters = 2, cosineThreshold = 0.99)
      .select("id").collect().map(_.getLong(0)).toSet
    // default quality: lowest id per component survives
    assert(out === Set(1L, 3L, 5L))
  }

  test("qualityExpr picks the component's quality argmax instead") {
    val out = SemDedup.keepBest(df(schema, rows: _*), "id", "emb",
      nClusters = 2, cosineThreshold = 0.99, qualityExpr = "len")
      .select("id").collect().map(_.getLong(0)).toSet
    // len: 2 beats 1 (20 > 10), 3 beats 4 (30 > 5)
    assert(out === Set(2L, 3L, 5L))
  }

  test("nClusters = 1 equals exact all-pairs dedup") {
    val exact = SemDedup.keepBest(df(schema, rows: _*), "id", "emb",
      nClusters = 1, cosineThreshold = 0.99)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(exact === Set(1L, 3L, 5L))
  }

  test("candidatePairs respects the cluster-size ban") {
    val banned = SemDedup.candidatePairs(df(schema, rows: _*), "id", "emb",
      nClusters = 1, cosineThreshold = 0.99, maxClusterSize = Some(2))
    assert(banned.count() === 0) // the single 5-row cell is over the cap
  }

  test("plan has no cartesian or nested-loop join") {
    val plan = SemDedup.candidatePairs(df(schema, rows: _*), "id", "emb",
      nClusters = 2, cosineThreshold = 0.99)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"))
  }

  test("nClusters must be positive") {
    intercept[IllegalArgumentException] {
      SemDedup.keepBest(df(schema, rows: _*), "id", "emb", nClusters = 0)
    }
  }
}
