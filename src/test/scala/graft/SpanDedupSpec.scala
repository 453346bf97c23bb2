package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.dedup.SpanDedup

class SpanDedupSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType)))

  private def clean(rows: Row*): Map[Long, String] =
    SpanDedup.clean(df(schema, rows: _*), "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("a cross-document duplicated span survives only its first occurrence") {
    val out = clean(
      Row(1L, "a b c d e f", "en"),
      Row(2L, "x y a b c d", "en"))
    // "a b c d" occurs at (1, 0) and (2, 2); keeper = (1, 0) — doc 2 loses
    // positions 2..5 and keeps its unique prefix.
    assert(out === Map(1L -> "a b c d e f", 2L -> "x y"))
  }

  test("within-document repetition keeps the first copy") {
    val out = clean(Row(1L, "p q r s p q r s", "en"))
    assert(out === Map(1L -> "p q r s"))
  }

  test("a fully-duplicated document drops from the output") {
    val out = clean(
      Row(1L, "m n o p q", "en"),
      Row(2L, "m n o p q", "en"))
    assert(out === Map(1L -> "m n o p q"))
  }

  test("documents shorter than the window pass through untouched") {
    val out = clean(Row(1L, "tiny doc", "en"), Row(2L, "tiny doc", "en"))
    assert(out === Map(1L -> "tiny doc", 2L -> "tiny doc"))
  }

  test("apply() replaces text in place and passes other columns through") {
    val out = SpanDedup(df(schema,
      Row(1L, "a b c d e f", "en"),
      Row(2L, "x y a b c d", "de")), "doc_id", "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(out === Set((1L, "a b c d e f", "en"), (2L, "x y", "de")))
  }

  test("window size must be at least 2") {
    intercept[IllegalArgumentException] {
      SpanDedup.clean(df(schema, Row(1L, "a b", "en")), "doc_id", "text", n = 1)
    }
  }

  test("plan has no cartesian or nested-loop join") {
    val plan = SpanDedup.clean(df(schema, Row(1L, "a b c d e", "en")),
      "doc_id", "text", n = 4).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"))
  }
}
