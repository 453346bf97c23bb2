package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Streams

class StreamingSpec extends SparkSpec {

  test("watermarked windowed counts over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "user_id", "value")
    val agg = Streams.windowedCounts(events, "ts", "10 minutes", "5 minutes", "user_id")
    val q = agg.writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Update()).start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    input.addData((ts(1), 1L, 1.0), (ts(2), 1L, 2.0), (ts(11), 1L, 3.0), (ts(3), 2L, 4.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT user_id, n_events, sum_value FROM win_counts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    assert(rows.contains((1L, 2L, 3.0))) // window 00:00-00:10 for user 1
    assert(rows.contains((1L, 1L, 3.0))) // window 00:10-00:20
    assert(rows.contains((2L, 1L, 4.0)))
  }

  test("stateful sessionization tracks per-user sessions") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long)]
    val events = input.toDF().toDF("user_id", "ts_seconds")
    val sessions = Streams.sessionize(events.toDF(), gapSeconds = 60)
    val q = sessions.toDF().writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Update()).start()
    input.addData((1L, 100L), (1L, 130L), (2L, 500L))
    q.processAllAvailable()
    val rows = spark.sql("SELECT user_id, session_start, session_end, n_events FROM sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    q.stop()
    assert(rows.contains((1L, 100L, 130L, 2L)))
    assert(rows.contains((2L, 500L, 500L, 1L)))
  }

  test("semantic map composes with a stream (object operator on micro-batches)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val client = graft.llm.MockLlmClient()
    val input = MemoryStream[String]
    val docs = input.toDF().toDF("text")
    val mapped = graft.ops.SemanticMap(docs, graft.ops.SemanticMapConfig(
      name = "sm", prompt = "{{ input.text }}",
      outputSchema = Seq("sentiment" -> "str")), client)
    val q = mapped.writeStream.format("memory").queryName("stream_sem")
      .outputMode(OutputMode.Append()).start()
    input.addData("very fast ride", "so slow today")
    q.processAllAvailable()
    val rows = spark.sql("SELECT text, sentiment FROM stream_sem")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    q.stop()
    assert(rows == Set("very fast ride" -> "positive", "so slow today" -> "negative"))
  }

  test("streaming minhash near-dedup flags pairs within and across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old river bank " +
      "while birds sing in tall green trees during a calm bright summer morning"
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("id", "text")
    val pairs = Streams.dedupNearMinhash(docs.toDF(), threshold = 0.5)
    val q = pairs.toDF("id_a", "id_b", "est").writeStream.format("memory")
      .queryName("stream_neardup").outputMode(OutputMode.Append()).start()
    input.addData(
      (1L, base),
      (2L, base.replace("calm", "quiet")), // near-dup of 1 in the same batch
      (3L, "completely different content about spark structured streaming state"))
    q.processAllAvailable()
    input.addData((4L, base + " extra")) // near-dup of 1/2 across batches
    q.processAllAvailable()
    val got = spark.sql("SELECT DISTINCT id_a, id_b FROM stream_neardup")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(got.contains((1L, 2L))) // in-batch pair
    assert(got.contains((1L, 4L)) || got.contains((2L, 4L))) // cross-batch pair
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated doc clean
  }

  test("stateful streaming dedup passes only the first row per fingerprint") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("id", "text")
    val deduped = Streams.dedupExact(docs.toDF())
    val q = deduped.toDF("id", "text").writeStream.format("memory")
      .queryName("stream_dedup").outputMode(OutputMode.Append()).start()
    input.addData((1L, "Hello  World"), (2L, "hello world"), (3L, "other"))
    q.processAllAvailable()
    input.addData((4L, "HELLO world"), (5L, "fresh text")) // dup across batches
    q.processAllAvailable()
    val ids = spark.sql("SELECT id FROM stream_dedup")
      .collect().map(_.getLong(0)).toSet
    q.stop()
    assert(ids == Set(1L, 3L, 5L)) // 2 deduped in-batch, 4 across batches
  }
}
