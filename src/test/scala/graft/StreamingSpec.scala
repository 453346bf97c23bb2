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

  test("native session windows close sessions when the watermark passes the gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val events = input.toDF().toDF("user_id", "ts")
    val sessions = Streams.sessionWindows(events, "ts",
      gapDuration = "1 minute", watermarkDelay = "5 minutes", keyCol = "user_id")
    val q = sessions.writeStream.format("memory").queryName("native_sessions")
      .outputMode(OutputMode.Append()).start()
    def ts(m: Int, s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")
    // user 1: two events 30s apart (one session); user 2: one event
    input.addData((1L, ts(0, 0)), (1L, ts(0, 30)), (2L, ts(2, 0)))
    q.processAllAvailable()
    // advance the watermark past both sessions' end + gap so they CLOSE
    input.addData((9L, ts(30, 0)))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT user_id, session_start, session_end, n_events FROM native_sessions")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    q.stop()
    val byUser = rows.map(r => r._1 -> r).toMap
    // session end = last event + gap (session_window semantics)
    assert(byUser(1L) == ((1L, ts(0, 0), ts(1, 30), 2L)))
    assert(byUser(2L) == ((2L, ts(2, 0), ts(3, 0), 1L)))
    assert(!byUser.contains(9L)) // its session is still open (append mode)
  }

  test("stateless streaming decontamination drops rows sharing a benchmark n-gram") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val bench = Seq("quiz answer the capital of france is paris")
      .toDF("text")
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val cleaned = Streams.decontaminate(docs, "text", bench, "text", n = 4)
    val q = cleaned.writeStream.format("memory").queryName("decontam")
      .outputMode(OutputMode.Append()).start()
    input.addData(
      (1L, "the capital of france is lyon they say"), // shares a 4-gram
      (2L, "totally novel words nothing shared here"),
      (3L, "of course answer the capital question"))  // no shared 4-gram
    q.processAllAvailable()
    val kept = spark.sql("SELECT doc_id FROM decontam")
      .collect().map(_.getLong(0)).toSet
    q.stop()
    assert(kept == Set(2L, 3L))
  }

  test("streaming near-dup hits against a static reference signature table") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val refSigs = graft.dedup.MinHashDedup.signatureTable(
      docsDf.filter("doc_id <= 3"), "doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val hits = Streams.nearDupHitsAgainstReference(docs, "doc_id", "text",
      refSigs, jaccardThreshold = 0.5)
    val q = hits.writeStream.format("memory").queryName("ref_hits")
      .outputMode(OutputMode.Append()).start()
    input.addData(
      (4L, "the fast spark join is good and fast"),  // exact dup of ref 1
      (5L, "the fast spark join is good and quick"), // near dup of ref 1
      (6L, "completely different words about databases here"))
    q.processAllAvailable()
    input.addData( // second batch: re-probing is stateless and still exact
      (7L, "the fast spark join is good and fast"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT id_new, id_ref FROM ref_hits")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    q.stop()
    // Each pair exactly ONCE despite matching in many LSH bands.
    assert(rows.length == rows.toSet.size)
    val pairs = rows.toSet
    assert(pairs.contains((4L, 1L)) && pairs.contains((5L, 1L)) &&
      pairs.contains((7L, 1L)))
    assert(!pairs.exists(_._1 == 6L))
  }

  test("stateless normalization + split assignment run on streams") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDF().toDF("doc_id", "text", "source")
    // cleanText is a codegen'd expression chain and assignSplit a pure
    // function of the group key — both compose with a stream statelessly,
    // and a source keeps its split across batches by construction.
    val out = graft.ops.SampleOp.assignSplit(
      docs.withColumn("text", graft.functions.TextFunctions.cleanText(
        org.apache.spark.sql.functions.col("text"))),
      org.apache.spark.sql.functions.col("source"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 7)
    val q = out.writeStream.format("memory").queryName("normsplit")
      .outputMode(OutputMode.Append()).start()
    input.addData((1L, "a  b", "siteA"), (2L, "c\u0007d", "siteB"))
    q.processAllAvailable()
    input.addData((3L, "later row", "siteA")) // same source, later batch
    q.processAllAvailable()
    val rows = spark.sql("SELECT doc_id, text, split FROM normsplit")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    q.stop()
    assert(rows(1L)._1 == "a b" && rows(2L)._1 == "cd")
    assert(rows(1L)._2 == rows(3L)._2) // same source -> same split, any batch
  }

  test("stateless hygiene ops run on streams: PII scrub + URL blocklist") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDF().toDF("doc_id", "text", "url")
    // Both are narrow (codegen'd Column expressions / a filter), so they
    // compose with a stream without any state store.
    val scrubbed = graft.functions.UrlFunctions.filterBlockedDomains(
      docs.withColumn("text",
        graft.functions.TextFunctions.redactPii(org.apache.spark.sql.functions.col("text"))),
      "url", Seq("spam-site.org"))
    val q = scrubbed.writeStream.format("memory").queryName("hygiene")
      .outputMode(OutputMode.Append()).start()
    input.addData(
      (1L, "mail a@b.io now", "https://ok.example.net/a"),
      (2L, "clean text", "https://x.spam-site.org/b"),
      (3L, "ping 10.0.0.1", "https://fine.example.org/c"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT doc_id, text FROM hygiene")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    q.stop()
    assert(rows.keySet == Set(1L, 3L)) // spam-site subdomain dropped
    assert(rows(1L) == "mail <EMAIL> now")
    assert(rows(3L) == "ping <IP>")
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

  test("streaming quotaByKey admits first-n per key within and across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("id", "host")
    val admitted = Streams.quotaByKey(docs.toDF(), "host", n = 2)
    val q = admitted.toDF("id", "key").writeStream.format("memory")
      .queryName("stream_quota").outputMode(OutputMode.Append()).start()
    // batch 1: host a floods with 3, host b sends 1
    input.addData((3L, "a"), (1L, "a"), (2L, "a"), (10L, "b"))
    q.processAllAvailable()
    // batch 2: a is already at quota; b admits one more then stops
    input.addData((4L, "a"), (11L, "b"), (12L, "b"))
    q.processAllAvailable()
    val ids = spark.sql("SELECT id FROM stream_quota")
      .collect().map(_.getLong(0)).toSet
    q.stop()
    // in-batch admission is id-ordered (deterministic): a keeps {1,2}
    assert(ids == Set(1L, 2L, 10L, 11L))
  }

  test("event-time quotaByKey resets an idle key's budget via watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDF().toDF("id", "host", "ts")
    val admitted = Streams.quotaByKeyEventTime(docs.toDF(), "host", n = 1,
      "ts", watermarkDelay = "0 seconds", stateTtl = "10 seconds")
    val q = admitted.toDF("id", "key").writeStream.format("memory")
      .queryName("stream_quota_et").outputMode(OutputMode.Append()).start()
    input.addData((1L, "a", ts(10)), (2L, "a", ts(11)))
    q.processAllAvailable() // a admits id 1, id 2 over quota
    input.addData((3L, "a", ts(15)))
    q.processAllAvailable() // still inside the TTL window: rejected
    input.addData((9L, "z", ts(100))) // watermark jumps past 15 + 10s
    q.processAllAvailable()
    input.addData((4L, "a", ts(101)))
    q.processAllAvailable() // budget reset: a admits again
    val ids = spark.sql("SELECT id FROM stream_quota_et")
      .collect().map(_.getLong(0)).toSet
    q.stop()
    assert(ids == Set(1L, 9L, 4L))
  }

  // With ProcessingTimeTimeout the engine keeps scheduling timeout-check
  // batches, so `processAllAvailable` never sees a quiescent stream — the
  // TTL tests poll the sink instead (a real trigger interval paces the
  // timeout batches; state evicts on the first empty batch past the TTL).
  private def eventually(what: String, timeoutMs: Long = 30000)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (!cond) {
      assert(System.currentTimeMillis < deadline, s"timed out waiting for: $what")
      Thread.sleep(100)
    }
  }

  test("dedupExact stateTtl evicts idle fingerprints so state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("id", "text")
    val deduped = Streams.dedupExact(docs.toDF(), stateTtl = Some("50 milliseconds"))
    val q = deduped.toDF("id", "text").writeStream.format("memory")
      .queryName("ttl_dedup").outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .start()
    def ids() = spark.sql("SELECT id FROM ttl_dedup").collect().map(_.getLong(0)).toSet
    input.addData((1L, "ttl doc"))
    eventually("first copy passes")(ids().contains(1L))
    Thread.sleep(500) // idle past the TTL: the empty batches evict the state
    input.addData((2L, "ttl doc"))
    // without eviction this duplicate would be dropped forever — it passing
    // again IS the proof the fingerprint state was removed (the documented
    // recall trade)
    eventually("post-TTL duplicate passes again")(ids().contains(2L))
    eventually("state drained")(q.lastProgress != null &&
      q.lastProgress.stateOperators(0).numRowsTotal <= 1L)
    q.stop()
    assert(ids() == Set(1L, 2L))
  }

  test("dedupExactEventTime evicts when the watermark passes last-seen + TTL") {
    // Event-time TTL is wall-clock free: eviction points are a pure
    // function of the data's timestamps, so this test needs no sleeps and
    // replays identically.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDF().toDF("id", "text", "ts")
    val out = Streams.dedupExactEventTime(docs.toDF(), "ts",
      watermarkDelay = "10 minutes", stateTtl = "30 minutes")
    val q = out.toDF("id", "text").writeStream.format("memory")
      .queryName("evt_dedup").outputMode(OutputMode.Append()).start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    input.addData((1L, "evt doc", ts(10, 0)))
    q.processAllAvailable()
    input.addData((2L, "evt doc", ts(10, 5))) // dup of a LIVE fingerprint: dropped
    q.processAllAvailable()
    input.addData((50L, "advance a", ts(11, 20))) // end-of-batch watermark -> 11:10
    q.processAllAvailable()
    // 11:10 > last-seen 10:05 + 30min TTL: this batch fires the eviction
    input.addData((51L, "advance b", ts(11, 21)))
    q.processAllAvailable()
    input.addData((3L, "evt doc", ts(11, 25))) // state evicted -> passes AGAIN
    q.processAllAvailable()
    val ids = spark.sql("SELECT id FROM evt_dedup").collect().map(_.getLong(0)).toSet
    q.stop()
    assert(ids == Set(1L, 50L, 51L, 3L)) // 2 deduped while live; 3 after eviction
  }

  test("dedupNearMinhash stateTtl evicts idle buckets (bounded state, documented recall trade)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old river bank " +
      "while birds sing in tall green trees during a calm bright summer morning"
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("id", "text")
    val pairs = Streams.dedupNearMinhash(docs.toDF(), threshold = 0.5,
      stateTtl = Some("50 milliseconds"))
    val q = pairs.toDF("id_a", "id_b", "est").writeStream.format("memory")
      .queryName("ttl_neardup").outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .start()
    def got() = spark.sql("SELECT DISTINCT id_a, id_b FROM ttl_neardup")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    input.addData((1L, base), (2L, base.replace("calm", "quiet")))
    eventually("live in-batch pair flagged")(got().contains((1L, 2L)))
    Thread.sleep(500) // docs 1/2's band buckets idle past TTL -> evicted
    // doc 3 is a near-dup of 1/2 but arrives after eviction; docs 7/8 are a
    // fresh in-batch pair in the SAME batch — their pair appearing proves
    // doc 3's batch fully processed, so the absence of any (x, 3) pair is
    // eviction, not lag.
    val other = "some entirely separate piece of writing about query engines " +
      "and the cost of shuffles in distributed execution plans at scale"
    input.addData((3L, base + " extra"), (7L, other), (8L, other.replace("cost", "price")))
    eventually("post-eviction batch processed")(got().contains((7L, 8L)))
    val pairsWith3 = got().filter(p => p._1 == 3L || p._2 == 3L)
    q.stop()
    assert(pairsWith3.isEmpty) // state was gone: late near-dup not flagged
    assert(got() == Set((1L, 2L), (7L, 8L)))
  }

  test("dedupNearMinhashEventTime evicts buckets by watermark, no sleeps") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old river bank " +
      "while birds sing in tall green trees during a calm bright summer morning"
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDF().toDF("id", "text", "ts")
    val pairs = Streams.dedupNearMinhashEventTime(docs.toDF(), "ts",
      watermarkDelay = "10 minutes", stateTtl = "30 minutes", threshold = 0.5)
    val q = pairs.toDF("id_a", "id_b", "est").writeStream.format("memory")
      .queryName("evt_neardup").outputMode(OutputMode.Append()).start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    def got() = spark.sql("SELECT DISTINCT id_a, id_b FROM evt_neardup")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    input.addData((1L, base, ts(10, 0)),
      (2L, base.replace("calm", "quiet"), ts(10, 1))) // live pair flags
    q.processAllAvailable()
    input.addData((50L, "completely different filler text", ts(11, 40))) // wm -> 11:30
    q.processAllAvailable()
    input.addData((51L, "more unrelated words entirely", ts(11, 41))) // eviction fires
    q.processAllAvailable()
    // docs 1/2's buckets evicted (last seen 10:01 + 30min << 11:30): the
    // late near-dup is NOT flagged — the documented recall trade
    input.addData((3L, base + " extra", ts(11, 45)))
    q.processAllAvailable()
    val result = got()
    q.stop()
    assert(result == Set((1L, 2L)))
  }

  test("sessionize stateTtl closes idle sessions and restarts on return") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long)]
    val events = input.toDF().toDF("user_id", "ts_seconds")
    val sessions = Streams.sessionize(events.toDF(), gapSeconds = 60,
      stateTtl = Some("50 milliseconds"))
    val q = sessions.toDF().writeStream.format("memory").queryName("ttl_sessions")
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .start()
    def rows() = spark.sql(
      "SELECT user_id, session_start, session_end, n_events FROM ttl_sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    input.addData((1L, 100L))
    eventually("first event sessionized")(rows().contains((1L, 100L, 100L, 1L)))
    Thread.sleep(500) // user 1 idle past TTL: closing snapshot, state evicted
    // event-time 130 is within gapSeconds of 100, but the state is gone ->
    // a FRESH session starts instead of extending the old one
    input.addData((1L, 130L))
    eventually("fresh session after eviction")(rows().contains((1L, 130L, 130L, 1L)))
    q.stop()
    assert(!rows().contains((1L, 100L, 130L, 2L)))
  }

  test("stream-stream interval join pairs rows within the time bound, native state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val lIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val rIn = MemoryStream[(Long, Double, java.sql.Timestamp)]
    val purchases = lIn.toDF().toDF("p_id", "p_user", "p_ts")
    val clicks = rIn.toDF().toDF("c_user", "c_value", "c_ts")
    val joined = Streams.intervalJoin(purchases, clicks,
      "p_user", "c_user", "p_ts", "c_ts",
      before = "10 minutes", after = "10 minutes",
      watermarkDelay = "5 minutes")
    val q = joined.select("p_id", "c_value").writeStream.format("memory")
      .queryName("ivj").outputMode(OutputMode.Append()).start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    rIn.addData((1L, 1.5, ts(0)), (1L, 2.5, ts(25)), (2L, 9.9, ts(5)))
    lIn.addData((100L, 1L, ts(5))) // pairs with click@10:00 only (25 too far)
    q.processAllAvailable()
    val rows = spark.sql("SELECT p_id, c_value FROM ivj")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    q.stop()
    assert(rows === Set((100L, 1.5)))
  }

  test("interval join refuses overlapping column names") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val d = in.toDF().toDF("k", "ts")
    val e = intercept[IllegalArgumentException] {
      Streams.intervalJoin(d, d, "k", "k", "ts", "ts",
        "1 minute", "1 minute", "1 minute")
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("streaming bloom decontamination: stateless per-row probe, no join") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ref = Seq("alpha beta gamma delta epsilon zeta eta").toDF("text")
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val cleaned = Streams.bloomClean(docs, "text", ref, "text",
      n = 4, m = 1L << 12, k = 3)
    // plan has no stream-static join and no stateful operator
    val planStr = cleaned.queryExecution.analyzed.toString
    assert(!planStr.toLowerCase.contains("join"), planStr)
    val q = cleaned.writeStream.format("memory").queryName("bloomclean")
      .outputMode(OutputMode.Append()).start()
    input.addData(
      (1L, "alpha beta gamma delta brand new ending"), // shares a ref 4-gram
      (2L, "совершенно novel tokens nothing shared at all"),
      (3L, "zeta eta and then something else entirely")) // no shared 4-gram
    q.processAllAvailable()
    val kept = spark.sql("SELECT doc_id FROM bloomclean")
      .collect().map(_.getLong(0)).toSet
    q.stop()
    assert(kept == Set(2L, 3L))
  }

  test("windowed quality monitor: rule signals aggregate per event-time window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // QualityRules signals are stateless codegen'd columns, so they fuse
    // straight onto a stream; a watermarked window then tracks keep rate
    // over time — the live ingest-quality dashboard shape.
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val docs = input.toDF().toDF("ts", "text")
    val signalled = graft.ops.QualityRules.signals(docs, "text",
      graft.ops.QualityRules.Config(minWords = 3, maxWords = 100,
        minAvgWordLen = 1.0, maxAvgWordLen = 20.0, maxDupWordFrac = 1.0,
        maxTop2gramFrac = 1.0, minDistinctStopwords = 0))
    val monitored = signalled
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
    val q = monitored.writeStream.format("memory").queryName("qmon")
      .outputMode(OutputMode.Complete()).start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    input.addData(
      (ts(1), "the quick brown fox jumps clean"),
      (ts(2), "ok"), // below minWords -> dropped by the rules
      (ts(14), "another perfectly reasonable document here"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT n_docs, n_keep FROM qmon ORDER BY n_docs DESC")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    q.stop()
    assert(rows.toSeq == Seq((2L, 1L), (1L, 1L)))
  }

  test("bloom probeValues matches the per-row probe on the same filter") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ref = (1 to 50).map(i => s"key$i").toDF("k")
    val f = graft.dedup.BloomFilter.build(ref, "k", m = 4096, k = 3)
    val probeDf = (40 to 60).map(i => s"key$i").toDF("k")
    val viaProbe = graft.dedup.BloomFilter.probe(probeDf, "k", f)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val viaValues = probeDf.select(col("k"),
      element_at(graft.dedup.BloomFilter.probeValues(array(col("k")), f), 1)
        .as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(viaProbe == viaValues)
    assert((40 to 50).forall(i => viaValues(s"key$i"))) // no false negatives
  }

  test("driftByWindow: per-window JS divergence vs a static reference") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val events = input.toDF().toDF("ts", "text")
    // reference = uniform over {a, b}
    val drift = Streams.driftByWindow(events, "ts", "text",
      "10 minutes", "5 minutes", Map("a" -> 5L, "b" -> 5L))
    val q = drift.writeStream.format("memory").queryName("drift")
      .outputMode(OutputMode.Append()).start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    // window 1: same distribution as the reference -> divergence ~ 0
    input.addData((ts(1), "a b"), (ts(2), "b a"))
    // window 2: disjoint vocabulary -> large divergence
    input.addData((ts(11), "x y x y"))
    // advance the watermark far enough to close both windows
    input.addData((ts(40), "z"))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT n_tokens, vocab_size, js_divergence FROM drift ORDER BY window")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    q.stop()
    assert(rows.length == 2)
    val (n1, v1, js1) = rows(0)
    assert(n1 == 4 && v1 == 2 && js1 < 0.01)     // matched distribution
    val (n2, v2, js2) = rows(1)
    assert(n2 == 4 && v2 == 4 && js2 > 0.2)      // disjoint vocab drifts
    // batch analog agrees: same smoothing as CorpusDrift on same data
    val a = Seq("x y x y").toDF("text")
    val b = Seq("a a a a a", "b b b b b").toDF("text")
    val batch = graft.ops.CorpusDrift.jensenShannon(a, "text", b, "text")
      .head().getDouble(0)
    assert(math.abs(batch - js2) < 1e-6)
  }

  test("semantic map composes onto a stream; the LLM cache keeps micro-batch retries idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("id", "text")
    val client = graft.llm.MockLlmClient()
    val cfg = graft.ops.SemanticMapConfig(
      name = "smap_stream",
      prompt = "r13stream classify: {{ input.text }}",
      outputSchema = Seq("sentiment" -> "string"))
    // the semantic op is an object operator — it composes onto the
    // streaming frame unchanged, per micro-batch
    val out = graft.ops.SemanticMap(docs, cfg, client)
    val q = out.writeStream.format("memory").queryName("smap_sink")
      .outputMode(OutputMode.Append()).start()
    val c0 = client.callCount
    input.addData((1L, "the fast car"), (2L, "a slow day"))
    q.processAllAvailable()
    val afterB1 = client.callCount
    assert(afterB1 - c0 == 2, s"expected 2 provider calls, got ${afterB1 - c0}")
    // an identical prompt in a LATER micro-batch (the replay/retry shape)
    // is served by the executor-local LlmCache: zero new provider calls
    input.addData((3L, "the fast car"))
    q.processAllAvailable()
    assert(client.callCount == afterB1,
      s"cache miss on replayed prompt: ${client.callCount - afterB1} extra calls")
    val rows = spark.sql("SELECT id, text, sentiment FROM smap_sink")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    q.stop()
    assert(rows == Map(1L -> "positive", 2L -> "negative", 3L -> "positive"))
  }
}
