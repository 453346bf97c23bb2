package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** Round-10 plan-shape pins + streaming composition of the new row-local
  * operators. The plan assertions are the scale contract: these paths must
  * stay shuffle-free (or bounded to the one aggregation they declare) so a
  * 100× scale-up changes task count, not plan shape. */
class Round10hSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  private def nExchanges(df: DataFrame): Int =
    "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length

  test("plan: cdc chunking, truncate, segment stats, chat render are shuffle-free") {
    val d = df(docSchema, Row(1L, "a b c d e f g h"))
    assert(nExchanges(graft.ops.CdcChunk.explodeChunks(d, "id", "text")) == 0)
    assert(nExchanges(graft.ops.Truncate(d, "text", 4, "head_tail")) == 0)
    assert(nExchanges(graft.ops.Segment.sentenceStats(d, "text")) == 0)
    val msgs = df(StructType(Seq(
      StructField("id", LongType),
      StructField("msgs", ArrayType(StructType(Seq(
        StructField("role", StringType),
        StructField("content", StringType))))))),
      Row(1L, Seq(Row("user", "x"))))
    assert(nExchanges(graft.ops.ChatOps.renderWithSpans(msgs, "msgs")) == 0)
    assert(nExchanges(graft.ops.ChatOps.validate(msgs, "msgs")) == 0)
  }

  test("plan: count-min probe is shuffle-free; overlap signatures shuffle once") {
    val d = df(docSchema, (1 to 50).map(i => Row(i.toLong, s"w${i % 7} x")): _*)
    val sk = graft.sketch.CountMin.build(d, "text", width = 256, depth = 3)
    assert(nExchanges(graft.sketch.CountMin.estimate(d, "text", sk)) == 0)
    val slices = df(StructType(Seq(StructField("slice", StringType),
      StructField("text", StringType))), Row("a", "x y z w v u t s"))
    // one partial-aggregating exchange for the (slice, seed) min — nothing else
    assert(nExchanges(
      graft.ops.CorpusOverlap.signatures(slices, "slice", "text")) == 1)
  }

  test("streaming: truncate + conversation validate + cms probe compose stateless") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // static sketch from an accumulated reference (the bloomClean shape)
    val ref = df(docSchema, (1 to 30).map(i => Row(i.toLong, "common")): _*)
    val sk = graft.sketch.CountMin.build(
      ref.select(explode(split(col("text"), " ")).as("w")), "w",
      width = 256, depth = 3)
    val input = MemoryStream[(Long, String, String)]
    val stream = input.toDF().toDF("id", "prompt", "resp")
    val out = graft.sketch.CountMin.estimate(
      graft.ops.ChatOps.validate(
        graft.ops.ChatOps.fromPromptResponse(
          graft.ops.Truncate(stream, "prompt", 3, "head"),
          "text_trunc", "resp"),
        "messages"),
      "resp", sk, "resp_freq")
    val q = out.writeStream.format("memory").queryName("r10_stream")
      .outputMode(OutputMode.Append()).start()
    input.addData((1L, "a b c d e", "common"), (2L, "x", ""))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT id, text_trunc, conv_valid, resp_freq FROM r10_stream")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getBoolean(2), r.getLong(3))).toMap
    q.stop()
    assert(rows(1L) == (("a b c", true, 30L)))
    assert(rows(2L) == (("x", false, 0L))) // empty response -> invalid
  }

  test("streaming: segment sentences explodes per micro-batch, stateless") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("id", "text")
    val q = graft.ops.Segment.sentences(stream, "id", "text")
      .writeStream.format("memory").queryName("r10_seg")
      .outputMode(OutputMode.Append()).start()
    input.addData((1L, "One two. Three four!"))
    q.processAllAvailable()
    val sents = spark.sql("SELECT sentence FROM r10_seg")
      .collect().map(_.getString(0)).toSeq
    q.stop()
    assert(sents == Seq("One two.", "Three four!"))
  }
}
