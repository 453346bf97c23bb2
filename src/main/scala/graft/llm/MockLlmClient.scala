package graft.llm

import org.apache.spark.sql.types._

/** Deterministic mock LLM (FIXTURES.md §9): every output is a pure function
  * of the prompt, so semantic operators become reproducible and — by design —
  * expressible in ANSI SQL for the DuckDB correctness oracle.
  *
  * Field-name rules (each mirrored 1:1 by oracle SQL in SparkEntry):
  *   - `sentiment` (str):  prompt contains "fast" -> "positive",
  *     else contains "slow" -> "negative", else "neutral"
  *   - `summary` (str):    "docs=<n> chars=<len>" where n = 1 + count of
  *     '\n' in the prompt and len = prompt length (reduce over joined members)
  *   - `canonical` (str):  lexicographically smallest '\n'-separated line
  *   - `rating` (int):     1 + len(prompt) mod 7  (Likert 1-7)
  *   - `action` (str):     "final" if the prompt contains "\nOBS:" else
  *     "tool" (agent loop: call one tool, then finish)
  *   - `is_match` (bool):  prompt is "<a>\n###\n<b>" -> trimmed lowercase
  *     equality of a and b; otherwise len(prompt) mod 2 == 0
  *   - any other bool:     len(prompt) mod 2 == 0
  *   - any other int:      len(prompt)
  *   - any other float:    len(prompt) / 10.0
  *   - any other str:      "mock:" + first 16 chars of prompt
  *   - list[str]:          first 3 whitespace tokens of the prompt
  *   - enum[...] fields (via StructField metadata): allowed[len(prompt) mod n]
  *
  * `costPerCall` is accumulated by the runner exactly like the reference's
  * per-op float cost (reference docetl/operations/base.py:190-205).
  */
final case class MockLlmClient(costPerCall: Double = 1e-4) extends LlmClient {

  // Count of completions served by this JVM — lets tests assert on call
  // volume (cache hits, gleaning rounds), cf. reference tests/conftest.py:31-42.
  def callCount: Long = MockLlmClient.calls.get()

  override def complete(model: String, prompt: String, schema: StructType): LlmResponse = {
    MockLlmClient.calls.incrementAndGet()
    val r = respond(model, prompt, schema)
    TokenTally.record(model, r)
    r
  }

  /** One provider round-trip for the whole batch: a single call is counted
    * (the economics the reference's batch_prompt mode buys, map.py:530-618). */
  override def completeBatch(
      model: String, prompts: Seq[String], schema: StructType): Seq[LlmResponse] = {
    if (prompts.nonEmpty) MockLlmClient.calls.incrementAndGet()
    prompts.map { p =>
      val r = respond(model, p, schema)
      TokenTally.record(model, r)
      r
    }
  }

  private def respond(model: String, prompt: String, schema: StructType): LlmResponse = {
    val values = schema.fields.map { f =>
      f.name -> (graft.core.SchemaTypes.enumOf(f) match {
        // enum fields: a constrained deterministic pick, SQL-mirrorable as
        // list_extract(values, 1 + len(prompt) % n)
        case Some(vals) => vals(prompt.length % vals.length)
        case None => mockValue(f.name, f.dataType, prompt)
      })
    }.toMap
    LlmResponse(values, costPerCall,
      inputTokens = prompt.length / 4 + 1, outputTokens = schema.fields.length * 4L)
  }

  override def embed(model: String, texts: Seq[String]): Seq[Array[Float]] =
    texts.map { t =>
      val h = t.hashCode.toLong & 0xFFFFFFFFL
      Array.tabulate(8)(i => (((h >> (i * 4)) & 0xF).toFloat - 7.5f) / 7.5f)
    }

  override def logprobConfidence(model: String, prompt: String): Double =
    (prompt.length % 100) / 100.0

  private def mockValue(name: String, dt: DataType, prompt: String): Any = (name, dt) match {
    case ("sentiment", StringType) =>
      if (prompt.contains("fast")) "positive"
      else if (prompt.contains("slow")) "negative"
      else "neutral"
    case ("ranges", StringType) => "1-2"
    // Agent loop protocol: call a tool until an observation is present.
    case ("action", StringType) =>
      if (prompt.contains("\nOBS:")) "final" else "tool"
    // Associative fold/merge accumulator: "n=<count of members seen>".
    // fold prompt: optional "ACC:n=k" line + member lines; merge prompt:
    // "MERGE:n=a\n###\nn=b". Genuinely associative, so partial-aggregation
    // results are partition-independent.
    case ("acc", StringType) =>
      val AccN = raw"n=(\d+)".r
      if (prompt.startsWith("MERGE:"))
        s"n=${AccN.findAllMatchIn(prompt).map(_.group(1).toLong).sum}"
      else {
        val lines = prompt.split('\n')
        val (accLines, memberLines) = lines.partition(_.startsWith("ACC:"))
        val carried = accLines.flatMap(AccN.findFirstMatchIn(_)).map(_.group(1).toLong).sum
        s"n=${carried + memberLines.count(_.nonEmpty)}"
      }
    case ("summary", StringType) =>
      val n = prompt.count(_ == '\n') + 1
      s"docs=$n chars=${prompt.length}"
    case ("canonical", StringType) => prompt.split('\n').min
    case ("rating", LongType)      => 1L + (prompt.length % 7)
    case (_, BooleanType) =>
      val i = prompt.indexOf("\n###\n")
      if (name == "is_match" && i >= 0) {
        val a = prompt.substring(0, i).trim.toLowerCase
        val b = prompt.substring(i + 5).trim.toLowerCase
        a == b
      } else prompt.length % 2 == 0
    case (_, LongType)   => prompt.length.toLong
    case (_, DoubleType) => prompt.length / 10.0
    case (_, StringType) => "mock:" + prompt.take(16)
    case (_, ArrayType(StringType, _)) => prompt.split("\\s+").take(3).toSeq
    case (_, other) =>
      throw new IllegalArgumentException(s"MockLlmClient: unsupported type $other for $name")
  }
}

object MockLlmClient {
  private[llm] val calls = new java.util.concurrent.atomic.AtomicLong(0)
  def resetCalls(): Unit = calls.set(0)
  val boolSchema: StructType = StructType(Seq(StructField("is_match", BooleanType)))
}
