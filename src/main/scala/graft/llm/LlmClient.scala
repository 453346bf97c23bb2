package graft.llm

import org.apache.spark.sql.types.StructType

/** The LLM seam every semantic operator calls through — the Scala analog of
  * the reference's `APIWrapper` (reference docetl/operations/utils/api.py:76+).
  *
  * Implementations must be Serializable: instances are closed over by
  * `mapPartitions` lambdas and run on executors. Production implementations
  * wrap an HTTP client with retries/rate limits; tests and the driver's
  * correctness gate use [[MockLlmClient]], whose outputs are deterministic
  * pure functions of the prompt (which is what licenses treating semantic
  * projections as deterministic for plan rewrites — SURVEY.md §2.11 note).
  */
trait LlmClient extends Serializable {

  /** One structured-output completion: returns a field->value map conforming
    * to `schema`, plus a dollar cost. (reference api.py:588 `call_llm`) */
  def complete(model: String, prompt: String, schema: StructType): LlmResponse

  /** Pairwise comparison returning is_match (reference equijoin.py:145-194,
    * resolve.py comparison_prompt). */
  def compare(model: String, prompt: String): Boolean =
    complete(model, prompt, MockLlmClient.boolSchema)
      .values("is_match").asInstanceOf[Boolean]

  /** Text embedding (reference api.py:179 `gen_embedding`). */
  def embed(model: String, texts: Seq[String]): Seq[Array[Float]]

  /** Single-token logprob confidence for cascade routing
    * (reference api.py:1004 `classify_with_logprob`). */
  def logprobConfidence(model: String, prompt: String): Double = 1.0
}

final case class LlmResponse(values: Map[String, Any], cost: Double)

/** Executor-local response cache, keyed by (model, prompt, schema) — the
  * analog of the reference's disk LLM cache (reference
  * docetl/operations/utils/cache.py:17-23). Makes Spark task retries and
  * speculative re-execution idempotent w.r.t. LLM calls (SURVEY.md §7.5.4).
  * Bounded FIFO eviction; per-JVM (executor), so no coordination cost.
  */
object LlmCache {
  private val maxEntries = 100000
  private val map = new java.util.concurrent.ConcurrentHashMap[String, LlmResponse]()
  private val order = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  def getOrCompute(key: String, compute: => LlmResponse): LlmResponse = {
    val hit = map.get(key)
    if (hit != null) hit
    else {
      val v = compute
      if (map.putIfAbsent(key, v) == null) {
        order.add(key)
        while (map.size() > maxEntries) {
          val evict = order.poll()
          if (evict != null) map.remove(evict) else return v
        }
      }
      v
    }
  }

  def clear(): Unit = { map.clear(); order.clear() }
}
