package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.llm.{LlmClient, MockLlmClient}

/** Lazy, config-building fluent API — the analog of the reference's `Frame`
  * (reference docetl/apis/frame.py:169,337-851 `_append_op` + fluent ops;
  * round-trips at frame.py:1183-1386 `from_yaml`/`to_yaml`).
  *
  * Unlike [[Frame]] (which wraps an eager `DataFrame` and applies operators
  * immediately — still lazy in the Spark sense, but bound to a session),
  * `LazyFrame` accumulates *op configs*: nothing touches Spark until
  * [[run]], and the whole pipeline serializes to YAML that
  * [[Pipeline.runYaml]] executes identically. That gives the reference's
  * three-surface contract: YAML, fluent builder, and DataFrame-wrapper all
  * lower to the same config and the same execution path.
  *
  * Op auto-naming is `{type}_{index}` (≅ frame.py auto-naming).
  */
final case class LazyFrame(
    datasetName: String,
    datasetPath: String,
    ops: Vector[java.util.LinkedHashMap[String, Any]]) {

  import LazyFrame.{jlist, jmap}

  private def append(tpe: String, fields: (String, Any)*): LazyFrame = {
    val m = jmap("name" -> s"${tpe}_${ops.length}", "type" -> tpe)
    fields.foreach { case (k, v) => m.put(k, v) }
    copy(ops = ops :+ m)
  }

  // ---- code (native relational) ops ----

  def codeMap(outputs: (String, String)*): LazyFrame =
    append("code_map", "outputs" -> jmap(outputs.map { case (k, v) => k -> (v: Any) }: _*))
  def codeFilter(predicate: String): LazyFrame =
    append("code_filter", "predicate" -> predicate)
  def codeReduce(keys: Seq[String], aggs: (String, String)*): LazyFrame =
    append("code_reduce", "reduce_key" -> jlist(keys),
      "aggs" -> jmap(aggs.map { case (k, v) => k -> (v: Any) }: _*))
  def select(columns: String*): LazyFrame =
    append("select", "columns" -> jlist(columns))
  def limit(n: Int): LazyFrame = append("limit", "n" -> n)

  // ---- semantic (LLM) ops ----

  def semanticMap(prompt: String, schema: (String, String)*): LazyFrame =
    append("map", "prompt" -> prompt,
      "output" -> jmap("schema" -> jmap(schema.map { case (k, v) => k -> (v: Any) }: _*)))
  def semanticFilter(prompt: String, decision: String = "keep"): LazyFrame =
    append("filter", "prompt" -> prompt,
      "output" -> jmap("schema" -> jmap(decision -> ("bool": Any))))
  def semanticReduce(keys: Seq[String], memberExpr: String, orderKey: String,
      schema: (String, String)*): LazyFrame =
    append("reduce", "reduce_key" -> jlist(keys), "member_expr" -> memberExpr,
      "order_key" -> orderKey,
      "output" -> jmap("schema" -> jmap(schema.map { case (k, v) => k -> (v: Any) }: _*)))
  def agentMap(prompt: String, tools: Seq[String], schema: (String, String)*): LazyFrame =
    append("agent_map", "prompt" -> prompt, "tools" -> jlist(tools),
      "output" -> jmap("schema" -> jmap(schema.map { case (k, v) => k -> (v: Any) }: _*)))

  // ---- reshape ----

  def split(splitKey: String, numTokens: Int, docIdExpr: String = "uuid()"): LazyFrame =
    append("split", "split_key" -> splitKey, "num_tokens" -> numTokens,
      "doc_id_expr" -> docIdExpr)
  def unnest(key: String): LazyFrame = append("unnest", "unnest_key" -> key)
  def sampleFirst(n: Int, orderBy: Seq[String]): LazyFrame =
    append("sample", "method" -> "first", "samples" -> n, "order_by" -> jlist(orderBy))

  // ---- lower / run ----

  /** The full pipeline config — one step listing every accumulated op. */
  def toConf: Conf = {
    val root = jmap(
      "datasets" -> jmap(datasetName -> jmap("path" -> datasetPath)),
      "operations" -> jlist(ops),
      "pipeline" -> jmap("steps" -> jlist(Seq(jmap(
        "name" -> s"${datasetName}_out",
        "input" -> datasetName,
        "operations" -> jlist(ops.map(_.get("name"))))))))
    Conf(root)
  }

  /** YAML serialization; `Conf.fromYaml(toYaml)` runs identically
    * (round-trip ≅ reference frame.py:1183-1386). */
  def toYaml: String = {
    val opts = new org.yaml.snakeyaml.DumperOptions()
    opts.setDefaultFlowStyle(org.yaml.snakeyaml.DumperOptions.FlowStyle.BLOCK)
    new org.yaml.snakeyaml.Yaml(opts).dump(toConf.value)
  }

  def run(spark: SparkSession, client: LlmClient = MockLlmClient()): DataFrame =
    Pipeline.run(toConf, spark, client)

  /** Propagated output schemas per step without writing output. */
  def describe(spark: SparkSession, client: LlmClient = MockLlmClient()): Seq[(String, org.apache.spark.sql.types.StructType)] =
    Pipeline.describe(toConf, spark, client)
}

object LazyFrame {

  def read(datasetName: String, path: String): LazyFrame =
    LazyFrame(datasetName, path, Vector.empty)

  /** Rebuild a LazyFrame from YAML emitted by [[LazyFrame.toYaml]] (single
    * linear step). General multi-step YAML runs via [[Pipeline]] directly. */
  def fromYaml(yaml: String): LazyFrame = {
    val conf = Conf.fromYaml(yaml)
    val (dsName, ds) = conf("datasets").asOrderedMap.head
    val opsByName = conf("operations").asList.map(o => o("name").str -> o).toMap
    val step = conf("pipeline")("steps").asList.head
    val ops = step("operations").asList.map(ref => opsByName(ref.str)).map { o =>
      val m = new java.util.LinkedHashMap[String, Any]()
      o.asOrderedMap.foreach { case (k, v) => m.put(k, v.value) }
      m
    }
    LazyFrame(dsName, ds("path").str, ops.toVector)
  }

  private[api] def jmap(pairs: (String, Any)*): java.util.LinkedHashMap[String, Any] = {
    val m = new java.util.LinkedHashMap[String, Any]()
    pairs.foreach { case (k, v) => m.put(k, v) }
    m
  }

  private[api] def jlist(items: Seq[Any]): java.util.ArrayList[Any] = {
    val l = new java.util.ArrayList[Any]()
    items.foreach(l.add)
    l
  }
}
