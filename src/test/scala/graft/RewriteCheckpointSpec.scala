package graft

import org.apache.spark.sql.functions._

import graft.api.{CheckpointStore, Conf, Pipeline, Rewrites}
import graft.llm.{LlmCache, MockLlmClient}

class RewritesSpec extends SparkSpec {
  private def op(yaml: String): Conf = Conf.fromYaml(yaml)

  test("selection pushdown hops an LLM map when fields are disjoint") {
    val ops = Seq(
      op("""{ name: m, type: map, prompt: "{{ input.text }}", output: { schema: { sentiment: str } } }"""),
      op("""{ name: f, type: code_filter, predicate: "doc_id > 3" }"""))
    val out = Rewrites(ops)
    assert(out.map(_("name").str) == Seq("f", "m"))
  }
  test("no pushdown when the filter reads the map's output") {
    val ops = Seq(
      op("""{ name: m, type: map, prompt: "p", output: { schema: { sentiment: str } } }"""),
      op("""{ name: f, type: code_filter, predicate: "sentiment = 'positive'" }"""))
    assert(Rewrites(ops).map(_("name").str) == Seq("m", "f"))
  }
  test("semantic filter hops an LLM map when its prompt fields are disjoint") {
    val ops = Seq(
      op("""{ name: m, type: map, prompt: "{{ input.text }}", output: { schema: { sentiment: str } } }"""),
      op("""{ name: f, type: filter, prompt: "{{ input.doc_id }}", output: { schema: { keep: bool } } }"""))
    assert(Rewrites(ops).map(_("name").str) == Seq("f", "m"))
  }
  test("semantic filter reading the map's output stays put") {
    val ops = Seq(
      op("""{ name: m, type: map, prompt: "p", output: { schema: { sentiment: str } } }"""),
      op("""{ name: f, type: filter, prompt: "{{ input.sentiment }}", output: { schema: { keep: bool } } }"""))
    assert(Rewrites(ops).map(_("name").str) == Seq("m", "f"))
  }
  test("no pushdown when the filter would clobber a column the map reads") {
    // the filter writes `keep` (consumed, but it overwrites the input
    // column while running); the map reads `keep` -> swap is illegal
    val ops = Seq(
      op("""{ name: m, type: map, prompt: "{{ input.keep }}", output: { schema: { sentiment: str } } }"""),
      op("""{ name: f, type: filter, prompt: "{{ input.text }}", output: { schema: { keep: bool } } }"""))
    assert(Rewrites(ops).map(_("name").str) == Seq("m", "f"))
  }
  test("no pushdown past non-LLM ops (nothing to save)") {
    val ops = Seq(
      op("""{ name: c, type: code_map, outputs: { n: "1" } }"""),
      op("""{ name: f, type: code_filter, predicate: "doc_id > 3" }"""))
    assert(Rewrites(ops).map(_("name").str) == Seq("c", "f"))
  }
  test("limit pushdown hops LLM maps; fixpoint crosses several") {
    val ops = Seq(
      op("""{ name: m1, type: map, prompt: "p", output: { schema: { a: str } } }"""),
      op("""{ name: m2, type: map, prompt: "p", output: { schema: { b: str } } }"""),
      op("""{ name: l, type: limit, n: 3 }"""))
    assert(Rewrites(ops).map(_("name").str) == Seq("l", "m1", "m2"))
  }
  test("pushdown in a real pipeline saves LLM calls, same result") {
    val dir = java.nio.file.Files.createTempDirectory("graft").toString
    docsDf.write.mode("overwrite").parquet(s"$dir/docs.parquet")
    def yaml(rewrites: Boolean) =
      s"""
         |plan_rewrites: $rewrites
         |datasets:
         |  docs: { path: $dir/docs.parquet }
         |pipeline:
         |  steps:
         |    - name: s1
         |      input: docs
         |      operations:
         |        - { name: m, type: map, prompt: "{{ input.text }}",
         |            output: { schema: { sentiment: str } }, bypass_cache: true }
         |        - { name: f, type: code_filter, predicate: "doc_id <= 2" }
         |""".stripMargin
    LlmCache.clear(); MockLlmClient.resetCalls()
    val client = MockLlmClient()
    val without = Pipeline.runYaml(yaml(rewrites = false), spark, client).collect()
    val callsWithout = client.callCount
    MockLlmClient.resetCalls()
    val withRw = Pipeline.runYaml(yaml(rewrites = true), spark, client).collect()
    val callsWith = client.callCount
    assert(without.map(_.getLong(0)).toSet == withRw.map(_.getLong(0)).toSet)
    assert(callsWith < callsWithout) // 2 rows mapped instead of 6
  }
}

class CheckpointSpec extends SparkSpec {
  test("rolling hash changes when any upstream config changes") {
    val a = Conf.fromYaml("""{ type: code_map, outputs: { x: "1" } }""")
    val b = Conf.fromYaml("""{ type: code_map, outputs: { x: "2" } }""")
    val h1 = CheckpointStore.rollingHash("base", a)
    val h2 = CheckpointStore.rollingHash("base", b)
    val h3 = CheckpointStore.rollingHash("other", a)
    assert(h1 != h2 && h1 != h3)
    // key order in the config map doesn't matter
    val a2 = Conf.fromYaml("""{ outputs: { x: "1" }, type: code_map }""")
    assert(CheckpointStore.rollingHash("base", a2) == h1)
  }
  test("second pipeline run reuses checkpoints instead of recomputing") {
    val dir = java.nio.file.Files.createTempDirectory("graft").toString
    docsDf.write.mode("overwrite").parquet(s"$dir/docs.parquet")
    val yaml =
      s"""
         |checkpoint_dir: $dir/ckpt
         |datasets:
         |  docs: { path: $dir/docs.parquet }
         |pipeline:
         |  steps:
         |    - name: s1
         |      input: docs
         |      operations:
         |        - { name: m, type: map, prompt: "{{ input.text }}",
         |            output: { schema: { sentiment: str } }, bypass_cache: true }
         |""".stripMargin
    LlmCache.clear(); MockLlmClient.resetCalls()
    val client = MockLlmClient()
    Pipeline.runYaml(yaml, spark, client).count()
    val callsFirst = client.callCount
    assert(callsFirst == 6)
    Pipeline.runYaml(yaml, spark, client).count()
    assert(client.callCount == callsFirst) // no new LLM calls: loaded parquet
  }
}
