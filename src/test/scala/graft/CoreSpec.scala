package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SchemaTypes
import graft.llm.{MockLlmClient, Template}

class SchemaTypesSpec extends AnyFunSuite {
  test("scalar type strings") {
    assert(SchemaTypes.parse("str") == StringType)
    assert(SchemaTypes.parse("string") == StringType)
    assert(SchemaTypes.parse("int") == LongType)
    assert(SchemaTypes.parse("number") == DoubleType)
    assert(SchemaTypes.parse("bool") == BooleanType)
  }
  test("list types") {
    assert(SchemaTypes.parse("list[str]") == ArrayType(StringType))
    assert(SchemaTypes.parse("list[list[int]]") == ArrayType(ArrayType(LongType)))
  }
  test("bare list rejected (reference validation.py:151-152)") {
    intercept[IllegalArgumentException](SchemaTypes.parse("list"))
  }
  test("inline struct") {
    assert(SchemaTypes.parse("{a: int, b: list[str]}") ==
      StructType(Seq(StructField("a", LongType),
        StructField("b", ArrayType(StringType)))))
  }
  test("enum maps to string with values") {
    assert(SchemaTypes.parse("enum[x, y]") == StringType)
    assert(SchemaTypes.enumValues("enum[x, y]").contains(Seq("x", "y")))
  }
}

class TemplateSpec extends AnyFunSuite {
  private val schema = StructType(Seq(
    StructField("a", StringType),
    StructField("n", StructType(Seq(StructField("b", LongType))))))

  test("render top-level and nested fields") {
    val row = new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      Array("hello", new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array(7L), schema.fields(1).dataType.asInstanceOf[StructType])), schema)
    assert(Template("x {{ input.a }} y {{ input.n.b }}", schema).render(row) == "x hello y 7")
  }
  test("schema-less rows work for top-level fields") {
    val row = Row("hi", null)
    assert(Template("{{ input.a }}", schema).render(row) == "hi")
  }
  test("unknown field is strict (reference strict_render)") {
    intercept[IllegalArgumentException](Template("{{ input.zzz }}", schema))
  }
  test("referencedFields") {
    assert(Template.referencedFields("{{ input.a }} {{ input.n.b }}") == Seq("a", "n"))
  }
  test("numeric path segments index into arrays (reference lookup_field)") {
    val s = StructType(Seq(StructField("xs", ArrayType(StringType))))
    val row = Row(Seq("p", "q"))
    assert(Template("{{ input.xs.1 }}", s).render(row) == "q")
    assert(Template("{{ input.xs.9 }}", s).render(row) == "") // out of range -> empty
  }

  // --- Jinja subset: {% for %}, {% if %}, filters (reference reduce/resolve
  // prompts, docs/concepts/operators.md) ---

  private val memberSchema = StructType(Seq(
    StructField("title", StringType), StructField("score", LongType)))
  private val groupSchema = StructType(Seq(
    StructField("key", StringType),
    StructField("inputs", ArrayType(memberSchema))))
  private def member(t: String, s: Long) =
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      Array[Any](t, s), memberSchema)
  private val groupRow = Row("k1", Seq(member("alpha", 3L), member("beta", 5L)))

  test("for loop over member list (reference reduce fold prompt shape)") {
    val t = Template(
      "Summarize:{% for item in input.inputs %}\n- {{ item.title }} ({{ item.score }}){% endfor %}",
      groupSchema)
    assert(t.render(groupRow) == "Summarize:\n- alpha (3)\n- beta (5)")
  }
  test("loop.index / first / last / length") {
    val t = Template(
      "{% for x in input.inputs %}{{ loop.index }}/{{ loop.length }}{% if loop.last %}.{% else %},{% endif %}{% endfor %}",
      groupSchema)
    assert(t.render(groupRow) == "1/2,2/2.")
  }
  test("schema-less member rows render via static element type") {
    // rows out of mapPartitions lose their schema; element struct ordinals
    // must come from the plan-time ArrayType element schema
    val row = Row("k1", Seq(Row("gamma", 9L)))
    val t = Template("{% for m in input.inputs %}{{ m.title }}={{ m.score }}{% endfor %}", groupSchema)
    assert(t.render(row) == "gamma=9")
  }
  test("if / else with truthiness and comparison") {
    val s = StructType(Seq(StructField("lang", StringType), StructField("n", LongType)))
    val t = Template("{% if input.lang == 'en' %}EN{% else %}other{% endif %}{% if input.n %}+{% endif %}", s)
    assert(t.render(Row("en", 1L)) == "EN+")
    assert(t.render(Row("fr", 0L)) == "other")
  }
  test("filters: upper, join, truncate, default, length, tojson") {
    val s = StructType(Seq(
      StructField("a", StringType), StructField("xs", ArrayType(StringType)),
      StructField("miss", StringType)))
    val row = Row("hello world", Seq("x", "y", "z"), null)
    assert(Template("{{ input.a | upper }}", s).render(row) == "HELLO WORLD")
    assert(Template("{{ input.xs | join(', ') }}", s).render(row) == "x, y, z")
    assert(Template("{{ input.a | truncate(5) }}", s).render(row) == "hello...")
    assert(Template("{{ input.miss | default('n/a') }}", s).render(row) == "n/a")
    assert(Template("{{ input.xs | length }}", s).render(row) == "3")
    assert(Template("{{ input.xs | tojson }}", s).render(row) == "[\"x\", \"y\", \"z\"]")
  }
  test("whole loop var renders as json (reference {{ item }} in prompts)") {
    val t = Template("{% for item in input.inputs %}{{ item }};{% endfor %}", groupSchema)
    assert(t.render(groupRow) ==
      "{\"title\": \"alpha\", \"score\": 3};{\"title\": \"beta\", \"score\": 5};")
  }
  test("unclosed block and unknown filter are strict") {
    intercept[IllegalArgumentException](Template("{% for x in input.inputs %}oops", groupSchema))
    intercept[IllegalArgumentException](
      Template("{{ input.key | frobnicate }}", groupSchema).render(groupRow))
  }
  test("undefined loop var field is strict at plan time") {
    intercept[Exception](Template("{% for m in input.inputs %}{{ m.nope }}{% endfor %}", groupSchema))
  }
  test("referencedFields sees for-loop sources and conditions") {
    assert(Template.referencedFields(
      "{% for x in input.items %}{{ x.a }}{% endfor %}{% if input.flag %}y{% endif %}") ==
      Seq("items", "flag"))
  }
}

class MockLlmClientSpec extends AnyFunSuite {
  private val c = MockLlmClient()
  test("sentiment rule") {
    val s = StructType(Seq(StructField("sentiment", StringType)))
    assert(c.complete("m", "so fast", s).values("sentiment") == "positive")
    assert(c.complete("m", "so slow", s).values("sentiment") == "negative")
    assert(c.complete("m", "meh", s).values("sentiment") == "neutral")
  }
  test("is_match compares around the separator") {
    assert(c.compare("m", "A b\n###\na B "))
    assert(!c.compare("m", "x\n###\ny"))
  }
  test("summary counts lines and chars") {
    val s = StructType(Seq(StructField("summary", StringType)))
    assert(c.complete("m", "ab\ncd", s).values("summary") == "docs=2 chars=5")
  }
  test("deterministic embeddings") {
    val e1 = c.embed("m", Seq("abc")).head
    val e2 = c.embed("m", Seq("abc")).head
    assert(e1.sameElements(e2) && e1.length == 8)
  }
}
