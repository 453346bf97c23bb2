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
