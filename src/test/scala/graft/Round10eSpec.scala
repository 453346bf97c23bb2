package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{ChatOps, Truncate}

/** Round-10: token-budget truncation + conversation normalize/validate. */
class Round10eSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  private def trunc(text: String, max: Int, mode: String,
      marker: String = ""): (String, Long) = {
    val r = Truncate(df(schema, Row(1L, text)), "text", max, mode, marker)
      .head()
    (r.getAs[String]("text_trunc"), r.getAs[Long]("text_trunc_tokens"))
  }

  test("truncate: head, tail, head_tail modes") {
    val t = "a b c d e f g h i j"
    assert(trunc(t, 3, "head") == ("a b c", 3L))
    assert(trunc(t, 3, "tail") == ("h i j", 3L))
    assert(trunc(t, 4, "head_tail") == ("a b i j", 4L))
    assert(trunc(t, 5, "head_tail") == ("a b c i j", 5L))
    assert(trunc(t, 4, "head_tail", "<...>") == ("a b <...> i j", 5L))
  }

  test("truncate: short text passes through untouched in every mode") {
    Seq("head", "tail", "head_tail").foreach { m =>
      assert(trunc("x y z", 5, m, "...") == ("x y z", 3L), m)
    }
  }

  test("truncate: rejects bad mode and non-positive budget") {
    intercept[IllegalArgumentException] { trunc("a", 1, "sideways") }
    intercept[IllegalArgumentException] { trunc("a", 0, "head") }
  }

  private val pairSchema = StructType(Seq(
    StructField("id", LongType), StructField("q", StringType),
    StructField("a", StringType)))

  test("conversation: fromPromptResponse with and without system") {
    val d = df(pairSchema, Row(1L, "hi", "hello"))
    val plainRow = ChatOps.fromPromptResponse(d, "q", "a").head()
    val plain = plainRow.getSeq[Row](plainRow.fieldIndex("messages"))
      .map(r => (r.getString(0), r.getString(1)))
    assert(plain == Seq("user" -> "hi", "assistant" -> "hello"))
    val sysRow = ChatOps.fromPromptResponse(d, "q", "a", Some("be nice")).head()
    val sys = sysRow.getSeq[Row](sysRow.fieldIndex("messages"))
      .map(r => (r.getString(0), r.getString(1)))
    assert(sys == Seq("system" -> "be nice", "user" -> "hi",
      "assistant" -> "hello"))
    // normalize -> validate composes to a valid conversation
    val v = ChatOps.validate(
      ChatOps.fromPromptResponse(d, "q", "a", Some("s")), "messages").head()
    assert(v.getAs[Boolean]("conv_valid"))
  }

  private val msgsSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("msgs", ArrayType(StructType(Seq(
      StructField("role", StringType),
      StructField("content", StringType)))))))

  test("conversation validate: every defect class and its reason") {
    def reasonOf(msgs: Seq[Row]): (Boolean, String) = {
      val r = ChatOps.validate(df(msgsSchema, Row(1L, msgs)), "msgs").head()
      (r.getAs[Boolean]("conv_valid"),
        Option(r.getAs[String]("conv_invalid_reason")).getOrElse(""))
    }
    val u = Row("user", "q"); val a = Row("assistant", "r")
    val s = Row("system", "be nice")
    assert(reasonOf(Seq(u, a)) == (true, ""))
    assert(reasonOf(Seq(s, u, a)) == (true, ""))
    assert(reasonOf(Seq(s, u, a, u, a)) == (true, ""))
    assert(reasonOf(Seq.empty) == (false, "empty"))
    assert(reasonOf(Seq(s)) == (false, "empty"))
    assert(reasonOf(Seq(u, a, s, u, a)) == (false, "system_not_leading"))
    assert(reasonOf(Seq(u, Row("assistant", ""))) == (false, "empty_content"))
    assert(reasonOf(Seq(u, Row("assistant", null))) == (false, "empty_content"))
    assert(reasonOf(Seq(a, u)) == (false, "bad_alternation"))
    assert(reasonOf(Seq(u, a, u)) == (false, "unterminated"))
  }

  test("conversation yaml registry: pairs -> validate -> drop_invalid") {
    val d = df(pairSchema, Row(1L, "hi", "yo"), Row(2L, "", "yo"))
    val msgs = graft.api.Registry("conversation_from_pairs")(d,
      graft.api.Conf.fromYaml(
        "type: conversation_from_pairs\nprompt_key: q\nresponse_key: a"), null)
    val kept = graft.api.Registry("conversation_validate")(msgs,
      graft.api.Conf.fromYaml(
        "type: conversation_validate\nmessages_key: messages\n" +
          "drop_invalid: true"), null)
    assert(kept.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(!kept.columns.contains("conv_valid"))
  }
}
