package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.NaiveBayes

/** Round-10: Naive Bayes train/score/classify. */
class Round10kSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("lbl", StringType),
    StructField("text", StringType)))

  private def trainingSet = df(schema,
    Row(1L, "db", "query join table scan index"),
    Row(2L, "db", "table scan sort merge join"),
    Row(3L, "db", "index lookup join query"),
    Row(4L, "ml", "model train gradient loss epoch"),
    Row(5L, "ml", "loss gradient batch train model"),
    Row(6L, "ml", "epoch batch model eval"))

  test("nb: recovers clearly separable classes") {
    val model = NaiveBayes.train(trainingSet, "lbl", "text")
    val test = df(schema,
      Row(10L, null, "join the table with a sort"),
      Row(11L, null, "train the model one epoch"))
    val pred = NaiveBayes.classify(test, "id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred == Map(10L -> "db", 11L -> "ml"))
  }

  test("nb: all-unseen tokens fall back to the prior (largest class wins)") {
    val skewed = df(schema,
      Row(1L, "big", "aa bb"), Row(2L, "big", "cc dd"), Row(3L, "big", "ee ff"),
      Row(4L, "small", "gg hh"))
    val model = NaiveBayes.train(skewed, "lbl", "text")
    val test = df(schema, Row(9L, null, "zz yy xx"))
    val scores = NaiveBayes.scores(test, "id", "text", model)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    // identical per-token default handling -> the prior decides
    val pred = NaiveBayes.classify(test, "id", "text", model).head()
    assert(pred.getString(1) == "big", scores.toString)
  }

  test("nb: hand-checked score arithmetic") {
    // one class, tiny vocab: P(tok|c) = (cnt+1)/(total+V), default 1/(total+V)
    val d = df(schema, Row(1L, "only", "a a b"))
    val model = NaiveBayes.train(d, "lbl", "text") // total=3, V=2
    val w = model.collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(math.abs(w("a") - math.log(3.0 / 5)) < 1e-8)
    assert(math.abs(w("b") - math.log(2.0 / 5)) < 1e-8)
    assert(math.abs(w(NaiveBayes.DefaultToken) - math.log(1.0 / 5)) < 1e-8)
    assert(w(NaiveBayes.PriorToken) == 0.0) // ln(1)
    val s = NaiveBayes.scores(df(schema, Row(7L, null, "a zz")),
      "id", "text", model).head().getDouble(2)
    val expect = 0.0 + math.log(3.0 / 5) + math.log(1.0 / 5)
    assert(math.abs(s - expect) < 1e-5)
  }

  test("nb: classify tie-break is label-ascending and deterministic") {
    val sym = df(schema, Row(1L, "a", "x"), Row(2L, "b", "y"))
    val model = NaiveBayes.train(sym, "lbl", "text")
    // token seen in NEITHER class scores identically under both -> tie
    val pred = NaiveBayes.classify(df(schema, Row(5L, null, "zz")),
      "id", "text", model).head()
    assert(pred.getString(1) == "a")
  }

  test("luhn: checksum validity and length gates") {
    import graft.functions.{TextFunctions => TF}
    val s2 = StructType(Seq(StructField("s", StringType)))
    def valid(s: String): Boolean =
      df(s2, Row(s)).select(TF.luhnValid(col("s"))).head().getBoolean(0)
    assert(valid("4539578763621486"))          // valid visa test number
    assert(valid("4539-5787-6362-1486"))       // separators stripped
    assert(!valid("1234567890123456"))         // checksum fails
    assert(!valid("4111111111"))               // too short (10 digits)
    assert(!valid("45395787636214864539578763621486")) // too long
  }

  test("redact_cc: only Luhn-valid candidates redact; idempotent") {
    import graft.functions.{TextFunctions => TF}
    val s2 = StructType(Seq(StructField("t", StringType)))
    def redact(t: String): String =
      df(s2, Row(t)).select(TF.redactCreditCards(col("t"))).head().getString(0)
    assert(redact("pay 4539578763621486 order 1234567890123456") ==
      "pay <CC> order 1234567890123456")
    assert(redact("grouped 4539-5787-6362-1486 end") == "grouped <CC> end")
    assert(redact("no cards here 12345") == "no cards here 12345")
    // idempotent: the token contains no digits
    assert(redact(redact("x 4539578763621486 y")) == "x <CC> y")
    // registry surface
    val out = graft.api.Registry("redact_cc")(
      df(s2, Row("n 4539578763621486")), graft.api.Conf.fromYaml(
        "type: redact_cc\ntext_key: t\ntoken: \"[CARD]\""), null)
    assert(out.head().getString(0) == "n [CARD]")
  }

  test("nb yaml registry: self-train and external model dataset") {
    val selfCfg = graft.api.Conf.fromYaml(
      "type: nb_classify\nid_key: id\ntext_key: text\nlabel_key: lbl")
    val ctx = graft.api.OpContext(spark, graft.llm.MockLlmClient(), Map.empty)
    val self = graft.api.Registry("nb_classify")(trainingSet, selfCfg, ctx)
    // append semantics: input columns survive, prediction columns add on
    assert(self.columns.toSeq ==
      Seq("id", "lbl", "text", "pred_label", "nb_score"))
    val model = graft.api.Registry("nb_train")(trainingSet,
      graft.api.Conf.fromYaml(
        "type: nb_train\nlabel_key: lbl\ntext_key: text"), ctx)
    val ctx2 = graft.api.OpContext(spark, graft.llm.MockLlmClient(),
      Map("m" -> model))
    val viaRef = graft.api.Registry("nb_classify")(trainingSet,
      graft.api.Conf.fromYaml(
        "type: nb_classify\nid_key: id\ntext_key: text\nmodel: m"), ctx2)
    // append semantics keep lbl alongside pred_label
    val acc = viaRef.filter(col("pred_label") === col("lbl")).count()
    assert(acc == trainingSet.count()) // training-set accuracy is perfect here
  }
}
