package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-14 regressions: the five advisor items (null-safe apportion,
  * exact ragged Fleiss, per-message pseudonymize extraction, gramless
  * novelty slices, persist-for-two-actions in confusion/equal-mass
  * bins) plus the new scale-path operators added this round. */
class Round14Spec extends SparkSpec {

  private def tmpParquet(d: DataFrame, name: String): DataFrame = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_$name")
      .resolve("t.parquet").toString
    d.write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  // ------------------------------------------- advisor item 1: apportion

  test("apportion ignores null domains and survives all-null sums") {
    val schema = StructType(Seq(
      StructField("d", StringType), StructField("w", LongType)))
    val in = df(schema,
      Row("a", 30L), Row("a", 30L), Row("b", 30L),
      Row(null, 1000L), // null domain: excluded, must not NPE the driver
      Row("c", null))   // all-null sum for c: coalesces to 0
    val out = graft.ops.MixtureSolver.apportion(in, "d", "w", budget = 9L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq("a", "b", "c"))
    // masses 60/30/0 of 90 → quotas 6/3/0, sum = budget exactly
    assert(out.toSeq == Seq(("a", 60L, 6L), ("b", 30L, 3L), ("c", 0L, 0L)))
  }

  // --------------------------------------- advisor item 2: ragged Fleiss

  test("fleiss kappa is exact on ragged designs (hand-computed rationals)") {
    val schema = StructType(Seq(
      StructField("item", LongType), StructField("label", StringType)))
    // i1: [a, a] (P_1 = 1), i2: [a, b, b] (P_2 = 1/3)
    val in = df(schema,
      Row(1L, "a"), Row(1L, "a"),
      Row(2L, "a"), Row(2L, "b"), Row(2L, "b"))
    val r = graft.ops.Agreement.fleissKappa(in, "item", "label").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 5L)
    // p_bar = (1 + 1/3)/2 = 2/3; pe = (3/5)² + (2/5)² = 0.52;
    // kappa = 11/36 — exact rational arithmetic, so these are BIT-equal
    // on every run regardless of shuffle partitioning
    assert(r.getDouble(2) == 0.666667)
    assert(r.getDouble(3) == 0.52)
    assert(r.getDouble(4) == 0.305556)
  }

  test("fleiss kappa ragged result is identical across repartitionings") {
    val schema = StructType(Seq(
      StructField("item", LongType), StructField("label", StringType)))
    val rows = (1L to 40L).flatMap { i =>
      val n = 2 + (i % 4).toInt // ragged: 2..5 raters per item
      (0 until n).map(j => Row(i, if ((i + j) % 3 == 0) "x" else "y"))
    }
    val in = df(schema, rows: _*)
    val a = graft.ops.Agreement.fleissKappa(in, "item", "label")
      .head().getDouble(4)
    val b = graft.ops.Agreement.fleissKappa(in.repartition(7), "item",
      "label").head().getDouble(4)
    val c = graft.ops.Agreement.fleissKappa(in.repartition(1), "item",
      "label").head().getDouble(4)
    assert(a == b && b == c)
  }

  // ----------------------------- advisor item 3: per-message extraction

  test("conversation pseudonymize cannot invent cross-message entities") {
    val msgT = ArrayType(StructType(Seq(
      StructField("role", StringType), StructField("content", StringType))))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("messages", msgT)))
    val in = df(schema,
      Row(1L, Seq(Row("user", "xx END"), Row("assistant", "START yy"))))
    // pattern CAN match across whitespace — a transcript-joined extract
    // would see "END\nSTART" and mint a phantom entity
    val out = graft.ops.Pseudonymize.conversation(in, "messages",
      pattern = "END[\\s\\S]START", label = "SPAN")
    val r = out.head()
    assert(r.getLong(r.fieldIndex("n_span_entities")) == 0L)
    val contents = r.getSeq[Row](r.fieldIndex("messages_pseudo"))
      .map(_.getString(1))
    assert(contents == Seq("xx END", "START yy"))
    // and a genuinely per-message match still numbers consistently
    val in2 = df(schema,
      Row(2L, Seq(Row("user", "mail a@x.co now"),
        Row("assistant", "cc b@y.co and a@x.co"))))
    val out2 = graft.ops.Pseudonymize.conversation(in2, "messages").head()
    val c2 = out2.getSeq[Row](out2.fieldIndex("messages_pseudo"))
      .map(_.getString(1))
    assert(c2 == Seq("mail EMAIL_1 now", "cc EMAIL_2 and EMAIL_1"))
  }

  // --------------------------------- advisor item 4: gramless slices

  test("novelty report emits a zero row for gramless slices") {
    val schema = StructType(Seq(
      StructField("slice", StringType), StructField("text", StringType)))
    val cur = df(schema,
      Row("long", "alpha beta gamma delta"),
      Row("tiny", "one two")) // < n=3 tokens: no grams
    val ref = df(schema, Row("r", "alpha beta gamma"))
    val out = graft.ops.Novelty.report(cur, "slice", "text", ref, "text",
      n = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else java.lang.Double.valueOf(r.getDouble(3))))
      .sortBy(_._1).toSeq
    // "long" has 2 grams, 1 novel; "tiny" is PRESENT with zeros + null rate
    assert(out == Seq(
      ("long", 2L, 1L, java.lang.Double.valueOf(0.5)),
      ("tiny", 0L, 0L, null)))
  }

  // ------------------------- advisor item 5: persist-for-two-actions

  test("confusion and equal-mass bins persist their two-action input") {
    val schema = StructType(Seq(
      StructField("a", StringType), StructField("b", StringType),
      StructField("l", LongType), StructField("s", DoubleType)))
    val in = df(schema,
      Row("x", "x", 1L, 0.9), Row("x", "y", 0L, 0.2),
      Row("y", "y", 1L, 0.7), Row("y", "y", 0L, 0.4))
    val before = graft.core.PersistScope.registered
    val conf = graft.ops.Agreement.confusion(in, "a", "b")
    assert(conf.queryExecution.optimizedPlan.toString
      .contains("InMemoryRelation"))
    assert(conf.collect().map(r => (r.getString(0), r.getString(1),
      r.getLong(2))).toSet ==
      Set(("x", "x", 1L), ("x", "y", 1L), ("y", "y", 2L)))
    // the rank path rebases on an RDD, so the cache is not visible in
    // the final plan — the PersistScope count below covers it
    val bins = graft.ops.ClassifierEval.calibrationBinsEqualMass(
      in, "l", "s", bins = 2, tieBreak = "s")
    assert(bins.agg(sum("n")).head().getLong(0) == 4L)
    assert(graft.core.PersistScope.registered >= before + 2)
    graft.core.PersistScope.unpersistAll()
  }

  // ------------------------- scale-safe blocklist (VERDICT item 1)

  private def textsDf(rows: (Long, String)*): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    df(schema, rows.map { case (i, t) => Row(i, t) }: _*)
  }

  private def phrasesDf(ps: Seq[String]): DataFrame = {
    val schema = StructType(Seq(StructField("phrase", StringType)))
    df(schema, ps.map(Row(_)): _*)
  }

  test("aho-corasick blocklist matches the classic overlapping-suffix set") {
    // Aho & Corasick's own example: dict links must surface "he"
    // inside "she", "hers" ending where "he"+"rs" overlap
    val texts = textsDf(
      (1L, "ushers walked"), (2L, "SHE said"), (3L, "a"), (4L, null),
      (5L, "hi there"))
    val phrases = phrasesDf(Seq("he", "she", "his", "hers"))
    val out = graft.ops.Blocklist.report(texts, "text", phrases, "phrase")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(2), r.getLong(3)))
      .toMap
    assert(out(1L) == (true, 3L))  // she, he, hers
    assert(out(2L) == (true, 2L))  // she, he (case-insensitive)
    assert(out(3L) == (false, 0L))
    assert(out(4L) == (false, 0L)) // null text: no hits
    assert(out(5L) == (true, 1L))  // "there" contains "he"
    val matched = graft.ops.Blocklist.reportMatches(texts, "text",
      phrases, "phrase").filter(col("id") === 1L)
      .head().getSeq[String](4)
    assert(matched == Seq("he", "hers", "she")) // sorted phrase order
    // filter arm: only the clean rows (and null text) survive
    val kept = graft.ops.Blocklist.filterBlocked(texts, "text", phrases,
      "phrase").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L))
  }

  test("blocklist agrees with the expression form and brute force at 10^4 phrases") {
    // 10,000 phrases, a handful planted — the scale the expression
    // chain is documented NOT to take
    val planted = Seq("click here to subscribe", "all rights reserved",
      "lorem ipsum dolor", "winner winner", "zz top hit")
    val filler = (0 until 9995).map(i => s"blk${i}q${i * 7 % 997}x")
    val phrases = phrasesDf(planted ++ filler)
    val texts = textsDf(
      (1L, "please CLICK here to subscribe today"),
      (2L, "copyright 2020 ALL RIGHTS RESERVED and blk42q294x too"),
      (3L, "nothing to see"),
      (4L, "lorem ipsum dolor sit amet winner winner"),
      (5L, "the quick brown fox"))
    val out = graft.ops.Blocklist.report(texts, "text", phrases, "phrase")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // brute-force cross-check on the driver
    val all = (planted ++ filler).map(_.toLowerCase)
    val expect = texts.collect().map { r =>
      val t = Option(r.getString(1)).map(_.toLowerCase).getOrElse("")
      r.getLong(0) -> all.count(t.contains).toLong
    }.toMap
    assert(out == expect)
    assert(out(1L) == 1L && out(2L) == 2L && out(3L) == 0L && out(4L) == 2L)
    // and the expression form agrees where it is contractually valid
    // (the small planted subset)
    val exprOut = graft.ops.Hygiene.blocklistPhrases(texts, "text",
      planted, report = true)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val acSmall = graft.ops.Blocklist.report(texts, "text",
      phrasesDf(planted), "phrase")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(acSmall == exprOut)
  }

  // ----------------------- plan-shape pins (VERDICT r13 item 8 + r14)

  test("blocklist kernel plan: one narrow scan, no shuffle, no join") {
    val texts = tmpParquet(textsDf(
      (1L, "click here now"), (2L, "plain")), "bl_texts")
    val phrases = phrasesDf(Seq("click here", "act fast"))
    val out = graft.ops.Blocklist.report(texts, "text", phrases, "phrase")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
    assert(!plan.contains("Join"), plan.take(800))
    assert(plan.contains("MapPartitions"), plan.take(800))
  }

  test("score ensemble rank hops avoid unpartitioned windows") {
    val base = tmpParquet(df(StructType(Seq(
      StructField("id", LongType), StructField("s1", LongType),
      StructField("s2", LongType))),
      (1L to 40L).map(i => Row(i, i * 7 % 13, i * 11 % 17)): _*),
      "rrf_base")
    val rrf = graft.ops.ScoreEnsemble.rrf(base, Seq("s1", "s2"), "id")
    assert(!rrf.queryExecution.executedPlan.toString.contains("Window"))
    val pct = graft.ops.ScoreEnsemble.percentile(base, Seq("s1", "s2"),
      "id")
    assert(!pct.queryExecution.executedPlan.toString.contains("Window"))
    graft.core.PersistScope.unpersistAll()
  }

  test("distributed kappa plan: keyed aggregations, no window, no cartesian") {
    val in = tmpParquet(df(StructType(Seq(
      StructField("a", StringType), StructField("b", StringType))),
      (1L to 30L).map(i => Row((i % 3).toString, (i % 4 % 3).toString)): _*),
      "kappa_in")
    val out = graft.ops.Agreement.cohenKappaDistributed(in, "a", "b")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(plan.contains("HashAggregate"), plan.take(800))
    graft.core.PersistScope.unpersistAll()
  }

  // ---------------------------- chat content parts (VERDICT item 7)

  private def partsConvDf: DataFrame = {
    val partT = StructType(Seq(
      StructField("type", StringType), StructField("text", StringType),
      StructField("ref", StringType))) // extra field: must survive
    val msgT = ArrayType(StructType(Seq(
      StructField("role", StringType),
      StructField("ts", LongType), // extra message field: must survive
      StructField("parts", ArrayType(partT)))))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("messages", msgT)))
    df(schema,
      Row(1L, Seq(
        Row("user", 10L, Seq(Row("text", "look at ", null),
          Row("image", "cat.png", "img://1"), Row("text", "please", null))),
        Row("assistant", 20L, Seq(Row("text", "a cat", null),
          Row("image", "box.png", "img://2"))))),
      Row(2L, Seq(
        Row("user", 30L, null), // NULL parts array
        Row("assistant", 40L, Seq(Row("text", "ok", null))))))
  }

  test("partsToContent flattens with placeholders and keeps extra fields") {
    val out = graft.ops.ChatOps.partsToContent(partsConvDf, "messages")
      .select("id", "messages_flat").collect()
      .map(r => r.getLong(0) -> r.getSeq[Row](1)).toMap
    val m1 = out(1L)
    assert(m1.map(_.getString(0)) == Seq("user", "assistant"))
    assert(m1.map(_.getLong(1)) == Seq(10L, 20L)) // ts survived
    val contentIdx = 3 // role, ts, parts, content (withField appends)
    assert(m1(0).getString(contentIdx) == "look at <image>please")
    assert(m1(1).getString(contentIdx) == "a cat<image>")
    // parts themselves survived, including the extra ref field
    assert(m1(0).getSeq[Row](2)(1).getString(2) == "img://1")
    // NULL parts → empty content, not a poisoned row
    assert(out(2L)(0).getString(contentIdx) == "")
  }

  test("renderPartsWithSpans masks only assistant TEXT parts") {
    val out = graft.ops.ChatOps.renderPartsWithSpans(partsConvDf,
      "messages").select("id", "text", "mask_spans").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getSeq[Row](2).map(sp => (sp.getLong(0), sp.getLong(1)))))
    val (_, text1, spans1) = out.find(_._1 == 1L).get
    val expected1 = "<|user|>\nlook at <image>please\n" +
      "<|assistant|>\na cat<image>\n"
    assert(text1 == expected1)
    // one span, covering exactly "a cat" (the image placeholder after
    // it is unmasked)
    assert(spans1.size == 1)
    val (s, e) = spans1.head
    assert(text1.substring(s.toInt, e.toInt) == "a cat")
    // doc 2: null user parts render as an empty body; assistant "ok"
    val (_, text2, spans2) = out.find(_._1 == 2L).get
    assert(text2 == "<|user|>\n\n<|assistant|>\nok\n")
    assert(spans2.size == 1 &&
      text2.substring(spans2.head._1.toInt, spans2.head._2.toInt) == "ok")
  }

  test("statsParts counts part types and text mass") {
    val r = graft.ops.ChatOps.statsParts(partsConvDf, "messages")
      .filter(col("id") === 1L).head()
    assert(r.getLong(r.fieldIndex("n_turns")) == 2L)
    assert(r.getLong(r.fieldIndex("n_text_parts")) == 3L)
    assert(r.getLong(r.fieldIndex("n_nontext_parts")) == 2L)
    assert(r.getLong(r.fieldIndex("n_image_parts")) == 2L)
    assert(r.getLong(r.fieldIndex("text_chars")) ==
      ("look at " + "please" + "a cat").length.toLong)
    val r2 = graft.ops.ChatOps.statsParts(partsConvDf, "messages")
      .filter(col("id") === 2L).head()
    assert(r2.getLong(r2.fieldIndex("n_text_parts")) == 1L)
    assert(r2.getLong(r2.fieldIndex("text_chars")) == 2L)
  }

  test("conversationParts pseudonymizes text parts only, numbering shared") {
    val partT = StructType(Seq(
      StructField("type", StringType), StructField("text", StringType)))
    val msgT = ArrayType(StructType(Seq(
      StructField("role", StringType),
      StructField("parts", ArrayType(partT)))))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("messages", msgT)))
    val in = df(schema, Row(1L, Seq(
      Row("user", Seq(Row("text", "mail bob@x.co and amy@y.org"),
        Row("image", "bob@x.co"))), // red herring: must stay raw
      Row("assistant", Seq(Row("text", "cc bob@x.co"))))))
    val out = graft.ops.Pseudonymize.conversationParts(in, "messages")
      .head()
    assert(out.getLong(out.fieldIndex("n_email_entities")) == 2L)
    val msgs = out.getSeq[Row](out.fieldIndex("messages_pseudo"))
    val uParts = msgs(0).getSeq[Row](1)
    assert(uParts(0).getString(1) == "mail EMAIL_2 and EMAIL_1")
    assert(uParts(1).getString(1) == "bob@x.co") // image untouched
    assert(msgs(1).getSeq[Row](1)(0).getString(1) == "cc EMAIL_2")
  }

  test("content-part YAML arms (parts: true)") {
    val d = partsConvDf
    val flat = graft.api.Registry("conversation_parts_flatten")(d,
      graft.api.Conf.fromYaml(
        "type: conversation_parts_flatten\nmessages_key: messages"), null)
    assert(flat.columns.contains("messages_flat"))
    val stats = graft.api.Registry("conversation_stats")(d,
      graft.api.Conf.fromYaml(
        "type: conversation_stats\nmessages_key: messages\nparts: true"),
      null)
    assert(stats.filter(col("id") === 1L).head()
      .getLong(stats.schema.fieldIndex("n_image_parts")) == 2L)
    val rendered = graft.api.Registry("chat_render")(d,
      graft.api.Conf.fromYaml(
        "type: chat_render\nmessages_key: messages\nparts: true"), null)
    assert(rendered.filter(col("id") === 2L).head()
      .getString(rendered.schema.fieldIndex("text"))
      == "<|user|>\n\n<|assistant|>\nok\n")
  }

  test("validateParts: part-level reasons before flat rules") {
    val partT = StructType(Seq(
      StructField("type", StringType), StructField("text", StringType)))
    val msgT = ArrayType(StructType(Seq(
      StructField("role", StringType),
      StructField("parts", ArrayType(partT)))))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("messages", msgT)))
    def m(role: String, parts: Seq[Row]) = Row(role, parts)
    val txt = Row("text", "hi")
    val in = df(schema,
      Row(1L, Seq(m("user", Seq(txt)), m("assistant", Seq(txt)))),
      Row(2L, Seq(m("user", Seq.empty), m("assistant", Seq(txt)))),
      Row(3L, Seq(m("user", Seq(Row("sticker", "x"))),
        m("assistant", Seq(txt)))),
      Row(4L, Seq(m("user", Seq(Row("text", ""))),
        m("assistant", Seq(txt)))),
      Row(5L, Seq.empty), // empty conversation: flat 'empty' wins
      Row(6L, Seq(m("assistant", Seq(txt))))) // flat alternation reason
    val out = graft.ops.ChatOps.validateParts(in, "messages")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(r.fieldIndex("conv_valid")),
          Option(r.getString(r.fieldIndex("conv_invalid_reason")))))
      .toMap
    assert(out(1L) == (true, None))
    assert(out(2L) == (false, Some("no_parts")))
    assert(out(3L) == (false, Some("unknown_part_type")))
    assert(out(4L) == (false, Some("empty_text_part")))
    assert(out(5L) == (false, Some("empty")))
    assert(out(6L) == (false, Some("bad_alternation")))
  }

  test("trimToBudget keeps the longest contiguous suffix plus system") {
    val msgT = ArrayType(StructType(Seq(
      StructField("role", StringType), StructField("content", StringType))))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("messages", msgT)))
    val in = df(schema, Row(1L, Seq(
      Row("system", "be terse"),          // 8 chars, always kept
      Row("user", "aaaaaaaaaa"),          // 10
      Row("assistant", "bbbbb"),          // 5
      Row("user", "cc"),                  // 2
      Row("assistant", "ddd"))))          // 3
    // budget 20: sys 8 + ddd 3 + cc 2 + bbbbb 5 = 18; +10 overflows
    val out = graft.ops.ChatOps.trimToBudget(in, "messages", budget = 20L)
      .head()
    val kept = out.getSeq[Row](out.fieldIndex("messages_trimmed"))
      .map(r => (r.getString(0), r.getString(1)))
    assert(kept == Seq(("system", "be terse"), ("assistant", "bbbbb"),
      ("user", "cc"), ("assistant", "ddd")))
    assert(out.getLong(out.fieldIndex("n_trimmed_turns")) == 1L)
    // contiguity: a tiny old turn cannot re-enter after an overflow
    val in2 = df(schema, Row(2L, Seq(
      Row("user", "x"),                   // 1 char, oldest — must NOT sneak in
      Row("user", "yyyyyyyyyyyy"),        // 12, overflows
      Row("assistant", "zzzzz"))))        // 5
    val out2 = graft.ops.ChatOps.trimToBudget(in2, "messages",
      budget = 6L).head()
    val kept2 = out2.getSeq[Row](out2.fieldIndex("messages_trimmed"))
      .map(_.getString(1))
    assert(kept2 == Seq("zzzzz"))
    // budget smaller than the system message: body all trimmed
    val out3 = graft.ops.ChatOps.trimToBudget(in, "messages",
      budget = 5L).head()
    assert(out3.getSeq[Row](out3.fieldIndex("messages_trimmed"))
      .map(_.getString(0)) == Seq("system"))
  }

  test("lsh plan: S-curve arithmetic and banding choice") {
    val plan = graft.dedup.LshPlan.choose(spark, 16, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(4))).sortBy(_._1)
    assert(plan.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L, 16L))
    // b=4, r=4: t* = (1/4)^(1/4) ≈ 0.7071; b=8, r=2: (1/8)^(1/2) ≈ .3536
    val t4 = plan.find(_._1 == 4L).get._3
    assert(math.abs(t4 - math.pow(0.25, 0.25)) < 1e-6)
    // closest to 0.5 is b=8 (|0.354-0.5|=.146 vs b=4 .207)
    assert(plan.filter(_._4).map(_._1).toSeq == Seq(8L))
    val curve = graft.dedup.LshPlan.curve(spark, 16, 8, Seq(0.2, 0.9))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // p(s) = 1-(1-s^2)^8
    assert(math.abs(curve(0.2) - (1 - math.pow(1 - 0.04, 8))) < 1e-6)
    assert(curve(0.9) > 0.99)
  }

  // ------------------------------ byte-level BPE (VERDICT item 4)

  test("gpt-2 byte alphabet matches the published bytes_to_unicode table") {
    val a = graft.ops.BpeTrain.ByteAlphabet
    assert(a.length == 256)
    assert(a('a'.toInt) == "a" && a('~'.toInt) == "~" && a('!'.toInt) == "!")
    assert(a(' '.toInt) == "Ġ") // space -> Ġ
    assert(a(0) == "Ā")         // NUL -> Ā (first remapped byte)
    assert(a('\n'.toInt) == "Ċ") // LF -> Ċ
    assert(a(0xa9) == "©")      // © is in the direct 161–172 range
    assert(a.distinct.length == 256) // bijective
    // multibyte UTF-8 decomposes to one symbol per BYTE
    assert(graft.ops.BpeTrain.byteSymbols("é") == Seq("Ã", "©"))
  }

  test("gpt-2 pretokenizer splits with leading spaces and contractions") {
    val docs = textsDf((1L, "the fast car's wheel, ok 42"))
    val toks = graft.ops.BpeTrain.pretokenCounts(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(toks == Map("the" -> 1L, " fast" -> 1L, " car" -> 1L,
      "'s" -> 1L, " wheel" -> 1L, "," -> 1L, " ok" -> 1L, " 42" -> 1L))
  }

  test("byte-level BPE trains hand-derivable merges") {
    val docs = textsDf((1L, "aa aa aa"), (2L, "aa aa aa"))
    // pretokens: "aa"×2, " aa"×4 → pairs (a,a)=6, (Ġ,a)=4;
    // merge1 (a,a,6) → vocab [aa]×2, [Ġ,a,a→ wait: [Ġ,aa]×4 →
    // merge2 (Ġ,aa,4); then nothing pairable → early stop at 2 merges
    val merges = graft.ops.BpeTrain.trainByteLevel(docs, "text", 3)
    assert(merges == Seq(
      graft.ops.BpeTrain.Merge("a", "a", 6L),
      graft.ops.BpeTrain.Merge("Ġ", "aa", 4L)))
    val enc = graft.ops.BpeTrain.encodeByteLevelGreedy(docs, "text",
      merges).head().getSeq[String](2)
    assert(enc == Seq("aa", "Ġaa", "Ġaa"))
  }

  test("byte-level greedy encode == sequential rank-order application") {
    val docs = docsDf.select(col("doc_id"),
      regexp_replace(col("text"), "[^ -~]", "").as("text"))
    val merges = graft.ops.BpeTrain.trainByteLevel(docs, "text", 8)
    assert(merges.nonEmpty)
    val greedy = graft.ops.BpeTrain.encodeByteLevelGreedy(docs, "text",
      merges).select("doc_id", "tokens").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // driver-side reference: apply each merge, in rank order, as a
    // left-to-right non-overlapping scan per pretoken
    def applySeq(syms: Vector[String], l: String, r: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.size) {
        if (i < syms.size - 1 && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    val pat = java.util.regex.Pattern.compile(
      graft.ops.BpeTrain.Gpt2PretokenRegex)
    docs.collect().foreach { row =>
      val m = pat.matcher(row.getString(1))
      val ref = Vector.newBuilder[String]
      while (m.find()) {
        var syms = graft.ops.BpeTrain.byteSymbols(m.group()).toVector
        merges.foreach(mg => syms = applySeq(syms, mg.left, mg.right))
        ref ++= syms
      }
      assert(greedy(row.getLong(0)) == ref.result(),
        s"doc ${row.getLong(0)}")
    }
  }

  test("byte-level BPE YAML arms (level: byte)") {
    val docs = textsDf((1L, "aa aa aa"), (2L, "aa aa aa"))
    val tbl = graft.api.Registry("bpe_train")(docs,
      graft.api.Conf.fromYaml(
        "type: bpe_train\ntext_key: text\nnum_merges: 3\nlevel: byte"),
      null)
    assert(tbl.collect().map(r => (r.getString(1), r.getString(2))).toSeq
      == Seq(("a", "a"), ("Ġ", "aa")))
    val enc = graft.api.Registry("bpe_encode")(docs,
      graft.api.Conf.fromYaml(
        "type: bpe_encode\ntext_key: text\nnum_merges: 2\nlevel: byte"),
      null)
    assert(enc.head().getSeq[String](2) ==
      Seq("aa", "Ġaa", "Ġaa"))
  }

  test("truncation curve matches the single-L report per grid point") {
    val d = docsDf
    val lens = Seq(3L, 6L, 100L)
    val curve = graft.ops.PackOp.truncationCurve(d,
      "size(split(text, ' '))", lens)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4)))
      .toMap
    lens.foreach { l =>
      val single = graft.ops.PackOp.truncationReport(d,
        "size(split(text, ' '))", l).head()
      assert(curve(l) == (single.getLong(1), single.getLong(3)),
        s"L=$l")
    }
    assert(curve(100L) == (0L, 0L)) // everything fits at 100
  }

  test("zipf report: hand-checkable counts and slope sign") {
    val d = textsDf(
      (1L, "the the the the cat cat dog unique1 unique2"),
      (2L, "the cat"))
    val r = graft.ops.CorpusStats.zipfReport(d, "text", topK = 10).head()
    // tokens: the×5, cat×3, dog×1, unique1×1, unique2×1 → 11 tokens,
    // 5 types, 3 hapax; top1_share = 5/11
    assert(r.getLong(0) == 11L && r.getLong(1) == 5L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 0.6)
    assert(r.getDouble(4) == math.rint(5.0 / 11 * 1e6) / 1e6)
    assert(r.getDouble(5) < 0.0) // frequencies decay with rank
  }

  test("topValues ranks with deterministic ties and counts nulls") {
    val schema = StructType(Seq(
      StructField("src", StringType), StructField("lang", StringType)))
    val in = df(schema,
      Row("a", "en"), Row("a", "en"), Row("b", "en"), Row("b", "de"),
      Row(null, "de"), Row("c", null))
    val out = graft.ops.Profile.topValues(in, Seq("src", "lang"), k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(4), r.getDouble(5)))
    val src = out.filter(_._1 == "src").sortBy(_._2)
    // counts: a=2, b=2, null=1, c=1 → ties break value-asc: a then b
    assert(src.map(t => (t._3, t._4)).toSeq == Seq(("a", 2L), ("b", 2L)))
    assert(src.head._5 == math.rint(2.0 / 6 * 1e6) / 1e6)
    val lang = out.filter(_._1 == "lang").sortBy(_._2)
    assert(lang.map(_._3).toSeq == Seq("en", "de"))
    // k exceeding cardinality: the "null" bucket appears
    val all = graft.ops.Profile.topValues(in, Seq("src"), k = 10)
      .collect().map(_.getString(2)).toSet
    assert(all == Set("a", "b", "c", "null"))
    graft.core.PersistScope.unpersistAll()
  }

  test("freshness report: ages, future rows, exact mean") {
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("ts", LongType)))
    val in = df(schema,
      Row("x", 100L), Row("x", 200L), Row("x", 1300L), // 1300 is future
      Row("y", 1000L))
    val out = graft.ops.TemporalOps.freshness(in, "ts",
      asOfMicros = 1200L, groupCols = Seq("g"))
      .collect().map(r => r.getString(0) -> r).toMap
    val x = out("x")
    assert(x.getLong(x.fieldIndex("n")) == 3L)
    assert(x.getLong(x.fieldIndex("n_future")) == 1L)
    assert(x.getLong(x.fieldIndex("age_min")) == -100L)
    assert(x.getLong(x.fieldIndex("age_max")) == 1100L)
    // mean of (1100, 1000, -100) = 2000/3
    assert(x.getDouble(x.fieldIndex("age_mean")) ==
      math.rint(2000.0 / 3 * 1e4) / 1e4)
    val y = out("y")
    assert(y.getLong(y.fieldIndex("n")) == 1L &&
      y.getLong(y.fieldIndex("age_min")) == 200L)
  }

  // --------------------------- code-review pass 2 regressions

  test("truncation curve reports every grid row on an EMPTY input") {
    val empty = docsDf.filter(col("doc_id") < 0)
    val out = graft.ops.PackOp.truncationCurve(empty,
      "size(split(text, ' '))", Seq(8L, 16L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.isNullAt(5))).sortBy(_._1).toSeq
    assert(out == Seq((8L, 0L, 0L, true), (16L, 0L, 0L, true)))
  }

  test("blocklist content keys are length-prefixed (no separator aliasing)") {
    // ["a<NUL>b"] and ["a", "b"] must NOT share an automaton: with a
    // NUL-separator digest both would hash identically and the second
    // scan would be served the first list's matcher
    val texts = textsDf((1L, "only a here"), (2L, "a\u0000b inside"))
    val r1 = graft.ops.Blocklist.report(texts, "text",
      phrasesDf(Seq("a\u0000b")), "phrase")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(r1 == Map(1L -> false, 2L -> true))
    val r2 = graft.ops.Blocklist.report(texts, "text",
      phrasesDf(Seq("a", "b")), "phrase")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(r2 == Map(1L -> true, 2L -> true))
  }

  test("zipf report handles degenerate corpora like its oracle guards") {
    // single distinct token: slope guard (den = 0) -> 0.0
    val one = textsDf((1L, "same same same"))
    val r = graft.ops.CorpusStats.zipfReport(one, "text").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L)
    assert(r.getDouble(5) == 0.0)
    // empty corpus: one row of zeros, no NaNs
    val r2 = graft.ops.CorpusStats.zipfReport(
      textsDf((1L, "")), "text").head()
    assert(r2.getLong(0) == 0L && r2.getDouble(3) == 0.0 &&
      r2.getDouble(5) == 0.0)
    graft.core.PersistScope.unpersistAll()
  }

  // --------------------------- code-review pass 1 regressions

  test("gpt-2 pretokenizer treats unicode whitespace as whitespace") {
    // NBSP must break the punctuation run (Python regex \s semantics),
    // not glue '.',NBSP,',' into one token (ASCII-\s Java default)
    val docs = textsDf((1L, "x. ,y"))
    val toks = graft.ops.BpeTrain.pretokenCounts(docs, "text")
      .collect().map(_.getString(0)).toSet
    assert(toks == Set("x", ".", " ", ",", "y"), toks.toString)
  }

  test("novelty keeps a NULL slice group's true counts (null-safe join)") {
    val schema = StructType(Seq(
      StructField("slice", StringType), StructField("text", StringType)))
    val cur = df(schema,
      Row(null, "alpha beta gamma delta"), // null slice WITH grams
      Row("s", "one two three"))
    val ref = df(schema, Row("r", "alpha beta gamma"))
    val out = graft.ops.Novelty.report(cur, "slice", "text", ref, "text",
      n = 3).collect()
      .map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out(None) == (2L, 1L), out.toString) // not zeroed out
    assert(out(Some("s")) == (1L, 1L))
  }

  test("blocklist automata are content-keyed: list swaps never serve stale matches") {
    val texts = textsDf((1L, "alpha beta"), (2L, "gamma"))
    val r1 = graft.ops.Blocklist.report(texts, "text",
      phrasesDf(Seq("alpha")), "phrase")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(r1 == Map(1L -> true, 2L -> false))
    // different list, same session: must match against ITS phrases
    val r2 = graft.ops.Blocklist.report(texts, "text",
      phrasesDf(Seq("gamma")), "phrase")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(r2 == Map(1L -> false, 2L -> true))
    // identical list again: cache-hit path still correct
    val r3 = graft.ops.Blocklist.report(texts, "text",
      phrasesDf(Seq("alpha")), "phrase")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(r3 == r1)
  }

  test("byte-level bpe_encode rejects greedy: false") {
    val docs = textsDf((1L, "aa aa"))
    val ex = intercept[IllegalArgumentException] {
      graft.api.Registry("bpe_encode")(docs, graft.api.Conf.fromYaml(
        "type: bpe_encode\ntext_key: text\nnum_merges: 1\nlevel: byte\n" +
          "greedy: false"), null)
    }
    assert(ex.getMessage.contains("greedy by definition"))
  }

  // ------------------ in-plan Cohen + Krippendorff (VERDICT items 5/6)

  test("distributed cohen kappa is bit-equal to the collect form") {
    val schema = StructType(Seq(
      StructField("a", StringType), StructField("b", StringType)))
    val in = df(schema,
      Row("x", "x"), Row("x", "y"), Row("y", "y"), Row("y", "y"),
      Row("z", "x"), // label z never appears on side b
      Row(null, "x"), Row("x", null)) // unlabeled rows excluded
    val collect = graft.ops.Agreement.cohenKappa(in, "a", "b").head()
    val dist = graft.ops.Agreement.cohenKappaDistributed(in, "a", "b")
    val d = dist.head()
    assert(d.getLong(0) == collect.getLong(0))
    assert(d.getDouble(1) == collect.getDouble(1))
    assert(d.getDouble(2) == collect.getDouble(2))
    assert(d.getDouble(3) == collect.getDouble(3))
    // genuinely in-plan: the result is an aggregation join, not a
    // driver-assembled LocalRelation
    val plan = dist.queryExecution.optimizedPlan.toString
    assert(plan.contains("Join"), plan.take(500))
    graft.core.PersistScope.unpersistAll()
  }

  test("krippendorff alpha: hand-computed ragged design") {
    val schema = StructType(Seq(
      StructField("item", LongType), StructField("label", StringType)))
    // i1: [a, a]; i2: [a, b, b]; i3: [b] (unpairable, excluded)
    val in = df(schema,
      Row(1L, "a"), Row(1L, "a"),
      Row(2L, "a"), Row(2L, "b"), Row(2L, "b"),
      Row(3L, "b"))
    val r = graft.ops.Agreement.krippendorffAlpha(in, "item", "label")
      .head()
    // A_obs = 2 + 1 = 3; n = 5; D_o = 0.4; n_c = (3, 2) →
    // D_e = (25 − 13)/20 = 0.6; α = 1 − 0.4/0.6 = 1/3
    assert(r.getLong(0) == 2L && r.getLong(1) == 5L)
    assert(r.getDouble(2) == 0.4)
    assert(r.getDouble(3) == 0.6)
    assert(r.getDouble(4) == 0.333333)
    // partitioning cannot move it (exact rationals)
    val r2 = graft.ops.Agreement.krippendorffAlpha(in.repartition(5),
      "item", "label").head()
    assert(r.toSeq == r2.toSeq)
  }

  test("krippendorff alpha tracks fleiss kappa on a constant-n design") {
    val schema = StructType(Seq(
      StructField("item", LongType), StructField("label", StringType)))
    val rows = (1L to 60L).flatMap { i =>
      val l1 = (i % 3).toString
      val l2 = if (i % 5 == 0) ((i % 3 + 1) % 3).toString else l1
      val l3 = if (i % 7 == 0) ((i % 3 + 2) % 3).toString else l1
      Seq(Row(i, l1), Row(i, l2), Row(i, l3))
    }
    val in = df(schema, rows: _*)
    val alpha = graft.ops.Agreement.krippendorffAlpha(in, "item", "label")
      .head().getDouble(4)
    val kappa = graft.ops.Agreement.fleissKappa(in, "item", "label")
      .head().getDouble(4)
    // nominal α and Fleiss κ agree asymptotically on constant-n designs
    // (α carries the small-sample (n−1) correction)
    assert(math.abs(alpha - kappa) < 0.02, s"alpha=$alpha kappa=$kappa")
    assert(alpha > 0.5 && alpha < 1.0)
  }

  test("krippendorff alpha degenerate cases") {
    val schema = StructType(Seq(
      StructField("item", LongType), StructField("label", StringType)))
    // every pairable value identical → D_e = 0 → α := 1
    val same = df(schema, Row(1L, "a"), Row(1L, "a"), Row(2L, "a"),
      Row(2L, "a"))
    val r = graft.ops.Agreement.krippendorffAlpha(same, "item", "label")
      .head()
    assert(r.getDouble(4) == 1.0 && r.getDouble(2) == 0.0)
    // nothing pairable → zeros, α := 1 by the D_e = 0 rule
    val single = df(schema, Row(1L, "a"), Row(2L, "b"))
    val r2 = graft.ops.Agreement.krippendorffAlpha(single, "item",
      "label").head()
    assert(r2.getLong(0) == 0L && r2.getLong(1) == 0L)
    assert(r2.getDouble(4) == 1.0)
  }

  // --------------------- split-leakage pair sharing (VERDICT item 2)

  test("split leakage shares ONE PassJoin across dedup + leakage + report") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("split", StringType)))
    val d = df(schema,
      Row(1L, "abcdefghij", "train"), Row(2L, "abcdefghijk", "test"),
      Row(3L, "abcdefghix", "train"), Row(4L, "zzzzzzzzzz", "test"),
      Row(5L, "qqqq", "train"), Row(6L, "qqqq", "test"))
    // materialize the single PassJoin; localCheckpoint truncates the
    // lineage, so a consumer plan REPEATING the candidate join would
    // be visible as levenshtein below (a .persist() handle works the
    // same operationally, but its InMemoryRelation rendering embeds
    // the cached plan, which this string assert could not see past)
    val ep = graft.dedup.EditDedup.pairs(d, "id", "s", t = 1)
      .localCheckpoint(true)
    val lp = graft.ops.SplitLeakage.pairs(d, "id", "split", ep)
    val direct = graft.ops.SplitLeakage.pairs(d, "id", "s", "split", 1)
      .collect().map(_.toSeq).toSet
    assert(lp.collect().map(_.toSeq).toSet == direct)
    assert(direct.map(r => (r(0), r(1))) == Set((1L, 2L), (5L, 6L)))
    // the overload plan must carry NO PassJoin machinery — only the
    // materialized pair handle plus the two label joins
    val plan = lp.queryExecution.optimizedPlan.toString
    assert(!plan.contains("levenshtein"), plan.take(800))
    assert(plan.contains("LogicalRDD"), plan.take(800))
    val rep = graft.ops.SplitLeakage.report(d, "id", "split", ep)
    val repPlan = rep.queryExecution.optimizedPlan.toString
    assert(!repPlan.contains("levenshtein"), repPlan.take(800))
    val r = rep.head()
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
      == ("test", "train", 2L, 4L))
    // matches the self-computing report
    val r2 = graft.ops.SplitLeakage.report(d, "id", "s", "split", 1).head()
    assert(r.toSeq == r2.toSeq)
    graft.core.PersistScope.unpersistAll()
  }

  test("split leakage YAML arm accepts a precomputed pairs dataset") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("split", StringType)))
    val d = df(schema,
      Row(1L, "abcdefghij", "train"), Row(2L, "abcdefghijk", "test"))
    val ep = graft.api.Registry("edit_pairs")(d, graft.api.Conf.fromYaml(
      "type: edit_pairs\nid_key: id\ntext_key: s\nthreshold: 1"), null)
    val ctx = graft.api.OpContext(spark, null, Map("ep" -> ep))
    val out = graft.api.Registry("split_leakage")(d,
      graft.api.Conf.fromYaml(
        "type: split_leakage\nmode: pairs\nid_key: id\nsplit_key: split\n" +
          "pairs_from: ep"), ctx)
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == Set((1L, 2L)))
  }

  test("blocklist YAML arm takes the phrase list as a dataset") {
    val texts = textsDf((1L, "buy now limited offer"), (2L, "plain text"))
    val phrases = phrasesDf(Seq("limited offer", "act fast"))
    val ctx = graft.api.OpContext(spark, null, Map("bl" -> phrases))
    val rep = graft.api.Registry("phrase_blocklist")(texts,
      graft.api.Conf.fromYaml(
        "type: phrase_blocklist\ntext_key: text\nreport: true\n" +
          "phrases_from: bl\nphrase_key: phrase"), ctx)
    assert(rep.filter(col("blocked")).count() == 1L)
    val filt = graft.api.Registry("phrase_blocklist")(texts,
      graft.api.Conf.fromYaml(
        "type: phrase_blocklist\ntext_key: text\n" +
          "phrases_from: bl\nphrase_key: phrase"), ctx)
    assert(filt.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }
}
