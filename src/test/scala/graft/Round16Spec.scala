package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-16 regressions: the config-reachable IVF arms of bitext
  * mining / hard negatives (VERDICT r15 items 1 and 7), the
  * docfreq-semi-join posting cap (item 2), q269/q270 plan pins
  * (item 5), and this round's advisor items. */
class Round16Spec extends SparkSpec {

  private def textsDf(rows: (Long, String)*): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    df(schema, rows.map { case (i, t) => Row(i, t) }: _*)
  }

  private val embSchema = StructType(Seq(StructField("id", LongType),
    StructField("e", ArrayType(FloatType)),
    StructField("label", StringType)))

  /** Two-cluster gaussian fixture (seeded) — 40 rows, 6 dims. */
  private def clusteredEmb: DataFrame = {
    val rng = new scala.util.Random(16)
    df(embSchema, (0 until 40).map { i =>
      val ctr = Array.fill(6)(if (i % 4 < 2) 1.0 else -1.0)
      Row(i.toLong, ctr.map(c =>
        (c + rng.nextGaussian() * 0.15).toFloat).toSeq,
        if (i % 3 == 0) "a" else "b")
    }: _*)
  }

  private def ctx(datasets: Map[String, DataFrame] = Map.empty) =
    graft.api.OpContext(spark, graft.llm.MockLlmClient(), datasets)

  private def rowsOf(d: DataFrame): Set[Seq[Any]] =
    d.collect().map(_.toSeq).toSet

  // ----------------- IVF arms reach the registry (VERDICT r15 item 1)

  test("bitext_mine method: ivf with full probes replays brute exactly") {
    val all = clusteredEmb
    val src = all.filter(col("id") % 2 === 0)
    val tgt = all.filter(col("id") % 2 === 1)
    val conf = (m: String) => graft.api.Conf.fromYaml(
      s"""type: bitext_mine
         |target_from: tgt
         |id_key: id
         |embedding_key: e
         |k: 3
         |threshold: 0.0
         |method: $m
         |n_cells: 2
         |n_probe: 2""".stripMargin)
    val c = ctx(Map("tgt" -> tgt))
    val brute = graft.api.Registry("bitext_mine")(src, conf("brute"), c)
    val ivf = graft.api.Registry("bitext_mine")(src, conf("ivf"), c)
    assert(rowsOf(ivf) == rowsOf(brute) && brute.count() > 0)
    // unknown method is a config error, not silent brute
    val bad = intercept[IllegalArgumentException] {
      graft.api.Registry("bitext_mine")(src, conf("lsh"), c)
    }
    assert(bad.getMessage.contains("brute|ivf"))
  }

  test("bitext ivf plan has no |src|x|tgt| exchange (cell equi-join)") {
    val all = clusteredEmb
    val plan = graft.ops.BitextMine.marginIvf(
      all.filter(col("id") % 2 === 0), "id", "e",
      all.filter(col("id") % 2 === 1), "id", "e",
      k = 3, threshold = 0.0, nCells = 2, nProbe = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("unified hard_negatives: embedding default, ivf parity, bm25 alias") {
    val emb = clusteredEmb
    val queries = emb.filter(col("id") < 8)
    val c = ctx(Map("corpus" -> emb))
    val embConf = (extra: String) => graft.api.Conf.fromYaml(
      s"""type: hard_negatives
         |corpus: corpus
         |id_key: id
         |embedding_key: e
         |label_key: label
         |k: 3
         |$extra""".stripMargin)
    val direct = graft.ann.Ann.hardNegatives(emb, "id", "e", "label",
      queries, "id", "e", "label", 3)
    val viaDefault = graft.api.Registry("hard_negatives")(
      queries, embConf("seed: 42"), c)
    assert(rowsOf(viaDefault) == rowsOf(direct) && direct.count() == 24)
    // the IVF arm with n_probe = n_cells is bit-identical
    val viaIvf = graft.api.Registry("hard_negatives")(queries,
      embConf("method: embedding_ivf\nn_cells: 2\nn_probe: 2"), c)
    assert(rowsOf(viaIvf) == rowsOf(direct))
    // bm25 routes through the SAME op (and the legacy alias agrees)
    val docs = textsDf((13L, "spark join window fast spark"),
      (26L, "window join slow"), (2L, "spark spark spark"),
      (3L, "nothing here"))
    val q = df(StructType(Seq(StructField("qid", LongType),
      StructField("qtext", StringType))), Row(1L, "spark join window"))
    val pos = df(StructType(Seq(StructField("qid", LongType),
      StructField("doc", LongType))), Row(1L, 13L))
    val bmConf = (tpe: String, m: String) => graft.api.Conf.fromYaml(
      s"""type: $tpe
         |qid_key: qid
         |qtext_key: qtext
         |positives_from: pos
         |pos_qid_key: qid
         |pos_doc_key: doc
         |corpus_from: docs
         |doc_id_key: id
         |text_key: text
         |negatives: 5
         |$m""".stripMargin)
    val c2 = ctx(Map("pos" -> pos, "docs" -> docs))
    val viaBm = graft.api.Registry("hard_negatives")(
      q, bmConf("hard_negatives", "method: bm25"), c2)
    val viaAlias = graft.api.Registry("hard_negatives_bm25")(
      q, bmConf("hard_negatives_bm25", ""), c2)
    val expect = Set(Seq[Any](1L, 26L, 1L, 1.43134),
      Seq[Any](1L, 2L, 2L, 1.10749))
    assert(rowsOf(viaBm) == expect && rowsOf(viaAlias) == expect)
  }

  // --------------- posting cap = docfreq filter (VERDICT r15 item 2)

  test("hard-negatives posting cap: no Window over _term, hot term gone") {
    // "spark" appears in 3 docs — over a cap of 2 it must stop
    // contributing; "join" (2 docs) survives with its FULL df
    val docs = textsDf((13L, "spark join window fast spark"),
      (26L, "window join slow"), (2L, "spark spark spark"),
      (4L, "spark alone"), (3L, "nothing here"))
    val q = df(StructType(Seq(StructField("qid", LongType),
      StructField("qtext", StringType))), Row(1L, "spark join window"))
    val noPos = df(StructType(Seq(StructField("qid", LongType),
      StructField("doc", LongType))))
    val capped = graft.ops.HardNegatives.mine(q, "qid", "qtext",
      noPos, "qid", "doc", docs, "id", "text", negPerQuery = 5,
      maxPostingSize = Some(2))
    val plan = capped.queryExecution.executedPlan.toString
    // the cap must NOT materialize a _term-partitioned window — the
    // hot keys it prunes would be that window's skewed partitions
    assert(!plan.contains("windowspecdefinition(_term"), plan.take(1500))
    val rows = capped.collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    // doc 4 ("spark alone") scores ONLY via spark -> no overlap left,
    // not a candidate; docs 13/26 rank on join+window alone
    assert(!rows.map(_._1).contains(4L))
    assert(rows.map(_._1).toSet == Set(13L, 26L))
    // uncapped agrees with the capped ranking's support superset
    val full = graft.ops.HardNegatives.mine(q, "qid", "qtext",
      noPos, "qid", "doc", docs, "id", "text", negPerQuery = 5)
    assert(full.collect().map(_.getLong(1)).toSet == Set(13L, 26L, 2L, 4L))
  }

  // --------------------------- plan pins (VERDICT r15 item 5)

  test("q269 shape: postings equi-join + WindowGroupLimit, no cartesian") {
    val docs = textsDf((13L, "spark join window fast spark"),
      (26L, "window join slow"), (2L, "spark spark spark"))
    val q = df(StructType(Seq(StructField("qid", LongType),
      StructField("qtext", StringType))), Row(1L, "spark join window"))
    val noPos = df(StructType(Seq(StructField("qid", LongType),
      StructField("doc", LongType))))
    val plan = graft.ops.HardNegatives.mine(q, "qid", "qtext",
      noPos, "qid", "doc", docs, "id", "text", negPerQuery = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(1200))
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
  }

  test("q270 shape: margin arithmetic is keyed joins over capped k-NN") {
    // the brute arm's k-NN is the documented broadcast cross; the
    // MARGIN stage on top must stay keyed-join + keyed-agg (no second
    // cross product, no cartesian anywhere)
    val all = clusteredEmb
    val plan = graft.ops.BitextMine.margin(
      all.filter(col("id") % 2 === 0), "id", "e",
      all.filter(col("id") % 2 === 1), "id", "e",
      k = 3, threshold = 0.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  // ------------------------------------------------ advisor items

  test("tool names with control characters still render valid JSON") {
    val partT = StructType(Seq(StructField("id", StringType),
      StructField("name", StringType), StructField("arguments", StringType)))
    val msgT = StructType(Seq(StructField("role", StringType),
      StructField("content", StringType),
      StructField("tool_calls", ArrayType(partT)),
      StructField("tool_call_id", StringType)))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("messages", ArrayType(msgT))))
    val in = df(schema, Row(1L, Seq(
      Row("user", "q", Seq.empty[Row], null),
      Row("assistant", "", Seq(Row("a", "get\nx\ty\u0001z", "{\"k\":1}")), null),
      Row("tool", "r", Seq.empty[Row], "a"),
      Row("assistant", "done", Seq.empty[Row], null))))
    val text = graft.ops.ChatOps.renderTools(in, "messages")
      .select("text").collect().head.getString(0)
    val body = text.substring(text.indexOf("<tool_call>") + 11,
      text.indexOf("</tool_call>"))
    // \n and \t JSON-escape; the unprintable \u0001 strips
    assert(body.contains("\"get\\nx\\ty" + "z\""), body)
    // the block parses as JSON with the name intact
    val parsed = spark.range(1).select(from_json(lit(body),
      StructType(Seq(StructField("name", StringType)))).getField("name"))
      .collect().head.getString(0)
    assert(parsed == "get\nx\tyz")
  }

  test("preference_render parts arm honors custom placeholders") {
    val partT = StructType(Seq(
      StructField("type", StringType), StructField("text", StringType)))
    val msgT = ArrayType(StructType(Seq(
      StructField("role", StringType),
      StructField("parts", ArrayType(partT)))))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("messages_chosen", msgT),
      StructField("messages_rejected", msgT)))
    val in = df(schema, Row(1L,
      Seq(Row("user", Seq(Row("image", "x.png"), Row("text", "hi"))),
        Row("assistant", Seq(Row("text", "yo")))),
      Seq(Row("user", Seq(Row("image", "x.png"), Row("text", "hi"))),
        Row("assistant", Seq(Row("text", "nah"))))))
    val conf = graft.api.Conf.fromYaml(
      """type: preference_render
        |parts: true
        |placeholders:
        |  image: "<CUSTOM_IMG>"""".stripMargin)
    val out = graft.api.Registry("preference_render")(in, conf, ctx())
      .select("text_chosen", "text_rejected").collect().head
    assert(out.getString(0).contains("<CUSTOM_IMG>"), out.getString(0))
    assert(out.getString(1).contains("<CUSTOM_IMG>"))
    // and it matches the library call with the same placeholders
    val direct = graft.ops.Preference.renderPairParts(in,
      "messages_chosen", "messages_rejected",
      placeholders = Map("image" -> "<CUSTOM_IMG>"))
      .select("text_chosen", "text_rejected").collect().head
    assert(out.getString(0) == direct.getString(0))
  }

  test("LazyFrame wordpieceEncode serializes vocab_from + merges_per_round") {
    val lf = graft.api.LazyFrame.read("d", "/tmp/nowhere.parquet")
    val withVocab = lf.wordpieceEncode("text", vocabFrom = Some("vtab"),
      mergesPerRound = 3).toYaml
    assert(withVocab.contains("vocab_from: vtab"), withVocab)
    assert(withVocab.contains("merges_per_round: 3"), withVocab)
    // absent option -> key ABSENT (registry dispatches on presence)
    val without = lf.wordpieceEncode("text").toYaml
    assert(!without.contains("vocab_from"), without)
  }

  // ------------- tokenizer golden parity (VERDICT r15 item 4)

  test("wordpiece MaxMatch replays the published BERT docstring example") {
    // google-research/bert tokenization.py (WordpieceTokenizer docstring):
    //   input = "unaffable", vocab ⊇ {un, ##aff, ##able}
    //   output = ["un", "##aff", "##able"]
    val vocabSchema = StructType(Seq(StructField("piece", StringType)))
    def vocabOf(ps: String*) = df(vocabSchema, ps.map(Row(_)): _*)
    val in = textsDf((1L, "unaffable"))
    val out = graft.ops.WordPiece.encode(in, "text",
      vocabOf("un", "##aff", "##able"))
      .select("pieces", "decoded", "n_unk").collect().head
    assert(out.getSeq[String](0) == Seq("un", "##aff", "##able"))
    assert(out.getString(1) == "unaffable" && out.getLong(2) == 0L)
    // greedy longest-match-first is the PUBLISHED rule even where a
    // shorter first piece would let the rest segment more coarsely:
    // "una" wins the first match, the tail then segments char-wise
    val greedy = graft.ops.WordPiece.encode(in, "text",
      vocabOf("un", "una", "##affable",
        "##f", "##a", "##b", "##l", "##e"))
      .select("pieces").collect().head.getSeq[String](0)
    assert(greedy == Seq("una", "##f", "##f", "##a", "##b", "##l", "##e"))
    // any unmatchable remainder collapses the WHOLE word to [UNK]
    // (never a partial piece list), and maxChars pre-empts matching
    val unkOut = graft.ops.WordPiece.encode(
      textsDf((1L, "unaffable xyq")), "text",
      vocabOf("un", "##aff", "##able", "x", "##y"))
      .select("pieces", "n_unk").collect().head
    assert(unkOut.getSeq[String](0) ==
      Seq("un", "##aff", "##able", "[UNK]"))
    assert(unkOut.getLong(1) == 1L)
    val longWord = "a" * 101
    val capped = graft.ops.WordPiece.encode(
      textsDf((1L, longWord)), "text", vocabOf("a", "##a"))
      .select("pieces").collect().head.getSeq[String](0)
    assert(capped == Seq("[UNK]"))
  }

  test("unigram Viterbi is brute-force segmentation-optimal; ties -> longer") {
    // exhaustive-DP agreement on every word: the published SentencePiece
    // Viterbi contract (argmax Σ logp over all segmentations)
    val logps = Map("a" -> -1.5, "b" -> -1.2, "c" -> -1.9,
      "ab" -> -2.0, "bc" -> -2.4, "abc" -> -4.6, "cab" -> -3.1,
      "abca" -> -5.0)
    val m = new java.util.HashMap[String, java.lang.Double]
    logps.foreach { case (k, v) => m.put(k, v) }
    val unk = -20.0
    def bestScore(w: String): Double = {
      val n = w.length
      val dp = Array.fill(n + 1)(Double.NegativeInfinity)
      dp(0) = 0.0
      for (j <- 1 to n; l <- 1 to math.min(4, j)) {
        val p = w.substring(j - l, j)
        val lp = logps.get(p).orElse(
          if (l == 1) Some(unk) else None)
        lp.foreach(s => dp(j) = math.max(dp(j), dp(j - l) + s))
      }
      dp(n)
    }
    for (w <- Seq("abc", "abcab", "cababc", "abcabca", "aaxbc", "cabab")) {
      val pieces = graft.ops.UnigramLm.viterbi(w, m, 4, unk)
      assert(pieces.mkString == w, s"$w round-trip")
      val score = pieces.map(p =>
        logps.getOrElse(p, unk)).sum
      assert(math.abs(score - bestScore(w)) < 1e-12,
        s"$w: ${pieces.mkString("+")} scored $score != ${bestScore(w)}")
    }
    // documented tie rule: equal total score -> the LONGER piece wins
    // (xy at -2.0 exactly ties x+y = -1.0 + -1.0)
    val tie = new java.util.HashMap[String, java.lang.Double]
    tie.put("x", -1.0); tie.put("y", -1.0); tie.put("xy", -2.0)
    assert(graft.ops.UnigramLm.viterbi("xy", tie, 4, -20.0).toSeq ==
      Seq("xy"))
    // char fallback: a vocab-absent char segments as itself at unk cost
    assert(graft.ops.UnigramLm.viterbi("xqy", tie, 4, -20.0).toSeq ==
      Seq("x", "q", "y"))
  }

  // ------------------- tool-call preference pairs (VERDICT r15 item 8)

  private val toolCallT = StructType(Seq(StructField("id", StringType),
    StructField("name", StringType), StructField("arguments", StringType)))
  private val toolMsgT = StructType(Seq(StructField("role", StringType),
    StructField("content", StringType),
    StructField("tool_calls", ArrayType(toolCallT)),
    StructField("tool_call_id", StringType)))

  private def tm(role: String, content: String,
      calls: Seq[(String, String, String)] = Nil,
      tid: String = null): Row =
    Row(role, content,
      if (calls.isEmpty) Seq.empty[Row]
      else calls.map { case (i, n, a) => Row(i, n, a) }, tid)

  private def toolPair(chosen: Seq[Row], rejected: Seq[Row]): DataFrame = {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("messages_chosen", ArrayType(toolMsgT)),
      StructField("messages_rejected", ArrayType(toolMsgT))))
    df(schema, Row(1L, chosen, rejected))
  }

  test("tools-DPO validate: reason priority and call-id prefix signal") {
    def reasonOf(d: DataFrame): Option[String] =
      Option(graft.ops.Preference.validatePairsTools(d,
        "messages_chosen", "messages_rejected")
        .select("pair_invalid_reason").collect().head.getString(0))
    val prefix = Seq(tm("user", "q"),
      tm("assistant", "", calls = Seq(("c1", "search", "{}"))),
      tm("tool", "r", tid = "c1"))
    // divergent final text -> valid
    assert(reasonOf(toolPair(prefix :+ tm("assistant", "yes"),
      prefix :+ tm("assistant", "no"))).isEmpty)
    // identical final turns -> identical_responses
    assert(reasonOf(toolPair(prefix :+ tm("assistant", "yes"),
      prefix :+ tm("assistant", "yes")))
      .contains("identical_responses"))
    // rejected ends on an unanswered call -> side reason, prefixed
    assert(reasonOf(toolPair(prefix :+ tm("assistant", "yes"),
      prefix :+ tm("assistant", "yes",
        calls = Seq(("c2", "search", "{}")))))
      .contains("rejected_unanswered_tool_calls"))
    // prefix traces differing ONLY in call id (tool tid follows) ->
    // prefix_mismatch even though a render prints them identically
    val prefixAltId = Seq(tm("user", "q"),
      tm("assistant", "", calls = Seq(("c9", "search", "{}"))),
      tm("tool", "r", tid = "c9"))
    assert(reasonOf(toolPair(prefix :+ tm("assistant", "yes"),
      prefixAltId :+ tm("assistant", "no")))
      .contains("prefix_mismatch"))
    // ... and differing only in ARGUMENTS likewise
    val prefixAltArgs = Seq(tm("user", "q"),
      tm("assistant", "", calls = Seq(("c1", "search", "{\"k\":2}"))),
      tm("tool", "r", tid = "c1"))
    assert(reasonOf(toolPair(prefix :+ tm("assistant", "yes"),
      prefixAltArgs :+ tm("assistant", "no")))
      .contains("prefix_mismatch"))
  }

  test("tools-DPO render: call blocks in masked bodies, diverge_at exact") {
    val prefix = Seq(tm("user", "q"),
      tm("assistant", "", calls = Seq(("c1", "get", "{\"k\":1}"))),
      tm("tool", "r", tid = "c1"))
    val out = graft.ops.Preference.renderPairTools(
      toolPair(prefix :+ tm("assistant", "yes"),
        prefix :+ tm("assistant", "no")),
      "messages_chosen", "messages_rejected")
      .select("text_chosen", "text_rejected", "diverge_at",
        "mask_spans_chosen").collect().head
    val block = "\n<tool_call>{\"name\": \"get\", " +
      "\"arguments\": {\"k\":1}}</tool_call>"
    val pre = "<|user|>\nq\n" + "<|assistant|>\n" + block + "\n" +
      "<|tool|>\n<tool_response>\nr\n</tool_response>\n" +
      "<|assistant|>\n"
    assert(out.getString(0) == pre + "yes\n", out.getString(0))
    assert(out.getString(1) == pre + "no\n")
    assert(out.getLong(2) == pre.length.toLong)
    // the first mask span covers the call block (the model must learn
    // to emit it); the tool response is never masked
    val spans = out.getSeq[Row](3).map(r => (r.getLong(0), r.getLong(1)))
    val asst1Start = "<|user|>\nq\n<|assistant|>\n".length.toLong
    assert(spans.head == ((asst1Start, asst1Start + block.length)))
    assert(spans.last == ((pre.length.toLong, pre.length + 3L)))
  }

  test("preference_validate/render tools: true registry arms dispatch") {
    val prefix = Seq(tm("user", "q"),
      tm("assistant", "", calls = Seq(("c1", "get", "{}"))),
      tm("tool", "r", tid = "c1"))
    val in = toolPair(prefix :+ tm("assistant", "yes"),
      prefix :+ tm("assistant", "no"))
    val v = graft.api.Registry("preference_validate")(in,
      graft.api.Conf.fromYaml("type: preference_validate\ntools: true"),
      ctx())
    assert(v.select("pair_valid").collect().head.getBoolean(0))
    val r = graft.api.Registry("preference_render")(in,
      graft.api.Conf.fromYaml("type: preference_render\ntools: true"),
      ctx())
    val direct = graft.ops.Preference.renderPairTools(in,
      "messages_chosen", "messages_rejected")
    assert(r.select("text_chosen", "diverge_at").collect().head ==
      direct.select("text_chosen", "diverge_at").collect().head)
  }

  // ---------------- l-diversity + embedding decontamination (depth)

  test("l-diversity report and worklist are hand-exact; NULL is a value") {
    val schema = StructType(Seq(StructField("zip", StringType),
      StructField("age", LongType), StructField("disease", StringType)))
    val d = df(schema,
      Row("94110", 30L, "flu"), Row("94110", 30L, "flu"),
      Row("94110", 30L, "flu"),                    // class A: 3 rows, 1 value
      Row("94110", 31L, "flu"), Row("94110", 31L, "cold"),
      Row("94110", 31L, null),                     // class B: 3 rows, 3 values
      Row("02139", 40L, "flu"), Row("02139", 40L, "cold")) // C: 2 rows, 2
    val r = graft.ops.Profile.lDiversity(d, Seq("zip", "age"),
      "disease", l = 3).collect().head
    // (l, n_rows, n_classes, n_rows_below_l, n_classes_below_l,
    //  min_distinct, frac)
    assert(r.getLong(0) == 3L && r.getLong(1) == 8L && r.getLong(2) == 3L)
    assert(r.getLong(3) == 5L && r.getLong(4) == 2L && r.getLong(5) == 1L)
    assert(r.getDouble(6) == 0.625)
    val g = graft.ops.Profile.lDiversityGroups(d, Seq("zip", "age"),
      "disease", l = 3, limit = 10).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // largest first: class A (3 rows, 1 distinct), then C (2 rows, 2)
    assert(g.toSeq == Seq(("94110", 30L, 3L, 1L), ("02139", 40L, 2L, 2L)))
    // the sensitive column cannot double as a quasi-identifier
    val bad = intercept[IllegalArgumentException] {
      graft.ops.Profile.lDiversity(d, Seq("zip", "disease"), "disease", 3)
    }
    assert(bad.getMessage.contains("sensitive"))
    // registry dispatch: report + groups arms
    val viaReg = graft.api.Registry("l_diversity")(d, graft.api.Conf.fromYaml(
      "type: l_diversity\ncolumns: [zip, age]\nsensitive_key: disease\nl: 3"),
      ctx()).collect().head
    assert(viaReg == r)
  }

  test("entropy l-diversity catches the skewed class distinct-l passes") {
    val schema = StructType(Seq(StructField("zip", StringType),
      StructField("disease", StringType)))
    // class A: {flu: 99, cold: 1} — 2 distinct values (passes distinct
    // l=2) but entropy = 0.99·ln(100/99) + 0.01·ln(100) ≈ 0.056 nats,
    // far under ln(2) (the paper's motivating blind spot);
    // class B: {flu: 2, cold: 2} — entropy exactly ln(2), passes
    val rows = Seq.fill(99)(Row("94110", "flu")) ++ Seq(Row("94110", "cold")) ++
      Seq(Row("02139", "flu"), Row("02139", "flu"),
        Row("02139", "cold"), Row("02139", "cold"))
    val d = df(schema, rows: _*)
    val distinctR = graft.ops.Profile.lDiversity(d, Seq("zip"),
      "disease", l = 2).collect().head
    assert(distinctR.getLong(4) == 0L) // both classes pass distinct-l
    val r = graft.ops.Profile.lDiversityEntropy(d, Seq("zip"),
      "disease", l = 2).collect().head
    // (l, entropy_bar, n_rows, n_classes, n_rows_below,
    //  n_classes_below, min_entropy, frac)
    assert(r.getLong(0) == 2L && r.getDouble(1) == 0.693147)
    assert(r.getLong(2) == 104L && r.getLong(3) == 2L)
    assert(r.getLong(4) == 100L && r.getLong(5) == 1L) // A fails
    // hand-exact micro-nat sum for class A:
    // round(0.99*ln(100/99)*1e6) + round(0.01*ln(100)*1e6)
    val expectA = (math.round(0.99 * math.log(100.0 / 99) * 1e6) +
      math.round(0.01 * math.log(100.0) * 1e6)).toDouble / 1e6
    assert(r.getDouble(6) == graft.core.Num.rnd6(expectA))
    // registry entropy mode dispatches
    val viaReg = graft.api.Registry("l_diversity")(d, graft.api.Conf.fromYaml(
      "type: l_diversity\ncolumns: [zip]\nsensitive_key: disease\n" +
        "l: 2\nmode: entropy"), ctx()).collect().head
    assert(viaReg == r)
  }

  test("rouge-L: LCS hand-exact, order-sensitive where ROUGE-N is not") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("cand", StringType), StructField("ref", StringType)))
    val d = df(schema,
      Row(1L, "a c e", "a b c d e"),          // classic: LCS 3
      Row(2L, "e d c b a", "a b c d e"),      // reversed: LCS 1
      Row(3L, "a b c", "a b c"),              // identical: LCS 3
      Row(4L, "", "a b"),                     // empty cand: zeros
      Row(5L, null, "a b"))                   // null cand: zeros
    val out = graft.ops.TextSim.rougeL(d, Seq("id"), "cand", "ref")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(out(1L) == ((3L, 5L, 3L, 1.0, 0.6, 0.75)))
    assert(out(2L) == ((5L, 5L, 1L, 0.2, 0.2, 0.2)))
    assert(out(3L) == ((3L, 3L, 3L, 1.0, 1.0, 1.0)))
    assert(out(4L) == ((0L, 2L, 0L, 0.0, 0.0, 0.0)))
    assert(out(5L) == ((0L, 2L, 0L, 0.0, 0.0, 0.0)))
    // the reversal that keeps ROUGE-1 at 1.0 drops ROUGE-L to 0.2 —
    // the order sensitivity that motivates the second metric
    val n1 = graft.ops.TextSim.ngramF1(d.filter(col("id") === 2),
      Seq("id"), "cand", "ref", 1).collect().head
    assert(n1.getAs[Double]("f1") == 1.0)
    // lcsLen unit edges: one side empty, no common symbols
    assert(graft.ops.TextSim.lcsLen(Array.empty, Array("a")) == 0)
    assert(graft.ops.TextSim.lcsLen(Array("x"), Array("y")) == 0)
  }

  test("chrF: hand-exact orders, whitespace stripped, beta recall weight") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("cand", StringType), StructField("ref", StringType)))
    val d = df(schema,
      Row(1L, "abc", "abc"),       // identical: chrf 1.0
      Row(2L, "ab", "abab"),       // P = 1 at both orders, R = (1/2, 1/3)
      Row(3L, "a b", "ab"),        // whitespace strips -> identical
      Row(4L, "", "ab"),           // empty cand: 0.0
      Row(5L, "xy", "ab"))         // zero overlap: 0.0
    val out = graft.ops.TextSim.chrF(d, Seq("id"), "cand", "ref",
      maxN = 2, beta = 2.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 1.0 && out(3L) == 1.0)
    assert(out(4L) == 0.0 && out(5L) == 0.0)
    // id 2 by hand: P1 = P2 = 1 -> chrP = 1; R micro = round(1e6/2) +
    // round(1e6/3) over 2 orders; chrf = 5·chrP·chrR/(4·chrP + chrR)
    val chrR = (500000L + 333333L).toDouble / 2e6
    val expect = graft.core.Num.rnd6(5.0 * chrR / (4.0 + chrR))
    assert(out(2L) == expect, s"${out(2L)} vs $expect")
    // registry arm dispatches with the knobs
    val viaReg = graft.api.Registry("chrf")(d, graft.api.Conf.fromYaml(
      "type: chrf\nid_keys: [id]\ncandidate_key: cand\n" +
        "reference_key: ref\nmax_n: 2\nbeta: 2.0"), ctx())
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaReg == out)
  }

  test("bleu: clipped precisions, brevity penalty, unsmoothed zeros") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("cand", StringType), StructField("ref", StringType)))
    val d = df(schema,
      Row(1L, "a b c d", "a b c d"),   // identical: 1.0
      Row(2L, "a b c", "a b c d"),     // prefix: BLEU = BP = exp(-1/3)
      Row(3L, "a c", "a b c"),         // unmatched bigram: 0 (unsmoothed)
      Row(4L, "a b c d e", "a b c"),   // long cand: BP = 1, p = (3/5, 2/4)
      Row(5L, "", "a b"))              // empty cand: 0
    val out = graft.ops.TextSim.bleu(d, Seq("id"), "cand", "ref", maxN = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 1.0)
    assert(out(2L) == graft.core.Num.rnd6(math.exp(1.0 - 4.0 / 3)))
    assert(out(3L) == 0.0 && out(5L) == 0.0)
    val sln = math.round(math.log(3.0 / 5) * 1e6) +
      math.round(math.log(2.0 / 4) * 1e6)
    assert(out(4L) == graft.core.Num.rnd6(math.exp(sln / 2e6)))
    // registry arm dispatches
    val viaReg = graft.api.Registry("bleu")(d, graft.api.Conf.fromYaml(
      "type: bleu\nid_keys: [id]\ncandidate_key: cand\n" +
        "reference_key: ref\nmax_n: 2"), ctx())
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(viaReg == out)
  }

  test("unimax water-filling: caps, uniform suffix, unallocated surfaced") {
    val schema = StructType(Seq(StructField("domain", StringType),
      StructField("n", LongType)))
    // counts: a=2, b=10, c=10; maxEpochs=2 -> caps 4, 20, 20
    val d = df(schema, Row("a", 2L), Row("b", 10L), Row("c", 10L),
      Row(null, 99L)) // null domains are excluded (apportion rule)
    // budget 24: a capped at 4; remaining 20 splits 10/10 over b, c
    val r1 = graft.ops.MixtureSolver.unimax(d, "domain", "n", 24L, 2)
      .collect().map(x => (x.getString(0), x.getLong(3), x.getLong(5)))
    assert(r1.toSet == Set(("a", 4L, 0L), ("b", 10L, 0L), ("c", 10L, 0L)))
    // budget 50 > total cap 44: everyone caps, 6 unallocated — loud
    val r2 = graft.ops.MixtureSolver.unimax(d, "domain", "n", 50L, 2)
      .collect().map(x => (x.getString(0), x.getLong(3), x.getLong(5)))
    assert(r2.toSet == Set(("a", 4L, 6L), ("b", 20L, 6L), ("c", 20L, 6L)))
    // uncapped uniform: budget 9 over three -> floor shares 3/3/3,
    // epochs exact to 6dp
    val r3 = graft.ops.MixtureSolver.unimax(d, "domain", "n", 9L, 2)
      .collect().map(x => (x.getString(0), x.getLong(3), x.getDouble(4)))
      .sortBy(_._1)
    assert(r3.toSeq == Seq(("a", 3L, 1.5), ("b", 3L, 0.3), ("c", 3L, 0.3)))
    // a positive budget over NO domains has no row to carry
    // unallocated — loud, not a silent empty frame
    val allNull = df(schema, Row(null, 5L))
    val e = intercept[IllegalArgumentException] {
      graft.ops.MixtureSolver.unimax(allNull, "domain", "n", 10L, 2)
    }
    assert(e.getMessage.contains("no non-null domains"))
    assert(graft.ops.MixtureSolver.unimax(allNull, "domain", "n", 0L, 2)
      .count() == 0L)
  }

  test("embedding decontamination: broadcast kernel, ties, clean arm") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("e", ArrayType(FloatType))))
    def v(id: Long, xs: Double*) = Row(id, xs.map(_.toFloat))
    val corpus = df(schema,
      v(1L, 1, 0), v(2L, 0.8, 0.6), v(3L, 0, 1), v(4L, -1, 0))
    val bench = df(schema, v(10L, 1, 0), v(20L, 0, 1), v(30L, 1, 0))
    val hits = graft.dedup.Decontaminate.embeddingHits(
      corpus, "id", "e", bench, "id", "e", threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    // id 1: ties 10/30 at 1.0 -> SMALLER bench id wins; id 2: 0.8 to 10
    // (30 ties, 10 first); id 3: 1.0 to 20; id 4: best is -1.0, no hit
    assert(hits.toSeq == Seq((1L, 10L, 1.0), (2L, 10L, 0.8),
      (3L, 20L, 1.0)))
    val cleaned = graft.dedup.Decontaminate.embeddingClean(
      corpus, "id", "e", bench, "id", "e", threshold = 0.6)
      .collect().map(_.getLong(0)).toSet
    assert(cleaned == Set(4L))
    // null/zero-norm rows never match, on either side
    val weird = df(schema, Row(5L, null), v(6L, 0, 0), v(7L, 1, 0))
    val h2 = graft.dedup.Decontaminate.embeddingHits(
      weird, "id", "e", bench, "id", "e", threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(h2 == Set(7L))
    // registry embedding arm dispatches with benchmark keys
    val viaReg = graft.api.Registry("decontaminate")(corpus,
      graft.api.Conf.fromYaml(
        """type: decontaminate
          |benchmark: bench
          |method: embedding
          |id_key: id
          |embedding_key: e
          |threshold: 0.6
          |mode: hits""".stripMargin),
      ctx(Map("bench" -> bench)))
    assert(viaReg.count() == 3L)
  }

  // --------------------------- code-review fixes (round 16)

  test("IVF arms: empty sides return empty frames like the brute arms") {
    val all = clusteredEmb
    val none = all.filter(col("id") < 0)
    val m = graft.ops.BitextMine.marginIvf(none, "id", "e",
      all, "id", "e", k = 2, threshold = 0.0, nCells = 2, nProbe = 2)
    assert(m.count() == 0L)
    assert(m.columns.toSeq == Seq("src_id", "tgt_id", "score", "margin"))
    val h = graft.ann.Ann.hardNegativesIvf(all, "id", "e", "label",
      none, "id", "e", "label", k = 2, nCells = 2, nProbe = 2)
    assert(h.count() == 0L)
    assert(h.columns.toSeq == Seq("query_id", "neighbor_id", "score"))
    // and the shuffle-join (non-broadcast) arms still replay exactly:
    // ivfSearch with broadcastQueries = false is bit-identical
    val queries = all.filter(col("id") < 8)
    val cent = graft.ann.Ann.trainCentroids(all, "e", 2)
    val assigned = graft.ann.Ann.ivfAssign(all, "e", cent)
    val bcTrue = graft.ann.Ann.ivfSearch(assigned, "id", "e",
      queries, "id", "e", cent, k = 3, nProbe = 2).collect().toSet
    val bcFalse = graft.ann.Ann.ivfSearch(assigned, "id", "e",
      queries, "id", "e", cent, k = 3, nProbe = 2,
      broadcastQueries = false).collect().toSet
    assert(bcTrue == bcFalse && bcTrue.nonEmpty)
  }

  test("embedding decontamination fails LOUD on unusable benchmarks") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("e", ArrayType(FloatType))))
    val corpus = df(schema, Row(1L, Seq(1f, 0f)))
    // all-null benchmark: must throw, never silently match nothing
    val nullBench = df(schema, Row(10L, null), Row(20L, null))
    val e1 = intercept[IllegalArgumentException] {
      graft.dedup.Decontaminate.embeddingHits(
        corpus, "id", "e", nullBench, "id", "e", 0.5).collect()
    }
    assert(e1.getMessage.contains("no usable"))
    // zero-norm-only benchmark: same
    val zeroBench = df(schema, Row(10L, Seq(0f, 0f)))
    val e2 = intercept[IllegalArgumentException] {
      graft.dedup.Decontaminate.embeddingHits(
        corpus, "id", "e", zeroBench, "id", "e", 0.5).collect()
    }
    assert(e2.getMessage.contains("no usable"))
    // corpus/benchmark dimension mismatch: wrong encoder — throw
    val bench3 = df(schema, Row(10L, Seq(1f, 0f, 0f)))
    val e3 = intercept[Exception] {
      graft.dedup.Decontaminate.embeddingHits(
        corpus, "id", "e", bench3, "id", "e", 0.5).collect()
    }
    // the throw happens executor-side — search the cause chain
    val msgs = Iterator.iterate[Throwable](e3)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("|")
    assert(msgs.contains("dimension"), msgs.take(300))
  }

  test("preference ops reject contradictory parts+tools flags") {
    val in = spark.range(1).toDF("id")
    for (op <- Seq("preference_validate", "preference_render")) {
      val e = intercept[IllegalArgumentException] {
        graft.api.Registry(op)(in, graft.api.Conf.fromYaml(
          s"type: $op\nparts: true\ntools: true"), ctx())
      }
      assert(e.getMessage.contains("mutually exclusive"), op)
    }
  }

  test("round-16 surfaces run end-to-end from user YAML") {
    val dir = java.nio.file.Files.createTempDirectory("graft16").toString
    val all = clusteredEmb
    all.write.mode("overwrite").parquet(s"$dir/all.parquet")
    all.filter(col("id") % 2 === 1).write.mode("overwrite")
      .parquet(s"$dir/odd.parquet")
    all.filter(col("id") % 10 === 0).write.mode("overwrite")
      .parquet(s"$dir/bench.parquet")
    // bitext_mine method: ivf — exactly the YAML a user would ship
    val mined = graft.api.Pipeline.runYaml(
      s"""
         |datasets:
         |  src: { path: $dir/bench.parquet }
         |  tgt: { path: $dir/odd.parquet }
         |operations:
         |  - name: mine
         |    type: bitext_mine
         |    target_from: tgt
         |    id_key: id
         |    embedding_key: e
         |    k: 3
         |    threshold: 0.0
         |    method: ivf
         |    n_cells: 2
         |    n_probe: 2
         |pipeline:
         |  steps:
         |    - { name: s1, input: src, operations: [mine] }
         |""".stripMargin, spark)
    val direct = graft.ops.BitextMine.margin(
      all.filter(col("id") % 10 === 0), "id", "e",
      all.filter(col("id") % 2 === 1), "id", "e", k = 3, threshold = 0.0)
    assert(rowsOf(mined) == rowsOf(direct) && direct.count() > 0)
    // decontaminate method: embedding, then l_diversity on the survivors
    val out = graft.api.Pipeline.runYaml(
      s"""
         |datasets:
         |  corpus: { path: $dir/all.parquet }
         |  bench: { path: $dir/bench.parquet }
         |operations:
         |  - name: scrub
         |    type: decontaminate
         |    method: embedding
         |    benchmark: bench
         |    id_key: id
         |    embedding_key: e
         |    threshold: 0.999999
         |  - name: audit
         |    type: l_diversity
         |    columns: [label]
         |    sensitive_key: id
         |    l: 2
         |pipeline:
         |  steps:
         |    - { name: s1, input: corpus, operations: [scrub, audit] }
         |""".stripMargin, spark)
    val r = out.collect().head
    // the 4 exact self-matches (ids 0,10,20,30) are scrubbed; both
    // label classes keep >= 2 distinct ids
    assert(r.getLong(1) == 36L && r.getLong(4) == 0L)
  }

  test("LazyFrame bitextMine/hardNegatives carry the method knobs") {
    val lf = graft.api.LazyFrame.read("d", "/tmp/nowhere.parquet")
    val y = lf.bitextMine("id", "e", "tgt", method = "ivf",
      nCells = 8, nProbe = 2).toYaml
    assert(y.contains("method: ivf") && y.contains("n_cells: 8") &&
      y.contains("n_probe: 2"), y)
    val hn = lf.hardNegatives(
      graft.api.LazyFrame.read("c", "/tmp/nowhere2.parquet"),
      "id", "e", "label", k = 3, method = "embedding_ivf").toYaml
    assert(hn.contains("method: embedding_ivf"), hn)
  }
}
