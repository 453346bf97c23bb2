package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-12 fixes: linear-time sentence chunking on book-length
  * documents, integer-exact AUC, distributed vocab-id assignment, and
  * the Compact round-trip gate's helpers. */
class Round12Spec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  // ------------------------------------ chunkBySentences at book scale

  test("chunk sentences: a many-sentence book round-trips in linear time") {
    // 4000 sentences × ~8 words ≈ 200k chars: the r11 flat-string fold
    // did O(sentences × text) ≈ 8·10⁸ char ops per row here and took
    // minutes; the struct accumulator makes this a sub-second test.
    val n = 4000
    val sents = (0 until n).map(i => s"sentence number $i has a few more words.")
    val text = sents.mkString(" ")
    val d = df(docSchema, Row(1L, text))
    val t0 = System.nanoTime()
    val chunks = graft.ops.Segment.chunkBySentences(d, "id", "text",
      maxWords = 64).orderBy("chunk_idx").collect()
    val secs = (System.nanoTime() - t0) / 1e9
    // round-trip: concatenated chunks = normalized text
    assert(chunks.map(_.getString(3)).mkString(" ") == text)
    // budget respected (every sentence is 8 words, 64 = 8 sentences/chunk)
    assert(chunks.forall(_.getLong(2) <= 64))
    assert(chunks.length == n / 8)
    // loose wall guard: quadratic behavior would blow far past this
    assert(secs < 30.0, s"chunking took ${secs}s — accumulator regressed?")
  }

  test("chunk sentences: overlap semantics survive the struct accumulator") {
    // A longer overlap>0 case than Round11b's: every chunk after the
    // first must START with the previous chunk's last two sentences.
    val sents = (0 until 30).map(i => s"s$i a b.")
    val d = df(docSchema, Row(1L, sents.mkString(" ")))
    val out = graft.ops.Segment.chunkBySentences(d, "id", "text",
      maxWords = 15, overlap = 2).orderBy("chunk_idx")
      .collect().map(_.getString(3))
    assert(out.length > 2)
    out.sliding(2).foreach { case Array(prev, next) =>
      val prevTail = prev.split("\\. ").takeRight(2).mkString(". ")
      assert(next.startsWith(prevTail.stripSuffix(".")),
        s"chunk '$next' does not re-open with '$prevTail'")
    }
    // every sentence still present
    sents.foreach(s => assert(out.exists(_.contains(s)), s))
  }

  test("chunksByBoundary: trailing and consecutive boundary words") {
    val d = df(docSchema,
      Row(1L, "a b. c d."), // trailing boundary word
      Row(2L, "a. b. c"), // consecutive boundaries
      Row(3L, ""), // empty
      Row(4L, "no terminal punctuation at all"))
    val out = graft.ops.Segment.sentences(d, "id", "text")
      .orderBy("id", "sent_idx").collect()
      .map(r => (r.getLong(0), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, "a b."), (1L, "c d."),
      (2L, "a."), (2L, "b."), (2L, "c"),
      (4L, "no terminal punctuation at all")))
  }

  // ------------------------------------------------ integer-exact AUC

  test("AUC: BIGINT 2×mid-rank sum is bit-equal to the float formula") {
    // Tie-heavy fixture: 40 rows over only 4 distinct scores, labels
    // mixed within every tie group — mid-rank handling dominates.
    val rnd = new scala.util.Random(7)
    val rows = (0 until 40).map { i =>
      Row(i.toLong, (i % 2).toLong, Seq(0.2, 0.4, 0.4, 0.8)(rnd.nextInt(4)))
    }
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("label", LongType), StructField("score", DoubleType)))
    val d = df(schema, rows: _*)
    val got = graft.ops.ClassifierEval.report(d, "label", "score")
      .select("auc").head().getDouble(0)
    // reference: direct float mid-rank computation on the driver
    val data = rows.map(r => (r.getLong(1), r.getDouble(2)))
    val ranked = data.sortBy(_._2).zipWithIndex
      .map { case ((l, s), i) => (l, s, i + 1L) }
    val mid = ranked.groupBy(_._2).map { case (s, g) =>
      s -> g.map(_._3.toDouble).sum / g.size
    }
    val prs = ranked.filter(_._1 == 1L).map(r => mid(r._2)).sum
    val nPos = data.count(_._1 == 1L).toDouble
    val nNeg = data.size - nPos
    val expected = BigDecimal((prs - nPos * (nPos + 1) / 2.0) / (nPos * nNeg))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == expected, s"auc $got != float-formula $expected")
  }

  test("AUC: perfect and inverted separations hit 1 and 0 exactly") {
    val schema = StructType(Seq(StructField("label", LongType),
      StructField("score", DoubleType)))
    val perfect = df(schema, (0 until 10).map(i =>
      Row((i / 5).toLong, i / 10.0)): _*)
    assert(graft.ops.ClassifierEval.report(perfect, "label", "score")
      .select("auc").head().getDouble(0) == 1.0)
    val inverted = df(schema, (0 until 10).map(i =>
      Row((i / 5).toLong, 1.0 - i / 10.0)): _*)
    assert(graft.ops.ClassifierEval.report(inverted, "label", "score")
      .select("auc").head().getDouble(0) == 0.0)
  }

  // ------------------------------------------- distributed vocab ids

  test("vocab withIds: ids are dense count-desc/token-asc, no window") {
    val schema = StructType(Seq(StructField("token", StringType),
      StructField("cnt", LongType)))
    val vocab = df(schema, Row("b", 5L), Row("a", 5L), Row("c", 9L),
      Row("d", 1L))
    val out = graft.ops.VocabCoverage.withIds(vocab)
      .orderBy("id").collect().map(r => (r.getString(0), r.getLong(2)))
    assert(out.toSeq == Seq(("c", 0L), ("a", 1L), ("b", 2L), ("d", 3L)))
  }

  // ------------------------------------------------ fill-in-the-middle

  test("fim: PSM/SPM serializations reassemble to the original text") {
    val d = df(docSchema, (0L until 50L).map(i =>
      Row(i, s"fn f$i(x) { return x + $i; } // trailing comment $i")): _*)
    val out = graft.ops.Fim(d, "id", "text", rate = 1.0, spmRate = 0.5,
      seed = 3).collect()
    assert(out.forall(_.getBoolean(3))) // rate=1 → all applied
    val modes = out.map(_.getString(4)).toSet
    assert(modes == Set("psm", "spm")) // both serializations exercised
    out.foreach { r =>
      val text = r.getString(1); val fim = r.getString(2)
      val lo = r.getLong(5).toInt; val hi = r.getLong(6).toInt
      val (pre, mid, suf) =
        (text.substring(0, lo), text.substring(lo, hi), text.substring(hi))
      val expected =
        if (r.getString(4) == "spm")
          s"<fim_prefix><fim_suffix>$suf<fim_middle>$pre$mid"
        else s"<fim_prefix>$pre<fim_suffix>$suf<fim_middle>$mid"
      assert(fim == expected, s"row ${r.getLong(0)}")
    }
  }

  test("fim: rate 0 passes everything through; determinism across runs") {
    val d = df(docSchema, Row(1L, "abc def"), Row(2L, ""))
    val none = graft.ops.Fim(d, "id", "text", rate = 0.0).collect()
    none.foreach { r =>
      assert(!r.getBoolean(3) && r.getString(2) == r.getString(1))
      assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
    }
    val a = graft.ops.Fim(d, "id", "text", rate = 1.0, seed = 9)
      .collect().map(_.getString(2)).toSeq
    val b = graft.ops.Fim(d.repartition(3), "id", "text", rate = 1.0,
      seed = 9).orderBy("id").collect().map(_.getString(2)).toSeq
    assert(a == b) // seeded md5 → partitioning-independent
  }

  // ------------------------------------------------ preference pairs

  private val pairSchema = StructType(Seq(
    StructField("id", LongType), StructField("prompt", StringType),
    StructField("chosen", StringType), StructField("rejected", StringType)))

  test("preference: valid pair renders with divergence at the responses") {
    val d = df(pairSchema, Row(1L, "what is 2+2?", "4", "5"))
    val out = graft.ops.Preference.renderPair(
      graft.ops.Preference.validatePairs(
        graft.ops.Preference.fromPromptPair(d, "prompt", "chosen",
          "rejected"),
        "messages_chosen", "messages_rejected"),
      "messages_chosen", "messages_rejected").head()
    assert(out.getAs[Boolean]("pair_valid"))
    val tc = out.getAs[String]("text_chosen")
    val tr = out.getAs[String]("text_rejected")
    assert(tc == "<|user|>\nwhat is 2+2?\n<|assistant|>\n4\n")
    assert(tr == "<|user|>\nwhat is 2+2?\n<|assistant|>\n5\n")
    // divergence = length of the shared header+prompt prefix
    assert(out.getAs[Long]("diverge_at") ==
      "<|user|>\nwhat is 2+2?\n<|assistant|>\n".length.toLong)
    // chosen-side mask span covers exactly the chosen content
    val spans = out.getAs[scala.collection.Seq[Row]]("mask_spans_chosen")
    assert(spans.length == 1)
    val (s0, e0) = (spans.head.getLong(0), spans.head.getLong(1))
    assert(tc.substring(s0.toInt, e0.toInt) == "4")
  }

  test("preference: each pair-contract violation gets its reason") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("prompt", StringType), StructField("chosen", StringType),
      StructField("rejected", StringType)))
    val flat = df(schema,
      Row(1L, "p", "a", "b"), // valid
      Row(2L, "p", "same", "same"), // identical_responses
      Row(3L, "p", "", "b"), // chosen_empty_content
      Row(4L, "", "a", "b")) // chosen_empty_content (prompt empty)
    val out = graft.ops.Preference.validatePairs(
      graft.ops.Preference.fromPromptPair(flat, "prompt", "chosen",
        "rejected"),
      "messages_chosen", "messages_rejected")
      .select("id", "pair_valid", "pair_invalid_reason")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), Option(r.getString(2)))).toMap
    assert(out(1L) == (true, None))
    assert(out(2L) == (false, Some("identical_responses")))
    assert(out(3L) == (false, Some("chosen_empty_content")))
    assert(out(4L) == (false, Some("chosen_empty_content")))
  }

  test("preference: prefix_mismatch fires when prompts differ") {
    // hand-build message arrays with different user prompts
    val d = spark.sql(
      """SELECT 1L AS id,
           array(named_struct('role', 'user', 'content', 'p1'),
                 named_struct('role', 'assistant', 'content', 'a')) AS mc,
           array(named_struct('role', 'user', 'content', 'p2'),
                 named_struct('role', 'assistant', 'content', 'b')) AS mr""")
    val out = graft.ops.Preference.validatePairs(d, "mc", "mr").head()
    assert(!out.getAs[Boolean]("pair_valid"))
    assert(out.getAs[String]("pair_invalid_reason") == "prefix_mismatch")
  }

  test("preference: divergenceCol handles prefix/equal/empty cases") {
    val schema = StructType(Seq(StructField("a", StringType),
      StructField("b", StringType)))
    val d = df(schema, Row("abcd", "abXd"), Row("abc", "abc"),
      Row("abc", "abcdef"), Row("", "x"), Row("", ""), Row(null, "x"))
    val got = d.select(graft.ops.Preference.divergenceCol(col("a"),
      col("b")).as("d")).collect().map(r =>
      if (r.isNullAt(0)) -1L else r.getLong(0)).toSeq
    assert(got == Seq(2L, 3L, 3L, 0L, 0L, -1L))
  }

  // ------------------------------------------------ line clean

  test("line clean: C4 rules keep prose, drop banners/stubs/fragments") {
    val d = df(docSchema, Row(1L,
      "This is a real sentence with words.\n" +
        "Enable JavaScript to continue.\n" +
        "home\n" +
        "Please accept our Cookie Policy today.\n" +
        "a fragment with no punctuation\n" +
        "Short one. and this line also stays fine!"))
    val out = graft.ops.LineClean(d, "text").head()
    assert(out.getAs[String]("text_clean") ==
      "This is a real sentence with words.\n" +
        "Short one. and this line also stays fine!")
    assert(out.getAs[Long]("n_lines") == 6L)
    assert(out.getAs[Long]("n_kept_lines") == 2L)
    // punctuation requirement is toggleable
    val loose = graft.ops.LineClean(d, "text",
      graft.ops.LineClean.Config(requireTerminalPunct = false)).head()
    assert(loose.getAs[String]("text_clean")
      .contains("a fragment with no punctuation"))
  }

  // ------------------------------------------------ encoding repair

  test("encoding repair: trio/Ã-pair/Â-pair families all restore") {
    val d = df(docSchema,
      Row(1L, "cafÃ© naÃ¯ve Ã¼ber"),
      Row(2L, "itâ€™s â€œquotedâ€“dash"),
      Row(3L, "Â«brackedÂ» 10Â°"),
      Row(4L, "perfectly clean text"))
    val out = graft.ops.EncodingQuality.repair(d, "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[String]("text_repaired"),
          r.getAs[Boolean]("was_repaired"))).toMap
    assert(out(1L) == ("café naïve über", true))
    assert(out(2L) == ("it’s “quoted–dash", true))
    assert(out(3L) == ("«bracked» 10°", true))
    assert(out(4L) == ("perfectly clean text", false))
  }

  test("encoding repair: repaired text scores clean on the detector") {
    val d = df(docSchema, Row(1L, "cafÃ© itâ€™s Â«xÂ» Ã¼ber naÃ¯ve"))
    val repaired = graft.ops.EncodingQuality.repair(d, "text")
      .select(col("id"), col("text_repaired").as("text"))
    val score = graft.ops.EncodingQuality.report(repaired, "text")
      .head().getAs[Double]("mojibake_score")
    assert(score == 0.0, s"repair left mojibake behind (score $score)")
  }

  // ------------------------------------------------ script profile

  test("script profile: counts and first-wins dominant script") {
    val d = df(docSchema,
      Row(1L, "mostly english text here"),
      Row(2L, "Привет мир Привет"),
      Row(3L, "你好你好你好 hi"),
      Row(4L, "12345 !!!"), // no script chars at all
      Row(5L, "abc где")) // latin 3 vs cyrillic 3: tie → latin first
    val out = graft.ops.ScriptProfile(d, "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[String]("main_script"), r.getAs[Long]("n_latin"),
          r.getAs[Long]("n_cyrillic"), r.getAs[Long]("n_cjk"))).toMap
    assert(out(1L)._1 == "latin")
    assert(out(2L)._1 == "cyrillic" && out(2L)._3 == 15L)
    assert(out(3L)._1 == "cjk" && out(3L)._4 == 6L)
    assert(out(4L)._1 == "none")
    assert(out(5L)._1 == "latin" && out(5L)._2 == 3L && out(5L)._3 == 3L)
  }

  // ------------------------------------------------ markdown sections

  test("markdown sections: preamble, levels, empty bodies, no headings") {
    val md = "before any heading\n# Top\nintro\n## Sub\n\n# Second\ntail"
    val d = df(docSchema, Row(1L, md), Row(2L, "just plain text"),
      Row(3L, ""))
    val out = graft.ops.MarkdownSegment.sections(d, "id", "text")
      .orderBy("id", "section_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
    assert(out.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0L, 0L, "", "before any heading"),
      (1L, 1L, 1L, "Top", "intro"),
      (1L, 2L, 2L, "Sub", ""),
      (1L, 3L, 1L, "Second", "tail")))
    assert(out.filter(_._1 == 2L).toSeq == Seq(
      (2L, 0L, 0L, "", "just plain text")))
    assert(!out.exists(_._1 == 3L)) // empty doc → no rows
  }

  // ------------------------------------------------ pseudonymize

  test("pseudonymize: consistent numbering, substring-safe replacement") {
    val d = df(docSchema,
      Row(1L, "bob@x.com wrote to amy@y.org; amy@y.org replied"),
      Row(2L, "see bob@x.co and bob@x.com together"), // substring pair
      Row(3L, "no entities at all"))
    val out = graft.ops.Pseudonymize(d, "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[String]("text_pseudo"),
          r.getAs[Long]("n_email_entities"))).toMap
    // sorted distinct: amy@y.org=1, bob@x.com=2; both amy mentions match
    assert(out(1L) ==
      ("EMAIL_2 wrote to EMAIL_1; EMAIL_1 replied", 2L))
    // longest-first replacement keeps bob@x.co from eating bob@x.com
    assert(out(2L) == ("see EMAIL_1 and EMAIL_2 together", 2L))
    assert(out(3L) == ("no entities at all", 0L))
  }

  // ------------------------------------------------ span corruption

  test("span corrupt: inputs+targets reconstruct the original text") {
    val d = df(docSchema, (0L until 20L).map(i =>
      Row(i, (1 to 30).map(w => s"w$w").mkString(" "))): _*)
    val out = graft.ops.SpanCorrupt(d, "id", "text", rate = 0.4,
      spanLen = 3, seed = 5).collect()
    out.foreach { r =>
      val text = r.getString(1)
      val inputs = r.getString(2); val targets = r.getString(3)
      val k = r.getLong(4)
      // sentinels appear 0..k-1 in order on both sides
      val sentRe = "<extra_id_(\\d+)>".r
      assert(sentRe.findAllMatchIn(inputs).map(_.group(1).toInt).toSeq ==
        (0 until k.toInt))
      assert(sentRe.findAllMatchIn(targets).map(_.group(1).toInt).toSeq ==
        (0 until k.toInt))
      // splicing target spans back into input sentinels restores text
      val spans = targets.split("<extra_id_\\d+> ?").filter(_.nonEmpty)
        .map(_.trim)
      var rebuilt = inputs
      spans.zipWithIndex.foreach { case (sp, i) =>
        rebuilt = rebuilt.replace(s"<extra_id_$i>", sp)
      }
      assert(rebuilt == text, s"row ${r.getLong(0)}")
    }
    // rate 0 → untouched; rate 1 → everything corrupted
    val none = graft.ops.SpanCorrupt(d, "id", "text", rate = 0.0).head()
    assert(none.getString(2) == none.getString(1) &&
      none.getLong(4) == 0L)
    val all = graft.ops.SpanCorrupt(d, "id", "text", rate = 1.0,
      spanLen = 3).head()
    assert(all.getLong(4) == 10L) // 30 words / 3 per span
    assert(!all.getString(2).exists(_.isDigit) ||
      all.getString(2).matches("(<extra_id_\\d+> ?)+"))
  }

  // ------------------------------------------- events -> conversations

  test("event log bridges to ordered conversations per session") {
    val schema = StructType(Seq(StructField("uid", LongType),
      StructField("ts", LongType), StructField("eid", LongType),
      StructField("role", StringType), StructField("content", StringType)))
    val d = df(schema,
      Row(1L, 100L, 1L, "user", "hi"),
      Row(1L, 200L, 2L, "assistant", "hello"),
      Row(1L, 10000L, 3L, "user", "new session"), // > gap of 5000
      Row(2L, 150L, 4L, "user", "other user"))
    val convs = graft.ops.ChatOps.fromEventLog(d, "uid", "ts", "role",
      "content", gap = 5000L, tieBreak = "eid")
    val byKey = convs.collect().map(r =>
      (r.getLong(0), r.getLong(1)) ->
        r.getAs[scala.collection.Seq[Row]]("messages")
          .map(m => (m.getString(0), m.getString(1)))).toMap
    assert(byKey((1L, 1L)) == Seq(("user", "hi"), ("assistant", "hello")))
    assert(byKey((1L, 2L)) == Seq(("user", "new session")))
    assert(byKey((2L, 1L)) == Seq(("user", "other user")))
    // the output feeds the render path directly
    val rendered = graft.ops.ChatOps.renderWithSpans(convs, "messages")
    assert(rendered.filter(col("uid") === 1 && col("session_id") === 1)
      .head().getAs[String]("text") ==
      "<|user|>\nhi\n<|assistant|>\nhello\n")
  }

  // ------------------------------------------------ length bucketing

  test("length batches: similar lengths co-batch; padding is exact") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("len", LongType)))
    // lengths 100,99,...,1 → with batchSize 10, batch 0 = 100..91
    val d = df(schema, (1L to 100L).map(i => Row(i, i)): _*)
    val report = graft.ops.LengthBucket.paddingReport(d, "len", 10, "id")
      .orderBy("batch_id").collect()
    assert(report.length == 10)
    val b0 = report.head
    assert(b0.getAs[Long]("max_len") == 100L)
    assert(b0.getAs[Long]("sum_len") == (91L to 100L).sum)
    assert(b0.getAs[Long]("pad_tokens") ==
      10L * 100L - (91L to 100L).sum)
    // bucketing beats random batching: total padding is minimal here
    val totalPad = report.map(_.getAs[Long]("pad_tokens")).sum
    assert(totalPad == report.map { r =>
      r.getAs[Long]("n_rows") * r.getAs[Long]("max_len") -
        r.getAs[Long]("sum_len")
    }.sum)
    val assigned = graft.ops.LengthBucket.assignBatches(d, "len", 10, "id")
    assert(assigned.filter(col("len") > 90).select("batch_id")
      .distinct().count() == 1)
  }

  // ------------------------------------------------ robots.txt

  test("robots: parser handles runs, comments, case, empty disallow") {
    val schema = StructType(Seq(StructField("host", StringType),
      StructField("body", StringType)))
    val d = df(schema, Row("h1",
      "# top comment\nUSER-AGENT: BotA\nUser-Agent: botb\n" +
        "Disallow: /x # inline\nAllow: /x/ok\n" +
        "Disallow:\n" + // empty = allow-all idiom, no rule
        "Crawl-delay: 10\n" +
        "User-agent: *\nDisallow: /all\n"))
    val rules = graft.ops.RobotsTxt.parseRules(d, "host", "body")
      .collect().map(r => (r.getString(1), r.getBoolean(2),
        r.getString(3))).toSet
    // the UA run binds BOTH bota and botb to both rules; case folds
    assert(rules == Set(
      ("bota", false, "/x"), ("botb", false, "/x"),
      ("bota", true, "/x/ok"), ("botb", true, "/x/ok"),
      ("*", false, "/all")))
  }

  test("robots: group selection, longest match, allow ties, wildcards") {
    val rSchema = StructType(Seq(StructField("host", StringType),
      StructField("body", StringType)))
    val robots = df(rSchema,
      Row("a.com", "User-agent: *\nDisallow: /p/\nAllow: /p/ok/\n" +
        "Disallow: /q*z\n"),
      Row("b.com", "User-agent: me\nDisallow: /only$\n" +
        "User-agent: *\nDisallow: /\n"))
    val rules = graft.ops.RobotsTxt.parseRules(robots, "host", "body")
    val uSchema = StructType(Seq(StructField("id", LongType),
      StructField("host", StringType), StructField("path", StringType)))
    val urls = df(uSchema,
      Row(1L, "a.com", "/p/secret"), // blocked by /p/
      Row(2L, "a.com", "/p/ok/page"), // allow overrides (longer)
      Row(3L, "a.com", "/q123z"), // * wildcard hits
      Row(4L, "a.com", "/other"), // no rule -> allowed
      Row(5L, "b.com", "/only"), // $-anchored block for 'me'
      Row(6L, "b.com", "/onlyx"), // anchor miss -> allowed
      Row(7L, "b.com", "/free"), // specific group has no match
      Row(8L, "c.com", "/anything")) // host without robots
    val out = graft.ops.RobotsTxt.isAllowed(urls, "id", "host", "path",
      rules, "Me").collect()
      .map(r => r.getLong(0) -> (r.getAs[Boolean]("allowed"),
        r.getAs[String]("matched_rule"))).toMap
    assert(out(1L) == (false, "/p/"))
    assert(out(2L) == (true, "/p/ok/"))
    assert(out(3L) == (false, "/q*z"))
    assert(out(4L) == (true, ""))
    assert(out(5L) == (false, "/only$"))
    assert(out(6L) == (true, ""))
    assert(out(7L) == (true, ""))
    assert(out(8L) == (true, ""))
  }

  // ------------------------------------------------ score ensemble

  test("score ensemble: borda is exact rank sums; zscore standardizes") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("a", LongType), StructField("b", LongType)))
    val d = df(schema, Row(1L, 10L, 1L), Row(2L, 20L, 2L),
      Row(3L, 30L, 3L), Row(4L, 40L, 4L))
    val borda = graft.ops.ScoreEnsemble.borda(d, Seq("a", "b"), "id")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("borda_sum"))
      .toMap
    // both signals agree: id 4 is rank 1+1, id 1 is rank 4+4
    assert(borda == Map(1L -> 8L, 2L -> 6L, 3L -> 4L, 4L -> 2L))
    val z = graft.ops.ScoreEnsemble.zscore(d, Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("ensemble_z"))
      .toMap
    // symmetric data: z-scores mirror around 0 and the extremes match
    assert(math.abs(z(1L) + z(4L)) < 1e-9)
    assert(math.abs(z(2L) + z(3L)) < 1e-9)
    assert(z(4L) > z(3L) && z(3L) > z(2L) && z(2L) > z(1L))
    // a constant column contributes zero, not NaN
    val cz = graft.ops.ScoreEnsemble.zscore(
      d.withColumn("c", lit(7L)), Seq("a", "c"))
      .select("ensemble_z").collect().map(_.getDouble(0))
    assert(cz.forall(v => !v.isNaN))
  }

  // ------------------------------------------------ surfaces

  test("round-12 ops run from YAML registry and LazyFrame round-trips") {
    val d = docsDf
    val fimmed = graft.api.Registry("fim")(d,
      graft.api.Conf.fromYaml(
        "type: fim\nid_key: doc_id\ntext_key: text\nrate: 1.0"), null)
    assert(fimmed.filter(col("fim_applied")).count() == d.count())
    val flat = d.withColumn("chosen", concat(col("lang"), lit("-good")))
      .withColumn("rejected", col("lang"))
    val pairs = graft.api.Registry("preference_from_pairs")(flat,
      graft.api.Conf.fromYaml(
        "type: preference_from_pairs\nprompt_key: text\n" +
          "chosen_key: chosen\nrejected_key: rejected"), null)
    val validated = graft.api.Registry("preference_validate")(pairs,
      graft.api.Conf.fromYaml("type: preference_validate"), null)
    assert(validated.filter(col("pair_valid")).count() == d.count())
    val rendered = graft.api.Registry("preference_render")(validated,
      graft.api.Conf.fromYaml(
        "type: preference_render\ntemplate: chatml"), null)
    assert(rendered.columns.contains("diverge_at"))
    assert(rendered.filter(col("text_chosen").contains("<|im_start|>"))
      .count() == d.count())

    val cleaned = graft.api.Registry("line_clean")(d,
      graft.api.Conf.fromYaml(
        "type: line_clean\ntext_key: text\nmin_words: 2\n" +
          "require_terminal_punct: false"), null)
    assert(cleaned.columns.contains("text_clean"))
    val rep = graft.api.Registry("encoding_quality")(d,
      graft.api.Conf.fromYaml(
        "type: encoding_quality\ntext_key: text\nmode: repair"), null)
    assert(rep.columns.contains("text_repaired"))
    val sp = graft.api.Registry("script_profile")(d,
      graft.api.Conf.fromYaml(
        "type: script_profile\ntext_key: text"), null)
    assert(sp.columns.contains("main_script"))
    val mds = graft.api.Registry("markdown_sections")(
      d.withColumn("md", concat(lit("# H\n"), col("text"))),
      graft.api.Conf.fromYaml(
        "type: markdown_sections\nid_key: doc_id\ntext_key: md"), null)
    assert(mds.count() == d.count())
    val ps = graft.api.Registry("pseudonymize")(d,
      graft.api.Conf.fromYaml(
        "type: pseudonymize\ntext_key: text"), null)
    assert(ps.columns.contains("text_pseudo"))
    val sc = graft.api.Registry("span_corrupt")(d,
      graft.api.Conf.fromYaml(
        "type: span_corrupt\nid_key: doc_id\ntext_key: text\nrate: 1.0"),
      null)
    assert(sc.columns.contains("inputs") && sc.columns.contains("targets"))
    val ev = d.select(col("doc_id").as("uid"),
      (col("doc_id") * 100).as("ts"), col("doc_id").as("eid"),
      lit("user").as("role"), col("text").as("content"))
    val cv = graft.api.Registry("conversation_from_events")(ev,
      graft.api.Conf.fromYaml(
        "type: conversation_from_events\nkey: uid\nts: ts\n" +
          "role_key: role\ncontent_key: content\ngap: 1000000\n" +
          "tie_break: eid"), null)
    assert(cv.columns.contains("messages"))
    val lb = graft.api.Registry("length_batch")(
      d.withColumn("len", length(col("text")).cast("bigint")),
      graft.api.Conf.fromYaml(
        "type: length_batch\nlen_key: len\nbatch_size: 2\n" +
          "tie_break: doc_id\nmode: report"), null)
    assert(lb.columns.contains("pad_tokens"))
    val rr = graft.api.Registry("robots_txt")(
      d.select(lit("h").as("host"),
        lit("User-agent: *\nDisallow: /x\n").as("body")).limit(1),
      graft.api.Conf.fromYaml(
        "type: robots_txt\nmode: parse\nhost_key: host\n" +
          "content_key: body"), null)
    assert(rr.collect().map(_.getString(3)).toSeq == Seq("/x"))
    val se = graft.api.Registry("score_ensemble")(
      d.withColumn("s", col("doc_id").cast("bigint")),
      graft.api.Conf.fromYaml(
        "type: score_ensemble\ncolumns: [s]\ntie_break: doc_id"), null)
    assert(se.columns.contains("borda_sum"))

    import graft.api.LazyFrame
    val dir = java.nio.file.Files.createTempDirectory("r12").toString
    flat.write.mode("overwrite").parquet(s"$dir/docs.parquet")
    val lf = LazyFrame.read("docs", s"$dir/docs.parquet")
      .fim("doc_id", "text", rate = 1.0)
    assert(LazyFrame.fromYaml(lf.toYaml).toYaml == lf.toYaml)
    assert(lf.run(spark).filter(col("fim_applied")).count() == d.count())
    val lp = LazyFrame.read("docs", s"$dir/docs.parquet")
      .preferenceFromPairs("text", "chosen", "rejected")
      .preferenceValidate().preferenceRender()
    assert(lp.run(spark).filter(col("pair_valid")).count() == d.count())
    val lx = LazyFrame.read("docs", s"$dir/docs.parquet")
      .encodingRepair("text").scriptProfile("text")
      .lineClean("text", minWords = 1, requireTerminalPunct = false)
      .pseudonymize("text")
    assert(LazyFrame.fromYaml(lx.toYaml).toYaml == lx.toYaml)
    assert(lx.run(spark).count() == d.count())
    val lm = LazyFrame.read("docs", s"$dir/docs.parquet")
      .markdownSections("doc_id", "text")
    assert(lm.run(spark).count() == d.count())
  }

  // -------------------------------------------- retrieval ranking eval

  test("ranking eval: hand-computed metrics at k=2, degenerate query") {
    val schema = StructType(Seq(
      StructField("qid", LongType), StructField("doc", LongType),
      StructField("score", LongType), StructField("rel", LongType)))
    val d = df(schema,
      // q1: relevant at ranks 1 and 3 → hits@2=1
      Row(1L, 1L, 10L, 1L), Row(1L, 2L, 9L, 0L),
      Row(1L, 3L, 8L, 1L), Row(1L, 4L, 7L, 0L),
      // q2: nothing relevant → recall/ndcg null, rr 0
      Row(2L, 5L, 5L, 0L), Row(2L, 6L, 4L, 0L))
    val pq = graft.ops.RankingEval.perQuery(d, "qid", "score", "rel",
      k = 2, tieCol = "doc").orderBy("qid").collect()
    val q1 = pq(0)
    assert(q1.getLong(1) == 4 && q1.getLong(2) == 2 && q1.getLong(3) == 1)
    assert(q1.getDouble(4) == 0.5)       // precision@2 = 1/2
    assert(q1.getDouble(5) == 0.5)       // recall@2 = 1/2
    assert(q1.getLong(6) == 1L)          // hit@2
    assert(q1.getDouble(7) == 1.0)       // rr: first relevant at rank 1
    // dcg@2 = 1/log2(2) = 1.0 → 1000000 µ; idcg@2 = 1 + 1/log2(3)
    // → 1000000 + 630930 µ; ndcg = 1000000/1630930
    assert(q1.getDouble(8) == math.rint(1000000.0 / 1630930 * 1e6) / 1e6)
    val q2 = pq(1)
    assert(q2.isNullAt(5) && q2.getDouble(7) == 0.0 && q2.isNullAt(8))
    val s = graft.ops.RankingEval.summary(
      graft.ops.RankingEval.perQuery(d, "qid", "score", "rel", 2, "doc"))
      .head()
    assert(s.getLong(0) == 2)
    assert(s.getDouble(1) == 0.25)       // mean precision (0.5 + 0)/2
    assert(s.getDouble(2) == 0.5)        // mean recall over defined queries
    assert(s.getDouble(3) == 0.5)        // hit rate
    assert(s.getDouble(4) == 0.5)        // MRR (1.0 + 0)/2
  }

  // ------------------------------------------------------- html links

  test("html links: extraction, resolution, drops, and host edges") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("host", StringType),
      StructField("html", StringType)))
    val html =
      """<p>x</p><a HREF="HTTPS://Ext.COM/a/b?q=1#f">One <i>two</i></a>
        |<a href='/rel/p?u=2'> pad </a><a href="#top">no</a>
        |<a href="mailto:a@b">no</a><a href="tel:+1">no</a>
        |<a href="sub/page.html">rel</a>
        |<a href="https://self.org/x">self</a>""".stripMargin
    val d = df(schema, Row(1L, "self.org", html))
    val links = graft.sources.HtmlLinks
      .extract(d, Seq("id"), "html", "host").collect()
    assert(links.length == 4)
    // columns: id, host, href, anchor, kind, dst_host, dst_path, internal
    val byHref = links.map(r => (r.getString(2), r)).toMap
    val abs = byHref("HTTPS://Ext.COM/a/b?q=1#f")
    assert(abs.getString(3) == "One two")
    assert(abs.getString(5) == "ext.com")   // dst_host lowercased
    assert(abs.getString(6) == "/a/b")      // query+fragment stripped
    assert(abs.getString(4) == "absolute" && !abs.getBoolean(7))
    val root = byHref("/rel/p?u=2")
    assert(root.getString(3) == "pad" && root.getString(5) == "self.org")
    assert(root.getString(6) == "/rel/p" && root.getBoolean(7))
    val rel = byHref("sub/page.html")
    assert(rel.getString(4) == "relative" && rel.isNullAt(5))
    val self = byHref("https://self.org/x")
    assert(self.getBoolean(7))              // internal: host matches
    val edges = graft.sources.HtmlLinks.hostEdges(
      graft.sources.HtmlLinks.extract(d, Seq("id"), "html", "host"),
      "host").collect()
    assert(edges.length == 1 && edges.head.getString(1) == "ext.com" &&
      edges.head.getLong(2) == 1L)          // self-links excluded
  }

  // --------------------------------------------------------- ngram F1

  test("ngram F1: clipped counts at n=1 and n=2, empty-side guard") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("cand", StringType), StructField("ref", StringType)))
    val d = df(schema,
      Row(1L, "The cat sat on the mat.", "the cat lay on the mat"),
      Row(2L, "", "some reference"),
      Row(3L, "only cand", ""))
    val u = graft.ops.TextSim.ngramF1(d, Seq("id"), "cand", "ref", 1)
      .orderBy("id").collect()
    // clipped unigrams: the×2, cat, on, mat → 5 of 6; p = r = 5/6
    assert(u(0).getLong(3) == 5)
    assert(u(0).getDouble(4) == 0.833333 && u(0).getDouble(5) == 0.833333)
    assert(u(0).getDouble(6) == 0.833333)
    assert(u(1).getLong(1) == 0 && u(1).getDouble(4) == 0.0 &&
      u(1).getDouble(6) == 0.0)
    assert(u(2).getLong(2) == 0 && u(2).getDouble(5) == 0.0)
    val b = graft.ops.TextSim.ngramF1(d, Seq("id"), "cand", "ref", 2)
      .orderBy("id").collect()
    // shared bigrams: "the cat", "on the", "the mat" → 3 of 5
    assert(b(0).getLong(3) == 3 && b(0).getDouble(6) == 0.6)
  }

  // -------------------------------------------------------- edit pairs

  test("edit pairs: matches driver-side brute force, incl. hard cases") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val rows = Seq(
      1L -> "abcdefghij",
      2L -> "abcdefghij",    // exact dup (dist 0)
      3L -> "xbcdefghij",    // first-char substitution (prefix-hostile)
      4L -> "abcdefghijkl",  // two insertions at the end
      5L -> "zzzzzzzzzz",    // far from everything
      6L -> "ab",            // short bucket
      7L -> "b",             // short bucket, dist 1 from "ab"
      8L -> "abcd",          // fringe: len 4 with t=2
      9L -> "")              // empty string
    val d = df(schema, rows.map { case (i, s) => Row(i, s) }: _*)
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(a.length)
    }
    val expected = (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && lev(sa, sb) <= 2
    } yield (ia, ib, lev(sa, sb).toLong)).toSet
    val got = graft.dedup.EditDedup.pairs(d, "id", "s", t = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
    assert(expected.contains((1L, 3L, 1L)))  // the prefix-hostile pair
    assert(expected.contains((6L, 7L, 1L)))  // short bucket
  }

  test("edit keep-best: clusters via CC, longest survives, loners pass") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val d = df(schema,
      Row(1L, "abcdefghij"),   // cluster A
      Row(2L, "abcdefghijk"),  // cluster A: longer -> survives
      Row(3L, "abcdefghix"),   // cluster A via id1 (dist 2 to id2)
      Row(4L, "zzzzzzzzzz"),   // unpaired: passes through
      Row(5L, "qqqq"), Row(6L, "qqqq"))  // identical pair: min id wins
    val kept = graft.dedup.EditDedup.keepBest(d, "id", "s", t = 1)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(2L, 4L, 5L))
    val yaml = graft.api.Registry("dedup")(d,
      graft.api.Conf.fromYaml(
        "type: dedup\nmethod: edit_keep_best\nid_key: id\n" +
          "text_key: s\nthreshold: 1"), null)
    assert(yaml.count() == 3)
  }

  test("round-12b ops run from YAML registry and LazyFrame round-trips") {
    val d = docsDf
    val re = graft.api.Registry("ranking_eval")(
      d.select((col("doc_id") % 2).as("q"), col("doc_id"),
        col("doc_id").as("sc"), (col("doc_id") % 3).as("r")),
      graft.api.Conf.fromYaml(
        "type: ranking_eval\nquery_key: q\nscore_key: sc\nrel_key: r\n" +
          "k: 3\ntie_break: doc_id"), null)
    assert(re.columns.contains("ndcg_k"))
    val rs = graft.api.Registry("ranking_eval")(re,
      graft.api.Conf.fromYaml("type: ranking_eval\nmode: summary"), null)
    assert(rs.head().getLong(0) == 2)
    val hl = graft.api.Registry("html_links")(
      d.select(col("doc_id"), lit("h.com").as("host"),
        lit("<a href=\"https://x.org/p\">t</a>").as("html")),
      graft.api.Conf.fromYaml(
        "type: html_links\nid_keys: [doc_id]\nhtml_key: html\n" +
          "host_key: host"), null)
    assert(hl.count() == d.count())
    val he = graft.api.Registry("html_links")(hl,
      graft.api.Conf.fromYaml(
        "type: html_links\nmode: host_edges\nhost_key: host"), null)
    assert(he.head().getString(1) == "x.org")
    val nf = graft.api.Registry("ngram_f1")(
      d.withColumn("ref", col("text")),
      graft.api.Conf.fromYaml(
        "type: ngram_f1\nid_keys: [doc_id]\ncandidate_key: text\n" +
          "reference_key: ref\nn: 1"), null)
    assert(nf.filter(col("f1") === 1.0).count() ==
      nf.filter(col("cand_grams") > 0).count())
    val ep = graft.api.Registry("edit_pairs")(
      d.select(col("doc_id"), substring(col("text"), 1, 8).as("s")),
      graft.api.Conf.fromYaml(
        "type: edit_pairs\nid_key: doc_id\ntext_key: s\nthreshold: 1"),
      null)
    assert(ep.columns.toSeq == Seq("id_a", "id_b", "dist"))

    import graft.api.LazyFrame
    val dir = java.nio.file.Files.createTempDirectory("r12b").toString
    d.withColumn("ref", col("text"))
      .write.mode("overwrite").parquet(s"$dir/docs.parquet")
    val lf = LazyFrame.read("docs", s"$dir/docs.parquet")
      .ngramF1(Seq("doc_id"), "text", "ref", n = 2)
    assert(LazyFrame.fromYaml(lf.toYaml).toYaml == lf.toYaml)
    assert(lf.run(spark).count() == d.count())
    val le = LazyFrame.read("docs", s"$dir/docs.parquet")
      .editPairs("doc_id", "text", threshold = 1)
    assert(LazyFrame.fromYaml(le.toYaml).toYaml == le.toYaml)
    le.run(spark).collect()
  }

  // -------------------------------------------------------- skew report

  test("skew report: hot-key detection, shares, salting, uniform case") {
    val schema = StructType(Seq(StructField("k", StringType)))
    val d = df(schema,
      (Seq.fill(6)("hot") ++ Seq("a", "b", "c", "d")).map(Row(_)): _*)
    val s = graft.ops.SkewReport.summary(d, "k").head()
    assert(s.getLong(0) == 10 && s.getLong(1) == 5 && s.getLong(2) == 6)
    assert(s.getDouble(3) == 2.0)        // mean 10/5
    assert(s.getDouble(4) == 0.6)        // max share
    assert(s.getDouble(5) == 3.0)        // skew factor 6/2
    val h = graft.ops.SkewReport.heavyKeys(d, "k", k = 2,
      targetPerKey = 2L).orderBy("rank").collect()
    assert(h(0).getString(0) == "hot" && h(0).getLong(1) == 6 &&
      h(0).getDouble(2) == 0.6 && h(0).getLong(3) == 3)  // ceil(6/2)
    assert(h(1).getLong(1) == 1 && h(1).getLong(3) == 1) // cold: no salt
    val uni = df(schema, Seq("a", "b", "c").map(Row(_)): _*)
    assert(graft.ops.SkewReport.summary(uni, "k").head().getDouble(5) == 1.0)
  }

  // ----------------------------------------------------- pmi cooccur

  test("pmi cooccur: hand-computed window-1 PMI, min count, symmetry") {
    val schema = StructType(Seq(StructField("text", StringType)))
    val d = df(schema, Row("a b a"), Row("b a"), Row("solo"))
    // slots: doc1 (a,b)(b,a) -> (a,b)x2; doc2 (b,a) -> (a,b); doc3 none
    // n_pairs=3, unigrams over multi-token docs: a:3 b:2, n_toks=5
    val out = graft.ops.Cooccur.pmi(d, "text", window = 1).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "a" && r.getString(1) == "b")   // normalized
    assert(r.getLong(2) == 3 && r.getLong(3) == 3 && r.getLong(4) == 2)
    // pmi = ln((3/3) / ((3/5)(2/5))) = ln(25/6)
    assert(r.getDouble(5) == math.rint(math.log(25.0 / 6) * 1e6) / 1e6)
    // min_count filters the pair out entirely
    assert(graft.ops.Cooccur.pmi(d, "text", 1, minCount = 4L).count() == 0)
  }

  // ------------------------------------------------- markdown tables

  test("markdown tables: grammar gates, escapes, multi-table, widths") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val twoTables =
      "| H1 | H2 |\n|---|---|\n| x | y\\|z |\nprose\n" +
        "| A |\n|:-:|\n| 1 | extra |"
    val invalid = "| not | table |\n| no | delim |"   // missing |---|
    val headerOnly = "| H |\n|---|"                    // zero data rows
    val d = df(schema,
      Row(1L, twoTables), Row(2L, invalid), Row(3L, headerOnly),
      Row(4L, "no tables at all"))
    val cells = graft.ops.MarkdownTables.cells(d, "id", "text")
      .orderBy("id", "table_idx", "row_idx", "col_idx").collect()
    // doc1: table0 row0 = (x, y|z); table1 row0 = (1, extra)
    assert(cells.length == 4)
    assert(cells(0).getString(4) == "H1" && cells(0).getString(5) == "x")
    assert(cells(1).getString(4) == "H2" && cells(1).getString(5) == "y|z")
    assert(cells(2).getLong(1) == 1 && cells(2).getString(4) == "A" &&
      cells(2).getString(5) == "1")
    // data row wider than header: header falls back to ''
    assert(cells(3).getString(4) == "" && cells(3).getString(5) == "extra")
    assert(cells.forall(_.getLong(0) == 1L))  // docs 2-4 yield nothing
    // table at document start and unterminated at EOF still parses
    val edge = df(schema, Row(5L, "| H |\n|---|\n| v |"))
    val e = graft.ops.MarkdownTables.cells(edge, "id", "text").collect()
    assert(e.length == 1 && e.head.getString(5) == "v")
  }

  test("round-12c ops run from YAML registry and LazyFrame round-trips") {
    val d = docsDf
    val sk = graft.api.Registry("skew_report")(d,
      graft.api.Conf.fromYaml("type: skew_report\nkey: lang"), null)
    assert(sk.columns.contains("skew_factor"))
    val sh = graft.api.Registry("skew_report")(d,
      graft.api.Conf.fromYaml(
        "type: skew_report\nmode: heavy\nkey: lang\nk: 2\n" +
          "target_per_key: 1"), null)
    assert(sh.count() <= 2)
    val pc = graft.api.Registry("pmi_cooccur")(d,
      graft.api.Conf.fromYaml(
        "type: pmi_cooccur\ntext_key: text\nwindow: 2"), null)
    assert(pc.columns.toSeq ==
      Seq("x", "y", "n_xy", "n_x", "n_y", "pmi"))
    val mt = graft.api.Registry("markdown_tables")(
      d.withColumn("md", lit("| H |\n|---|\n| v |")),
      graft.api.Conf.fromYaml(
        "type: markdown_tables\nid_key: doc_id\ntext_key: md"), null)
    assert(mt.count() == d.count())

    import graft.api.LazyFrame
    val dir = java.nio.file.Files.createTempDirectory("r12c").toString
    d.withColumn("md", lit("| H |\n|---|\n| v |"))
      .write.mode("overwrite").parquet(s"$dir/docs.parquet")
    val lf = LazyFrame.read("docs", s"$dir/docs.parquet")
      .markdownTables("doc_id", "md")
    assert(LazyFrame.fromYaml(lf.toYaml).toYaml == lf.toYaml)
    assert(lf.run(spark).count() == d.count())
    val ls = LazyFrame.read("docs", s"$dir/docs.parquet")
      .skewHeavyKeys("lang", k = 1, targetPerKey = 1L)
      .skewSummary("key")
    assert(LazyFrame.fromYaml(ls.toYaml).toYaml == ls.toYaml)
    assert(ls.run(spark).head().getLong(1) == 1L)  // one heavy key row
    val lpm = LazyFrame.read("docs", s"$dir/docs.parquet")
      .pmiCooccur("text", window = 1, minCount = 2L)
    assert(LazyFrame.fromYaml(lpm.toYaml).toYaml == lpm.toYaml)
    lpm.run(spark).collect()
  }

  // ------------------------------------------- vocab decode round-trip

  test("vocab decode: round-trips in-vocab ids, unks unknown ids") {
    val vocab = df(StructType(Seq(StructField("token", StringType),
      StructField("id", LongType))),
      Row("alpha", 0L), Row("beta", 1L))
    val d = df(StructType(Seq(StructField("id", LongType),
      StructField("toks", ArrayType(StringType)))),
      Row(1L, Seq("alpha", "beta", "gamma")))
    val enc = graft.ops.VocabCoverage.toIds(d, "toks", vocab)
    val dec = graft.ops.VocabCoverage.fromIds(enc, "ids", vocab).head()
    assert(dec.getSeq[Long](2) == Seq(0L, 1L, -1L))
    assert(dec.getSeq[String](3) == Seq("alpha", "beta", "<unk>"))
  }

  // ------------------------------------------------------ anchor texts

  test("anchor texts: per-host top-k with count/tie ordering") {
    val schema = StructType(Seq(StructField("dst_host", StringType),
      StructField("anchor", StringType)))
    val links = df(schema,
      Row("h.com", "big"), Row("h.com", "big"), Row("h.com", "mid"),
      Row("h.com", "mid"), Row("h.com", "aaa"), Row("h.com", "zzz"),
      Row("x.org", "one"), Row(null, "drop"), Row("y.net", ""))
    val top = graft.sources.HtmlLinks.anchorTexts(links, k = 3)
      .orderBy("dst_host", "rank").collect()
    // h.com: big(2) rank1, mid(2)... tie broken anchor asc -> big < mid;
    // then aaa(1) beats zzz(1) on the tie
    assert(top.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3))).toSeq == Seq(
      ("h.com", "big", 2L, 1L), ("h.com", "mid", 2L, 2L),
      ("h.com", "aaa", 1L, 3L), ("x.org", "one", 1L, 1L)))
  }

  // -------------------------------------------------- scan stats/prune

  test("scan stats: footer bounds match data; sorted layout prunes") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_scanstats").toString
    val d = df(docSchema, (0 until 400).map(i =>
      Row(i.toLong, s"t$i")): _*)
    // sorted layout: 4 contiguous ranges -> a range predicate prunes 3/4
    (0 until 4).foreach { b =>
      d.filter(col("id") >= b * 100 && col("id") < (b + 1) * 100)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/r$b")
    }
    val rg = graft.sources.ScanStats.rowGroups(spark, dir, "id")
    val got = rg.collect().map(r => (r.getString(3).toLong,
      r.getString(4).toLong, r.getLong(2))).sortBy(_._1).toSeq
    assert(got == Seq((0L, 99L, 100L), (100L, 199L, 100L),
      (200L, 299L, 100L), (300L, 399L, 100L)))
    val est = graft.sources.ScanStats.pruneEstimate(rg, 120, 130).head()
    assert(est.getLong(0) == 4 && est.getLong(1) == 1)
    assert(est.getLong(2) == 400 && est.getLong(3) == 100)
    assert(est.getDouble(4) == 0.75)
    // no stats for a missing column -> nothing prunable
    val rgMissing = graft.sources.ScanStats.rowGroups(spark, dir, "nope")
    val estM = graft.sources.ScanStats
      .pruneEstimate(rgMissing, 120, 130).head()
    assert(estM.getLong(1) == 4 && estM.getDouble(4) == 0.0)
    // string column stats render via UTF8
    val rgText = graft.sources.ScanStats.rowGroups(spark, dir, "text")
      .collect()
    assert(rgText.forall(r => r.getString(3).startsWith("t")))
  }

  test("round-12d ops run from YAML registry and LazyFrame round-trips") {
    val d = docsDf
    val vocab = df(StructType(Seq(StructField("token", StringType),
      StructField("id", LongType))), Row("alpha", 0L))
    val enc = d.withColumn("ids", array(lit(0L), lit(9L)))
    val ctx = graft.api.OpContext(spark, null, Map("v" -> vocab))
    val dec = graft.api.Registry("vocab_decode")(enc,
      graft.api.Conf.fromYaml(
        "type: vocab_decode\nids_key: ids\nvocab: v"), ctx)
    assert(dec.head().getSeq[String](dec.columns.indexOf("tokens")) ==
      Seq("alpha", "<unk>"))
    val links = d.select(lit("h.com").as("dst_host"),
      lit("anchor text").as("anchor"))
    val at = graft.api.Registry("anchor_texts")(links,
      graft.api.Conf.fromYaml("type: anchor_texts\nk: 1"), null)
    assert(at.count() == 1 && at.head().getLong(2) == d.count())
    val rgSchema = StructType(Seq(StructField("file", StringType),
      StructField("row_group", LongType), StructField("rows", LongType),
      StructField("min_value", StringType),
      StructField("max_value", StringType), StructField("nulls", LongType)))
    val rg = df(rgSchema, Row("f", 0L, 10L, "0", "9", 0L),
      Row("f", 1L, 10L, "10", "19", 0L))
    val pe = graft.api.Registry("scan_stats_estimate")(rg,
      graft.api.Conf.fromYaml(
        "type: scan_stats_estimate\nlo: 0.0\nhi: 5.0"), null)
    assert(pe.head().getDouble(4) == 0.5)

    import graft.api.LazyFrame
    val dir = java.nio.file.Files.createTempDirectory("r12d").toString
    links.write.mode("overwrite").parquet(s"$dir/links.parquet")
    val lf = LazyFrame.read("links", s"$dir/links.parquet").anchorTexts(1)
    assert(LazyFrame.fromYaml(lf.toYaml).toYaml == lf.toYaml)
    assert(lf.run(spark).count() == 1)
  }

  // ----------------------------------------------------- bradley-terry

  test("bradley terry: multi-item dominance, drops, degenerate winner") {
    val schema = StructType(Seq(StructField("a", StringType),
      StructField("b", StringType), StructField("w", StringType)))
    // x beats y 3:1, y beats z 3:1, x beats z 4:0 -> rating x > y > z
    val rows =
      Seq.fill(3)(Row("x", "y", "x")) ++ Seq(Row("x", "y", "y")) ++
        Seq.fill(3)(Row("y", "z", "y")) ++ Seq(Row("y", "z", "z")) ++
        Seq.fill(4)(Row("x", "z", "x")) ++
        Seq(Row("x", "y", "tie"), Row("x", "x", "x")) // dropped rows
    val d = df(schema, rows: _*)
    val out = graft.ops.BradleyTerry.fit(d, "a", "b", "w")
      .orderBy("rank").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("x", "y", "z"))
    assert(out(0).getLong(1) == 7 && out(0).getLong(2) == 8)  // x: 7/8
    assert(out(2).getLong(1) == 1 && out(2).getLong(2) == 8)  // z: 1/8
    val ratings = out.map(_.getDouble(3))
    assert(ratings(0) > ratings(1) && ratings(1) > ratings(2))
    assert(ratings.forall(r => r > 0))
  }

  // -------------------------------------------------- collapse repeats

  test("collapse repeats: runs, phrase loops, cascades, gram bound") {
    val schema = StructType(Seq(StructField("text", StringType)))
    def run(s: String, maxGram: Int = 3): String =
      graft.ops.RepeatCollapse.collapse(df(schema, Row(s)), "text",
        maxGram).head().getString(1)
    assert(run("a a a a") == "a")
    assert(run("x y x y x y") == "x y")
    assert(run("buy now buy now buy now done") == "buy now done")
    assert(run("a b c a b c a b c") == "a b c")
    assert(run("x y x y y") == "x y")          // cascade after collapse
    assert(run("no repeats here at all") == "no repeats here at all")
    assert(run("a b a") == "a b a")            // non-adjacent: kept
    assert(run("") == "")
    assert(run("  spaced   out  ") == "spaced out")
    // 4-gram loop survives maxGram=3, collapses at maxGram=4
    val four = "p q r s p q r s"
    assert(run(four, 3) == four)
    assert(run(four, 4) == "p q r s")
  }

  // ------------------------------------------------------- salted join

  test("salted join: equals the plain join on a hot-key fixture") {
    val big = df(StructType(Seq(StructField("id", LongType),
      StructField("k", StringType))),
      (0 until 300).map(i =>
        Row(i.toLong, if (i % 10 < 8) "hot" else s"k${i % 10}")): _*)
    val dim = df(StructType(Seq(StructField("k", StringType),
      StructField("label", StringType))),
      Row("hot", "H"), Row("k8", "A"), Row("k9", "B"))
    val salted = graft.ops.SaltedJoin.inner(big, dim, "k", 4, "id")
      .select("id", "label").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val plain = big.join(dim, "k").select("id", "label").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain && salted.size == 300)
    intercept[IllegalArgumentException] {
      graft.ops.SaltedJoin.inner(big, dim.withColumnRenamed("label", "id"),
        "k", 4, "id") // shared non-key column must be rejected
    }
  }

  test("round-12e ops run from YAML registry and LazyFrame round-trips") {
    val d = docsDf
    val comps = d.select(lit("a").as("a"), lit("b").as("b"),
      when(col("doc_id") % 2 === 0, lit("a")).otherwise(lit("b")).as("w"))
    val bt = graft.api.Registry("bradley_terry")(comps,
      graft.api.Conf.fromYaml(
        "type: bradley_terry\na_key: a\nb_key: b\nwinner_key: w"), null)
    assert(bt.count() == 2 && bt.columns.contains("rating"))
    val cr = graft.api.Registry("collapse_repeats")(
      d.withColumn("t2", concat(col("text"), lit(" spam spam"))),
      graft.api.Conf.fromYaml(
        "type: collapse_repeats\ntext_key: t2"), null)
    assert(cr.filter(col("text_collapsed").endsWith("spam spam")).count() == 0)
    val dim = d.select((col("doc_id") % 2).as("doc_mod")).distinct()
      .withColumn("label", col("doc_mod").cast("string"))
    val ctx = graft.api.OpContext(spark, null, Map("dim" -> dim))
    val sj = graft.api.Registry("salted_join")(
      d.withColumn("doc_mod", col("doc_id") % 2),
      graft.api.Conf.fromYaml(
        "type: salted_join\nsmall: dim\nkey: doc_mod\nsalts: 2\n" +
          "salt_expr: doc_id"), ctx)
    assert(sj.count() == d.count())

    import graft.api.LazyFrame
    val dir = java.nio.file.Files.createTempDirectory("r12e").toString
    comps.write.mode("overwrite").parquet(s"$dir/comps.parquet")
    val lf = LazyFrame.read("comps", s"$dir/comps.parquet")
      .bradleyTerry("a", "b", "w")
    assert(LazyFrame.fromYaml(lf.toYaml).toYaml == lf.toYaml)
    assert(lf.run(spark).count() == 2)
    d.write.mode("overwrite").parquet(s"$dir/docs.parquet")
    val lc = LazyFrame.read("docs", s"$dir/docs.parquet")
      .collapseRepeats("text", maxGram = 2)
    assert(LazyFrame.fromYaml(lc.toYaml).toYaml == lc.toYaml)
    assert(lc.run(spark).count() == d.count())
  }

  // -------------------------------------------- stratified exact sample

  test("stratified exact: floor(frac*n) per stratum, deterministic pick") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("g", StringType)))
    val d = df(schema, (0 until 100).map(i =>
      Row(i.toLong, if (i < 70) "big" else "small")): _*)
    val out = graft.ops.SampleOp.stratifiedExact(d, "g", 0.5, "id")
    val byG = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG == Map("big" -> 35L, "small" -> 15L))
    // deterministic: same selection on rerun
    val a = out.select("id").collect().map(_.getLong(0)).toSet
    val b = graft.ops.SampleOp.stratifiedExact(d, "g", 0.5, "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(graft.ops.SampleOp.stratifiedExact(d, "g", 0.0, "id")
      .count() == 0)
    assert(graft.ops.SampleOp.stratifiedExact(d, "g", 1.0, "id")
      .count() == 100)
  }

  // -------------------------------------------------- robots sitemaps

  test("robots sitemaps: any case, anywhere, absent when none") {
    val schema = StructType(Seq(StructField("host", StringType),
      StructField("body", StringType)))
    val d = df(schema,
      Row("a", "User-agent: *\nDisallow: /\nSITEMAP: https://a/x.xml"),
      Row("b", "sitemap: https://b/1.xml\n# c\nSitemap:   https://b/2.xml"),
      Row("c", "User-agent: *\nAllow: /"))
    val out = graft.ops.RobotsTxt.sitemaps(d, "host", "body").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("a", "https://a/x.xml"), ("b", "https://b/1.xml"),
      ("b", "https://b/2.xml")))
  }

  // ------------------------------------------------ correlation matrix

  test("correlate: collinear 1, inverted -1, nulls excluded per pair") {
    val schema = StructType(Seq(StructField("x", DoubleType),
      StructField("y", DoubleType), StructField("z", DoubleType)))
    val d = df(schema,
      Row(1.0, 2.0, -1.0), Row(2.0, 4.0, -2.0), Row(3.0, 6.0, -3.0),
      Row(4.0, 8.0, null))
    val out = graft.ops.Profile.correlationMatrix(d, Seq("x", "y", "z"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), if (r.isNullAt(3)) null else r.getDouble(3)))).toMap
    assert(out(("x", "y")) == (4L, 1.0))
    assert(out(("x", "z")) == (3L, -1.0))   // null row excluded
    assert(out(("y", "z")) == (3L, -1.0))
    // constant column -> null corr, not a crash
    val c = df(schema, Row(1.0, 5.0, 1.0), Row(2.0, 5.0, 2.0))
    val cc = graft.ops.Profile.correlationMatrix(c, Seq("x", "y"))
      .head()
    assert(cc.isNullAt(3))
  }

  test("round-12f ops run from YAML registry and LazyFrame round-trips") {
    val d = docsDf
    val se = graft.api.Registry("sample")(d,
      graft.api.Conf.fromYaml(
        "type: sample\nmethod: stratified_exact\nstratify_key: lang\n" +
          "fraction: 0.5\nkey_expr: doc_id"), null)
    assert(se.count() <= d.count())
    val rs = graft.api.Registry("robots_txt")(
      d.select(lit("h").as("host"),
        lit("Sitemap: https://h/s.xml").as("body")).limit(1),
      graft.api.Conf.fromYaml(
        "type: robots_txt\nmode: sitemaps\nhost_key: host\n" +
          "content_key: body"), null)
    assert(rs.head().getString(1) == "https://h/s.xml")
    val co = graft.api.Registry("correlate")(
      d.select(col("doc_id").cast("double").as("a"),
        (col("doc_id") * 2).cast("double").as("b")),
      graft.api.Conf.fromYaml("type: correlate\ncolumns: [a, b]"), null)
    assert(co.head().getDouble(3) == 1.0)

    import graft.api.LazyFrame
    val dir = java.nio.file.Files.createTempDirectory("r12f").toString
    d.write.mode("overwrite").parquet(s"$dir/docs.parquet")
    val lf = LazyFrame.read("docs", s"$dir/docs.parquet")
      .stratifiedExact("lang", 0.5, "doc_id")
    assert(LazyFrame.fromYaml(lf.toYaml).toYaml == lf.toYaml)
    assert(lf.run(spark).count() == se.count())
  }

  // --------------------------------------------------------- parse json

  test("parse json: graft schema dialect, malformed to null, keep_raw") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("j", StringType)))
    val d = df(schema,
      Row(1L, """{"n": 7, "xs": [1, 2], "o": {"s": "v"}}"""),
      Row(2L, "{broken"),
      Row(3L, null))
    val out = graft.ops.JsonOps.parseColumn(d, "j",
      Seq("n" -> "int", "xs" -> "list[int]", "o" -> "{s: str}"))
      .orderBy("id").collect()
    assert(out(0).getLong(2) == 7L)
    assert(out(0).getSeq[Long](3) == Seq(1L, 2L))
    assert(out(0).getStruct(4).getString(0) == "v")
    assert(out(1).isNullAt(2) && out(2).isNullAt(2))
    val dropped = graft.ops.JsonOps.parseColumn(d, "j",
      Seq("n" -> "int"), keepRaw = false)
    assert(!dropped.columns.contains("j"))
    val yaml = graft.api.Registry("parse_json")(d,
      graft.api.Conf.fromYaml(
        "type: parse_json\njson_key: j\nschema:\n  n: int\n  o: '{s: str}'"),
      null)
    assert(yaml.columns.toSeq.takeRight(2) == Seq("n", "o"))
    import graft.api.LazyFrame
    val dir = java.nio.file.Files.createTempDirectory("r12g").toString
    d.write.mode("overwrite").parquet(s"$dir/j.parquet")
    val lf = LazyFrame.read("j", s"$dir/j.parquet")
      .parseJson("j", Seq("n" -> "int"))
    assert(LazyFrame.fromYaml(lf.toYaml).toYaml == lf.toYaml)
    assert(lf.run(spark).filter(col("n") === 7).count() == 1)
  }

  // ----------------------------------------------------- train classifier

  test("train classifier: LinearScore serves the exported model exactly") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("label", LongType), StructField("text", StringType)))
    val d = df(schema, (0 until 60).map { i =>
      val good = i % 2 == 1
      Row(i.toLong, if (good) 1L else 0L,
        s"common words here ${if (good) "greatstuff" else "badstuff"} tail$i")
    }: _*)
    val m = graft.ops.TextClassifier.train(d, "label", "text",
      vocabSize = 1024, maxIter = 30)
    // bias + weights through the pure-aggregation scorer
    val scored = graft.ops.LinearScore.withScore(d, "id", "text",
      m.weights, m.bias, "binary", "score")
    val eval = graft.ops.ClassifierEval.report(scored, "label", "score")
      .head()
    assert(eval.getDouble(eval.fieldIndex("auc")) == 1.0)
    assert(scored.filter((col("score") >= 0.5) =!= (col("label") === 1))
      .count() == 0)
    // the discriminative tokens carry opposite-sign weights
    val w = m.weights.collect().map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    assert(w("greatstuff") > 0 && w("badstuff") < 0)
    // YAML arm emits the __bias__ sentinel row
    val yaml = graft.api.Registry("train_classifier")(
      d.select(col("label"), col("text")),
      graft.api.Conf.fromYaml(
        "type: train_classifier\nlabel_key: label\ntext_key: text\n" +
          "max_iter: 20"), null)
    assert(yaml.filter(col("token") === "__bias__").count() == 1)
  }

  // ------------------------------------------------- embedding training

  test("word2vec: topic clusters separate through trained doc vectors") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("text", StringType)))
    // two disjoint-vocabulary topics, many co-occurrence repetitions
    val catWords = Seq("cat", "kitten", "meow", "whiskers", "purr")
    val finWords = Seq("bank", "loan", "rate", "credit", "bond")
    val rng = new scala.util.Random(7)
    val rows = (0 until 80).map { i =>
      val words = if (i % 2 == 0) catWords else finWords
      Row(i.toLong,
        Seq.fill(12)(words(rng.nextInt(words.size))).mkString(" "))
    }
    val d = df(schema, rows: _*)
    val vectors = graft.ops.EmbedTrain.word2vec(d, "text", dim = 16,
      minCount = 1, maxIter = 3, seed = 11L)
    assert(vectors.count() == 10)
    val docs = graft.ops.EmbedTrain.docVectors(d, "id", "text", vectors)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    assert(docs.length == 80)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      dot / (na * nb)
    }
    val cats = docs.filter(_._1 % 2 == 0).map(_._2)
    val fins = docs.filter(_._1 % 2 == 1).map(_._2)
    def meanCos(xs: Seq[(Array[Double], Array[Double])]) =
      xs.map { case (a, b) => cos(a, b) }.sum / xs.size
    val intra = meanCos(cats.take(10).zip(cats.slice(10, 20)) ++
      fins.take(10).zip(fins.slice(10, 20)))
    val inter = meanCos(cats.take(20).zip(fins.take(20)))
    assert(intra > inter,
      s"w2v topics failed to separate: intra=$intra inter=$inter")
    // YAML arm
    val yaml = graft.api.Registry("train_embeddings")(d,
      graft.api.Conf.fromYaml(
        "type: train_embeddings\ntext_key: text\ndim: 8\nmin_count: 1"),
      null)
    assert(yaml.columns.toSeq == Seq("token", "vector"))
    val ctx = graft.api.OpContext(spark, null, Map("v" -> vectors))
    val dv = graft.api.Registry("doc_vectors")(d,
      graft.api.Conf.fromYaml(
        "type: doc_vectors\nid_key: id\ntext_key: text\nvectors: v"), ctx)
    assert(dv.count() == 80)
  }

  // ---------------------------------------------------- distinct sketch

  test("distinct sketch: small-n exactness, merge = full-build, YAML") {
    val schema = StructType(Seq(StructField("g", StringType),
      StructField("v", StringType)))
    val rows = (0 until 500).map(i => Row(s"g${i % 2}", s"v${i % 37}"))
    val d = df(schema, rows: _*)
    val full = graft.ops.DistinctSketch.build(d, "g", "v")
    // HLL is exact at tiny cardinalities (sparse mode): 37 distincts
    assert(full.collect().forall(r =>
      r.getLong(r.fieldIndex("estimate")) == 37L))
    val h1 = graft.ops.DistinctSketch.build(
      d.filter(substring(col("v"), 2, 10).cast("int") % 2 === 0), "g", "v")
    val h2 = graft.ops.DistinctSketch.build(
      d.filter(substring(col("v"), 2, 10).cast("int") % 2 === 1), "g", "v")
    val merged = graft.ops.DistinctSketch.merge(h1.unionByName(h2))
    val m = merged.collect().map(r =>
      r.getString(0) -> r.getLong(r.fieldIndex("estimate"))).toMap
    assert(m == Map("g0" -> 37L, "g1" -> 37L))
    assert(merged.columns.toSeq ==
      Seq("slice", "sketch", "estimate", "n_rows"))
    val yaml = graft.api.Registry("distinct_sketch")(d,
      graft.api.Conf.fromYaml(
        "type: distinct_sketch\nslice_key: g\nvalue_expr: v\nlg_k: 12"),
      null)
    assert(yaml.count() == 2)
  }

  // -------------------------------------------------- best-fit packing

  test("pack best-fit: beats greedy, respects budget, oversized alone") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("g", StringType), StructField("tok", LongType)))
    val rows = Seq(6L, 5L, 4L, 3L, 2L).zipWithIndex.map { case (t, i) =>
      Row(i.toLong, "a", t) }
    val d = df(schema, rows: _*)
    val bfd = graft.ops.PackOp.packBestFit(d, Seq("g"), "id", "tok", 10L)
    val packs = bfd.groupBy("pack_id").agg(sum("tok").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(packs == Map(0L -> 10L, 1L -> 10L))       // perfect fill
    val greedy = graft.ops.PackOp(d, Seq("g"), "id", "tok", 10L)
    assert(greedy.select("pack_id").distinct().count() == 3) // BFD wins
    // oversized row gets its own pack; budget never exceeded
    val big = df(schema, Row(1L, "a", 15L), Row(2L, "a", 4L))
    val bp = graft.ops.PackOp.packBestFit(big, Seq("g"), "id", "tok", 10L)
    assert(bp.select("pack_id").distinct().count() == 2)
    // YAML strategy arm
    val yaml = graft.api.Registry("pack")(d,
      graft.api.Conf.fromYaml(
        "type: pack\nstrategy: best_fit\ngroup_keys: [g]\n" +
          "order_key: id\ntoken_expr: tok\nbudget: 10"), null)
    assert(yaml.select("pack_id").distinct().count() == 2)
  }

  // -------------------------------------------------- sb model export

  test("sb model: stored-table scoring is bit-equal to direct perDoc") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("text", StringType)))
    val d = df(schema,
      Row(1L, "the cat sat on the mat"),
      Row(2L, "the dog sat on a log"),
      Row(3L, "an unseen trigram sequence entirely"),
      Row(4L, "to"))  // sub-trigram: absent from both outputs
    val ref = d.filter(col("id") <= 2)
    val direct = graft.ops.StupidBackoff.perDoc(d, "id", "text",
      Some(ref)).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val model = graft.ops.StupidBackoff.trainModel(ref, "text")
    val stored = graft.ops.StupidBackoff.perDocWithModel(d, "id", "text",
      model).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(stored == direct && stored.size == 3)
    // model table shape: ctx totals per order
    val byN = model.groupBy("n").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byN.keySet == Set(1, 2, 3) && byN.values.forall(_ > 0))
    val ctx = graft.api.OpContext(spark, null, Map("m" -> model))
    val viaYaml = graft.api.Registry("sb_score")(d,
      graft.api.Conf.fromYaml(
        "type: sb_score\nid_key: id\ntext_key: text\nmodel: m"), ctx)
    assert(viaYaml.columns.contains("sb_nll") && viaYaml.count() == 3)
  }

  // --------------------------------------------- review-pass regressions

  test("robots: colon-bearing paths survive; bare field lines are inert") {
    val schema = StructType(Seq(StructField("host", StringType),
      StructField("body", StringType)))
    val d = df(schema, Row("h",
      "User-agent: *\nDisallow: /api:v2/\nDisallow\nAllow: /api:v2/ok"))
    val rules = graft.ops.RobotsTxt.parseRules(d, "host", "body")
      .collect().map(r => (r.getBoolean(2), r.getString(3))).toSet
    // the FULL path after the first colon, and no fabricated rule from
    // the colon-less 'Disallow' line
    assert(rules == Set((false, "/api:v2/"), (true, "/api:v2/ok")))
    val urls = df(StructType(Seq(StructField("id", LongType),
      StructField("host", StringType), StructField("path", StringType),
      StructField("priority", LongType))),
      Row(1L, "h", "/api:v2/secret", 9L), Row(2L, "h", "/api:v2/ok", 5L))
    val out = graft.ops.RobotsTxt.isAllowed(urls, "id", "host", "path",
      graft.ops.RobotsTxt.parseRules(d, "host", "body"), "bot")
      .orderBy("id").collect()
    // extra url columns survive the verdict join-back
    assert(out.head.schema.fieldNames.contains("priority"))
    assert(!out(0).getBoolean(out(0).fieldIndex("allowed")))
    assert(out(1).getBoolean(out(1).fieldIndex("allowed")))
  }

  test("edit pairs: identical-text multiplicity stays distinct-bounded") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    // 6 identical empty strings + 3 identical short + 1 fringe + 1 long
    val rows = (1L to 6L).map(Row(_, "")) ++
      (7L to 9L).map(Row(_, "ab")) ++ Seq(Row(10L, "abc"), Row(11L, "xyzq"))
    val d = df(schema, rows: _*)
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(a.length)
    }
    val data = rows.map(r => (r.getLong(0), r.getString(1)))
    val expected = (for {
      (ia, sa) <- data; (ib, sb) <- data
      if ia < ib && lev(sa, sb) <= 2
    } yield (ia, ib, lev(sa, sb).toLong)).toSet
    val got = graft.dedup.EditDedup.pairs(d, "id", "s", t = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
    assert(expected.contains((1L, 2L, 0L)))   // identical empties pair
    assert(expected.contains((7L, 10L, 1L)))  // short-fringe
  }

  // ------------------------------------------------------- skipgram

  test("skipgram: window shape, label split, seeded determinism") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("text", StringType)))
    val d = df(schema, Row(1L, "a b c d"), Row(2L, "x"))
    val out = graft.ops.SkipGram.pairs(d, "id", "text", window = 1,
      negatives = 2, seed = 7L)
    // doc2 has one token: no slots. doc1: 3 interior adjacencies x 2
    // directions = 6 positives, 12 negatives
    assert(out.filter(col("label") === 1).count() == 6)
    assert(out.filter(col("label") === 0).count() == 12)
    val pos = out.filter(col("label") === 1)
      .select("center", "context").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pos == Set(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
      ("c", "d"), ("d", "c")))
    // negatives come from the corpus vocabulary and replay identically
    val vocab = Set("a", "b", "c", "d", "x")
    val negs = out.filter(col("label") === 0).select("context")
      .collect().map(_.getString(0))
    assert(negs.forall(vocab.contains))
    val again = graft.ops.SkipGram.pairs(d, "id", "text", 1, 2, 7L)
      .collect().map(_.toSeq).toSet
    assert(again == out.collect().map(_.toSeq).toSet)
    // different seed -> (almost surely) different samples, same shape
    val other = graft.ops.SkipGram.pairs(d, "id", "text", 1, 2, 8L)
    assert(other.count() == 18)
    val yaml = graft.api.Registry("skipgram_pairs")(d,
      graft.api.Conf.fromYaml(
        "type: skipgram_pairs\nid_key: id\ntext_key: text\nwindow: 1\n" +
          "negatives: 1"), null)
    assert(yaml.count() == 12)
  }

  // ----------------------------------------------------------- runs

  test("runs: islands per key, singleton runs, value reappearance") {
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("t", LongType), StructField("v", StringType),
      StructField("e", LongType)))
    val d = df(schema,
      Row(1L, 10L, "a", 1L), Row(1L, 20L, "a", 2L), Row(1L, 30L, "b", 3L),
      Row(1L, 40L, "a", 4L),   // 'a' reappears -> NEW run, not merged
      Row(2L, 10L, "x", 5L))
    val out = graft.ops.Runs.collapse(d, "k", "t", "v", "e")
      .orderBy("k", "run_start").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq(
      (1L, "a", 10L, 20L, 2L), (1L, "b", 30L, 30L, 1L),
      (1L, "a", 40L, 40L, 1L), (2L, "x", 10L, 10L, 1L)))
    val yaml = graft.api.Registry("runs")(d,
      graft.api.Conf.fromYaml(
        "type: runs\nkey: k\norder_key: t\nvalue_key: v\ntie_break: e"),
      null)
    assert(yaml.count() == 4)
  }

  // ---------------------------------------------------- dedup audit

  test("dedup audit: kept/survivor trail agrees with keepBest") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val d = df(schema,
      Row(1L, "abcdefghij"), Row(2L, "abcdefghijk"),
      Row(3L, "abcdefghix"), Row(4L, "zzzzzzzzzz"),
      Row(5L, "qqqq"), Row(6L, "qqqq"))
    val audit = graft.dedup.EditDedup.audit(d, "id", "s", t = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(r.fieldIndex("survivor_id")),
          r.getBoolean(r.fieldIndex("kept")))).toMap
    // consistency with keepBest's survivors (same fixture as the
    // keep-best spec: cluster {1,2,3} -> 2; 4 unpaired; {5,6} -> 5)
    assert(audit == Map(1L -> (2L, false), 2L -> (2L, true),
      3L -> (2L, false), 4L -> (4L, true), 5L -> (5L, true),
      6L -> (5L, false)))
    val kept = graft.dedup.EditDedup.keepBest(d, "id", "s", 1)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(audit.filter(_._2._2).keySet == kept)
    // minhash audit arm: near-identical long docs, same contract
    val docs = df(schema,
      Row(1L, "the quick brown fox jumps over the lazy dog again"),
      Row(2L, "the quick brown fox jumps over the lazy dog again!"),
      Row(3L, "completely different content with no shared shingles"))
    val ma = graft.dedup.MinHashDedup.audit(docs, "id", "s",
      jaccardThreshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        r.getBoolean(r.fieldIndex("kept"))).toMap
    assert(ma(3L))
    assert(Seq(ma(1L), ma(2L)).count(identity) == 1)
    val yaml = graft.api.Registry("dedup")(d,
      graft.api.Conf.fromYaml(
        "type: dedup\nmethod: edit_audit\nid_key: id\ntext_key: s\n" +
          "threshold: 1"), null)
    assert(yaml.count() == d.count())
  }

  // ------------------------------------------------ compact round-trip

  test("compact: run preserves content and hits the target layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r12_compact")
    val path = dir.resolve("t").toString
    val d = df(docSchema, (0 until 200).map(i =>
      Row(i.toLong, s"row $i text")): _*)
    d.repartition(32).write.mode("overwrite").parquet(path)
    val before = graft.ops.Datacard
      .fingerprint(spark.read.parquet(path), Seq("id", "text")).head()
    val p = graft.sources.Compact.run(spark, path, 128L << 20)
    assert(p.worthIt && p.targetFiles == 1)
    assert(graft.sources.Compact.dataFileCount(spark, path) == 1)
    val after = graft.ops.Datacard
      .fingerprint(spark.read.parquet(path), Seq("id", "text")).head()
    assert(before == after)
  }
}
