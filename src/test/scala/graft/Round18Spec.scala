package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-18 regressions: the de-boxed CER kernel (VERDICT r17 item 1),
  * external golden fixtures for WER/CER (item 5 — the byte-BPE
  * precedent: pin the conventions to PUBLIC ground truth, not just the
  * DuckDB replication of our own formula), and the broadcast
  * t-closeness global-distribution join (item 3). */
class Round18Spec extends SparkSpec {

  private val pairSchema = StructType(Seq(StructField("id", LongType),
    StructField("cand", StringType), StructField("ref", StringType)))

  // ---------------- editDistChars: the de-boxed CER kernel (item 1)

  test("editDistChars: textbook Levenshtein pairs") {
    val d = graft.ops.TextSim.editDistChars _
    // the two classic published examples (Wagner & Fischer 1974 /
    // every Levenshtein survey): kitten->sitting = 3, and the
    // saturday->sunday = 3 worked example
    assert(d("kitten", "sitting") == 3)
    assert(d("saturday", "sunday") == 3)
    // empty-side conventions
    assert(d("", "") == 0)
    assert(d("", "xyz") == 3)
    assert(d("xyz", "") == 3)
    // common prefix/suffix strip edge cases: the strip must not
    // over-consume when prefix and suffix overlap
    assert(d("abc", "abc") == 0)
    assert(d("aaa", "aa") == 1)   // prefix eats 2, suffix must stop
    assert(d("aa", "aaaa") == 2)
    assert(d("abab", "ab") == 2)
    assert(d("abc", "axc") == 1)  // strip leaves a 1x1 DP
    assert(d("ab", "ba") == 2)
  }

  test("editDistChars: parity with the boxed word-level kernel") {
    // the r17 cer ran editDist over one-char-string arrays; the
    // de-boxed kernel must compute the identical distance
    val pairs = Seq(
      ("hello world", "hello duck"),
      ("the quick brown fox", "the kwik brown fx"),
      ("mississippi", "misisipi"),
      ("a1b2c3", "abc"),
      ("same same", "same same"))
    for ((a, b) <- pairs) {
      val boxed = graft.ops.TextSim.editDist(
        a.split("").filter(_.nonEmpty), b.split("").filter(_.nonEmpty))
      assert(graft.ops.TextSim.editDistChars(a, b) == boxed, s"($a, $b)")
    }
  }

  // ------------- banded (Ukkonen) thresholded kernels (max_rate arm)

  test("bandedDp: exact parity with the brute kernels under the band") {
    // deterministic pseudo-random word/char pairs: the banded kernel
    // must return the EXACT brute distance whenever it is <= band and
    // -1 exactly when it exceeds it — for every band from 0 to past
    // the true distance
    val words = Array("aa", "bb", "cc", "dd", "ee")
    def seq(seed: Int, n: Int): Array[String] =
      Array.tabulate(n)(i => words(math.abs(
        scala.util.hashing.MurmurHash3.productHash((seed, i))) % 5))
    for (seed <- 0 until 12; la <- Seq(0, 1, 4, 9); lb <- Seq(0, 2, 7, 9)) {
      val a = seq(seed, la); val b = seq(seed + 100, lb)
      val brute = graft.ops.TextSim.editDist(a, b)
      for (band <- 0 to brute + 2) {
        val got = graft.ops.TextSim.editDistWithin(a, b, band)
        assert(got == (if (brute <= band) brute else -1),
          s"seed=$seed la=$la lb=$lb band=$band brute=$brute got=$got")
      }
      val as = a.mkString(""); val bs = b.mkString("")
      val bruteC = graft.ops.TextSim.editDistChars(as, bs)
      for (band <- 0 to bruteC + 2) {
        val got = graft.ops.TextSim.editDistCharsWithin(as, bs, band)
        assert(got == (if (bruteC <= band) bruteC else -1),
          s"chars seed=$seed band=$band brute=$bruteC got=$got")
      }
    }
    // negative band certifies nothing is within
    assert(graft.ops.TextSim.editDistWithin(
      Array("x"), Array("x"), -1) == -1)
  }

  test("wer/cer max_rate: within rows carry exact metrics, exceeded rows sentinels") {
    // ref has 4 tokens -> band = floor(0.25 * 4) = 1: one-substitution
    // candidates are within (wer 0.25 exactly on the boundary), two
    // are exceeded
    val d = df(pairSchema,
      Row(1L, "aa bb cc dd", "aa bb cc dd"),   // 0 edits, within
      Row(2L, "aa xx cc dd", "aa bb cc dd"),   // 1 edit = band, within
      Row(3L, "aa xx yy dd", "aa bb cc dd"),   // 2 edits, exceeded
      Row(4L, "", "aa bb cc dd"))              // 4 deletions, exceeded
    val w = graft.ops.TextSim.wer(d, Seq("id"), "cand", "ref",
        maxRate = Some(0.25))
      .orderBy("id").collect()
    assert(w.map(_.getAs[Boolean]("within")).toSeq ==
      Seq(true, true, false, false))
    assert(w.map(_.getAs[Long]("edits")).toSeq == Seq(0L, 1L, -1L, -1L))
    assert(w(1).getAs[Double]("wer") == 0.25)
    assert(w(2).getAs[Double]("wer") == -1.0)
    // cer: ref canonical = "abcd efgh" (9 chars) -> band = 2
    val dc = df(pairSchema,
      Row(1L, "abcd efgh", "abcd efgh"),   // 0 edits, within
      Row(2L, "abcd ef", "abcd efgh"),     // 2 deletions = band, within
      Row(3L, "abcd", "abcd efgh"))        // 5 deletions, exceeded
    val c = graft.ops.TextSim.cer(dc, Seq("id"), "cand", "ref",
        maxRate = Some(0.25))
      .orderBy("id").collect()
    assert(c.map(_.getAs[Boolean]("within")).toSeq ==
      Seq(true, true, false))
    assert(c.map(_.getAs[Long]("edits")).toSeq == Seq(0L, 2L, -1L))
    // unthresholded schema is UNCHANGED (no within column)
    assert(!graft.ops.TextSim.wer(d, Seq("id"), "cand", "ref")
      .columns.contains("within"))
    // knob validation fails loud
    intercept[IllegalArgumentException] {
      graft.ops.TextSim.wer(d, Seq("id"), "cand", "ref",
        maxRate = Some(0.0))
    }
  }

  test("wer/cer max_rate reaches the Registry and the facades") {
    val d = df(pairSchema, Row(1L, "aa bb cc dd", "aa bb cc dd"),
      Row(2L, "xx yy cc dd", "aa bb cc dd"))
    val out = graft.api.Registry("wer")(d, graft.api.Conf.fromYaml(
      """type: wer
        |id_keys: [id]
        |candidate_key: cand
        |reference_key: ref
        |max_rate: 0.25""".stripMargin), ctx())
    assert(out.columns.contains("within"))
    assert(out.filter(col("within")).count() == 1)
    val yaml = graft.api.LazyFrame.read("docs", "x.json")
      .cer(Seq("id"), "cand", "ref", maxRate = Some(0.3)).toYaml
    assert(yaml.contains("max_rate"), yaml)
    assert(!graft.api.LazyFrame.read("docs", "x.json")
      .wer(Seq("id"), "cand", "ref").toYaml.contains("max_rate"))
  }

  // ------------- golden fixtures from published examples (item 5)

  test("wer: jiwer README golden case and the empty-ref convention") {
    // jiwer's README leads with wer("hello world", "hello duck") ==
    // 0.5 — one substitution over two reference words (jiwer docs,
    // jitsi/jiwer). Our canonicalization (lowercase alnum tokens)
    // is identity on the fixture, so the convention pin is exact.
    val d = df(pairSchema,
      Row(1L, "hello duck", "hello world"),
      // the standard ASR worked example: 1 substitution / 4 words
      Row(2L, "the kwik brown fox", "the quick brown fox"),
      // empty reference: edits/max(ref,1) = cand token count, not NaN
      Row(3L, "three new words", ""))
    val out = graft.ops.TextSim.wer(d, Seq("id"), "cand", "ref")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(r.fieldIndex("edits")),
          r.getDouble(r.fieldIndex("wer")))).toMap
    assert(out(1L) == ((1L, 0.5)))
    assert(out(2L) == ((1L, 0.25)))
    assert(out(3L) == ((3L, 3.0)))
  }

  test("cer: textbook golden cases through the DataFrame surface") {
    val d = df(pairSchema,
      // kitten vs sitting: 3 edits / 7 ref chars = 0.428571 (rnd6)
      Row(1L, "kitten", "sitting"),
      // sunday vs saturday: 3 / 8 = 0.375
      Row(2L, "sunday", "saturday"),
      // canonical form spans token boundaries: "ab cd" vs "ab ce" is
      // 1 edit / 5 chars (the space is a canonical character)
      Row(3L, "ab cd", "ab ce"),
      // empty reference: cand canonical length / 1
      Row(4L, "abc", ""))
    val out = graft.ops.TextSim.cer(d, Seq("id"), "cand", "ref")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(r.fieldIndex("edits")),
          r.getDouble(r.fieldIndex("cer")))).toMap
    assert(out(1L) == ((3L, 0.428571)))
    assert(out(2L) == ((3L, 0.375)))
    assert(out(3L) == ((1L, 0.2)))
    assert(out(4L) == ((3L, 3.0)))
  }

  test("cer: string-staged plan — no per-character array ever built") {
    val d = df(pairSchema, Row(1L, "candidate text", "reference text"))
    val out = graft.ops.TextSim.cer(d, Seq("id"), "cand", "ref")
    // the r17 kernel staged filter(split(canon, '')) — an ArrayType
    // column of one-char strings serialized through Tungsten, clamped
    // with slice(). The de-boxed plan stages the canonical STRING:
    // substring-clamped, and the kernel's input columns are StringType
    // (word tokenization's own split(text, ' ') legitimately remains).
    val plan = out.queryExecution.analyzed.toString
    assert(plan.contains("substring(_ctf"), plan.take(2000))
    assert(!plan.contains("slice(_ctf"), plan.take(2000))
    // clamp + flag still behave: 60-char canonical, maxChars 20
    val longRow = df(pairSchema,
      Row(2L, ("x" * 30) + " " + ("y" * 29), "x" * 30))
    val t = graft.ops.TextSim.cer(longRow, Seq("id"), "cand", "ref",
      maxChars = 20).collect().head
    assert(t.getLong(t.fieldIndex("cand_chars")) == 20L)
    assert(t.getLong(t.fieldIndex("ref_chars")) == 20L)
    assert(t.getBoolean(t.fieldIndex("truncated")))
    // clamped prefixes agree on the first 20 chars -> 0 edits
    assert(t.getLong(t.fieldIndex("edits")) == 0L)
  }

  // ------ t-closeness: broadcast global-distribution join (item 3)

  test("tCloseness: no exchange on the sensitive key; rows unchanged") {
    val schema = StructType(Seq(StructField("lang", StringType),
      StructField("source", StringType)))
    // a dominant sensitive value (the hot-key case the broadcast
    // exists for) plus a NULL sensitive value (must stay a value)
    val rows = Seq.fill(40)(Row("en", "none")) ++
      Seq(Row("en", "web"), Row("de", "none"), Row("de", null),
        Row(null, "none"))
    val p = java.nio.file.Files.createTempDirectory("graft_tclose")
      .resolve("t.parquet").toString
    df(schema, rows: _*).write.mode("overwrite").parquet(p)
    val d = spark.read.parquet(p)
    val rep = graft.ops.Profile.tCloseness(d, Seq("lang"), "source",
      t = 0.15)
    val plan = rep.queryExecution.executedPlan.toString
    // the global-distribution join must broadcast (distinct-value-
    // sized side), never shuffle the cells table by the raw sensitive
    // value — a dominant value makes that key hot by construction
    assert(!plan.contains("hashpartitioning(_svk"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    val r = rep.collect().head
    assert(r.getLong(r.fieldIndex("n_rows")) == 44L)
    assert(r.getLong(r.fieldIndex("n_classes")) == 3L)
    // the groups arm shares the broadcast core; the de class (half
    // "none", half NULL — the NULL sensitive value must stay a value)
    // is far from the none-dominated global distribution
    val groups = graft.ops.Profile.tClosenessGroups(d, Seq("lang"),
      "source", t = 0.2, limit = 10).collect()
    assert(groups.exists(g => !g.isNullAt(0) && g.getString(0) == "de" &&
      g.getLong(g.fieldIndex("group_size")) == 2L), groups.mkString("; "))
  }

  // -------- contradictory knobs fail loud (r17 ADVICE item 3)

  private def ctx(datasets: Map[String, org.apache.spark.sql.DataFrame] =
      Map.empty) =
    graft.api.OpContext(spark, graft.llm.MockLlmClient(), datasets)

  test("bitext_mine mode: audit rejects threshold/mutual_best") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("e", ArrayType(DoubleType))))
    val side = df(schema, Row(0L, Seq(1.0, 0.0)), Row(1L, Seq(0.0, 1.0)))
    val c = ctx(Map("tgt" -> side))
    for (knob <- Seq("threshold: 1.1", "mutual_best: true")) {
      val e = intercept[IllegalArgumentException] {
        graft.api.Registry("bitext_mine")(side, graft.api.Conf.fromYaml(
          s"""type: bitext_mine
             |target_from: tgt
             |id_key: id
             |embedding_key: e
             |mode: audit
             |$knob""".stripMargin), c)
      }
      assert(e.getMessage.contains("no effect under mode: audit"),
        e.getMessage)
    }
    // the LazyFrame facade must stay constructible in audit mode
    // (unset Option knobs are omitted, not emitted as defaults) —
    // while an EXPLICIT contradictory knob is emitted and rejected
    // rather than silently dropped
    val yaml = graft.api.LazyFrame.read("docs", "x.json")
      .bitextMine("id", "e", "tgt", mode = "audit").toYaml
    assert(!yaml.contains("threshold") && !yaml.contains("mutual_best"),
      yaml)
    val loudYaml = graft.api.LazyFrame.read("docs", "x.json")
      .bitextMine("id", "e", "tgt", mode = "audit",
        threshold = Some(1.5)).toYaml
    assert(loudYaml.contains("threshold"), loudYaml)
  }

  test("t_closeness method: categorical rejects bins") {
    val schema = StructType(Seq(StructField("lang", StringType),
      StructField("v", LongType)))
    val d = df(schema, Row("en", 1L), Row("de", 2L))
    val e = intercept[IllegalArgumentException] {
      graft.api.Registry("t_closeness")(d, graft.api.Conf.fromYaml(
        """type: t_closeness
          |columns: [lang]
          |sensitive_key: v
          |t: 0.2
          |bins: 8""".stripMargin), ctx())
    }
    assert(e.getMessage.contains("no effect under method: categorical"),
      e.getMessage)
    // facade: unset bins is omitted; an EXPLICIT bins is always
    // emitted (so a categorical config carrying it gets the Registry
    // rejection instead of a silent drop)
    val catYaml = graft.api.LazyFrame.read("docs", "x.json")
      .tCloseness(Seq("lang"), "v", 0.2).toYaml
    assert(!catYaml.contains("bins"), catYaml)
    val numYaml = graft.api.LazyFrame.read("docs", "x.json")
      .tCloseness(Seq("lang"), "v", 0.2, method = "numeric",
        bins = Some(8)).toYaml
    assert(numYaml.contains("bins"), numYaml)
    val loudCat = graft.api.LazyFrame.read("docs", "x.json")
      .tCloseness(Seq("lang"), "v", 0.2, bins = Some(8)).toYaml
    assert(loudCat.contains("bins"), loudCat)
  }
}
