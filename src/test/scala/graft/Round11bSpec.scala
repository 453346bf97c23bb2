package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 widening: sentence-aligned chunking, encoding-quality
  * detection, numeric column profiler, tokenizer fertility stats. */
class Round11bSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  // ------------------------------------------------ chunkBySentences

  test("chunk sentences: whole sentences pack greedily under the budget") {
    val d = df(docSchema,
      Row(1L, "one two three. four five. six seven eight nine. ten."))
    val chunks = graft.ops.Segment.chunkBySentences(d, "id", "text",
      maxWords = 5).collect()
      .map(r => (r.getLong(1), r.getString(3))).sortBy(_._1)
    // s1 (3w) + s2 (2w) = 5 <= 5; s3 (4w) + s4 (1w) = 5 <= 5
    assert(chunks.map(_._2).toSeq == Seq(
      "one two three. four five.", "six seven eight nine. ten."))
    // no chunk exceeds the budget
    val back = graft.ops.Segment.chunkBySentences(d, "id", "text", 5)
      .agg(max("n_words")).head().getLong(0)
    assert(back <= 5)
  }

  test("chunk sentences: an oversize sentence becomes its own chunk") {
    val d = df(docSchema,
      Row(1L, "a b. this sentence has seven words in it. c d."))
    val chunks = graft.ops.Segment.chunkBySentences(d, "id", "text",
      maxWords = 4).collect().map(_.getString(3)).sorted
    assert(chunks.contains("this sentence has seven words in it."))
    assert(chunks.contains("a b.") && chunks.contains("c d."))
  }

  test("chunk sentences: overlap re-opens the next chunk") {
    val d = df(docSchema,
      Row(1L, "s1 a. s2 b. s3 c. s4 d."))
    val noOv = graft.ops.Segment.chunkBySentences(d, "id", "text",
      maxWords = 4).collect().map(_.getString(3)).toSeq.sorted
    assert(noOv == Seq("s1 a. s2 b.", "s3 c. s4 d."))
    val ov = graft.ops.Segment.chunkBySentences(d, "id", "text",
      maxWords = 4, overlap = 1).collect()
      .map(r => (r.getLong(1), r.getString(3))).sortBy(_._1).map(_._2)
    // chunk 2 starts with chunk 1's last sentence
    assert(ov.head == "s1 a. s2 b.")
    assert(ov(1).startsWith("s2 b."), ov.mkString("; "))
    // every original sentence still appears somewhere
    Seq("s1 a.", "s2 b.", "s3 c.", "s4 d.").foreach { s =>
      assert(ov.exists(_.contains(s)), s)
    }
  }

  test("chunk sentences: empty text yields no chunks") {
    val d = df(docSchema, Row(1L, ""), Row(2L, "word one. two."))
    val out = graft.ops.Segment.chunkBySentences(d, "id", "text", 10)
    assert(out.filter(col("id") === 1).count() == 0)
    assert(out.filter(col("id") === 2).count() == 1)
  }

  // ------------------------------------------------ encoding quality

  test("encoding quality: each damage class is counted by its own signal") {
    val d = df(docSchema,
      Row(1L, "clean ascii text here"),
      Row(2L, "double cafÃ© and mÃ¼nchen"),
      Row(3L, "punct itâ€™s and â€quoted"),
      Row(4L, "repl �� here"),
      Row(5L, "c1 " + 0x85.toChar + " control"))
    val out = graft.ops.EncodingQuality.report(d, "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def sig(id: Long, name: String) = out(id).getAs[Long](name)
    assert(sig(1, "n_replacement") == 0 && sig(1, "n_double_utf8") == 0 &&
      sig(1, "n_punct_mojibake") == 0 && sig(1, "n_c1_controls") == 0)
    assert(out(1L).getAs[Double]("mojibake_score") == 0.0)
    assert(sig(2, "n_double_utf8") == 2)
    assert(sig(3, "n_punct_mojibake") == 2)
    // the left-double-quote mojibake in row 3 is â€ + U+009C (the Latin-1
    // decode of CP1252 0x9C) — that trailing byte IS a C1 control
    assert(sig(3, "n_c1_controls") == 1)
    assert(sig(4, "n_replacement") == 2)
    assert(sig(5, "n_c1_controls") == 1)
    assert(!out(1L).getAs[Boolean]("mojibake_flag"))
    assert(out(4L).getAs[Boolean]("mojibake_flag")) // 2 markers / 11 chars
  }

  test("encoding quality: clean mode drops damaged rows, keeps null text") {
    val d = df(docSchema,
      Row(1L, "fine"), Row(2L, "bad ���"), Row(3L, null))
    val kept = graft.ops.EncodingQuality.clean(d, "text")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  // ------------------------------------------------ profile

  test("profile: exact stats, nulls, and quartiles per column") {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", DoubleType)))
    val d = df(schema,
      Row(1L, 10.0), Row(2L, null), Row(3L, 30.0), Row(4L, 20.0),
      Row(5L, 40.0))
    val p = graft.ops.Profile.numeric(d, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = p("a")
    assert(a.getAs[Long]("n") == 5 && a.getAs[Long]("n_null") == 0)
    assert(a.getAs[Long]("n_distinct") == 5)
    assert(a.getAs[Double]("min") == 1.0 && a.getAs[Double]("max") == 5.0)
    assert(a.getAs[Double]("mean") == 3.0)
    // sample stddev of 1..5 = sqrt(2.5)
    assert(math.abs(a.getAs[Double]("stddev") - math.sqrt(2.5)) < 1e-6)
    assert(a.getAs[Double]("p50") == 3.0)
    assert(a.getAs[Double]("p25") == 2.0 && a.getAs[Double]("p75") == 4.0)
    val b = p("b")
    assert(b.getAs[Long]("n") == 4 && b.getAs[Long]("n_null") == 1)
    assert(b.getAs[Double]("mean") == 25.0)
    assert(b.getAs[Double]("p50") == 25.0) // interpolated between 20 and 30
  }

  test("profile: approx mode returns sane estimates") {
    val d = spark.range(1000).select(col("id").as("v"))
    val p = graft.ops.Profile.numeric(d, Seq("v"), approx = true).head()
    assert(math.abs(p.getAs[Long]("n_distinct") - 1000L) <= 50)
    assert(math.abs(p.getAs[Double]("p50") - 499.5) <= 25)
    assert(p.getAs[Double]("mean") == 499.5) // mean stays exact
  }

  test("profile: single row has null stddev, not NaN") {
    val d = df(StructType(Seq(StructField("x", LongType))), Row(7L))
    val p = graft.ops.Profile.numeric(d, Seq("x")).head()
    assert(p.isNullAt(p.fieldIndex("stddev")))
    assert(p.getAs[Double]("mean") == 7.0)
  }

  // ------------------------------------------------ tokenizer stats

  test("tokenizer stats: fertility numbers from a known merge list") {
    import graft.ops.BpeTrain.Merge
    val d = df(docSchema, Row(1L, "abab ab"), Row(2L, "cd"))
    // merges: a+b -> ab, ab+ab -> abab
    val merges = Seq(Merge("a", "b", 0), Merge("ab", "ab", 0))
    val st = graft.ops.BpeTrain.tokenizerStats(d, "text", merges).head()
    // words: abab -> [abab] (1 tok), ab -> [ab] (1), cd -> [c, d] (2)
    assert(st.getAs[Long]("n_words") == 3)
    assert(st.getAs[Long]("n_tokens") == 4)
    assert(st.getAs[Double]("tokens_per_word") == math.rint(4.0 / 3 * 1e6) / 1e6)
    // chars: 4 + 2 + 2 = 8 over 4 tokens
    assert(st.getAs[Double]("chars_per_token") == 2.0)
    assert(st.getAs[Double]("unsplit_frac") == math.rint(2.0 / 3 * 1e6) / 1e6)
  }

  // ------------------------------------------------ quota select

  test("quota select: keeps the best n per key, deterministic ties") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("host", StringType),
      StructField("score", DoubleType)))
    val d = df(schema,
      Row(1L, "a.com", 0.9), Row(2L, "a.com", 0.8), Row(3L, "a.com", 0.8),
      Row(4L, "a.com", 0.1), Row(5L, "b.com", 0.5))
    val kept = graft.ops.QuotaSelect(d, "host", 2, "score",
      tieBreak = "id").select("id").collect().map(_.getLong(0)).toSet
    // a.com: 0.9 then the 0.8 tie breaks to id=2; b.com under quota
    assert(kept == Set(1L, 2L, 5L))
    // asc order flips the pick
    val asc = graft.ops.QuotaSelect(d, "host", 1, "score", desc = false,
      tieBreak = "id").select("id").collect().map(_.getLong(0)).toSet
    assert(asc == Set(4L, 5L))
  }

  test("quota select plan carries the WindowGroupLimit pre-shuffle prune") {
    val d = spark.range(100).select(col("id"),
      (col("id") % 5).as("k"), (col("id") % 7).as("s"))
    val plan = graft.ops.QuotaSelect(d, "k", 3, "s", tieBreak = "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  // ------------------------------------------------ winsorize / vocab

  test("winsorize clips to quantiles; iqr flags the fences") {
    val d = spark.range(1, 101).select(col("id").cast("long").as("v"))
      .union(df(StructType(Seq(StructField("v", LongType))), Row(100000L)))
    val w = graft.ops.Profile.winsorize(d, "v", 0.01, 0.99)
    val mx = w.agg(max("v_winsor")).head().getDouble(0)
    assert(mx < 100000.0) // the spike is clipped to ~p99
    val o = graft.ops.Profile.iqrOutliers(d, "v")
    val flagged = o.filter(col("is_outlier")).select("v")
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(100000L))
  }

  test("build vocab: smallest count-desc prefix within the coverage share") {
    val d = df(docSchema,
      Row(1L, "a a a a b b b c c d")) // 10 tokens: a=4 b=3 c=2 d=1
    val v90 = graft.ops.VocabCoverage.buildVocab(d, "text", 0.9)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(v90 == Seq(("a", 4L), ("b", 3L), ("c", 2L))) // cum 9 <= 9
    val v50 = graft.ops.VocabCoverage.buildVocab(d, "text", 0.5)
      .collect().map(_.getString(0)).toSeq
    assert(v50 == Seq("a")) // cum 4 <= 5; +b would be 7 > 5
  }

  // ------------------------------------------------ surfaces

  test("round-11 ops run from YAML registry and LazyFrame round-trips") {
    val d = docsDf
    val chunks = graft.api.Registry("chunk_sentences")(d,
      graft.api.Conf.fromYaml(
        "type: chunk_sentences\nid_key: doc_id\ntext_key: text\n" +
          "max_words: 5"), null)
    assert(chunks.count() > 0)
    val enc = graft.api.Registry("encoding_quality")(d,
      graft.api.Conf.fromYaml(
        "type: encoding_quality\ntext_key: text"), null)
    assert(enc.columns.contains("mojibake_score"))
    val prof = graft.api.Registry("profile")(d,
      graft.api.Conf.fromYaml(
        "type: profile\ncolumns: [doc_id]"), null)
    assert(prof.count() == 1)
    val tok = graft.api.Registry("tokenizer_stats")(d,
      graft.api.Conf.fromYaml(
        "type: tokenizer_stats\ntext_key: text\n" +
          "merges: [[t, h], [th, e]]"), null)
    assert(tok.head().getAs[Long]("n_words") > 0)

    import graft.api.LazyFrame
    val dir = java.nio.file.Files.createTempDirectory("r11b").toString
    docsDf.write.mode("overwrite").parquet(s"$dir/docs.parquet")
    val lf = LazyFrame.read("docs", s"$dir/docs.parquet")
      .encodingQuality("text")
    val reparsed = LazyFrame.fromYaml(lf.toYaml)
    assert(reparsed.toYaml == lf.toYaml)
    assert(lf.run(spark).count() == docsDf.count())
    val lp = LazyFrame.read("docs", s"$dir/docs.parquet").profile(Seq("doc_id"))
    assert(lp.run(spark).count() == 1)
    val lc = LazyFrame.read("docs", s"$dir/docs.parquet")
      .chunkSentences("doc_id", "text", 5)
    assert(lc.run(spark).count() > 0)
    val lt = LazyFrame.read("docs", s"$dir/docs.parquet")
      .tokenizerStats("text", numMerges = 2)
    assert(lt.run(spark).count() == 1)
    val lq = LazyFrame.read("docs", s"$dir/docs.parquet")
      .quotaSelect("lang", 2, "length(text)", tieBreak = "doc_id")
    assert(lq.run(spark).count() > 0)
    val lw = LazyFrame.read("docs", s"$dir/docs.parquet")
      .winsorize("doc_id", 0.1, 0.9)
    assert(lw.run(spark).columns.contains("doc_id_winsor"))
    val lo = LazyFrame.read("docs", s"$dir/docs.parquet")
      .iqrOutliers("doc_id")
    assert(lo.run(spark).columns.contains("is_outlier"))
    val lv = LazyFrame.read("docs", s"$dir/docs.parquet")
      .buildVocab("text", 0.8)
    assert(lv.run(spark).count() > 0)
  }
}
