package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{CorpusOverlap, Segment}

/** Round-10: sentence segmentation + corpus-overlap estimation. */
class Round10fSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  test("segment: terminal punctuation splits; trailing quotes honored") {
    val d = df(schema,
      Row(1L, "Hello there. How are you? Fine! Trailing run no dot"))
    val out = Segment.sentences(d, "id", "text").orderBy("sent_idx")
      .collect().map(_.getAs[String]("sentence")).toSeq
    assert(out == Seq("Hello there.", "How are you?", "Fine!",
      "Trailing run no dot"))
    val q = df(schema, Row(1L, """He said "stop." Then left."""))
    val qs = Segment.sentences(q, "id", "text").orderBy("sent_idx")
      .collect().map(_.getAs[String]("sentence")).toSeq
    assert(qs == Seq("He said \"stop.\"", "Then left."))
  }

  test("segment: null/empty text yields no sentences; stats go null") {
    val d = df(schema, Row(1L, null), Row(2L, ""))
    assert(Segment.sentences(d, "id", "text").count() == 0)
    val st = Segment.sentenceStats(df(schema, Row(1L, ""), Row(2L, "One. Two three.")),
      "text").orderBy("id").collect()
    assert(st(0).getAs[Long]("n_sentences") == 0 &&
      st(0).isNullAt(st(0).fieldIndex("mean_sentence_words")))
    assert(st(1).getAs[Long]("n_sentences") == 2 &&
      st(1).getAs[Double]("mean_sentence_words") == 1.5 &&
      st(1).getAs[Long]("max_sentence_words") == 2)
  }

  private val sliceSchema = StructType(Seq(
    StructField("slice", StringType), StructField("text", StringType)))

  test("corpus overlap: identical slices estimate 1, disjoint estimate 0") {
    val shared = (1 to 60).map(i => s"w${i * 13 % 101}").mkString(" ")
    val other = (1 to 60).map(i => s"z${i * 7 % 89}").mkString(" ")
    val d = df(sliceSchema,
      Row("a", shared), Row("b", shared), Row("c", other))
    val m = CorpusOverlap.jaccardMatrix(d, "slice", "text", 3, 32)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(m(("a", "b")) == 1.0)
    assert(m(("a", "c")) == 0.0 && m(("b", "c")) == 0.0)
  }

  test("corpus overlap: estimate is duplicate-insensitive") {
    val text = (1 to 50).map(i => s"w${i * 13 % 101}").mkString(" ")
    val d1 = df(sliceSchema, Row("a", text), Row("b", text), Row("b", text))
    // b holds a's content twice over: gram SET identical -> estimate 1
    val m = CorpusOverlap.jaccardMatrix(d1, "slice", "text", 3, 32).head()
    assert(m.getDouble(2) == 1.0)
  }

  test("corpus overlap: estimate tracks exact Jaccard on a half-shared corpus") {
    // slice a: grams from words 1..60; slice b: words 31..90 -> substantial
    // but partial overlap; with 64 hashes the Broder estimate should land
    // near the exact 3-shingle Jaccard (deterministic: fixed data + seeds)
    val ta = (1 to 60).map(i => s"w$i").mkString(" ")
    val tb = (31 to 90).map(i => s"w$i").mkString(" ")
    val d = df(sliceSchema, Row("a", ta), Row("b", tb))
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val exact = {
      val (sa, sb) = (shingles(ta), shingles(tb))
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    val est = CorpusOverlap.jaccardMatrix(d, "slice", "text", 3, 64)
      .head().getDouble(2)
    assert(math.abs(est - exact) < 0.2,
      s"estimate $est too far from exact $exact")
  }

  test("corpus overlap: per-dump signature merge equals whole-corpus signatures") {
    val mk = (i: Int) => (1 to 40).map(j => s"w${(i * 37 + j * 13) % 211}")
      .mkString(" ")
    val dumpA = df(sliceSchema, Row("a", mk(1)), Row("b", mk(2)))
    val dumpB = df(sliceSchema, Row("a", mk(3)), Row("b", mk(4)), Row("c", mk(5)))
    val whole = dumpA.unionByName(dumpB)
    val merged = CorpusOverlap.mergeSignatures(
      CorpusOverlap.signatures(dumpA, "slice", "text", 3, 16),
      CorpusOverlap.signatures(dumpB, "slice", "text", 3, 16))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val direct = CorpusOverlap.signatures(whole, "slice", "text", 3, 16)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == direct) // min is associative: merge is EXACT
  }

  test("chat spans survive packing via offsetSpans") {
    import graft.ops.ChatOps
    val msgsSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("msgs", ArrayType(StructType(Seq(
        StructField("role", StringType),
        StructField("content", StringType)))))))
    val d = df(msgsSchema,
      Row(1L, Seq(Row("user", "hi"), Row("assistant", "yes"))))
    val rendered = ChatOps.renderWithSpans(d, "msgs")
    // simulate the sample landing at character 100 of a packed sequence
    val shifted = rendered.select(col("text"),
      ChatOps.offsetSpans(col("mask_spans"), lit(100L)).as("sp")).head()
    val text = shifted.getString(0)
    val sp = shifted.getSeq[Row](1).head
    val (s, e) = (sp.getLong(0), sp.getLong(1))
    assert(text.substring(s.toInt - 100, e.toInt - 100) == "yes")
  }

  test("segment + overlap yaml registry") {
    val d = df(schema, Row(1L, "One two. Three four."))
    val seg = graft.api.Registry("segment")(d, graft.api.Conf.fromYaml(
      "type: segment\nid_key: id\ntext_key: text"), null)
    assert(seg.count() == 2)
    val st = graft.api.Registry("segment")(d, graft.api.Conf.fromYaml(
      "type: segment\ntext_key: text\nstats: true"), null)
    assert(st.columns.contains("n_sentences"))
    val ov = graft.api.Registry("corpus_overlap")(
      df(sliceSchema, Row("a", "x y z w"), Row("b", "x y z w")),
      graft.api.Conf.fromYaml(
        "type: corpus_overlap\nslice_key: slice\ntext_key: text"), null)
    assert(ov.head().getDouble(2) == 1.0)
  }
}
