package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dedup.Winnow

/** Round-10: winnowing fingerprints. */
class Round10lSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  private def fps(text: String, k: Int = 5, w: Int = 4): Seq[(Long, Long)] =
    Winnow.fingerprints(df(schema, Row(1L, text)), "id", "text", k, w)
      .orderBy("pos").collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[Long]("fp_hash"))).toSeq

  test("winnow: selection density is ~2/(w+1), never empty") {
    val words = (1 to 400).map(i => s"t${i * 31 % 997}").mkString(" ")
    val sel = fps(words, k = 5, w = 4)
    val nGrams = 400 - 4
    assert(sel.nonEmpty)
    // expected density 2/(w+1) = 0.4; allow a generous band
    val density = sel.size.toDouble / nGrams
    assert(density > 0.2 && density < 0.6, s"density $density")
    // positions are valid gram indices, strictly increasing (distinct set)
    assert(sel.map(_._1) == sel.map(_._1).sorted)
    assert(sel.forall(p => p._1 >= 0 && p._1 < nGrams))
  }

  test("winnow guarantee: any shared passage >= w+k-1 tokens shares a fingerprint") {
    val (k, w) = (5, 4)
    // shared passage of exactly w+k-1 = 8 tokens inside different contexts
    val passage = (1 to 8).map(i => s"shared$i").mkString(" ")
    val a = s"alpha beta gamma $passage delta epsilon zeta eta theta"
    val b = s"one two three four five $passage six seven eight nine"
    val d = df(schema, Row(1L, a), Row(2L, b))
    val byDoc = Winnow.fingerprints(d, "id", "text", k, w)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getAs[Long]("fp_hash")).toSet }
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty,
      "documents sharing an 8-token passage must share a fingerprint")
    // and sharedFingerprints surfaces it
    val shared = Winnow.sharedFingerprints(d, "id", "text", k, w).count()
    assert(shared >= 1)
  }

  test("winnow: disjoint documents share nothing") {
    val a = (1 to 60).map(i => s"a$i").mkString(" ")
    val b = (1 to 60).map(i => s"b$i").mkString(" ")
    val d = df(schema, Row(1L, a), Row(2L, b))
    assert(Winnow.sharedFingerprints(d, "id", "text").count() == 0)
  }

  test("winnow: short documents (fewer grams than the window) still fingerprint") {
    // 6 words -> 2 grams at k=5, window w=4 clamps to 2
    val sel = fps("a b c d e f", k = 5, w = 4)
    assert(sel.size == 1) // one window over both grams -> one selection
    // single-gram doc (shorter than k): the whole-text fallback gram
    assert(fps("x y", k = 5, w = 4).size == 1)
    // null text: no rows
    assert(Winnow.fingerprints(df(schema, Row(1L, null)), "id", "text")
      .count() == 0)
  }

  test("winnow: rightmost tie-break (equal hashes pick the later position)") {
    // identical gram repeated -> equal hashes everywhere; each window
    // selects its RIGHTMOST element
    val words = Seq.fill(10)("same word again and more").mkString(" ")
    // build from one repeated k-gram: 'x x x x x x x x' with k=1
    val sel = fps("x x x x x x", k = 1, w = 3)
    // windows [0..2],[1..3],[2..4],[3..5] -> rightmost of each: 2,3,4,5
    assert(sel.map(_._1) == Seq(2L, 3L, 4L, 5L))
  }

  test("winnow matchPairs: localizes the shared passage; head caps postings") {
    val passage = (1 to 12).map(i => s"sh$i").mkString(" ")
    val d = df(schema,
      Row(1L, s"alpha beta gamma delta $passage tail one two"),
      Row(2L, s"x1 x2 x3 $passage y1 y2 y3"),
      Row(3L, "entirely different content with no overlap at all here"))
    val pairs = Winnow.matchPairs(d, "id", "text", k = 5, w = 4,
      maxPostingHead = None).collect()
    assert(pairs.length == 1)
    val p = pairs.head
    assert(p.getLong(0) == 1L && p.getLong(1) == 2L)
    assert(p.getAs[Long]("n_shared") >= 1)
    assert(p.getAs[Long]("pos_a") >= 0 && p.getAs[Long]("pos_b") >= 0)
    // a fingerprint shared by ALL docs: posting head=1 kills its pairs
    val same = (1 to 30).map(i => s"c$i").mkString(" ")
    val many = df(schema, (1L to 6L).map(i => Row(i, same)): _*)
    val capped = Winnow.matchPairs(many, "id", "text", k = 5, w = 4,
      maxPostingHead = Some(1))
    assert(capped.count() == 0) // each posting keeps one doc -> no pairs
    val uncapped = Winnow.matchPairs(many, "id", "text", k = 5, w = 4,
      maxPostingHead = None)
    assert(uncapped.count() == 15) // all C(6,2) pairs
  }

  test("mixture plan: downsample, upsample with epochs, shortfall, exclusion") {
    import graft.ops.MixtureSolver
    import spark.implicits._
    val stats = Seq(
      ("big", 1000L),   // plenty: downsampled
      ("tiny", 50L),    // scarce: upsampled over epochs
      ("empty", 0L),    // impossible ask: shortfall
      ("extra", 500L))  // no weight: excluded but listed
      .toDF("domain", "n_tokens")
    val plan = MixtureSolver.plan(stats,
      Map("big" -> 0.5, "tiny" -> 0.3, "empty" -> 0.2), totalBudget = 1000L)
      .collect().map(r => r.getAs[String]("domain") -> r).toMap
    val big = plan("big")
    assert(big.getAs[Long]("want_tokens") == 500L &&
      big.getAs[Long]("epochs") == 1L &&
      big.getAs[Double]("per_epoch_fraction") == 0.5)
    val tiny = plan("tiny")
    assert(tiny.getAs[Long]("want_tokens") == 300L &&
      tiny.getAs[Long]("epochs") == 6L &&
      tiny.getAs[Double]("per_epoch_fraction") == 1.0) // 300/(50*6)
    val empty = plan("empty")
    assert(empty.getAs[Long]("epochs") == 0L &&
      empty.getAs[Long]("shortfall") == 200L)
    val extra = plan("extra")
    assert(extra.getAs[Double]("target_share") == 0.0 &&
      extra.getAs[Long]("want_tokens") == 0L &&
      extra.getAs[Long]("epochs") == 0L)
    // weights normalize: 2x the same weights give the same plan
    val doubled = MixtureSolver.plan(stats,
      Map("big" -> 1.0, "tiny" -> 0.6, "empty" -> 0.4), 1000L)
      .collect().map(r => r.getAs[String]("domain") ->
        r.getAs[Long]("want_tokens")).toMap
    assert(doubled("big") == 500L && doubled("tiny") == 300L)
    // registry surface
    val docs = Seq(("a", "one two three"), ("b", "four five")).toDF("d", "text")
    val viaYaml = graft.api.Registry("mixture_plan")(docs, graft.api.Conf.fromYaml(
      "type: mixture_plan\ndomain_key: d\ntoken_expr: \"size(split(text, ' '))\"\n" +
        "weights: {a: 0.5, b: 0.5}\ntotal_budget: 10"), null)
    assert(viaYaml.count() == 2)
  }

  test("grounding: extractiveness precision with hand-checked values") {
    import graft.ops.Grounding
    val s2 = StructType(Seq(StructField("src", StringType),
      StructField("resp", StringType)))
    def score(src: String, resp: String): Option[Double] = {
      val r = df(s2, Row(src, resp))
        .select(Grounding.scoreCol(col("src"), col("resp"), 2)).head()
      if (r.isNullAt(0)) None else Some(r.getDouble(0))
    }
    // fully extractive response -> 1.0
    assert(score("a b c d e", "b c d") == Some(1.0))
    // fully novel -> 0.0
    assert(score("a b c d e", "x y z") == Some(0.0))
    // "a b" and "b x": one of two distinct bigrams grounded -> 0.5
    assert(score("a b c", "a b x") == Some(0.5))
    // null/empty response -> null
    assert(score("a b c", null).isEmpty)
    // registry surface appends the column
    val out = graft.api.Registry("grounding")(
      df(s2, Row("a b c", "a b")), graft.api.Conf.fromYaml(
        "type: grounding\nsource_key: src\nresponse_key: resp"), null)
    assert(out.head().getAs[Double]("grounding_score") == 1.0)
  }

  test("winnow yaml registry: both modes") {
    val d = df(schema,
      Row(1L, (1 to 30).map(i => s"w$i").mkString(" ")),
      Row(2L, (1 to 30).map(i => s"w$i").mkString(" ")))
    val f = graft.api.Registry("winnow")(d, graft.api.Conf.fromYaml(
      "type: winnow\nid_key: id\ntext_key: text"), null)
    assert(f.columns.toSeq == Seq("id", "pos", "fp_hash"))
    val s = graft.api.Registry("winnow")(d, graft.api.Conf.fromYaml(
      "type: winnow\nid_key: id\ntext_key: text\nmode: shared"), null)
    assert(s.collect().forall(_.getAs[Long]("n_docs") == 2L))
  }
}
