package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.BpeTrain
import graft.ops.BpeTrain.Merge

/** Round-10: full BPE vocabulary induction + the two encoders. */
class Round10bSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  test("bpe train: hand-computed two-merge example") {
    // words: aa x3, ab x1 -> pairs (a,a):3 (a,b):1 -> merge1 (a,a)
    // then vocab [aa]:3, [a,b]:1 -> merge2 (a,b)
    val d = df(schema, Row(1L, "aa aa ab"), Row(2L, "aa"))
    val merges = BpeTrain.train(d, "text", numMerges = 2)
    assert(merges == Seq(Merge("a", "a", 3L), Merge("a", "b", 1L)))
  }

  test("bpe train: stops early when no pair remains") {
    val d = df(schema, Row(1L, "ab ab"))
    // merge1 fuses the only pair; iteration 2 finds nothing
    val merges = BpeTrain.train(d, "text", numMerges = 10)
    assert(merges == Seq(Merge("a", "b", 2L)))
  }

  test("bpe train: argmax tie breaks (left, right) ascending") {
    // (a,b) and (c,d) both count 2 -> (a,b) wins
    val d = df(schema, Row(1L, "ab cd ab cd"))
    val merges = BpeTrain.train(d, "text", numMerges = 1)
    assert(merges == Seq(Merge("a", "b", 2L)))
  }

  test("bpe train: merged symbols participate in later pair counts") {
    // "abc" x3: merge1 (a,b):3 (ties with (b,c), (a,b) asc) ->
    // vocab [ab, c] -> merge2 (ab, c):3
    val d = df(schema, Row(1L, "abc abc abc"))
    val merges = BpeTrain.train(d, "text", numMerges = 2)
    assert(merges == Seq(Merge("a", "b", 3L), Merge("ab", "c", 3L)))
  }

  test("bpe applyMergeCol: left-to-right non-overlapping scan") {
    val d = df(StructType(Seq(StructField("syms", ArrayType(StringType)))),
      Row(Seq("a", "a", "a")), Row(Seq("a", "a", "a", "a")),
      Row(Seq("a", "b")), Row(Seq("a")), Row(Seq.empty[String]))
    val out = d.select(
      BpeTrain.applyMergeCol(col("syms"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(out == Seq(Seq("aa", "a"), Seq("aa", "aa"), Seq("a", "b"),
      Seq("a"), Seq.empty))
  }

  test("bpe encode: expression chain and greedy rank encoder agree") {
    val d = df(schema,
      Row(1L, "the fast spark join is good and fast"),
      Row(2L, "aaa aaaa ab abab low lower lowest"),
      Row(3L, ""), Row(4L, "a"))
    val merges = BpeTrain.train(d, "text", numMerges = 6)
    val expr = BpeTrain.encode(d, "text", merges)
      .select("id", "tokens").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val greedy = BpeTrain.encodeGreedy(d, "text", merges)
      .select("id", "tokens").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(expr == greedy)
    // tokens re-concatenate to the original words
    expr.foreach { case (id, toks) =>
      val orig = d.filter(col("id") === id).head().getString(1)
        .split(" ").filter(_.nonEmpty).mkString("")
      assert(toks.mkString("") == orig, s"row $id")
    }
  }

  test("bpe encodeGreedy: null text stays null; empty text yields no tokens") {
    val d = df(schema, Row(1L, null), Row(2L, "   "))
    val out = BpeTrain.encodeGreedy(d, "text", Seq(Merge("a", "b", 1L)))
      .orderBy("id").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("tokens")))
    assert(out(1).getSeq[String](out(1).fieldIndex("tokens")).isEmpty)
  }

  test("bpe train is partition-order invariant") {
    val rows = (1 to 120).map(i => Row(i.toLong,
      s"w${i % 13} abc${i % 5} shared tokens here"))
    val d = df(schema, rows: _*)
    val a = BpeTrain.train(d, "text", numMerges = 4)
    val b = BpeTrain.train(d.repartition(9), "text", numMerges = 4)
    assert(a == b)
  }

  test("bpe yaml registry: train and encode round-trip") {
    val d = df(schema, Row(1L, "aa aa ab"))
    val trainCfg = graft.api.Conf.fromYaml(
      "type: bpe_train\ntext_key: text\nnum_merges: 1")
    val mt = graft.api.Registry("bpe_train")(d, trainCfg, null)
    assert(mt.select("left", "right").head() == Row("a", "a"))
    val encCfg = graft.api.Conf.fromYaml(
      "type: bpe_encode\ntext_key: text\nmerges: [[a, a]]\ngreedy: true")
    val enc = graft.api.Registry("bpe_encode")(d, encCfg, null)
    assert(enc.select("tokens").head().getSeq[String](0) ==
      Seq("aa", "aa", "a", "b"))
  }
}
