package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.llm.MockLlmClient
import graft.ops._

/** ScalaCheck-driven property tests (SURVEY.md §5 strategy: round-trips and
  * associativity): deterministic seeded samples are batched into ONE
  * DataFrame per property so each property costs a handful of Spark jobs,
  * not one per case. */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val word: Gen[String] = for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield cs.mkString

  private val doc: Gen[String] = for {
    n <- Gen.choose(1, 50)
    ws <- Gen.listOfN(n, word)
  } yield ws.mkString(" ")

  test("property: split by token count reassembles to the original text") {
    val docs = samples(doc, 30)
    val d = df(StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))),
      docs.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }: _*)
    val chunks = SplitOp.byTokenCount(d, "sp", "text", 7, docIdExpr = "doc_id")
    val rebuilt = chunks
      .groupBy(col("sp_id"))
      .agg(concat_ws(" ", sort_array(collect_list(struct(col("sp_chunk_num"), col("text_chunk"))))
        .getField("text_chunk")).as("rebuilt"))
      .collect().map(r => r.get(0).toString.toLong -> r.getString(1)).toMap
    docs.zipWithIndex.foreach { case (t, i) =>
      assert(rebuilt(i.toLong) == t, s"doc $i did not round-trip")
    }
  }

  test("property: unnest emits exactly sum-of-list-sizes rows") {
    val lists = samples(Gen.listOf(Gen.choose(0L, 99L)), 40)
    val d = df(StructType(Seq(StructField("id", LongType),
      StructField("xs", ArrayType(LongType)))),
      lists.zipWithIndex.map { case (xs, i) => Row(i.toLong, xs) }: _*)
    assert(UnnestOp.list(d, "xs").count() == lists.map(_.size).sum)
    // keepEmpty adds one null-row per empty list (reference unnest.py).
    assert(UnnestOp.list(d, "xs", keepEmpty = true).count() ==
      lists.map(xs => math.max(xs.size, 1)).sum)
  }

  test("property: SimHashBits matches the reference fold over token hashes") {
    val arrays = samples(Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue)), 40)
    def model(hs: Seq[Long], bits: Int): Long = {
      val counts = new Array[Int](bits)
      hs.foreach(h => (0 until bits).foreach(b =>
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1))
      (0 until bits).foldLeft(0L)((acc, b) => if (counts(b) > 0) acc | (1L << b) else acc)
    }
    val d = df(StructType(Seq(StructField("id", LongType),
      StructField("hs", ArrayType(LongType)))),
      arrays.zipWithIndex.map { case (hs, i) => Row(i.toLong, hs) }: _*)
    val got = d.select(col("id"), graft.functions.SimHashBits(col("hs"), 60).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    arrays.zipWithIndex.foreach { case (hs, i) =>
      assert(got(i.toLong) == model(hs, 60), s"simhash mismatch on case $i")
    }
  }

  test("property: JaccardSimilarity equals set-based jaccard") {
    val pair = for {
      a <- Gen.listOf(Gen.choose(0L, 30L))
      b <- Gen.listOf(Gen.choose(0L, 30L))
    } yield (a.distinct.sorted, b.distinct.sorted)
    val pairs = samples(pair, 40).filter { case (a, b) => a.nonEmpty || b.nonEmpty }
    val d = df(StructType(Seq(StructField("id", LongType),
      StructField("a", ArrayType(LongType)), StructField("b", ArrayType(LongType)))),
      pairs.zipWithIndex.map { case ((a, b), i) => Row(i.toLong, a, b) }: _*)
    val got = d.select(col("id"),
      graft.functions.JaccardSimilarity(col("a"), col("b")).as("j"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      val inter = a.toSet.intersect(b.toSet).size.toDouble
      val union = a.toSet.union(b.toSet).size.toDouble
      val expected = if (union == 0) 0.0 else inter / union
      assert(math.abs(got(i.toLong) - expected) < 1e-12, s"jaccard mismatch on case $i")
    }
  }

  test("property: associative reduce is partition-independent") {
    val rows = samples(for {
      g <- Gen.oneOf("a", "b", "c")
      t <- doc
    } yield (g, t), 60)
    val d = df(StructType(Seq(StructField("grp", StringType), StructField("text", StringType))),
      rows.zipWithIndex.map { case ((g, t), i) => Row(g, s"$i $t") }: _*)
    def run(parts: Int) =
      AssociativeSemanticReduce(d.repartition(parts),
        AssociativeSemanticReduce.Config(
          name = "prop", reduceKeys = Seq("grp"), memberExpr = "text",
          outputSchema = Seq("acc" -> "str"), foldBatchSize = 7), MockLlmClient())
        .orderBy("grp").collect().toSeq
    assert(run(1) == run(7))
  }

  test("property: gather rendering always contains the current chunk") {
    val docs = samples(doc, 15)
    val d = df(StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))),
      docs.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }: _*)
    val chunks = SplitOp.byTokenCount(d, "sp", "text", 5, docIdExpr = "doc_id")
    val rendered = GatherOp(chunks, "text_chunk", "sp_id", "sp_chunk_num", 1, 1)
      .select("text_chunk", "text_chunk_rendered").collect()
    rendered.foreach { r =>
      assert(r.getString(1).contains(r.getString(0)))
    }
  }
}
