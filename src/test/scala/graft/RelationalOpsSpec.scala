package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops._

class CodeOpsSpec extends SparkSpec {
  private lazy val base = df(
    StructType(Seq(StructField("k", StringType), StructField("v", LongType))),
    Row("a", 1L), Row("a", 2L), Row("b", 3L))

  test("code_map merges outputs and drops keys") {
    val out = CodeMap(base, Seq("v2" -> "v * 2"), dropKeys = Seq("k"))
    assert(out.columns.toSeq == Seq("v", "v2"))
    assert(out.select(sum("v2")).collect()(0).getLong(0) == 12L)
  }
  test("code_map later outputs may reference earlier ones") {
    val out = CodeMap(base, Seq("v2" -> "v * 2", "v4" -> "v2 * 2"))
    assert(out.select(sum("v4")).collect()(0).getLong(0) == 24L)
  }
  test("code_filter with limit keeps n passing rows") {
    assert(CodeFilter(base, "v >= 2", limit = Some(1)).count() == 1)
  }
  test("code_reduce groups with counts column") {
    val out = CodeReduce(base, Seq("k"), Seq("total" -> "sum(v)"), "t")
    val m = out.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m == Map("a" -> (3L, 2L), "b" -> (3L, 1L)))
  }
  test("code_reduce _all makes one global group") {
    val out = CodeReduce(base, Seq("_all"), Seq("total" -> "sum(v)"), "t")
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((6L, 3L)))
  }
  test("add_uuid yields distinct ids") {
    val out = AddUuid(base, "op")
    assert(out.select("op_id").distinct().count() == 3)
  }
}

class ReshapeSpec extends SparkSpec {
  test("split by token count reassembles to the original") {
    val docs = docsDf
    val chunks = SplitOp.byTokenCount(docs, "sp", "text", 3, docIdExpr = "doc_id")
    val glued = chunks.groupBy("sp_id")
      .agg(concat_ws(" ", sort_array(collect_list(struct(col("sp_chunk_num"), col("text_chunk"))))
        .getField("text_chunk")).as("re"))
    val joined = glued.join(docs, col("sp_id") === col("doc_id"))
      .filter(col("re") =!= col("text"))
    assert(joined.count() == 0)
  }
  test("split by delimiter groups pieces") {
    val d = df(StructType(Seq(StructField("id", LongType), StructField("t", StringType))),
      Row(1L, "a.b.c.d.e"))
    val out = SplitOp.byDelimiter(d, "sd", "t", ".", numSplitsToGroup = 2, docIdExpr = "id")
    assert(out.select("t_chunk").collect().map(_.getString(0)).toSeq ==
      Seq("a.b", "c.d", "e"))
  }
  test("unnest list replaces key; keepEmpty emits null row") {
    val d = df(StructType(Seq(StructField("id", LongType),
      StructField("xs", ArrayType(StringType)))),
      Row(1L, Seq("a", "b")), Row(2L, Seq.empty[String]))
    assert(UnnestOp.list(d, "xs").count() == 2)
    val withEmpty = UnnestOp.list(d, "xs", keepEmpty = true)
    assert(withEmpty.count() == 3)
    assert(withEmpty.filter(col("id") === 2 && col("xs").isNull).count() == 1)
  }
  test("unnest recursive flattens nested lists") {
    val d = df(StructType(Seq(StructField("id", LongType),
      StructField("xs", ArrayType(ArrayType(StringType))))),
      Row(1L, Seq(Seq("a", "b"), Seq("c"))))
    assert(UnnestOp.list(d, "xs", recursive = true, depth = 2).count() == 3)
  }
  test("unnest_columns expands struct and drops source") {
    val d = docsDf.select(col("doc_id"),
      struct(col("lang"), col("text")).as("meta"))
    val out = UnnestColumnsOp(d, "meta")
    assert(out.columns.toSeq == Seq("doc_id", "lang", "text"))
  }
  test("gather renders neighbors in order") {
    val d = df(StructType(Seq(StructField("doc", LongType),
      StructField("ord", LongType), StructField("c", StringType))),
      Row(1L, 1L, "A"), Row(1L, 2L, "B"), Row(1L, 3L, "C"))
    val out = GatherOp(d, "c", "doc", "ord").orderBy("ord")
      .select("c_rendered").collect().map(_.getString(0))
    assert(out(0) == "--- current ---\nA\nB")
    assert(out(1) == "A\n--- current ---\nB\nC")
    assert(out(2) == "B\n--- current ---\nC")
  }
  test("gather skip markers count out-of-window characters") {
    val d = df(StructType(Seq(StructField("doc", LongType),
      StructField("ord", LongType), StructField("c", StringType))),
      Row(1L, 1L, "aa"), Row(1L, 2L, "bbb"), Row(1L, 3L, "c"), Row(1L, 4L, "dd"))
    val out = GatherOp(d, "c", "doc", "ord", previousCount = 1, nextCount = 1,
      skipMarkers = true).orderBy("ord")
      .select("c_rendered").collect().map(_.getString(0))
    // row 3 (ord=3): chunk "aa" (2 chars) is before the window
    assert(out(2).startsWith("[... 2 characters skipped ...]\n"))
    // row 1: chunks "c"+"dd" (3 chars) after the window
    assert(out(0).endsWith("\n[... 3 characters skipped ...]"))
  }
}

class SamplingSpec extends SparkSpec {
  private lazy val nums = spark.range(0, 100).toDF("id")
    .withColumn("grp", expr("cast(id % 4 as string)"))

  test("first is deterministic head") {
    assert(SampleOp.first(nums, 5, Seq("id")).collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 1L, 2L, 3L, 4L))
  }
  test("uniformHash is deterministic and engine-portable") {
    val a = SampleOp.uniformHash(nums, "id", 0.3).collect().map(_.getLong(0)).toSet
    val b = SampleOp.uniformHash(nums, "id", 0.3).collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty && a.size < 100)
  }
  test("stratified caps per group") {
    val out = SampleOp.stratified(nums, "grp", 3, Seq("id"))
    assert(out.groupBy("grp").count().collect().forall(_.getLong(1) == 3))
  }
  test("custom sample is a semi-join on key subset") {
    val wanted = df(StructType(Seq(StructField("grp", StringType))), Row("1"))
    assert(SampleOp.custom(nums, wanted).count() == 25)
  }
  test("outliers keeps farthest n") {
    val d = df(StructType(Seq(StructField("id", LongType),
      StructField("e", ArrayType(DoubleType)))),
      Row(1L, Seq(0.0, 0.0)), Row(2L, Seq(0.1, 0.0)),
      Row(3L, Seq(0.0, 0.1)), Row(4L, Seq(9.0, 9.0)))
    val kept = SampleOp.outliers(d, "e", None, Some(1), keep = true, Seq("id"))
    assert(kept.select("id").collect().map(_.getLong(0)).toSeq == Seq(4L))
  }
  test("bm25 ranks the matching doc first") {
    val top = TopKOp.bm25(docsDf, "text", Seq("spark"), 2, Seq("doc_id"))
    val first = top.orderBy(desc("_score")).select("doc_id").collect().head.getLong(0)
    assert(Set(1L, 4L, 5L).contains(first)) // the spark-y docs
  }
  test("embedding topk returns k by cosine") {
    val d = df(StructType(Seq(StructField("id", LongType),
      StructField("e", ArrayType(DoubleType)))),
      Row(1L, Seq(1.0, 0.0)), Row(2L, Seq(0.0, 1.0)), Row(3L, Seq(0.9, 0.1)))
    val top = TopKOp.embedding(d, "e", Array(1.0, 0.0), 2, Seq("id"))
    assert(top.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }
}
