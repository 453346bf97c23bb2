package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{CorpusDrift, InterleaveOp}

/** Round 9e: pairwise drift matrix and curriculum training order. */
class Round9eSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("grp", StringType),
    StructField("text", StringType)))

  // ----------------------------------------------------------- drift matrix

  test("drift matrix cells equal the two-corpus op on the same slices") {
    val d = df(schema,
      Row(1L, "a", "x y z x"), Row(2L, "a", "x w"),
      Row(3L, "b", "y z q"), Row(4L, "b", "q r"),
      Row(5L, "c", "completely different words here"))
    val matrix = CorpusDrift.jensenShannonMatrix(d, "grp", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(matrix.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    for (((ga, gb), (jsd, v, na, nb)) <- matrix) {
      val two = CorpusDrift.jensenShannon(
        d.filter(col("grp") === ga), "text",
        d.filter(col("grp") === gb), "text").head()
      assert(two.getDouble(0) == jsd, s"pair ($ga,$gb)")
      assert(two.getLong(1) == v && two.getLong(2) == na && two.getLong(3) == nb)
    }
  }

  test("drift matrix: identical slices -> 0, disjoint slices -> larger") {
    val d = df(schema,
      Row(1L, "a", "same words here"), Row(2L, "b", "same words here"),
      Row(3L, "c", "entirely other vocabulary tokens"))
    val m = CorpusDrift.jensenShannonMatrix(d, "grp", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m(("a", "b")) < m(("a", "c")))
    assert(m(("a", "b")) < 0.05) // identical up to smoothing
  }

  test("drift matrix requires at least two groups") {
    val d = df(schema, Row(1L, "only", "x"))
    intercept[IllegalArgumentException] {
      CorpusDrift.jensenShannonMatrix(d, "grp", "text")
    }
  }

  // ------------------------------------------------------------- curriculum

  private val curSchema = StructType(Seq(
    StructField("id", LongType), StructField("score", LongType)))

  test("curriculum: equal-frequency bands, monotone difficulty, full rank") {
    val rows = (1L to 40L).map(i => Row(i, (i * 7) % 40)) // distinct scores
    val d = df(curSchema, rows: _*)
    val out = InterleaveOp.curriculum(d, "score", "id", nBuckets = 4, seed = 9)
      .collect().map(r => (r.getLong(0),
        r.getInt(r.fieldIndex("difficulty_bucket")),
        r.getLong(r.fieldIndex("curriculum_rank"))))
    // exactly 10 rows per band
    assert(out.groupBy(_._2).view.mapValues(_.size).toMap ==
      Map(0 -> 10, 1 -> 10, 2 -> 10, 3 -> 10))
    // curriculum_rank is a permutation of 1..40 and bands are consumed in
    // order: every rank in band b is below every rank in band b+1
    assert(out.map(_._3).sorted.toSeq == (1L to 40L))
    val maxByBucket = out.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    val minByBucket = out.groupBy(_._2).view.mapValues(_.map(_._3).min).toMap
    for (b <- 0 to 2) assert(maxByBucket(b) < minByBucket(b + 1))
    // within a band the order is NOT score order (seeded shuffle): band 0
    // holds the 10 lowest scores but its rank order differs from score order
    val band0 = out.filter(_._2 == 0).sortBy(_._3).map(_._1)
    val band0ByScore = out.filter(_._2 == 0)
      .map(t => t._1 -> ((t._1 * 7) % 40)).sortBy(_._2).map(_._1)
    assert(band0.toSeq != band0ByScore.toSeq)
  }

  test("curriculum is deterministic per seed and changes with the seed") {
    val rows = (1L to 30L).map(i => Row(i, i % 7))
    val d = df(curSchema, rows: _*)
    def run(seed: Long) = InterleaveOp.curriculum(d, "score", "id", 3, seed)
      .select("id", "curriculum_rank")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) == run(1))
    assert(run(1) != run(2))
  }

  test("curriculum rejects reserved columns and bad bucket counts") {
    val d = df(curSchema, Row(1L, 1L))
    intercept[IllegalArgumentException] {
      InterleaveOp.curriculum(d.withColumn("difficulty_bucket", lit(1)),
        "score", "id", 2)
    }
    intercept[IllegalArgumentException] {
      InterleaveOp.curriculum(d, "score", "id", 0)
    }
  }

  // ------------------------------------------------------------ api surface

  test("Frame + LazyFrame wire drift matrix and curriculum through YAML") {
    val d = df(schema,
      Row(1L, "a", "x y"), Row(2L, "b", "y z"), Row(3L, "c", "z w"))
    assert(graft.api.Graft.fromDF(d).corpusDriftMatrix("grp", "text").count() == 3)
    assert(graft.api.Graft.fromDF(d)
      .curriculum("length(text)", "id", nBuckets = 3).count() == 3)

    import graft.api.{LazyFrame, Pipeline}
    val dir = java.nio.file.Files.createTempDirectory("r9e").toString
    d.write.mode("overwrite").parquet(s"$dir/d.parquet")
    val lf1 = LazyFrame.read("d", s"$dir/d.parquet")
      .corpusDriftMatrix("grp", "text")
    assert(LazyFrame.fromYaml(lf1.toYaml).toYaml == lf1.toYaml)
    assert(Pipeline.runYaml(lf1.toYaml, spark).count() == 3)
    val lf2 = LazyFrame.read("d", s"$dir/d.parquet")
      .curriculum("length(text)", "id", nBuckets = 2, randomState = 4)
    assert(LazyFrame.fromYaml(lf2.toYaml).toYaml == lf2.toYaml)
    val out = Pipeline.runYaml(lf2.toYaml, spark)
    assert(out.count() == 3 && out.columns.contains("curriculum_rank"))
  }
}
