package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.CorpusStats

class CorpusStatsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType)))

  // token counts per lang: en -> [1, 2, 3, 4], de -> [2]
  private val d = df(schema,
    Row(1L, "a", "en"),
    Row(2L, "a b", "en"),
    Row(3L, "a b c", "en"),
    Row(4L, "a b c d", "en"),
    Row(5L, "x y", "de"))

  test("per-group stats match hand-computed interpolated quantiles") {
    val out = CorpusStats(d, Seq("lang"), "size(split(text, ' '))",
      Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    // en: rank (4-1)*0.5 = 1.5 -> 2.5; (4-1)*0.9 = 2.7 -> 3.7
    assert(out("en") === ((4L, 10L, 2.5, 2.5, 3.7)))
    assert(out("de") === ((1L, 2L, 2.0, 2.0, 2.0)))
  }

  test("empty groupCols aggregates the whole corpus into one row") {
    val out = CorpusStats(d, Nil, "size(split(text, ' '))", Seq(0.5)).collect()
    assert(out.length === 1 && out(0).getLong(0) === 5L)
  }

  test("quantile labels and bounds validate") {
    assert(CorpusStats.label(0.5) === "p50")
    assert(CorpusStats.label(0.999) === "p99_9")
    intercept[IllegalArgumentException] {
      CorpusStats(d, Nil, "1", Seq(1.0))
    }
    intercept[IllegalArgumentException] {
      CorpusStats(d, Nil, "1", Nil)
    }
  }

  test("the curation-scoring example pipeline runs end to end") {
    val yaml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("examples/curation_scoring_pipeline.yaml")))
    val out = graft.api.Pipeline.runYaml(yaml, spark)
    val rows = out.collect()
    // one stats row per language that survived the budget cut
    assert(rows.nonEmpty && out.columns.contains("p90"))
    assert(rows.map(_.getAs[Long]("n_docs")).sum > 0)
  }

  test("Frame and LazyFrame wire corpusStats with YAML round-trip") {
    assert(graft.api.Graft.fromDF(d)
      .corpusStats(Seq("lang"), "size(split(text, ' '))").count() === 2)
    import graft.api.{LazyFrame, Pipeline}
    val dir = java.nio.file.Files.createTempDirectory("cstats").toString
    d.write.mode("overwrite").parquet(s"$dir/docs.parquet")
    val lf = LazyFrame.read("docs", s"$dir/docs.parquet")
      .corpusStats(Seq("lang"), "size(split(text, ' '))", Seq(0.5, 0.9))
    assert(LazyFrame.fromYaml(lf.toYaml).toYaml == lf.toYaml)
    assert(Pipeline.runYaml(lf.toYaml, spark).count() == 2)
  }
}
