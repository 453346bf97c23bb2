package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch per-stage profiler for bench hotspots (not part of the driver
  * contract; run by hand: `runMain graft.tools.BenchProbe`). */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.{TextFunctions => TF}
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    docs0.count() // warm
    // the q128 fixture text (planted PII)
    val docs = docs0.withColumn("text",
      concat(col("text"), when(col("doc_id") % 13 === 0,
        lit(" reach me at a.b@example.com")).otherwise(lit(""))))

    def time(name: String)(f: => Long): Unit = {
      // one warm pass, then min of 3
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-34s ${ts.min}%6.3f s")
    }

    val t = col("text")
    val piiTotal = TF.piiCounts(t).map(_._2).reduce(_ + _)

    // ---- q128 branch anatomy
    time("q128 full")(graft.ops.Datacard(docs0.withColumn("text",
      concat(col("text"), when(col("doc_id") % 13 === 0,
        lit(" reach me at a.b@example.com")).otherwise(lit("")))),
      "text", "source").count())
    time("base branch")(docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum(TF.tokenCount(t)).cast("double").as("n_tokens"),
      round(avg(TF.tokenCount(t)), 6).as("avg_doc_tokens"),
      round(lit(1.0) - countDistinct(md5(t)).cast("double") / count(lit(1)), 6)
        .as("exact_dup_rate"),
      sum(piiTotal).cast("double").as("pii_total")).count())
    time("base minus pii")(docs.agg(
      count(lit(1)).cast("double"),
      sum(TF.tokenCount(t)).cast("double"),
      round(avg(TF.tokenCount(t)), 6),
      round(lit(1.0) - countDistinct(md5(t)).cast("double") / count(lit(1)), 6))
      .count())
    time("base minus distinct")(docs.agg(
      count(lit(1)).cast("double"),
      sum(TF.tokenCount(t)).cast("double"),
      round(avg(TF.tokenCount(t)), 6),
      sum(piiTotal).cast("double")).count())
    time("slices branch")(docs.groupBy(col("source"))
      .agg(count(lit(1)).as("_n"))
      .agg(count(lit(1)).cast("double"),
        round(max(col("_n")).cast("double") / sum(col("_n")), 6)).count())
    time("grams branch")(docs.select(explode(TF.shingles(t, 3)).as("_g"))
      .agg(round(countDistinct(col("_g")).cast("double") / count(lit(1)), 6))
      .count())
    // grouping-sets merge of base+slices (perf prototype only)
    time("groupingsets base+slices")(docs
      .groupingSets(Seq(Seq(col("source")), Seq()), col("source"))
      .agg(count(lit(1)).as("_n"),
        sum(TF.tokenCount(t)).as("_tok"),
        avg(TF.tokenCount(t)).as("_avg"),
        countDistinct(md5(t)).as("_dst"),
        sum(piiTotal).as("_pii")).count())

    // ---- q130 branch anatomy
    time("q130 full")(graft.ops.Datacard.perSlice(docs0, "text", "source")
      .count())
    time("q130 rowStats")(docs0.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TF.tokenCount(t)).cast("bigint").as("n_tokens"),
        round(lit(1.0) - countDistinct(md5(t)).cast("double") / count(lit(1)),
          6).as("exact_dup_rate")).count())
    time("q130 diversity")(docs0
      .select(col("source"), explode(TF.shingles(t, 3)).as("_g"))
      .groupBy(col("source"))
      .agg(round(countDistinct(col("_g")).cast("double") / count(lit(1)), 6)
        .as("distinct_3gram_ratio")).count())
    spark.stop()
  }
}
