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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }

    import graft.functions.TextFunctions
    val sh = array_sort(array_distinct(transform(
      TextFunctions.shingles(col("text"), 3), s => xxhash64(s))))
    val d = docs.select(col("doc_id").as("_id"), sh.as("_sh"))
      .filter(size(col("_sh")) > 0)

    time("shingle+hash only")(d.count())
    val sig = graft.functions.MinHashSignature(col("_sh"), 64)
    time("’+signature")(d.withColumn("_sig", sig).count())
    val dp = d.persist()
    dp.count()
    val bands = posexplode(transform(
      sequence(lit(0), lit(15)),
      b => xxhash64(b, slice(col("_sig"), b * 4 + 1, lit(4)))))
    val banded = dp.withColumn("_sig", sig)
      .select(col("_id"), bands.as(Seq("_band", "_bkey")))
    time("banded")(banded.count())
    val l = banded.select(col("_band"), col("_bkey"), col("_id").as("id_a"))
    val r = banded.select(col("_band"), col("_bkey"), col("_id").as("id_b"))
    val cands = l.join(r, Seq("_band", "_bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    time("cands")(cands.count())
    val byId = dp.select(col("_id"), col("_sh"))
    val withSh = cands
      .join(byId.select(col("_id").as("id_a"), col("_sh").as("_sha")), Seq("id_a"))
      .join(byId.select(col("_id").as("id_b"), col("_sh").as("_shb")), Seq("id_b"))
    val verified = withSh
      .withColumn("jaccard",
        round(graft.functions.JaccardSimilarity(col("_sha"), col("_shb")), 6))
      .filter(col("jaccard") >= 0.8)
    time("verify")(verified.count())
    time("full repeat")(graft.dedup.MinHashDedup.candidatePairs(
      docs, "doc_id", "text", 3, 64, 16, 0.8).count())
    spark.stop()
  }
}
