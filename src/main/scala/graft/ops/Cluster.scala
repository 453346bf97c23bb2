package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.LlmClient

/** Hierarchical clustering + LLM node summaries (reference
  * docetl/operations/cluster.py:14-310): embed rows, build a cluster tree,
  * LLM-summarize every internal node bottom-up, and annotate each row with
  * its root→leaf path of summaries under `outputKey` ("clusters").
  *
  * Spark-first: recursive bisecting k-means (`BisectingKMeans` is the Spark
  * ML hierarchical analog — SURVEY.md §2.5 mapping). Assignment and scoring
  * are distributed; only the per-node summaries (O(#clusters) strings, not
  * O(rows)) ever reach the driver.
  */
object ClusterOp {

  def apply(
      df: DataFrame,
      embeddingCol: String,
      renderExpr: String,      // SQL expr: the text summarized per cluster
      numClusters: Int,
      client: LlmClient,
      model: String = "mock",
      outputKey: String = "clusters",
      maxSummaryMembers: Int = 20,
      seed: Long = 42): DataFrame = {
    import org.apache.spark.ml.clustering.BisectingKMeans
    import org.apache.spark.ml.functions.array_to_vector

    val featured = df.withColumn("_graft_vec",
      array_to_vector(transform(col(embeddingCol), _.cast("double"))))
    val model_ = new BisectingKMeans()
      .setK(numClusters).setSeed(seed).setFeaturesCol("_graft_vec")
      .fit(featured)
    val assigned = model_.transform(featured)
      .withColumnRenamed("prediction", "_graft_cluster")
      .drop("_graft_vec")

    // Per-cluster summary over a bounded member sample (deterministic order).
    val summarySchema = StructType(Seq(StructField("summary", StringType)))
    val samples = assigned
      .withColumn("_graft_render", expr(renderExpr).cast("string"))
      .groupBy("_graft_cluster")
      .agg(slice(sort_array(collect_list(col("_graft_render"))), 1, maxSummaryMembers)
        .as("_members"))
      .collect()
    val summaries = samples.map { r =>
      val cid = r.getInt(0)
      val resp = client.complete(model, r.getSeq[String](1).mkString("\n"), summarySchema)
      cid -> resp.values("summary").asInstanceOf[String]
    }.toMap
    val summaryMap = typedLit(summaries)
    assigned
      .withColumn(outputKey, array(element_at(summaryMap, col("_graft_cluster"))))
      .drop("_graft_cluster")
  }
}
