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
      seed: Long = 42,
      maxIter: Int = 10,
      /** Fixed centroids instead of k-means training — for reproducible
        * grids or externally-trained quantizers. */
      explicitCentroids: Option[Array[Array[Double]]] = None): DataFrame = {
    // Centroids train on a driver-side sample (graft.ann.Ann.trainCentroids
    // — the coarse-quantizer recipe); ASSIGNMENT is fully distributed, a
    // codegen'd nearest-centroid expression over every row. No per-iteration
    // Spark jobs, no ML pipeline in the hot path.
    val centroids = explicitCentroids.getOrElse(
      graft.ann.Ann.trainCentroids(df, embeddingCol, numClusters, maxIter, seed))
    val assigned = graft.ann.Ann.ivfAssign(df, embeddingCol, centroids)
      .withColumnRenamed("_cell", "_graft_cluster")

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

  /** Hierarchical variant (reference cluster.py:14-310 builds a full binary
    * tree agglomeratively on the driver — O(n²)): recursive bisecting
    * k-means, level by level. Each level is one pass over the data (the
    * clusters partition it), so depth d costs d distributed scans plus
    * 2^d - 1 tiny k=2 fits. Every internal node gets an LLM summary
    * bottom-up (leaves from bounded member samples, internal nodes from
    * their children's summaries), and each row is annotated with its
    * root→leaf PATH of summaries under `outputKey` — the reference's
    * `clusters` column shape.
    */
  def hierarchical(
      df: DataFrame,
      embeddingCol: String,
      renderExpr: String,
      depth: Int,
      client: LlmClient,
      model: String = "mock",
      outputKey: String = "clusters",
      maxSummaryMembers: Int = 10,
      seed: Long = 42,
      /** Collapse near-degenerate levels (reference cluster.py `collapse`
        * by relative distance): an internal node whose own split is at
        * least `ratio` x its parent's split distance adds little hierarchy
        * — its summary is dropped from every row's path (root and leaves
        * always stay). */
      collapse: Option[Double] = None): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(depth >= 1, "depth must be >= 1")

    // splitDist(path) = distance between the two child centroids of the
    // k=2 split performed AT that node.
    val splitDist = scala.collection.mutable.Map[String, Double]()
    var assigned = df
      .withColumn("_graft_vec", array_to_vector(transform(col(embeddingCol), _.cast("double"))))
      .withColumn("_graft_path", lit(""))
      .persist()
    (1 to depth).foreach { level =>
      val paths = assigned.select("_graft_path").distinct()
        .collect().map(_.getString(0)).sorted
      val next = paths.map { p =>
        val part = assigned.filter(col("_graft_path") === p)
        val n = part.count()
        if (n < 2) part // too small to bisect; stays a leaf early
        else {
          val km = new KMeans().setK(2).setSeed(seed + level)
            .setFeaturesCol("_graft_vec").fit(part)
          val Array(c0, c1) = km.clusterCenters.map(_.toArray)
          splitDist(p) = math.sqrt(c0.zip(c1).map { case (a, b) =>
            (a - b) * (a - b) }.sum)
          km.transform(part)
            .withColumn("_graft_path",
              concat(col("_graft_path"), lit("/"), col("prediction")))
            .drop("prediction")
        }
      }.reduce(_ unionByName _).persist()
      assigned.unpersist()
      assigned = next
    }
    // Collapsed internal nodes: split nearly as wide as the parent's.
    val collapsed: Set[String] = collapse match {
      case None => Set.empty
      case Some(ratio) =>
        splitDist.keySet.filter { p =>
          p.nonEmpty && {
            val parent = p.substring(0, p.lastIndexOf('/'))
            splitDist.get(parent).exists(pd => pd > 0 && splitDist(p) >= ratio * pd)
          }
        }.toSet
    }

    // Bottom-up summaries: leaves from member samples, ancestors from
    // children. Only O(#nodes) strings ever reach the driver.
    val summarySchema = StructType(Seq(StructField("summary", StringType)))
    val leafSamples = assigned
      .withColumn("_graft_render", expr(renderExpr).cast("string"))
      .groupBy("_graft_path")
      .agg(slice(sort_array(collect_list(col("_graft_render"))), 1, maxSummaryMembers)
        .as("_members"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val summaries = scala.collection.mutable.Map[String, String]()
    def summarize(path: String): String = summaries.getOrElseUpdate(path, {
      val children = leafSamples.keys.filter(k =>
        k.startsWith(path) && k != path).toSeq.sorted
      val directLeaf = leafSamples.get(path)
      val input = directLeaf match {
        case Some(members) => members.mkString("\n")
        case None =>
          // internal node: summarize the nearest descendant summaries
          val childPaths = children.map(_.substring(path.length).split('/')
            .filter(_.nonEmpty).head).distinct.sorted.map(c => s"$path/$c")
          childPaths.map(summarize).mkString("\n")
      }
      val resp = client.complete(model, input, summarySchema)
      resp.values("summary").asInstanceOf[String]
    })
    leafSamples.keys.foreach(summarize)
    summarize("") // root
    // Per-leaf path-of-summaries arrays, broadcast back as a literal map;
    // collapsed internal nodes drop out of the path (root + leaf kept).
    val pathArrays = leafSamples.keys.map { leaf =>
      val segs = leaf.split('/').filter(_.nonEmpty)
      val ancestors = (0 to segs.length).map(i =>
        segs.take(i).map("/" + _).mkString)
      val kept = ancestors.filter(a =>
        a == "" || a == leaf || !collapsed.contains(a))
      leaf -> kept.map(summaries)
    }.toMap
    val pathMap = typedLit(pathArrays)
    assigned
      .withColumn(outputKey, element_at(pathMap, col("_graft_path")))
      .drop("_graft_vec", "_graft_path")
  }
}
