package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplication-structure reporting over a components table (the
  * (id, component) output of [[MinHashDedup.components]] /
  * [[EditDedup.components]]): how big are the near-dup clusters, and
  * how much of the corpus would keep-best remove? The release-report
  * companion to the audit trail — an operator reads `audit` to learn
  * why one document vanished, and THIS to learn whether the corpus has
  * a long tail of pairs or a few pathological mega-clusters (which is
  * also the signal to revisit blocking caps before a 100 TB run).
  *
  * Scale shape: two keyed count aggregations over the COMPONENTS table
  * (paired rows only — a small fraction of the corpus by construction),
  * histogram output bounded by the largest cluster size.
  */
object DedupReport {

  /** Cluster-size histogram: (cluster_size, n_clusters, n_rows) with
    * n_rows = cluster_size × n_clusters, the member mass at that size. */
  def componentSizes(comp: DataFrame,
      componentCol: String = "component"): DataFrame =
    comp.groupBy(col(componentCol)).agg(count(lit(1)).as("_s"))
      .groupBy(col("_s").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size").cast("bigint").as("cluster_size"),
        col("n_clusters").cast("bigint").as("n_clusters"),
        (col("cluster_size") * col("n_clusters")).cast("bigint")
          .as("n_rows"))

  /** One-row dup-mass summary against a corpus of `corpusRows` rows:
    * paired members, clusters, removable (= members − clusters, what
    * keep-best deletes), and the corpus-level dup_rate. */
  def summary(comp: DataFrame, corpusRows: Long,
      componentCol: String = "component"): DataFrame = {
    val agg = comp.groupBy(col(componentCol)).agg(count(lit(1)).as("_s"))
      .select(coalesce(sum(col("_s")), lit(0L)).as("members"),
        count(lit(1)).as("clusters"))
      .head()
    val members = agg.getLong(0)
    val clusters = agg.getLong(1)
    val spark = comp.sparkSession
    import spark.implicits._
    Seq((corpusRows, members, clusters, members - clusters,
      math.rint((members - clusters).toDouble /
        math.max(corpusRows, 1L) * 1e6) / 1e6))
      .toDF("corpus_rows", "paired_rows", "clusters", "removable",
        "dup_rate")
  }
}
