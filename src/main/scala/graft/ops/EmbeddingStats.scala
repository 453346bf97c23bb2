package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space corpus diagnostics — the vector-side analog of
  * [[CorpusDrift]]: per-slice centroids, doc-to-centroid outlier scores,
  * and a slice-centroid similarity matrix. Publicly standard practice for
  * embedding-filtered corpora (SemDeDup/D4-style pipelines monitor
  * cluster geometry; retrieval corpora monitor per-source embedding
  * drift). §2.14 engine extension next to the ANN family.
  *
  * Scale shape: centroids come from ONE narrow (slice, dim, value)
  * explode with map-side partial sums — the shuffle carries at most
  * slices × dim rows per mapper, never vectors; outlier scoring
  * broadcast-joins the (slices × dim) centroid table back and evaluates
  * cosine as a pure fold expression; the similarity matrix touches only
  * the centroid table. Everything is exact and engine-portable (the
  * DuckDB oracle replays sums and cosines on float64).
  */
object EmbeddingStats {

  /** Cosine similarity of two double-array columns as a fold expression. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), _ + _)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0d), _ + _))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0d), _ + _))
    when(na === 0.0d || nb === 0.0d, lit(null).cast("double"))
      .otherwise(dot / (na * nb))
  }

  /** Per-slice mean vector: (slice, centroid array<double>, n_vectors).
    * One (slice, dim) keyed agg over an exploded (value) stream. */
  def sliceCentroids(df: DataFrame, sliceCol: String,
      embCol: String): DataFrame =
    df.select(col(sliceCol).as("slice"),
      posexplode(transform(col(embCol), _.cast("double")))
        .as(Seq("dim", "v")))
      .groupBy("slice", "dim")
      .agg(avg(col("v")).as("m"), count(lit(1)).as("n"))
      .groupBy("slice")
      .agg(array_sort(collect_list(struct(col("dim"), col("m"))))
        .getField("m").as("centroid"),
        first(col("n")).as("n_vectors"))

  /** Append `outCol` = cosine similarity of each row's embedding to its
    * OWN slice's centroid (low = embedding-space outlier for that slice).
    * The centroid table (slices × dim doubles) broadcast-joins back. */
  def outlierScores(df: DataFrame, sliceCol: String, embCol: String,
      outCol: String = "centroid_sim"): DataFrame = {
    val cents = sliceCentroids(df, sliceCol, embCol)
      .select(col("slice").as(sliceCol), col("centroid"))
    df.join(broadcast(cents), Seq(sliceCol), "left")
      .withColumn(outCol,
        round(cosine(transform(col(embCol), _.cast("double")),
          col("centroid")), 6))
      .drop("centroid")
  }

  /** Pairwise cosine similarity between slice centroids — "are these two
    * sources embedding-space near-duplicates?" Output bounded by
    * slices²/2; computed entirely on the centroid table.
    *
    * The pair fan-out is an explode of the COLLECTED slice list (driver
    * state = O(slices), the cluster-count convention) followed by a KEYED
    * broadcast join — never a cross join, so the engine-wide
    * no-nested-loop plan audit holds even for this metadata-sized
    * product. Slice keys stringify in the output (type-stable pair
    * orientation across engines). */
  def centroidSimilarityMatrix(df: DataFrame, sliceCol: String,
      embCol: String): DataFrame = {
    val cents = sliceCentroids(df, sliceCol, embCol)
      .withColumn("slice", col("slice").cast("string"))
    val sliceVals = cents.select("slice").collect().map(_.getString(0)).toSeq
    val a = cents.select(col("slice").as("slice_a"),
      col("centroid").as("_ca"))
      .withColumn("slice_b", explode(typedlit(sliceVals.sorted)))
      .filter(col("slice_a") < col("slice_b"))
    val b = cents.select(col("slice").as("slice_b"),
      col("centroid").as("_cb"))
    a.join(broadcast(b), Seq("slice_b"))
      .select(col("slice_a"), col("slice_b"),
        round(cosine(col("_ca"), col("_cb")), 6).as("centroid_cosine"))
  }
}
