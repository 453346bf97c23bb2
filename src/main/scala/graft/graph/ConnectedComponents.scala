package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative connected components over an edge DataFrame — the distributed
  * replacement for the reference's driver-resident union-find
  * (reference docetl/operations/resolve.py:33-37,554-590; SURVEY.md §7.5.6).
  *
  * Hash-min label propagation: every vertex starts with label = id; each
  * round, a vertex adopts the min label among itself and its neighbors;
  * stop when no label changes (or `maxIter`). Converges in O(diameter)
  * rounds — entity-resolution clusters are tiny (diameter <= a few), so in
  * practice 2-3 rounds. Each round is one shuffle of the (small) edge list,
  * never the documents.
  */
object ConnectedComponents {

  /** @param edges   two-column DataFrame (src, dst) of Long-compatible ids
    * @param vertices single-column DataFrame (id) incl. isolated vertices
    * @return (id, component) where component = min id reachable
    */
  def run(edges: DataFrame, vertices: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.toDF("src", "dst")
    // Undirected: propagate both ways. ONE scan of the edge plan — a
    // union(e, e.swapped) would execute the upstream twice, and the edge
    // producer is often an LLM-verify mapPartitions whose re-execution is
    // the single most expensive thing in a resolve.
    val undirected = e.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("_p"))
      .select(col("_p.src").as("src"), col("_p.dst").as("dst"))
      .distinct()
      .persist()
    var labels = vertices.toDF("id").withColumn("component", col("id")).persist()
    var iter = 0
    var changed = 1L
    def round(): Unit = {
      // Candidate labels flowing along edges.
      val nbr = undirected
        .join(labels, undirected("src") === labels("id"))
        .select(col("dst").as("id"), col("component"))
      val next = labels.select(col("id"), col("component"))
        .union(nbr)
        .groupBy("id").agg(min("component").as("component"))
        .persist()
      changed = next.join(labels.withColumnRenamed("component", "old"), "id")
        .filter(col("component") < col("old")).count()
      labels.unpersist()
      labels = next
    }
    while (changed > 0 && iter < maxIter) {
      round()
      iter += 1
    }
    // A graph that applies its last changes in exactly round maxIter is
    // CONVERGED — that's only observable with one more (no-change) round, so
    // give the boundary case a confirmation pass before declaring failure.
    if (changed > 0) round()
    undirected.unpersist()
    if (changed > 0)
      throw new IllegalStateException(
        s"ConnectedComponents did not converge after $maxIter iterations " +
          s"($changed labels still changing); raise maxIter (long match chains)")
    labels
  }
}
