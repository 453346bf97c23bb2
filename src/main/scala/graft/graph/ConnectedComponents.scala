package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

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
    * @param driverEdgeGate when the DEDUPED UNDIRECTED edge list has at most
    *        this many rows (and ids are integral), skip label propagation and
    *        union-find the edges on the driver instead. Match/near-dup edge
    *        lists are tiny relative to the documents they connect (the
    *        pairwise stages upstream are all capped/banned), and each
    *        propagation round costs ~4 Spark jobs — on a small edge list the
    *        job-scheduling overhead dwarfs the work. The fast path collects
    *        ONLY edges (never vertices: the component map broadcast-joins
    *        back onto them), so it is safe however large the vertex side is.
    *        2M undirected rows = 1M edges ≈ 32 MB on the driver.
    * @return (id, component) where component = min id reachable
    */
  def run(edges: DataFrame, vertices: DataFrame, maxIter: Int = 20,
      driverEdgeGate: Long = 2000000L): DataFrame = {
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
    val integralIds = e.schema.fields.take(2).forall(_.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _                                             => false
    })
    // One job; also materializes the persist the first round needs anyway.
    val undirectedCount = undirected.count()
    if (integralIds && undirectedCount <= driverEdgeGate) {
      val mapping = driverUnionFind(
        undirected.select(col("src").cast("long"), col("dst").cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1))))
      undirected.unpersist()
      val mapDf = broadcast(
        spark.createDataFrame(mapping.toSeq).toDF("id", "_cc"))
      // Cast back to the original id type: component = min reachable id is
      // always representable, and the output schema must not flip between
      // int and long depending on which side of driverEdgeGate the data
      // lands (the label-propagation path keeps the id's own type).
      val idType = vertices.schema.fields.head.dataType
      return vertices.toDF("id").join(mapDf, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("_cc"), col("id").cast("long")).cast(idType)
            .as("component"))
    }
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

  /** [[run]] with vertices = every edge endpoint — for callers whose
    * vertex set IS the paired ids (the dedup keep-best family: unpaired
    * rows never enter the component table, they pass through the
    * caller's left/anti join). The edge plan executes exactly ONCE (the
    * persisted undirected list); under the driver gate the output is
    * built straight from the union-find mapping — endpoint-sized, and
    * already on the driver — so NOTHING upstream is scanned a second
    * time. `run(edges, verts)` with verts derived from the edge plan
    * would execute that plan two more times for the vertex union. */
  def runFromEdges(edges: DataFrame, maxIter: Int = 20,
      driverEdgeGate: Long = 2000000L): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.toDF("src", "dst")
    val undirected = e.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("_p"))
      .select(col("_p.src").as("src"), col("_p.dst").as("dst"))
      .distinct()
      .persist()
    val integralIds = e.schema.fields.take(2).forall(_.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _                                             => false
    })
    // Mixed-width edge columns (int src, long dst) would make the final
    // cast-to-first-column-type below truncate wide ids — route them to
    // the label-propagation path, whose explode already unifies types.
    val sameType =
      e.schema.fields(0).dataType == e.schema.fields(1).dataType
    val undirectedCount = undirected.count()
    val idType = e.schema.fields.head.dataType
    if (integralIds && sameType && undirectedCount <= driverEdgeGate) {
      val mapping = driverUnionFind(
        undirected.select(col("src").cast("long"), col("dst").cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1))))
      undirected.unpersist()
      spark.createDataFrame(mapping.toSeq).toDF("id", "component")
        .select(col("id").cast(idType).as("id"),
          col("component").cast(idType).as("component"))
    } else {
      // Label-propagation path: vertices come from the PERSISTED
      // undirected list (symmetric, so src covers every endpoint).
      val verts = undirected.select(col("src").as("id")).distinct()
      val labels = run(undirected, verts, maxIter, driverEdgeGate = -1L)
      undirected.unpersist()
      labels
    }
  }

  /** Path-halving union-find over a collected edge list; O(E α(E)). Returns
    * id -> min id in its component for every id that appears in an edge
    * (isolated vertices are handled by the caller's left join + coalesce).
    * Exact, so — unlike label propagation — no iteration cap applies. */
  private[graft] def driverUnionFind(
      edges: Array[(Long, Long)]): collection.Map[Long, Long] = {
    val parent = collection.mutable.HashMap.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrElseUpdate(x, x)
      while (p != x) {
        val gp = parent.getOrElseUpdate(p, p)
        parent(x) = gp // path halving
        x = gp
        p = parent.getOrElseUpdate(x, x)
      }
      x
    }
    edges.foreach { case (a, b) =>
      val ra = find(a)
      val rb = find(b)
      // Union by MIN root so the representative is already the min id.
      if (ra < rb) parent(rb) = ra
      else if (rb < ra) parent(ra) = rb
    }
    // find() compresses paths in-place; snapshot keys before re-walking.
    parent.keys.toArray.map(k => k -> find(k)).toMap
  }
}
