package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge list — the domain-authority signal crawl
  * curation uses to weight sources (publicly: Page/Brin 1998; Common
  * Crawl publishes exactly this kind of host-level harmonic/pagerank
  * ranking, and quality pipelines join it as a prior). Complements
  * [[ConnectedComponents]] (membership) with IMPORTANCE.
  *
  * Determinism: ranks live as NANO-SCALED INTEGERS (1e9 units of
  * probability mass) and every update is integer arithmetic —
  * `contrib = rank // outdeg`, `new = (100−d)·1e9 // (100·n) +
  * d·Σcontrib // 100` — so results are bit-identical across
  * partitionings, re-runs, and engines (a float PageRank's per-dst sums
  * are shuffle-order dependent — the float-sum gate trap). Total mass is
  * 1e9, so per-dst sums can never overflow int64 regardless of graph
  * size. The integer truncation leaks ≤ outdeg nano-units per vertex per
  * iteration — irrelevant for an authority RANKING. Dangling vertices
  * (no out-edges) drop their mass, the standard simplification.
  * Multi-edges count once per occurrence (multigraph semantics).
  *
  * Scale shape: the edge list (with out-degrees attached) is persisted
  * and re-partitioned ONCE; each iteration is one src-keyed join + one
  * dst-keyed agg — the canonical distributed PageRank plan; ranks are
  * localCheckpoint'ed per iteration to keep lineage flat. Driver state =
  * one vertex count.
  */
object PageRank {

  private val Nano = 1000000000L

  /** (id, rank) after `nIter` iterations, rank = nano-mass / 1e9 rounded
    * to 9 decimals; `dampingPct` is the classic d as an integer percent
    * (85 = 0.85). Vertices = distinct src ∪ dst unless given. */
  def run(edges: DataFrame, nIter: Int = 10, dampingPct: Int = 85,
      vertices: Option[DataFrame] = None): DataFrame = {
    require(nIter >= 1 && nIter <= 100,
      s"nIter must be in [1, 100], got $nIter")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0, 100], got $dampingPct")
    val e = edges.toDF("src", "dst")
    val verts = vertices.map(_.toDF("id")).getOrElse(
      e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct())
      .localCheckpoint()
    val n = verts.count()
    require(n > 0, "pagerank: empty graph")

    val outdeg = e.groupBy("src").agg(count(lit(1)).as("_deg"))
    // Edges with degree attached, persisted once: every iteration joins
    // ranks against THIS table — the iteration never rescans the edge
    // producer (which may be an expensive extraction upstream).
    val withDeg = graft.core.PersistScope.register(
      e.join(outdeg, "src").persist())

    val baseNano = (100L - dampingPct) * Nano / (100L * n)
    var ranks = verts.withColumn("_rk", lit(Nano / n)).localCheckpoint()
    for (_ <- 1 to nIter) {
      val contribs = withDeg
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"),
          call_function("div", col("_rk"), col("_deg")).as("_c"))
        .groupBy("id").agg(sum(col("_c")).as("_s"))
      ranks = verts.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(baseNano) +
            call_function("div",
              lit(dampingPct.toLong) * coalesce(col("_s"), lit(0L)),
              lit(100L))).as("_rk"))
        .localCheckpoint()
    }
    ranks.select(col("id"), round(col("_rk").cast("double") / Nano, 9)
      .as("rank"))
  }
}
