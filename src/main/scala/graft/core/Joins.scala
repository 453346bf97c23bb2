package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-shape helpers enforcing SCALE.md's "no unbounded all-pairs stage"
  * rule at the PLAN level, not just by convention. */
object Joins {

  /** Re-select `right` in `left`'s column order so positional set-op
    * semantics (intersect/except) can't silently pair mismatched columns.
    * The single definition both the YAML set-op steps and the Frame API
    * use — the two surfaces must stay alignment-identical. */
  def alignByName(left: DataFrame, right: DataFrame): DataFrame =
    right.select(left.columns.map(col).toIndexedSeq: _*)

  /** A cross product whose small side is bounded BY CONSTRUCTION (a query
    * set, a retrieval index), expressed as a broadcast HASH join on a
    * degenerate key instead of a BroadcastNestedLoopJoin.
    *
    * Both sides get `_graft_bx = pmod(xxhash64(key), 1)` — always 0, but
    * non-foldable (hash of a live column), so Catalyst keeps the equi-join
    * and plans BroadcastHashJoin. Runtime behavior is identical to the
    * nested-loop plan (every probe row matches the whole broadcast build
    * side); what changes is that the suite-wide plan audit (PlanAuditSpec)
    * can now statically separate "bounded broadcast side by design" from an
    * accidental nested loop, and the join participates in whole-stage
    * codegen.
    *
    * "Bounded by construction" is also a CHECK, not just a comment: the
    * small side is counted with an O(maxRows) limited count (same guard
    * shape as Rank.byPairwise) and the call throws if it exceeds `maxRows` —
    * a corpus that outgrew its broadcast budget must be routed through a
    * scale path (e.g. Ann.ivf) by the caller, never silently broadcast. */
  def boundedCrossBroadcast(
      big: DataFrame, small: DataFrame,
      bigKey: Column, smallKey: Column,
      maxRows: Int = 500000,
      context: String = "boundedCrossBroadcast"): DataFrame = {
    val n = small.limit(maxRows + 1).count()
    require(n <= maxRows,
      s"$context: broadcast side exceeds maxRows=$maxRows rows; " +
        "route through a partitioned/indexed path (e.g. Ann.ivf) instead of broadcasting")
    val b = big.withColumn("_graft_bx", pmod(xxhash64(bigKey), lit(1)))
    val s = small.withColumn("_graft_bx", pmod(xxhash64(smallKey), lit(1)))
    b.join(broadcast(s), Seq("_graft_bx")).drop("_graft_bx")
  }
}
