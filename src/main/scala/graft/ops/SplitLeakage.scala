package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-split leakage audit — the eval-integrity check a training run
  * owes its benchmark numbers: after train/val/test assignment
  * ([[SampleOp.assignSplit]]'s group-hash split or any external one),
  * are there NEAR-DUPLICATE documents sitting on opposite sides of a
  * split boundary? A test document within edit distance t of a train
  * document inflates eval scores exactly like benchmark contamination
  * does ([[graft.dedup.Decontaminate]] guards against EXTERNAL
  * benchmarks; this guards the corpus against ITSELF).
  *
  * Built on [[graft.dedup.EditDedup.pairs]] — recall-1 character-level
  * pairs — filtered to pairs whose endpoints carry DIFFERENT split
  * labels. Use the `pairs` form for the offending id pairs (the
  * worklist: drop or re-split them) and `report` for the per-boundary
  * counts a datacard quotes.
  *
  * PAIR SHARING (the [[graft.dedup.EditDedup.components]] precedent): a
  * release pipeline running dedup + leakage + report on the same corpus
  * should pay the PassJoin ONCE — compute
  * `EditDedup.pairs(df, id, text, t)` once, persist it, and feed it to
  * the pair-accepting overloads here and to
  * `ConnectedComponents.runFromEdges` for the dedup arm. The
  * self-computing forms remain for one-shot audits; `report`'s
  * self-computing form persists its derived pairs internally
  * ([[graft.core.PersistScope]]) because the report is two aggregations
  * over them.
  *
  * Scale shape: everything the PassJoin arm costs plus two id-keyed
  * split-label joins and one (split_a, split_b)-keyed count — no new
  * shuffle classes, no driver state.
  */
object SplitLeakage {

  /** Leaking id pairs: (id_a, id_b, dist, split_a, split_b) with
    * split_a ≠ split_b (labels ordered so split_a ≤ split_b — one row
    * per unordered boundary pair). Self-computing form — derives the
    * PassJoin pairs itself; chains should use the overload below. */
  def pairs(df: DataFrame, idCol: String, textCol: String,
      splitCol: String, t: Int): DataFrame =
    pairs(df, idCol, splitCol,
      graft.dedup.EditDedup.pairs(df, idCol, textCol, t))

  /** [[pairs]] over PRECOMPUTED edit-distance pairs (id_a, id_b, dist)
    * — no PassJoin recompute: one `EditDedup.pairs` computation serves
    * dedup, leakage, and the boundary report. */
  def pairs(df: DataFrame, idCol: String, splitCol: String,
      editPairs: DataFrame): DataFrame = {
    // a null split label is NOT dropped (three-valued `=!=` would
    // silently erase the row from pairs AND report): unassigned rows
    // near-duplicating an assigned split are exactly what a release
    // audit must surface, so they bucket as "__unassigned__"
    val labels = df.select(col(idCol),
      coalesce(col(splitCol).cast("string"), lit("__unassigned__")))
    val withA = editPairs
      .join(labels.toDF("id_a", "_sa"), Seq("id_a"))
      .join(labels.toDF("id_b", "_sb"), Seq("id_b"))
      .filter(col("_sa") =!= col("_sb"))
    withA.select(col("id_a"), col("id_b"), col("dist"),
      least(col("_sa"), col("_sb")).as("split_a"),
      greatest(col("_sa"), col("_sb")).as("split_b"))
  }

  /** Per-boundary leakage counts: (split_a, split_b, n_pairs,
    * n_leaked_ids) — n_leaked_ids counts DISTINCT documents touching
    * that boundary (what you would have to drop to seal it).
    * Self-computing form: derives the pairs once, PERSISTED (the report
    * is two aggregations over them — without the handle the PassJoin
    * would run twice). */
  def report(df: DataFrame, idCol: String, textCol: String,
      splitCol: String, t: Int): DataFrame =
    reportFromPairs(graft.core.PersistScope.register(
      pairs(df, idCol, textCol, splitCol, t).persist()))

  /** [[report]] over PRECOMPUTED edit pairs — one PassJoin for the
    * whole dedup + leakage + report chain. The derived LEAKING subset
    * is persisted (it feeds two aggregations); the input pairs are
    * read once and left untouched. */
  def report(df: DataFrame, idCol: String, splitCol: String,
      editPairs: DataFrame): DataFrame =
    reportFromPairs(graft.core.PersistScope.register(
      pairs(df, idCol, splitCol, editPairs).persist()))

  /** The boundary rollup over an ALREADY-MATERIALIZED leaking-pairs
    * frame ([[pairs]] output). Callers handing in an unpersisted frame
    * pay its plan twice — the `report` overloads persist for you. */
  def reportFromPairs(prs: DataFrame): DataFrame = {
    val ids = prs.select(col("split_a"), col("split_b"),
      col("id_a").as("_id"))
      .unionByName(prs.select(col("split_a"), col("split_b"),
        col("id_b").as("_id")))
      .distinct()
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_leaked_ids"))
    prs.groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_pairs"))
      .join(ids, Seq("split_a", "split_b"))
  }
}
