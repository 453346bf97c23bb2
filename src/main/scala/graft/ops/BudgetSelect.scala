package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Token-budget corpus selection: keep the highest-quality documents whose
  * cumulative token cost fits a training budget — the "take the best N
  * billion tokens" step every data-curation pipeline runs after scoring
  * (quality-classifier / surprisal / importance-weight ranked corpora).
  *
  * Semantics: sort by (`scoreExpr` desc, `tieBreak` asc) and keep the
  * maximal prefix whose running `costExpr` sum stays ≤ `budget` (costs are
  * non-negative, so "rows whose cumulative sum ≤ budget" IS a prefix — the
  * first row that overflows is dropped along with everything after it).
  *
  * Scale shape: the naive formulation is `sum() OVER (ORDER BY score)` — a
  * GLOBAL window that serializes 100 TB through one task. Instead:
  *   1. one range-partitioned sort (Spark's distributed sort machinery —
  *      the same shape [[RankOp.withGlobalRank]] uses);
  *   2. an O(#partitions) first pass collects per-partition cost sums to
  *      the driver;
  *   3. an exclusive prefix sum over those sums (driver, #partitions
  *      scalars) gives each partition its starting offset;
  *   4. a second pass streams each partition with one running counter,
  *      emitting while the global cumulative stays within budget.
  * Partitions whose offset already exceeds the budget return an empty
  * iterator without consuming input. The sorted frame is persisted across
  * the two passes so the range partitioner's sampled boundaries cannot
  * shift between them (released via [[graft.core.PersistScope]]).
  */
object BudgetSelect {

  def apply(
      df: DataFrame,
      scoreExpr: String,
      costExpr: String,
      budget: Long,
      tieBreak: String): DataFrame = {
    require(budget >= 0, s"budgetSelect: budget must be non-negative, got $budget")
    val spark = df.sparkSession
    val base = df.columns
    val scored = df
      .withColumn("_graft_cost", expr(costExpr).cast("long"))
      .withColumn("_graft_score", expr(scoreExpr))
    val sorted = scored
      .orderBy(col("_graft_score").desc, expr(tieBreak).asc)
      .persist()
    graft.core.PersistScope.register(sorted)

    val costIdx = sorted.schema.fieldIndex("_graft_cost")
    val perPartition = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        var mn = 0L
        it.foreach { r =>
          if (!r.isNullAt(costIdx)) {
            val c = r.getLong(costIdx)
            s += c
            if (c < mn) mn = c
          }
        }
        Iterator((pid, s, mn))
      }
      .collect()
      .sortBy(_._1)
    // Prefix semantics ("cum ≤ budget" = a contiguous head) hold only for
    // non-negative costs; a negative cost would let the sum re-descend
    // below budget after overflowing. Fail loudly, not subtly.
    require(perPartition.forall(_._3 >= 0L),
      s"budgetSelect: costExpr '$costExpr' produced a negative cost")
    val offsets = perPartition.scanLeft(0L) { case (acc, (_, s, _)) => acc + s }

    val outSchema = StructType(sorted.schema.fields.toIndexedSeq)
    val kept = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var running = offsets(pid)
      if (running > budget) Iterator.empty[Row]
      else it.takeWhile { r =>
        val c = if (r.isNullAt(costIdx)) 0L else r.getLong(costIdx)
        running += c
        running <= budget
      }
    }
    spark.createDataFrame(kept, outSchema)
      .select(base.map(col).toIndexedSeq: _*)
  }
}
