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

  /** Per-group token-budget selection: every group (training domain,
    * language, source) gets its OWN budget, and within each group the
    * highest-quality prefix that fits is kept — the domain-mixture
    * composition step of curation pipelines (publicly described in the
    * DoReMi and Pile papers: per-domain token budgets, best documents
    * first), which the global [[apply]] cannot express because one hot
    * domain would eat the whole budget.
    *
    * Semantics per group g: sort members by (`scoreExpr` desc, `tieBreak`
    * asc), keep the maximal prefix with cumulative `costExpr` ≤ budget(g).
    * Groups without a budget get `defaultBudget` (0 = dropped — explicit
    * beats silently unlimited).
    *
    * Scale shape — the naive plan is `sum() OVER (PARTITION BY group ORDER
    * BY score)`, which serializes each domain through ONE task; a single
    * 10 TB web domain kills it. Instead this generalizes [[apply]]'s
    * two-pass trick to many groups in ONE distributed sort:
    *   1. range-partitioned sort on (group, score desc, tie) — a group
    *      spans consecutive partitions, a partition holds few groups;
    *   2. first pass collects per-(partition, group) cost sums in group
    *      order — O(#partitions + #groups) driver state, NOT per-row;
    *   3. driver computes each (partition, group)'s starting offset by a
    *      per-group prefix sum across partitions in pid order;
    *   4. second pass streams rows with one running counter per group
    *      transition, emitting while the group's cumulative fits.
    * No stage is per-group serial; budgets ride along as a broadcast map
    * bounded by the number of groups. */
  def grouped(
      df: DataFrame,
      groupCol: String,
      scoreExpr: String,
      costExpr: String,
      budgets: Map[Any, Long],
      tieBreak: String,
      defaultBudget: Long = 0L): DataFrame = {
    require(budgets.values.forall(_ >= 0L) && defaultBudget >= 0L,
      "budgetSelect.grouped: budgets must be non-negative")
    val spark = df.sparkSession
    val base = df.columns
    val scored = df
      .withColumn("_graft_cost", expr(costExpr).cast("long"))
      .withColumn("_graft_score", expr(scoreExpr))
    val sorted = scored
      .orderBy(col(groupCol).asc, col("_graft_score").desc, expr(tieBreak).asc)
      .persist()
    graft.core.PersistScope.register(sorted)

    val costIdx = sorted.schema.fieldIndex("_graft_cost")
    val grpIdx = sorted.schema.fieldIndex(groupCol)
    // Pass 1: per-partition per-group (sum, min) in first-seen group order
    // (= sort order, so the driver's cross-partition prefix is well-defined).
    val perPartition = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val order = collection.mutable.ArrayBuffer.empty[Any]
        val sums = collection.mutable.HashMap.empty[Any, (Long, Long)]
        it.foreach { r =>
          val g = if (r.isNullAt(grpIdx)) null else r.get(grpIdx)
          val c = if (r.isNullAt(costIdx)) 0L else r.getLong(costIdx)
          sums.get(g) match {
            case Some((s, mn)) => sums(g) = (s + c, math.min(mn, c))
            case None          => order += g; sums(g) = (c, c)
          }
        }
        Iterator((pid, order.toSeq.map(g => (g, sums(g)._1, sums(g)._2))))
      }
      .collect()
      .sortBy(_._1)
    require(perPartition.forall(_._2.forall(_._3 >= 0L)),
      s"budgetSelect.grouped: costExpr '$costExpr' produced a negative cost")
    val offsets = collection.mutable.HashMap.empty[(Int, Any), Long]
    val acc = collection.mutable.HashMap.empty[Any, Long]
    for ((pid, groups) <- perPartition; (g, s, _) <- groups) {
      offsets((pid, g)) = acc.getOrElse(g, 0L)
      acc(g) = acc.getOrElse(g, 0L) + s
    }
    val offB = spark.sparkContext.broadcast(offsets.toMap)
    val budgetB = spark.sparkContext.broadcast(budgets)

    val outSchema = StructType(sorted.schema.fields.toIndexedSeq)
    val kept = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      // Rows arrive group-contiguous (sort order); reset the counter at
      // each group transition. A row that overflows ends its group's kept
      // prefix — costs are non-negative so the check never re-passes.
      var started = false
      var curGrp: Any = null
      var running = 0L
      var budget = 0L
      it.filter { r =>
        val g = if (r.isNullAt(grpIdx)) null else r.get(grpIdx)
        if (!started || g != curGrp) {
          started = true
          curGrp = g
          running = offB.value((pid, g))
          budget = budgetB.value.getOrElse(g, defaultBudget)
        }
        val c = if (r.isNullAt(costIdx)) 0L else r.getLong(costIdx)
        running += c
        running <= budget
      }
    }
    spark.createDataFrame(kept, outSchema)
      .select(base.map(col).toIndexedSeq: _*)
  }

  /** Per-group budgets from a TOTAL budget and target mixture fractions
    * (the DoReMi form — domain weights are published as fractions of the
    * training token budget, not absolute counts). Fractions need not sum
    * to 1 (they are used as given: budget(g) = floor(frac(g) × total));
    * groups without a fraction get 0. Delegates to [[grouped]] — same one
    * sort, same O(#partitions + #groups) driver state. A group whose
    * documents cannot fill its budget simply yields fewer tokens;
    * reallocating its slack is a second pass the caller owns (keeping this
    * op a one-sort primitive). */
  def groupedFractions(
      df: DataFrame,
      groupCol: String,
      scoreExpr: String,
      costExpr: String,
      totalBudget: Long,
      fractions: Map[Any, Double],
      tieBreak: String): DataFrame = {
    require(totalBudget >= 0, s"totalBudget must be non-negative, got $totalBudget")
    require(fractions.values.forall(f => f >= 0.0 && !f.isNaN && !f.isInfinite),
      "fractions must be finite and non-negative")
    val budgets = fractions.map { case (g, f) =>
      g -> math.floor(f * totalBudget).toLong
    }
    grouped(df, groupCol, scoreExpr, costExpr, budgets, tieBreak)
  }

  /** Uniform per-group budget: every group present in the data gets the
    * same cap (the "at most N tokens per domain" balancing shape). */
  def groupedUniform(
      df: DataFrame,
      groupCol: String,
      scoreExpr: String,
      costExpr: String,
      budgetPerGroup: Long,
      tieBreak: String): DataFrame =
    grouped(df, groupCol, scoreExpr, costExpr, Map.empty[Any, Long], tieBreak,
      defaultBudget = budgetPerGroup)
}
