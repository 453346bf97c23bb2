package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mixture planning — turn "I want this domain composition over N
  * training tokens" into per-domain sampling rates and epoch counts
  * (the arithmetic behind Pile/DoReMi-style mixture tables): a domain
  * with more tokens than its share DOWNSAMPLES (fraction < 1, one
  * epoch); a domain with fewer UPSAMPLES (multiple epochs, the last
  * partial). The planner output feeds [[SampleOp]]'s weighted/epoch
  * samplers; keeping the solve explicit makes the mixture table a
  * reviewable artifact instead of arithmetic buried in a sampler.
  *
  * Output per domain: n_tokens (have), target_share (normalized),
  * want_tokens, epochs (ceil(want/have)), per_epoch_fraction
  * (want/(have·epochs) — uniform per-epoch rate whose total equals
  * want), and shortfall (want when the domain has NO tokens — the
  * impossible ask surfaced loudly, never silently dropped).
  *
  * Scale shape: one (domain)-keyed token aggregation; the solve is
  * arithmetic over the domain-count-sized stats table. Integer epoch
  * math `(want + have - 1) div have`, so the DuckDB oracle replays
  * exactly.
  */
object MixtureSolver {

  /** Plan from a raw corpus: aggregates `tokenExpr` per domain first. */
  def planFromCorpus(df: DataFrame, domainCol: String, tokenExpr: String,
      weights: Map[String, Double], totalBudget: Long): DataFrame =
    plan(df.groupBy(col(domainCol).cast("string").as("domain"))
      .agg(sum(expr(tokenExpr)).cast("bigint").as("n_tokens")),
      weights, totalBudget)

  /** Plan from an existing (domain, n_tokens) stats table. Domains absent
    * from `weights` get share 0 (explicitly excluded, still listed). */
  def plan(stats: DataFrame, weights: Map[String, Double],
      totalBudget: Long): DataFrame = {
    require(totalBudget > 0, s"totalBudget must be > 0, got $totalBudget")
    require(weights.nonEmpty && weights.values.forall(_ >= 0) &&
      weights.values.sum > 0,
      "weights must be non-negative and sum to > 0")
    val spark = stats.sparkSession
    import spark.implicits._
    val wSum = weights.values.sum
    val wTable = broadcast(
      weights.toSeq.map { case (d, w) => (d, w / wSum) }
        .toDF("domain", "target_share"))
    stats
      .join(wTable, Seq("domain"), "left")
      .withColumn("target_share",
        round(coalesce(col("target_share"), lit(0.0d)), 9))
      .withColumn("want_tokens",
        round(lit(totalBudget.toDouble) * col("target_share")).cast("bigint"))
      .withColumn("epochs",
        when(col("want_tokens") === 0, lit(0L))
          .when(col("n_tokens") === 0, lit(0L))
          // integer ceil-div (exact below 2^52, far past any token count)
          .otherwise(floor((col("want_tokens") + col("n_tokens") - 1)
            .cast("double") / col("n_tokens")).cast("bigint")))
      .withColumn("per_epoch_fraction",
        when(col("epochs") === 0, lit(0.0d))
          .otherwise(round(col("want_tokens").cast("double") /
            (col("n_tokens") * col("epochs")), 6)))
      .withColumn("shortfall",
        when(col("n_tokens") === 0, col("want_tokens")).otherwise(lit(0L)))
  }

  /** EXACT budget apportionment by the largest-remainder (Hamilton)
    * method: each domain gets floor(cᵈ·B/T), and the B − Σfloor leftover
    * units go to the domains with the largest integer remainders
    * (cᵈ·B mod T), ties by domain name ascending — so Σ quota = B
    * EXACTLY, unlike proportional rounding (which drifts) or
    * [[plan]]'s fractional shares (which a sampler only hits in
    * expectation). The release-manifest allocator: "exactly B tokens,
    * split as proportionally as integer arithmetic allows."
    *
    * All arithmetic is integer (BigInt products, so cᵈ·B can't
    * overflow) — replayable in any engine. Driver state is one row per
    * DOMAIN (the bound budgets maps already accept). Output:
    * (domain, n, quota). */
  def apportion(df: DataFrame, domainCol: String, countExpr: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    // null domains are excluded up front (the sibling Agreement ops
    // null-filter the same way) and an all-null countExpr sum coalesces
    // to 0 — neither shape may NPE the driver-side assembly below
    val counts = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol).cast("string").as("_d"))
      .agg(coalesce(sum(expr(countExpr)), lit(0L)).cast("long").as("_c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val total = counts.map(c => BigInt(c._2)).sum
    if (total <= 0)
      return counts.map { case (d, c) => (d, c, 0L) }.toSeq
        .toDF("domain", "n", "quota")
    val base = counts.map { case (d, c) =>
      val prod = BigInt(c) * budget
      (d, c, (prod / total).toLong, prod % total)
    }
    val leftover = (budget - base.map(_._3).sum).toInt
    val bonus = base.sortBy { case (d, _, _, rem) => (-rem, d) }
      .take(leftover).map(_._1).toSet
    base.map { case (d, c, fl, _) =>
      (d, c, fl + (if (bonus.contains(d)) 1L else 0L))
    }.toSeq.toDF("domain", "n", "quota")
  }

  /** UniMax budget allocation (Chung et al. 2023 — the mT5→UniMax
    * multilingual mixture recipe): spread `budget` units as UNIFORMLY
    * as possible across domains, subject to the per-domain repeat cap
    * `maxEpochs · count` (past a few epochs, repeating a small
    * language's data hurts more than under-representing it helps).
    * Water-filling, smallest domain first: each takes
    * min(cap, remaining ÷ domainsLeft); what a capped small domain
    * cannot absorb re-spreads over the larger rest. Because caps are
    * sorted ascending with the domains, the uncapped suffix always
    * absorbs the full remainder — budget left over means EVERY domain
    * capped (total corpus-epochs exhausted), surfaced in the
    * `unallocated` column (constant across rows), never silently
    * stretched. Integer floor-division fair shares make every step
    * exactly replayable (the recursive-CTE oracle shape).
    *
    * Scale shape: one (domain)-keyed count agg; the solve is a
    * driver loop over the domain-count-sized table (the [[apportion]]
    * bound). Output per domain: n, cap, alloc, epochs (alloc/n,
    * round 6), unallocated. */
  def unimax(df: DataFrame, domainCol: String, countExpr: String,
      budget: Long, maxEpochs: Int): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(maxEpochs >= 1 && maxEpochs <= 1000,
      s"maxEpochs must be in [1, 1000], got $maxEpochs")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol).cast("string").as("_d"))
      .agg(coalesce(sum(expr(countExpr)), lit(0L)).cast("long").as("_c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy { case (d, c) => (c, d) }
    // a positive budget over NO domains (all-null domain column, empty
    // corpus) has no row to carry `unallocated` — fail loud, the
    // "never silently dropped" contract
    require(counts.nonEmpty || budget == 0,
      "unimax: no non-null domains to allocate a positive budget over")
    var remaining = budget
    val rows = counts.zipWithIndex.map { case ((d, c), i) =>
      val fair = remaining / (counts.length - i) // integer floor
      val cap = BigInt(c.max(0L)) * maxEpochs
      val alloc = if (cap < fair) cap.toLong else fair
      remaining -= alloc
      // the REPORTED cap clamps to Long range (the solve above already
      // compares in BigInt, so alloc is unaffected by the clamp)
      (d, c, cap.min(Long.MaxValue).toLong, alloc)
    }
    val unallocated = remaining
    rows.map { case (d, c, cap, a) =>
      (d, c, cap, a,
        if (c > 0) graft.core.Num.rnd6(a.toDouble / c) else 0.0,
        unallocated)
    }.toSeq.toDF("domain", "n", "cap", "alloc", "epochs", "unallocated")
  }
}
