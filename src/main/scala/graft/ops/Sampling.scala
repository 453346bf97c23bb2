package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling family (reference docetl/operations/sample.py:13-713).
  *
  * Methods: first (positional head), uniform (seeded), hash (deterministic,
  * our scale-friendly addition), custom (key-subset semi-join), stratified,
  * outliers (embedding distance from centroid). All distributed; the only
  * driver-side values are scalar statistics (centroid, sigma) computed by
  * aggregations.
  */
object SampleOp {

  /** Positional head. The reference relies on list order (sample.py:404);
    * Spark DataFrames are unordered, so an explicit `orderCols` makes "first"
    * well-defined (SURVEY.md §7.5 order discipline). */
  def first(df: DataFrame, n: Int, orderCols: Seq[String]): DataFrame =
    df.orderBy(orderCols.map(col): _*).limit(n)

  /** Seeded uniform sample, Spark-native Bernoulli (reference sample.py:395
    * `random_state`). Deterministic for a fixed seed+partitioning. */
  def uniform(df: DataFrame, fraction: Double, seed: Long): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** Weighted sampling WITHOUT replacement by PER-ROW weight — the
    * Efraimidis–Spirakis A-ES scheme, the standard distributed form
    * (each row draws u ~ U(0,1) from a portable md5 hash of its id and
    * keeps key = -ln(u)/w; the k SMALLEST keys are a weighted sample
    * without replacement). Complements the weighted-MIXTURE samplers
    * (group-level weights): here every row carries its own weight, e.g. a
    * quality-classifier score steering corpus selection.
    *
    * Deterministic and portable: u is md5-derived (13 hex chars = 52 bits,
    * exact in float64), so any engine replaying the formula selects the
    * same rows. Rows with weight <= 0 or null are excluded (they have no
    * sampling mass; -ln(u)/0 would be +inf anyway). Scale shape: the
    * selection is orderBy(key).limit(k) — Spark plans TakeOrdered (per-
    * partition top-k heaps, one k-row merge on the driver), never a full
    * sort; weights/keys are codegen'd expressions inside the scan. */
  def weightedByRow(
      df: DataFrame,
      weightExpr: String,
      k: Int,
      idExpr: String,
      seed: Long = 0): DataFrame = {
    require(k >= 0, s"weightedByRow: k must be non-negative, got $k")
    val u = (conv(substring(md5(concat(expr(idExpr).cast("string"),
        lit(":" + seed))), 1, 13), 16, 10).cast("double") + 1.0) /
      4503599627370496.0 // 2^52; +1 keeps u in (0, 1]
    val w = expr(weightExpr).cast("double")
    val key = -log(u) / w
    // Null-id rows are excluded like null/non-positive weights: a null id
    // makes the A-ES key null, and asc ordering would otherwise sort those
    // rows FIRST — an unweighted free pass into every sample.
    df.filter(w > 0 && expr(idExpr).isNotNull)
      .withColumn("_graft_aes", key)
      .orderBy(col("_graft_aes").asc, expr(idExpr).asc)
      .limit(k)
      .drop("_graft_aes")
  }

  /** Deterministic hash-based sample on a key expression: keeps rows where
    * ((key*9301+49297+seed) mod 233280) < fraction*233280. Portable LCG —
    * reproducible across engines and cluster sizes, the right tool when a
    * sample must be stable across reruns at 100 TB. */
  def uniformHash(df: DataFrame, keyExpr: String, fraction: Double, seed: Long = 0): DataFrame = {
    val thresh = (fraction * 233280).toLong
    df.filter(pmod(expr(keyExpr) * 9301L + 49297L + seed, lit(233280L)) < thresh)
  }

  /** Leakage-safe train/val/test assignment: adds a `split` column that is a
    * pure function of `groupKey` (any Column, e.g. a domain or author id), so
    * EVERY row of a group lands in the same split — near-duplicate documents
    * from one site can never straddle train and eval. `splits` are
    * (name, fraction) pairs summing to ~1; assignment hashes the group key
    * with a portable md5 bucket (65536 buckets, so fractions resolve to
    * ~0.002%): stable under any partitioning, cluster size, data order, or
    * corpus growth — a group keeps its split forever as new members arrive,
    * which a rank-quantile split cannot promise. Pure codegen'd expressions;
    * no shuffle, no driver state. */
  def assignSplit(
      df: DataFrame, groupKey: Column,
      splits: Seq[(String, Double)], seed: Long = 0): DataFrame = {
    require(splits.nonEmpty, "assignSplit needs at least one (name, fraction)")
    require(splits.forall(_._2 >= 0), "split fractions must be >= 0")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-6, s"split fractions must sum to 1, got $total")
    val bucket = conv(
      substring(md5(concat(groupKey.cast("string"), lit(":" + seed))), 1, 4),
      16, 10).cast("int")
    val cuts = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * 65536)
    }.tail
    val assigned = splits.zip(cuts).init.foldRight(lit(splits.last._1)) {
      case (((name, _), cut), rest) => when(bucket < cut, lit(name)).otherwise(rest)
    }
    df.withColumn("split", assigned)
  }

  /** `custom` method: keep rows matching any of the given key-subset samples
    * (reference sample.py:421) — a broadcast left-semi join, not a driver loop. */
  def custom(df: DataFrame, samples: DataFrame): DataFrame =
    df.join(broadcast(samples), samples.columns.toSeq, "left_semi")

  /** Order-invariant "take n" for calibration/training samples: the n rows
    * with the smallest seeded xxhash64 over `hashCols` (default: all
    * columns). Unlike `.limit(n)` — which takes whatever partition lists
    * first, i.e. ONE FILE's distribution at 100 TB — this is a uniform
    * without-replacement sample that is identical under any partitioning or
    * file order. Compiles to TakeOrderedAndProject: per-partition top-n,
    * driver merge, no full sort. */
  def seededHead(df: DataFrame, n: Int, seed: Long = 42, hashCols: Seq[Column] = Nil): DataFrame = {
    val cols = if (hashCols.nonEmpty) hashCols else df.columns.toSeq.map(col)
    df.withColumn("_graft_sh", xxhash64((lit(seed) +: cols): _*))
      .orderBy(col("_graft_sh"))
      .limit(n)
      .drop("_graft_sh")
  }

  /** Stratified: n rows per `stratifyKey` group in `orderCols` order
    * (reference sample.py samples_per_group). Deliberately a PLAIN window +
    * row_number filter: Catalyst's InferWindowGroupLimit rewrites it into
    * the two-phase top-k — a *Partial* WindowGroupLimit keeps each input
    * partition's per-stratum top-n BEFORE the exchange (map-side, after
    * column pruning), so only <= partitions * strata * n survivors shuffle
    * and the final window ranks those. Hand-rolling the phases (a
    * pid-keyed window, or a mapPartitions head filter) is strictly worse:
    * the former adds a full-table exchange, the latter is an object
    * operator that blocks column pruning through the op. */
  /** EXACT-fraction stratified sample: floor(fraction × n_g) rows per
    * stratum, chosen by the portable 52-bit md5 order over `idExpr` —
    * the exactness the hash sampler can't give (hash thresholding hits
    * the fraction only in expectation; a release that promises "10% of
    * every source" wants the floor count). The md5 order has 2⁵² states
    * so strata of ANY size get a collision-free-in-practice random
    * order (the old 233,280-state LCG produced huge tie runs broken by
    * id — a low-id bias — above ~233k rows per stratum), and it is
    * non-negative by construction (no modulo sign trap on negative
    * ids). Rides [[BudgetSelect.grouped]]'s distributed prefix
    * machinery (ONE range-partitioned sort + O(#partitions + #strata)
    * driver state — never a per-stratum window); the per-stratum counts
    * are one aggregation collected to a driver map bounded by the
    * number of STRATA (sources/languages — bounded by construction;
    * this is the same bound budgets maps already accept). */
  def stratifiedExact(df: DataFrame, stratifyKey: String,
      fraction: Double, idExpr: String): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0, 1], got $fraction")
    val budgets: Map[Any, Long] = df.groupBy(col(stratifyKey))
      .agg(count(lit(1)).as("_n")).collect()
      .map(r => r.get(0) -> math.floor(fraction * r.getLong(1)).toLong)
      .toMap
    // DuckDB replay: ('0x' || substr(md5((id)::VARCHAR || ':sx'), 1, 13))::BIGINT
    BudgetSelect.grouped(df, stratifyKey,
      scoreExpr = "-cast(conv(substr(md5(concat(cast((" + idExpr +
        ") as string), ':sx')), 1, 13), 16, 10) as bigint)",
      costExpr = "1", budgets, tieBreak = idExpr)
  }

  def stratified(df: DataFrame, stratifyKey: String, nPerGroup: Int, orderCols: Seq[String]): DataFrame = {
    val global = Window.partitionBy(col(stratifyKey)).orderBy(orderCols.map(col): _*)
    df.withColumn("_graft_rn", row_number().over(global))
      .filter(col("_graft_rn") <= nPerGroup)
      .drop("_graft_rn")
  }

  /** Per-group uniform sample: exactly `nPerGroup` rows per stratum, chosen
    * by the portable LCG over `keyExpr` (reference sample.py:294-312
    * `samples_per_group` with method uniform). Same plan shape as
    * [[stratified]] — row_number window, map-side WindowGroupLimit — with
    * the hash as the order, so the pick is uniform AND reproducible across
    * engines/cluster sizes. */
  def stratifiedUniform(
      df: DataFrame, stratifyKey: String, keyExpr: String,
      nPerGroup: Int, seed: Long = 0): DataFrame = {
    val ord = pmod(expr(keyExpr) * 9301L + 49297L + seedRotation(seed), lit(233280L))
    val filtered = ordThresholdFilter(df, stratifyKey, ord, _ => lit(nPerGroup.toLong))
    val w = Window.partitionBy(col(stratifyKey)).orderBy(ord, expr(keyExpr))
    filtered.withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") <= nPerGroup)
      .drop("_graft_rn")
  }

  /** EXACT pre-filter for the LCG-ordered samplers: the rank window's sort
    * is the scale cost (the whole table sorts per stratum before
    * WindowGroupLimit trims it), but the LCG ord is bounded in [0, 233280),
    * so per-(stratum, ord) counts form a BOUNDED histogram regardless of row
    * count. A cumulative sum over that histogram yields, per stratum, the
    * smallest ord threshold containing >= quota rows; only rows at or below
    * their stratum's threshold (~quota + ties, not the full table) reach the
    * sort. Thresholds are O(#strata) and broadcast. Rows in strata without a
    * threshold row (null-keyed strata fail the equi-join) skip the
    * pre-filter and stay exact via the rank window. */
  private def ordThresholdFilter(
      df: DataFrame, stratifyKey: String,
      ord: org.apache.spark.sql.Column,
      quotaOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    val hist = df.select(col(stratifyKey).as("_graft_s"), ord.as("_graft_o"))
      .groupBy("_graft_s", "_graft_o").agg(count(lit(1)).as("_graft_c"))
    val cw = Window.partitionBy(col("_graft_s")).orderBy(col("_graft_o"))
    val thresh = hist
      .withColumn("_graft_cum", sum(col("_graft_c")).over(cw))
      // keep ord values whose PRECEDING cumulative count is still short of
      // the quota; the max of those is the exact threshold
      .filter(col("_graft_cum") - col("_graft_c") < quotaOf(col("_graft_s")))
      .groupBy("_graft_s").agg(max(col("_graft_o")).as("_graft_t"))
    df.join(broadcast(thresh), col(stratifyKey) === col("_graft_s"), "left")
      .filter(col("_graft_t").isNull || ord <= col("_graft_t"))
      .drop("_graft_s", "_graft_t")
  }

  /** Driver-side seed mixing for the LCG-ordered samplers: the raw seed
    * enters the LCG additively, so nearby seeds would rotate the ordering
    * by only a few positions and pick near-identical samples. A golden-ratio
    * multiply spreads any seed to a large rotation while staying a plain
    * constant the oracle SQL can embed. */
  private[graft] def seedRotation(seed: Long): Long =
    java.lang.Long.remainderUnsigned(seed * 0x9E3779B97F4A7C15L, 233280L)

  /** Capacity-aware largest-remainder quota allocation (driver-side,
    * O(#strata²) worst case over the stratum MAP, never the data): start
    * from capped floors of the exact proportional shares, then hand the
    * remaining slots one at a time to the stratum with spare capacity and
    * the largest deficit (exact - quota), key ascending breaking ties. With
    * total <= #rows this is exactly classic largest-remainder (a floor can
    * only exceed its stratum's size when total > #rows); beyond that it
    * degrades gracefully to "every row" instead of stranding slots on full
    * strata. Null-keyed and empty strata take no quota (the reference's
    * pandas groupby drops null groups, sample.py:314-339) and do not dilute
    * the proportional shares of live strata. PropertySpec checks the
    * invariants (quota sum, per-stratum caps, classic-LR agreement) against
    * a brute-force reference allocator. */
  /** Capacity-aware largest-remainder fill shared by the proportional and
    * weighted allocators: floor quotas capped at stratum capacity, then the
    * remainder goes one-by-one to the largest fractional deficit (ties by
    * key) among strata with headroom. */
  private def fillLargestRemainder(
      live: Map[String, Long], exact: Map[String, Double], total: Int,
      counts: Map[String, Long]): Map[String, Long] = {
    var quotas = exact.map { case (k, e) => k -> math.min(live(k), e.toLong) }
    var remaining = total - quotas.values.sum
    while (remaining > 0 && quotas.exists { case (k, q) => q < live(k) }) {
      val k = quotas.toSeq.filter { case (k0, q) => q < live(k0) }
        .minBy { case (k0, q) => (q - exact(k0), k0) }._1
      quotas = quotas.updated(k, quotas(k) + 1)
      remaining -= 1
    }
    counts.map { case (k, _) => k -> quotas.getOrElse(k, 0L) }
  }

  private[graft] def allocateProportional(
      counts: Map[String, Long], total: Int): Map[String, Long] = {
    val live = counts.filter { case (k, n) => k != null && n > 0 }
    if (live.isEmpty || total <= 0)
      return counts.view.mapValues(_ => 0L).toMap
    val totalRows = live.values.sum
    val exact = live.view.mapValues(n => total.toDouble * n / totalRows).toMap
    fillLargestRemainder(live, exact, total, counts)
  }

  /** Explicit-mixture allocation (domain reweighting, cf. the public DoReMi
    * / data-mixture literature): shares follow the TARGET `weights` instead
    * of the empirical distribution, capped at each stratum's capacity with
    * the overflow redistributed by largest remainder. Strata without a
    * positive weight get zero. Integer-valued weights keep the share
    * arithmetic bit-identical across engines (their sum is exact in
    * binary). */
  private[graft] def allocateWeighted(
      counts: Map[String, Long], weights: Map[String, Double],
      total: Int): Map[String, Long] = {
    val live = counts.filter { case (k, n) =>
      k != null && n > 0 && weights.getOrElse(k, 0.0) > 0 }
    if (live.isEmpty || total <= 0)
      return counts.view.mapValues(_ => 0L).toMap
    val sumW = live.keys.toSeq.sorted.map(weights).sum // fixed order: stable sum
    val exact = live.map { case (k, _) => k -> (total * weights(k) / sumW) }
    fillLargestRemainder(live, exact, total, counts)
  }

  /** Proportional stratified sampling (reference sample.py:314-339
    * `_sample_stratified_proportional`): `total` rows allocated across
    * strata by group size with largest-remainder rounding, picked uniformly
    * within each stratum by the portable LCG. Driver state is O(#strata)
    * (one count aggregation); the per-group quota rides back as a literal
    * map, and a constant `max quota` filter first keeps the window
    * WindowGroupLimit-optimizable. */
  def stratifiedProportional(
      df: DataFrame, stratifyKey: String, keyExpr: String,
      total: Int, seed: Long = 0): DataFrame =
    lcgQuotaStratified(df, stratifyKey, keyExpr, seed,
      counts => allocateProportional(counts, total),
      "proportional sampling needs a non-empty input")

  /** Weighted-mixture stratified sampling: like [[stratifiedProportional]]
    * but quotas follow explicit target `weights` ([[allocateWeighted]]) —
    * the resample step that retargets a corpus's domain mixture. Same
    * single-histogram scan, O(#strata) driver state, and exact LCG
    * threshold pre-filter as the proportional path. */
  def stratifiedWeighted(
      df: DataFrame, stratifyKey: String, keyExpr: String,
      total: Int, weights: Map[String, Double], seed: Long = 0): DataFrame =
    lcgQuotaStratified(df, stratifyKey, keyExpr, seed,
      counts => allocateWeighted(counts, weights, total),
      "weighted sampling needs a non-empty input")

  /** Temperature-flattened mixture sampling — the public mC4 / XLM-R
    * alpha-sampling recipe: stratum shares follow n_i^alpha instead of n_i,
    * with alpha = 1/temperature in (0, 1]. alpha = 1 reduces to
    * [[stratifiedProportional]]; alpha -> 0 approaches uniform-across-
    * strata; the usual 0.2–0.5 range boosts low-resource strata (languages,
    * domains) without letting any dominate. Delegates to
    * [[allocateWeighted]] with the powered counts as weights, so capacity
    * caps and largest-remainder redistribution behave identically to the
    * explicit-weights path. Same single-histogram scan and O(#strata)
    * driver state as every quota sampler. */
  def stratifiedTemperature(
      df: DataFrame, stratifyKey: String, keyExpr: String,
      total: Int, alpha: Double, seed: Long = 0): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    // IEEE-754 guarantees sqrt correctly rounded but NOT pow: routing the
    // common alpha = 0.5 through sqrt makes the shares bit-identical to a
    // SQL engine's sqrt (the oracle checks this path).
    val pw: Double => Double =
      if (alpha == 0.5) math.sqrt else x => math.pow(x, alpha)
    lcgQuotaStratified(df, stratifyKey, keyExpr, seed,
      counts => {
        val w = counts.collect { case (k, n) if k != null && n > 0 =>
          k -> pw(n.toDouble) }
        allocateWeighted(counts, w, total)
      },
      "temperature sampling needs a non-empty input")
  }

  /** Weighted mixture WITH upsampling: when a stratum's target share
    * exceeds its row count, its rows repeat across epochs (capped at
    * `maxEpochs` — the standard way training pipelines oversample a small
    * high-value domain). Each output row carries an `epoch` column
    * (0-based). Quota realization per stratum of n rows and quota q:
    * every row appears `q / n` times, and the LCG-first `q % n` rows once
    * more. Capacity = n × maxEpochs; if the weights demand more, the
    * allocator redistributes by largest remainder (the result under-fills
    * `total` only when EVERY weighted stratum hits maxEpochs).
    *
    * Scale: same single (stratum, ord) histogram scan as the proportional
    * sampler; pure-downsample strata (zero full epochs) are pre-filtered by
    * the exact ord threshold before the rank window, upsampled strata keep
    * all rows (every row is emitted anyway). Driver state stays O(#strata);
    * the epoch fan-out is an explode of a bounded constant-length slice. */
  def stratifiedWeightedEpochs(
      df: DataFrame, stratifyKey: String, keyExpr: String,
      total: Int, weights: Map[String, Double], seed: Long = 0,
      maxEpochs: Int = 4): DataFrame = {
    require(maxEpochs >= 1, "maxEpochs must be >= 1")
    require(!df.columns.contains("epoch"), "input already has epoch")
    val ord = pmod(expr(keyExpr) * 9301L + 49297L + seedRotation(seed), lit(233280L))
    val hist = graft.core.PersistScope.register(
      df.select(col(stratifyKey).cast("string").as("_graft_s"), ord.as("_graft_o"))
        .groupBy("_graft_s", "_graft_o").agg(count(lit(1)).as("_graft_c"))
        .persist())
    val counts = hist.groupBy("_graft_s").agg(sum("_graft_c").as("_n")).collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0)) -> r.getLong(1)).toMap
    require(counts.values.sum > 0, "weighted epoch sampling needs a non-empty input")
    val capacities = counts.view.mapValues(_ * maxEpochs).toMap
    val quotas = allocateWeighted(capacities, weights, total)
    val live = quotas.filter { case (k, q) => k != null && q > 0 }
    val fulls = live.map { case (k, q) => k -> q / counts(k) }
    val rems = live.map { case (k, q) => k -> q % counts(k) }
    // Pre-filter BEFORE the rank window, but only where it is sound: a
    // stratum with zero full epochs keeps just its LCG-first `rem` rows
    // (exact ord threshold, as in the proportional path); a stratum with
    // full epochs >= 1 emits every row, so it takes no threshold.
    val filterQuota = fulls.map { case (k, f) =>
      k -> (if (f >= 1) counts(k) else rems(k)) }
    val quotaMapF = typedLit(filterQuota)
    val cw = Window.partitionBy(col("_graft_s")).orderBy(col("_graft_o"))
    val thresh = hist
      .withColumn("_graft_cum", sum(col("_graft_c")).over(cw))
      .filter(col("_graft_cum") - col("_graft_c") <
        coalesce(element_at(quotaMapF, col("_graft_s")), lit(0L)))
      .groupBy("_graft_s").agg(max(col("_graft_o")).as("_graft_t"))
    val filtered = df
      .filter(col(stratifyKey).cast("string").isin(live.keys.toSeq: _*))
      .join(broadcast(thresh),
        col(stratifyKey).cast("string") === col("_graft_s"), "left")
      .filter(col("_graft_t").isNull || ord <= col("_graft_t"))
      .drop("_graft_s", "_graft_t")
    val fullMap = typedLit(fulls)
    val remMap = typedLit(rems)
    val w = Window.partitionBy(col(stratifyKey)).orderBy(ord, expr(keyExpr))
    val reps =
      coalesce(element_at(fullMap, col(stratifyKey).cast("string")), lit(0L)) +
        when(row_number().over(w) <=
          coalesce(element_at(remMap, col(stratifyKey).cast("string")), lit(0L)),
          1L).otherwise(0L)
    filtered
      .withColumn("_graft_reps", reps)
      .withColumn("epoch",
        explode(slice(sequence(lit(0L), lit(maxEpochs.toLong)), lit(1),
          col("_graft_reps").cast("int"))))
      .drop("_graft_reps")
  }

  private def lcgQuotaStratified(
      df: DataFrame, stratifyKey: String, keyExpr: String, seed: Long,
      allocate: Map[String, Long] => Map[String, Long],
      emptyMsg: String): DataFrame = {
    val ord = pmod(expr(keyExpr) * 9301L + 49297L + seedRotation(seed), lit(233280L))
    // ONE bounded (stratum, ord) histogram serves both driver needs: the
    // per-stratum row counts (quota allocation) roll up from it, and the
    // exact ord thresholds (pre-filter, see ordThresholdFilter) derive from
    // its cumulative sums — one scan of the data instead of two.
    val hist = graft.core.PersistScope.register(
      df.select(col(stratifyKey).cast("string").as("_graft_s"), ord.as("_graft_o"))
        .groupBy("_graft_s", "_graft_o").agg(count(lit(1)).as("_graft_c"))
        .persist())
    val counts = hist.groupBy("_graft_s").agg(sum("_graft_c").as("_n")).collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0)) -> r.getLong(1)).toMap
    require(counts.values.sum > 0, emptyMsg)
    val quotas = allocate(counts)
    val maxQuota = (quotas.values ++ Seq(0L)).max
    val quotaMap = typedLit(quotas.filter(_._1 != null))
    val cw = Window.partitionBy(col("_graft_s")).orderBy(col("_graft_o"))
    val thresh = hist
      .withColumn("_graft_cum", sum(col("_graft_c")).over(cw))
      .filter(col("_graft_cum") - col("_graft_c") <
        coalesce(element_at(quotaMap, col("_graft_s")), lit(0L)))
      .groupBy("_graft_s").agg(max(col("_graft_o")).as("_graft_t"))
    val filtered = df
      .join(broadcast(thresh),
        col(stratifyKey).cast("string") === col("_graft_s"), "left")
      .filter(col("_graft_t").isNull || ord <= col("_graft_t"))
      .drop("_graft_s", "_graft_t")
    val w = Window.partitionBy(col(stratifyKey)).orderBy(ord, expr(keyExpr))
    filtered.withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") <= maxQuota) // constant bound -> group limit
      .filter(col("_graft_rn") <=
        coalesce(element_at(quotaMap, col(stratifyKey).cast("string")), lit(0L)))
      .drop("_graft_rn")
  }

  /** `outliers` method (reference sample.py:465-545): distance of each row's
    * embedding from the mean embedding; keep (or drop) rows beyond
    * `stdCutoff` standard deviations, or the `samples` farthest.
    *
    * Centroid is computed by posexplode + per-index avg (an aggregation, not
    * a collect of vectors), then broadcast back as a literal — O(dim) driver
    * data regardless of row count.
    */
  def outliers(
      df: DataFrame,
      embeddingCol: String,
      stdCutoff: Option[Double],
      samples: Option[Int],
      keep: Boolean,
      tieBreak: Seq[String],
      /** Measure distance from this point instead of the mean embedding
        * (reference sample.py `center` config). */
      center: Option[Array[Double]] = None): DataFrame = {
    val centroid = center.getOrElse {
      df.select(posexplode(col(embeddingCol)).as(Seq("_i", "_v")))
        .groupBy("_i").agg(avg("_v").as("_m"))
        .orderBy("_i")
        .collect()
        .map(_.getDouble(1))
    }
    val distCol = graft.functions.VectorFunctions
      .euclideanToConst(col(embeddingCol), centroid)
    val scored = df.withColumn("_graft_dist", distCol)
    (stdCutoff, samples) match {
      case (Some(k), _) =>
        val Array(m, s) = scored.select(avg("_graft_dist"), stddev_pop("_graft_dist"))
          .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
        val cut = m + k * s
        val pred = if (keep) col("_graft_dist") > cut else col("_graft_dist") <= cut
        scored.filter(pred).drop("_graft_dist")
      case (None, Some(n)) =>
        // Global top-n via sort-limit (per-partition top-k + k-row driver
        // merge) — NOT an unpartitioned window, which would funnel every row
        // through a single task at scale.
        scored.orderBy(
          (if (keep) col("_graft_dist").desc else col("_graft_dist").asc) +:
            tieBreak.map(col(_).asc): _*)
          .limit(n)
          .drop("_graft_dist")
      case _ => throw new IllegalArgumentException("outliers needs stdCutoff or samples")
    }
  }
}

/** Top-k retrieval (reference docetl/operations/topk.py:12-261).
  * Methods: `embedding` (cosine to a query vector), `fts` (BM25). Optional
  * per-group stratified retrieval via `stratifyKey` (topk.py:184-188).
  */
object TopKOp {

  /** Cosine-similarity top-k against a constant query vector. Score + global
    * top-k: Spark's sort-limit is a per-partition top-k then a k-row merge on
    * the driver — no full sort at scale. */
  def embedding(
      df: DataFrame,
      embeddingCol: String,
      query: Array[Double],
      k: Int,
      tieBreak: Seq[String],
      scoreName: String = "_score"): DataFrame = {
    val score = graft.functions.VectorFunctions.cosineToConst(col(embeddingCol), query)
    df.withColumn(scoreName, score)
      .orderBy(col(scoreName).desc +: tieBreak.map(col(_).asc): _*)
      .limit(k)
  }

  /** Per-stratum top-k. Like [[SampleOp.stratified]], a plain window +
    * row_number filter on purpose: InferWindowGroupLimit plans the map-side
    * per-stratum top-k (Partial WindowGroupLimit) before the exchange, so
    * only survivors shuffle. */
  def embeddingStratified(
      df: DataFrame,
      embeddingCol: String,
      query: Array[Double],
      k: Int,
      stratifyKey: String,
      tieBreak: Seq[String],
      scoreName: String = "_score"): DataFrame = {
    val score = graft.functions.VectorFunctions.cosineToConst(col(embeddingCol), query)
    val order = col(scoreName).desc +: tieBreak.map(col(_).asc)
    val global = Window.partitionBy(col(stratifyKey)).orderBy(order: _*)
    df.withColumn(scoreName, score)
      .withColumn("_graft_rn", row_number().over(global))
      .filter(col("_graft_rn") <= k)
      .drop("_graft_rn")
  }

  /** BM25 top-k (reference sample.py:547-672 fts method). Distributed: doc
    * frequencies and average doc length come from aggregations over the
    * corpus; scores are a per-row expression; top-k is sort-limit. */
  def bm25(
      df: DataFrame,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      tieBreak: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      scoreName: String = "_score"): DataFrame = {
    import org.apache.spark.sql.Row
    val tokens = split(col(textCol), " ")
    val withLen = df.withColumn("_graft_dl", size(tokens))
    // Corpus stats: N, avgdl, and df per query term — one aggregation pass.
    val statsRow = withLen.agg(
      count(lit(1)).as("n"),
      avg(col("_graft_dl")).as("avgdl"),
      struct(queryTerms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(tokens, t), 1L).otherwise(0L)).as(s"df_$i")
      }: _*).as("dfs")
    ).collect()(0)
    val n = statsRow.getLong(0).toDouble
    val avgdl = statsRow.getDouble(1)
    val dfs = statsRow.getStruct(2)
    val score = queryTerms.zipWithIndex.map { case (t, i) =>
      val dfT = dfs.getLong(i).toDouble
      val idf = math.log((n - dfT + 0.5) / (dfT + 0.5) + 1.0)
      val tf = size(filter(tokens, x => x === t)).cast("double")
      lit(idf) * tf * (k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("_graft_dl").cast("double") / avgdl))
    }.reduce(_ + _)
    withLen.withColumn(scoreName, score)
      .drop("_graft_dl")
      .orderBy(col(scoreName).desc +: tieBreak.map(col(_).asc): _*)
      .limit(k)
  }

  /** Per-stratum BM25 top-k (reference topk.py:183-188: stratify_key makes
    * every method per-group). Corpus statistics (N, avgdl, per-term df)
    * aggregate PER STRATUM in one pass — O(#strata) rows — and broadcast
    * back; scoring is the same per-row expression and the per-stratum top-k
    * is a WindowGroupLimit-optimized row_number filter. */
  def bm25Stratified(
      df: DataFrame,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      stratifyKey: String,
      tieBreak: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      scoreName: String = "_score"): DataFrame = {
    val tokens = split(col(textCol), " ")
    val withLen = df.withColumn("_graft_dl", size(tokens))
    val statCols = Seq(
      count(lit(1)).cast("double").as("_graft_n"),
      avg(col("_graft_dl")).as("_graft_avgdl")) ++
      queryTerms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(tokens, t), 1L).otherwise(0L)).cast("double").as(s"_graft_df_$i")
      }
    val stats = withLen.groupBy(col(stratifyKey)).agg(statCols.head, statCols.tail: _*)
    val joined = withLen.join(broadcast(stats), Seq(stratifyKey))
    val score = queryTerms.zipWithIndex.map { case (t, i) =>
      val dfT = col(s"_graft_df_$i")
      val idf = log((col("_graft_n") - dfT + 0.5) / (dfT + 0.5) + 1.0)
      val tf = size(filter(tokens, x => x === t)).cast("double")
      idf * tf * (k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("_graft_dl").cast("double") / col("_graft_avgdl")))
    }.reduce(_ + _)
    val w = Window.partitionBy(col(stratifyKey))
      .orderBy(col(scoreName).desc +: tieBreak.map(col(_).asc): _*)
    joined.withColumn(scoreName, score)
      .withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") <= k)
      .drop(("_graft_rn" +: "_graft_dl" +: "_graft_n" +: "_graft_avgdl" +:
        queryTerms.indices.map(i => s"_graft_df_$i")): _*)
  }

  /** `llm_compare` method (reference topk.py:208+ delegates to rank with k):
    * Likert-rate every row, keep the global top k. */
  def llmCompare(
      df: DataFrame,
      name: String,
      promptTemplate: String,
      k: Int,
      client: graft.llm.LlmClient,
      model: String = "mock",
      tieBreak: Seq[String] = Nil): DataFrame =
    RankOp.byLikert(df, name, promptTemplate, client, model, "desc", tieBreak)
      .filter(col("_rank") <= k)
}
