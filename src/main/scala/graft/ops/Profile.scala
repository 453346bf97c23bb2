package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Numeric column profiler — the structured-column companion to the
  * text-centric [[Datacard]]: one row per profiled column with count,
  * nulls, distincts, min/max, mean/stddev, and quartiles. This is the
  * standard pre-training data-quality audit for metadata columns (lengths,
  * scores, timestamps, label ids): skewed or constant columns, null
  * explosions, and out-of-range values all surface here before they skew a
  * mixture or a filter threshold downstream.
  *
  * Scale shape: ONE aggregation computes every metric for every profiled
  * column in a single scan (map-side partials throughout), melted to
  * per-column rows from a constant-width struct array — output is
  * O(#columns), never row-sized. Mean and stddev are computed from
  * sum / sum-of-squares (Welford-free): for integer-valued columns the
  * double sums are EXACT (order-independent under 2^53), so the report is
  * bit-stable across partitionings and engines — a running-variance
  * aggregate's float merges are not. Exact percentiles buffer per-column
  * values (Spark's `percentile`), fine to ~10^8 rows per executor;
  * `approx = true` swaps percentile → `approx_percentile` (GK sketch) and
  * distinct → HLL++, the constant-memory 100 TB path (same knob
  * convention as [[Datacard]]/[[Diversity]]).
  */
object Profile {

  /** Profile `cols` (numeric) of `df`: one output row per column with
    * n, n_null, n_distinct, min, max, mean, stddev (sample), p25/p50/p75.
    * Doubles round to 6 decimals. */
  def numeric(df: DataFrame, cols: Seq[String], approx: Boolean = false,
      rsd: Double = 0.02, percentileAccuracy: Int = 10000): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    def nDistinct(c: Column) =
      if (approx) approx_count_distinct(c, rsd) else countDistinct(c)
    def quartiles(c: Column) =
      if (approx)
        approx_percentile(c, array(lit(0.25), lit(0.5), lit(0.75)),
          lit(percentileAccuracy))
      else percentile(c, array(lit(0.25), lit(0.5), lit(0.75)))

    val aggs = cols.flatMap { name =>
      val c = col(name).cast("double")
      val n = count(c)
      val s = sum(c)
      val s2 = sum(c * c)
      Seq(
        count(lit(1)).as(s"${name}__rows"),
        n.as(s"${name}__n"),
        nDistinct(col(name)).cast("bigint").as(s"${name}__nd"),
        min(c).as(s"${name}__min"),
        max(c).as(s"${name}__max"),
        s.as(s"${name}__sum"),
        s2.as(s"${name}__sum2"),
        quartiles(col(name).cast("double")).as(s"${name}__q"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { name =>
      val n = col(s"${name}__n")
      val s = col(s"${name}__sum")
      val s2 = col(s"${name}__sum2")
      // sample variance from exact sums: (Σx² − (Σx)²/n) / (n − 1)
      val variance = (s2 - s * s / n) / (n - lit(1))
      struct(
        lit(name).as("column"),
        n.cast("bigint").as("n"),
        (col(s"${name}__rows") - n).cast("bigint").as("n_null"),
        col(s"${name}__nd").as("n_distinct"),
        round(col(s"${name}__min"), 6).as("min"),
        round(col(s"${name}__max"), 6).as("max"),
        round(s / n, 6).as("mean"),
        when(n >= 2, round(sqrt(greatest(variance, lit(0.0))), 6))
          .as("stddev"),
        round(element_at(col(s"${name}__q"), 1), 6).as("p25"),
        round(element_at(col(s"${name}__q"), 2), 6).as("p50"),
        round(element_at(col(s"${name}__q"), 3), 6).as("p75"))
    }
    one.select(explode(array(rows: _*)).as("_p")).select("_p.*")
  }

  /** The (lo, hi) quantile pair of `colName` — one aggregation, two driver
    * scalars; None when the input has no non-null values (an upstream
    * filter emptying the frame is a normal pipeline state, not a crash).
    * `approx` swaps in the GK sketch (constant memory). */
  private def quantilePair(df: DataFrame, colName: String, pLo: Double,
      pHi: Double, approx: Boolean,
      accuracy: Int): Option[(Double, Double)] = {
    val c = col(colName).cast("double")
    val q =
      if (approx) approx_percentile(c, array(lit(pLo), lit(pHi)),
        lit(accuracy))
      else percentile(c, array(lit(pLo), lit(pHi)))
    val row = df.agg(q).head()
    if (row.isNullAt(0)) None
    else {
      val r = row.getSeq[Double](0)
      Some((r(0), r(1)))
    }
  }

  /** Equi-width value histogram over [lo, hi): `bins` buckets of width
    * (hi−lo)/bins, values outside the range CLAMPED into the first/last
    * bin (so the row count is conserved — a histogram that silently
    * drops outliers misreports the distribution it exists to show).
    * Output (bin, lo_edge, hi_edge, n), only non-empty bins, one keyed
    * aggregation; the bin index is floor((v−lo)·bins/(hi−lo)) — plain
    * double arithmetic both engines compute identically. Explicit
    * bounds by design: the caller pins them (from Profile.numeric's
    * min/max, a domain contract, or a prior run), so the histogram is
    * ONE pass and comparable across snapshots. */
  def histogram(df: DataFrame, colName: String, bins: Int, lo: Double,
      hi: Double): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val v = col(colName).cast("double")
    val raw = floor((v - lo) * bins / (hi - lo))
    val bin = least(greatest(raw, lit(0)), lit(bins - 1)).cast("bigint")
    // NaN would clamp into bin 0 (floor(NaN) casts to 0) and silently
    // inflate the lowest bucket — drop it like null
    df.filter(v.isNotNull && !isnan(v))
      .select(bin.as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        round(lit(lo) + col("bin") * (lit(hi) - lit(lo)) / bins, 6)
          .as("lo_edge"),
        round(lit(lo) + (col("bin") + 1) * (lit(hi) - lit(lo)) / bins, 6)
          .as("hi_edge"),
        col("n"))
  }

  /** Winsorize: clip `colName` to its [pLo, pHi] quantile range — the
    * standard score-stabilization step before a quality threshold or a
    * mixture weight is derived from a heavy-tailed signal. Two driver
    * scalars, then a pure `least/greatest` expression fused into the scan
    * (rounded to 6 decimals — the clip bounds are interpolated doubles).
    * An empty (or all-null-column) input appends a null column. */
  def winsorize(df: DataFrame, colName: String, pLo: Double = 0.01,
      pHi: Double = 0.99, approx: Boolean = false, accuracy: Int = 10000,
      outCol: String = ""): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val out = if (outCol.nonEmpty) outCol else s"${colName}_winsor"
    quantilePair(df, colName, pLo, pHi, approx, accuracy) match {
      case Some((lo, hi)) => df.withColumn(out,
        round(least(greatest(col(colName).cast("double"), lit(lo)),
          lit(hi)), 6))
      case None => df.withColumn(out, lit(null).cast("double"))
    }
  }

  /** Tukey-fence outlier flag: `colName` outside
    * [q1 − k·IQR, q3 + k·IQR] (k = 1.5 is the classic fence). Same
    * two-scalar driver shape as [[winsorize]]; the flag is a pure
    * expression, so downstream filters push to the scan. An empty (or
    * all-null-column) input flags nothing. */
  def iqrOutliers(df: DataFrame, colName: String, k: Double = 1.5,
      approx: Boolean = false, accuracy: Int = 10000,
      outCol: String = "is_outlier"): DataFrame =
    quantilePair(df, colName, 0.25, 0.75, approx, accuracy) match {
      case Some((q1, q3)) =>
        val iqr = q3 - q1
        val c = col(colName).cast("double")
        df.withColumn(outCol,
          coalesce(c < lit(q1 - k * iqr) || c > lit(q3 + k * iqr),
            lit(false)))
      case None => df.withColumn(outCol, lit(false))
    }

  /** Pairwise Pearson correlation over `cols` — the redundancy check
    * before [[ScoreEnsemble]] (two signals at r=0.98 are one signal
    * counted twice; Borda/z-score fusion assumes the inputs add
    * information). One row per unordered pair: (col_a, col_b, n, corr).
    *
    * Scale shape: ONE aggregation computes all pairs' moment sums —
    * values scale ×10⁶ to DECIMAL(38,0) so every sum is exact and
    * order-independent (the float-sum invariant); the closed-form
    * combination runs on the driver from one collected row, converting
    * the exact decimals to doubles in a fixed expression order, so the
    * rounded result replays cross-engine. Rows with a null in EITHER
    * column of a pair are excluded from that pair only. */
  /** Top-K most frequent values per listed column — the categorical
    * datacard band next to [[numeric]]: (column, rank, value, n, share)
    * rows, rank by (count desc, value asc, is_null asc) so the table
    * is deterministic. NULLs count as a real value (rendered as the
    * string "null" with `is_null = true` — a dominant-null column is
    * exactly what this report exists to surface, and the flag keeps a
    * genuine "null" STRING value from merging with it).
    *
    * Scale shape: one (column, value)-keyed count per listed column
    * (map-side combinable) and a rank window per column key —
    * `row_number() <= k` plans as WindowGroupLimit (map-side partial
    * top-k BEFORE the shuffle), so a high-cardinality column never
    * ships its full tail. Output is |cols| × k rows. */
  def topValues(df: DataFrame, cols: Seq[String], k: Int = 10): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    require(k >= 1 && k <= 10000, s"k must be in [1, 10000], got $k")
    // persisted (PersistScope — runner flush points release it): the
    // share-denominator count plus the per-column count scans are
    // k+1 actions over the same projection (the percentile() pattern);
    // a window-sum denominator would instead break the WindowGroupLimit
    // prune on the rank filter below
    val proj = graft.core.PersistScope.register(
      df.select(cols.map(col): _*).persist())
    val total = lit(math.max(proj.count(), 1L).toDouble)
    val perCol = cols.map { c =>
      // is_null keeps genuine NULLs distinct from literal "null"
      // strings — coalescing alone would merge their counts/shares
      proj.groupBy(
          coalesce(col(c).cast("string"), lit("null")).as("value"),
          col(c).isNull.as("is_null"))
        .agg(count(lit(1)).as("n"))
        .select(lit(c).as("column"), col("value"), col("is_null"),
          col("n"))
    }
    val counts = perCol.reduce(_ unionByName _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("column")
      .orderBy(col("n").desc, col("value"), col("is_null"))
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("column"), col("rank").cast("bigint").as("rank"),
        col("value"), col("is_null"), col("n"),
        round(col("n") / total, 6).as("share"))
  }

  /** k-anonymity audit (Sweeney 2002) over quasi-identifier columns —
    * the re-identification band of the release datacard: how many rows
    * sit in a quasi-identifier combination observed fewer than `k`
    * times. NULL is a real value (a missing zip code still identifies).
    * ONE (cols)-keyed count aggregation + one constant-row summary —
    * no row-sized driver state. */
  def kAnonymity(df: DataFrame, cols: Seq[String], k: Int): DataFrame = {
    require(cols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2 && k <= 1000000, s"k must be in [2, 1000000], got $k")
    df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("_n"))
      .agg(
        coalesce(sum(col("_n")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_combinations"),
        coalesce(sum(when(col("_n") < k, col("_n")).otherwise(0L)),
          lit(0L)).as("n_rows_below_k"),
        coalesce(sum(when(col("_n") < k, 1L).otherwise(0L)), lit(0L))
          .as("n_combinations_below_k"),
        coalesce(min(col("_n")), lit(0L)).as("min_group_size"))
      .select(lit(k.toLong).as("k"), col("n_rows"),
        col("n_combinations"), col("n_rows_below_k"),
        col("n_combinations_below_k"), col("min_group_size"),
        round(col("n_rows_below_k").cast("double") /
          greatest(col("n_rows"), lit(1L)).cast("double"), 6)
          .as("frac_rows_below_k"))
  }

  /** The risky combinations themselves — every quasi-identifier tuple
    * below `k`, largest first (deterministic ties on the stringified
    * values), capped at `limit` rows (the worklist shape: at web scale
    * most free-text combinations are unique, so the full below-k table
    * is corpus-sized — the audit wants the biggest offenders, the
    * one-row [[kAnonymity]] report carries the totals). */
  def kAnonymityGroups(df: DataFrame, cols: Seq[String], k: Int,
      limit: Int = 1000): DataFrame = {
    require(cols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2 && k <= 1000000, s"k must be in [2, 1000000], got $k")
    require(limit >= 1 && limit <= 1000000,
      s"limit must be in [1, 1000000], got $limit")
    // unit-separator join + a per-column null marker = collision-proof
    // total order: ("ab","c") must not tie with ("a","bc") at the limit
    // boundary, and a NULL must not tie with any real value
    val tie = concat_ws("\u0001",
      cols.flatMap(c => Seq(
        when(col(c).isNull, lit("0")).otherwise(lit("1")),
        coalesce(col(c).cast("string"), lit("")))): _*)
    df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .filter(col("group_size") < k)
      .orderBy(col("group_size").desc, tie)
      .limit(limit)
  }

  /** Distinct l-diversity report (Machanavajjhala et al. 2006 — the
    * layer k-anonymity misses: a k-sized equivalence class whose rows
    * all share ONE sensitive value still discloses it; each class must
    * carry at least `l` distinct sensitive values). One-row report over
    * (quasi-identifier) classes. NULL is a real sensitive value (its
    * absence is itself disclosure), same convention as [[kAnonymity]]'s
    * NULL quasi-identifiers.
    *
    * Scale shape: one (qi, sensitive)-keyed count then one qi-keyed
    * agg — exact distinct as two-phase partial dedup, so no executor
    * holds a class's value set; both aggs map-side combine; driver
    * state = the one report row. */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      l: Int): DataFrame = {
    require(l >= 2 && l <= 1000000, s"l must be in [2, 1000000], got $l")
    val classes = lDiversityClasses(df, qiCols, sensitiveCol)
    classes.agg(
        coalesce(sum(col("_n")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_classes"),
        coalesce(sum(when(col("_d") < l, col("_n")).otherwise(0L)),
          lit(0L)).as("n_rows_below_l"),
        coalesce(sum(when(col("_d") < l, 1L).otherwise(0L)), lit(0L))
          .as("n_classes_below_l"),
        coalesce(min(col("_d")), lit(0L)).as("min_distinct_sensitive"))
      .select(lit(l.toLong).as("l"), col("n_rows"), col("n_classes"),
        col("n_rows_below_l"), col("n_classes_below_l"),
        col("min_distinct_sensitive"),
        round(col("n_rows_below_l").cast("double") /
          greatest(col("n_rows"), lit(1L)).cast("double"), 6)
          .as("frac_rows_below_l"))
  }

  /** The below-l equivalence classes themselves — the worklist arm
    * ([[kAnonymityGroups]]'s shape: largest classes first,
    * collision-proof ties, capped at `limit`; at web scale the full
    * below-l table is corpus-sized by construction). */
  def lDiversityGroups(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, l: Int, limit: Int = 1000): DataFrame = {
    require(limit >= 1 && limit <= 1000000,
      s"limit must be in [1, 1000000], got $limit")
    val tie = concat_ws("\u0001",
      qiCols.flatMap(c => Seq(
        when(col(c).isNull, lit("0")).otherwise(lit("1")),
        coalesce(col(c).cast("string"), lit("")))): _*)
    lDiversityClasses(df, qiCols, sensitiveCol)
      .filter(col("_d") < l)
      .orderBy(col("_n").desc, tie)
      .limit(limit)
      .select(qiCols.map(col) :+ col("_n").as("group_size") :+
        col("_d").as("n_distinct_sensitive"): _*)
  }

  /** The (class, value)-distinct cell counts both l-diversity arms
    * share — one (qi, sensitive)-keyed count plus the validations. */
  private def lDiversityCells(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(!qiCols.contains(sensitiveCol),
      "sensitive column cannot be a quasi-identifier")
    df.groupBy((qiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("_c"))
  }

  private def lDiversityClasses(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String): DataFrame =
    lDiversityCells(df, qiCols, sensitiveCol)
      .groupBy(qiCols.map(col): _*)
      .agg(sum(col("_c")).as("_n"), count(lit(1)).as("_d"))

  /** The cells table with a `_qi` struct key and per-class totals `_n`
    * joined back — shared by [[lDiversityEntropy]] and the t-closeness
    * arms. Per-class totals are a keyed agg joined back on STRUCT
    * equality: struct comparison treats null fields as equal, so NULL
    * quasi-identifier classes (real combinations here — the kAnonymity
    * convention) survive where a plain multi-column equi-join would
    * drop them. A Window.partitionBy(qiCols) would also work
    * arithmetically, but a high-cardinality sensitive column (free
    * text) makes one class's cells one hot single-task window
    * partition — the SCALE.md no-hot-key-window rule; the keyed join
    * instead skew-splits under AQE. */
  private def cellsWithClassTotals(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String): DataFrame = {
    val cells = lDiversityCells(df, qiCols, sensitiveCol)
      .withColumn("_qi", struct(qiCols.map(col): _*))
    val totals = cells.groupBy(col("_qi").as("_qik"))
      .agg(sum(col("_c")).as("_n"))
    cells.join(totals, col("_qi") === col("_qik")).drop("_qik")
  }

  /** Per-class DOUBLED total-variation distance to the global sensitive
    * distribution, in integer micro units (`_d2`), plus class size
    * (`_n`) — the shared core of both t-closeness arms.
    *
    * For the categorical (equal-distance) ground metric the paper's
    * EMD reduces to total variation: TV = ½ Σ_v |p_v − q_v|. The sum
    * decomposes over CLASS-PRESENT values plus a closed-form remainder
    * for absent ones (each contributes |0 − q_v| = q_v, and
    * Σ_absent q_v = 1 − Σ_present q_v), so only the cells table joins —
    * never the full (class × value) cross. Determinism: |p−q| and q
    * round to INTEGER micro units per term (the q149 rule), the
    * remainder clamps at 0 (per-term rounding can push Σq a hair past
    * 1e6), and the ½ division happens once at the end. Driver state:
    * ONE scalar (the corpus row count — the global denominator). */
  private def tClosenessClasses(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String): DataFrame = {
    val cells = cellsWithClassTotals(df, qiCols, sensitiveCol)
    val head = df.agg(count(lit(1)),
      approx_count_distinct(col(sensitiveCol))).collect().head
    val n = head.getLong(0)
    // a privacy gate over nothing must fail, not report zero risk
    // (the numeric arm's rule — both arms hold it)
    require(n > 0, "t_closeness: empty input — a privacy gate over " +
      "nothing must fail, not report zero risk")
    val g0 = cells.groupBy(struct(col(sensitiveCol)).as("_sv"))
      .agg(sum(col("_c")).as("_g"))
    // The global distribution is distinct-sensitive-value-sized — the
    // shape the engine broadcasts everywhere else. A shuffle join here
    // keys the cells table by the RAW sensitive value, which goes hot
    // on a realistic dominant value (95% "none" is the normal privacy-
    // audit case); broadcasting g removes that exchange entirely.
    // Guarded by the distinct count (one approx sketch riding the
    // fail-loud agg above): a free-text sensitive column (ndv ~ rows)
    // keeps the shuffle arm, where AQE skew-splitting applies.
    val g = if (head.getLong(1) <= 100000L) broadcast(g0) else g0
    cells.withColumn("_svk", struct(col(sensitiveCol)))
      .join(g, col("_svk") === col("_sv"))
      .withColumn("_a", round(abs(col("_c").cast("double") / col("_n") -
        col("_g").cast("double") / n) * 1e6).cast("bigint"))
      .withColumn("_b",
        round(col("_g").cast("double") / n * 1e6).cast("bigint"))
      .groupBy(col("_qi"))
      .agg((sum(col("_a")) +
        greatest(lit(0L), lit(1000000L) - sum(col("_b")))).as("_d2"),
        first(col("_n")).as("_n"))
  }

  /** t-closeness report (Li, Li & Venkatasubramanian 2007 — the layer
    * l-diversity misses: a class can carry l distinct sensitive values
    * whose DISTRIBUTION still leaks, e.g. 99% "cancer" in a population
    * that is 1% "cancer"; the class must stay within distance `t` of
    * the global distribution). Categorical equal-distance EMD = total
    * variation; one report row. A class violates when its distance
    * EXCEEDS t (integer-micro comparison on the doubled distance, so
    * the gate replays across engines). */
  def tCloseness(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      t: Double): DataFrame = {
    require(t > 0.0 && t <= 1.0, s"t must be in (0, 1], got $t")
    val bar2 = 2L * math.round(t * 1e6)
    val classes = tClosenessClasses(df, qiCols, sensitiveCol)
    classes.agg(
        coalesce(sum(col("_n")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_classes"),
        coalesce(sum(when(col("_d2") > bar2, col("_n")).otherwise(0L)),
          lit(0L)).as("n_rows_above"),
        coalesce(sum(when(col("_d2") > bar2, 1L).otherwise(0L)), lit(0L))
          .as("n_classes_above"),
        max(col("_d2")).as("_maxD2"))
      .select(lit(t).as("t"), col("n_rows"), col("n_classes"),
        col("n_rows_above"), col("n_classes_above"),
        round(coalesce(col("_maxD2"), lit(0L)).cast("double") / 2e6, 6)
          .as("max_t"),
        round(col("n_rows_above").cast("double") /
          greatest(col("n_rows"), lit(1L)).cast("double"), 6)
          .as("frac_rows_above"))
  }

  /** The above-t equivalence classes themselves — the worklist arm
    * ([[kAnonymityGroups]]'s shape: largest classes first,
    * collision-proof ties, capped at `limit`). */
  def tClosenessGroups(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, t: Double, limit: Int = 1000): DataFrame = {
    require(t > 0.0 && t <= 1.0, s"t must be in (0, 1], got $t")
    require(limit >= 1 && limit <= 1000000,
      s"limit must be in [1, 1000000], got $limit")
    val bar2 = 2L * math.round(t * 1e6)
    val qi = (c: String) => col("_qi").getField(c)
    val tie = concat_ws("\u0001",
      qiCols.flatMap(c => Seq(
        when(qi(c).isNull, lit("0")).otherwise(lit("1")),
        coalesce(qi(c).cast("string"), lit("")))): _*)
    tClosenessClasses(df, qiCols, sensitiveCol)
      .filter(col("_d2") > bar2)
      .orderBy(col("_n").desc, tie)
      .limit(limit)
      .select(qiCols.map(c => qi(c).as(c)) :+
        col("_n").as("group_size") :+
        round(col("_d2").cast("double") / 2e6, 6).as("t_value"): _*)
  }

  /** Per-class SCALED ordered EMD to the global distribution of a
    * NUMERIC sensitive column, in integer micro units (`_ds` =
    * Σ|prefix| where D = _ds / ((bins−1)·1e6)), plus class size `_n` —
    * the shared core of both numeric t-closeness arms.
    *
    * The paper's ordered-distance EMD (Li et al. 2007 §4, the salary
    * example) is D = (1/(m−1)) Σᵢ |Σ_{j≤i}(p_j − q_j)| over the m
    * ordered values; continuous attributes bin to `bins` equal-width
    * buckets over the global [min, max] ([[histogram]]'s pinned-bounds
    * convention — identical IEEE arithmetic replays in an external
    * oracle). Every class must see EVERY bin (a bin the class lacks
    * still moves the prefix), so the skeleton explodes bins per class —
    * class × bins rows where bins is a CONFIG CONSTANT, never
    * data-sized; the prefix sum is a window whose partitions are
    * exactly `bins` rows (bounded by config, not by data — not a
    * hot-key window). Per-bin p/q round to integer micro units before
    * the prefix sum (the q149 rule). NULL/NaN sensitive values have no
    * position on an ordered axis and are EXCLUDED from both
    * distributions (unlike the categorical arm, where NULL is a
    * value); an input with no usable sensitive values fails LOUD. */
  private def tClosenessNumericClasses(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, bins: Int): DataFrame = {
    // the same quasi-identifier validations the categorical arm gets
    // from lDiversityCells — identical YAML must fail identically
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(!qiCols.contains(sensitiveCol),
      "sensitive column cannot be a quasi-identifier")
    val v = col(sensitiveCol).cast("double")
    val usable = df.filter(v.isNotNull && !isnan(v))
    val bounds = usable.agg(min(v), max(v), count(lit(1))).collect().head
    require(bounds.getLong(2) > 0, "t_closeness numeric: no usable " +
      s"(non-null, non-NaN) values in '$sensitiveCol' — a privacy gate " +
      "over nothing must fail, not report zero risk")
    val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
    // a constant column: every class distribution equals the global one
    val bin = if (lo == hi) lit(0L)
      else least(greatest(floor((v - lo) * bins / (hi - lo)), lit(0)),
        lit(bins - 1)).cast("bigint")
    val binCounts = usable
      .select(struct(qiCols.map(col): _*).as("_qi"), bin.as("_bin"))
      .groupBy(col("_qi"), col("_bin"))
      .agg(count(lit(1)).as("_c"))
    val classTotals = binCounts.groupBy(col("_qi").as("_qik"))
      .agg(sum(col("_c")).as("_n"))
    val globalBins = binCounts.groupBy(col("_bin").as("_gbin"))
      .agg(sum(col("_c")).as("_g"))
    val n = bounds.getLong(2)
    // class × bins skeleton (bins = a config constant, never data-sized)
    val skeleton = classTotals
      .withColumn("_sbin", explode(sequence(lit(0L), lit(bins - 1L))))
    val perBin = skeleton
      .join(binCounts, col("_qik") === col("_qi") &&
        col("_sbin") === col("_bin"), "left")
      // globalBins is at most `bins` rows (config constant) — always
      // broadcastable, and a shuffle here would key by bin id (hot by
      // construction: popular bins hold most of the corpus)
      .join(broadcast(globalBins), col("_sbin") === col("_gbin"), "left")
      .withColumn("_pq",
        round(coalesce(col("_c"), lit(0L)).cast("double") / col("_n") *
          1e6).cast("bigint") -
        round(coalesce(col("_g"), lit(0L)).cast("double") / n *
          1e6).cast("bigint"))
    // partition size == bins exactly — config-bounded, not a hot key
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_qik")).orderBy(col("_sbin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    perBin.withColumn("_prefix", sum(col("_pq")).over(w))
      .groupBy(col("_qik").as("_qi"))
      .agg(sum(abs(col("_prefix"))).as("_ds"), first(col("_n")).as("_n"))
  }

  /** t-closeness report for a NUMERIC sensitive column (the paper's
    * salary example): ordered EMD over `bins` equal-width buckets —
    * nearby values leak less than distant ones, which the categorical
    * arm cannot express. One report row; a class violates when its
    * distance exceeds `t` (integer-micro gate: Σ|prefix| against
    * round(t·1e6)·(bins−1), exact on both engines). */
  def tClosenessNumeric(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, t: Double, bins: Int = 16): DataFrame = {
    require(t > 0.0 && t <= 1.0, s"t must be in (0, 1], got $t")
    require(bins >= 2 && bins <= 1024,
      s"bins must be in [2, 1024], got $bins")
    val bar = math.round(t * 1e6) * (bins - 1L)
    val denom = (bins - 1L) * 1e6
    val classes = tClosenessNumericClasses(df, qiCols, sensitiveCol, bins)
    classes.agg(
        coalesce(sum(col("_n")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_classes"),
        coalesce(sum(when(col("_ds") > bar, col("_n")).otherwise(0L)),
          lit(0L)).as("n_rows_above"),
        coalesce(sum(when(col("_ds") > bar, 1L).otherwise(0L)), lit(0L))
          .as("n_classes_above"),
        max(col("_ds")).as("_maxDs"))
      .select(lit(t).as("t"), lit(bins.toLong).as("bins"), col("n_rows"),
        col("n_classes"), col("n_rows_above"), col("n_classes_above"),
        round(coalesce(col("_maxDs"), lit(0L)).cast("double") / denom, 6)
          .as("max_t"),
        round(col("n_rows_above").cast("double") /
          greatest(col("n_rows"), lit(1L)).cast("double"), 6)
          .as("frac_rows_above"))
  }

  /** The above-t worklist for [[tClosenessNumeric]] — same contract as
    * [[tClosenessGroups]]. */
  def tClosenessNumericGroups(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, t: Double, bins: Int = 16,
      limit: Int = 1000): DataFrame = {
    require(t > 0.0 && t <= 1.0, s"t must be in (0, 1], got $t")
    require(bins >= 2 && bins <= 1024,
      s"bins must be in [2, 1024], got $bins")
    require(limit >= 1 && limit <= 1000000,
      s"limit must be in [1, 1000000], got $limit")
    val bar = math.round(t * 1e6) * (bins - 1L)
    val denom = (bins - 1L) * 1e6
    val qi = (c: String) => col("_qi").getField(c)
    val tie = concat_ws("\u0001",
      qiCols.flatMap(c => Seq(
        when(qi(c).isNull, lit("0")).otherwise(lit("1")),
        coalesce(qi(c).cast("string"), lit("")))): _*)
    tClosenessNumericClasses(df, qiCols, sensitiveCol, bins)
      .filter(col("_ds") > bar)
      .orderBy(col("_n").desc, tie)
      .limit(limit)
      .select(qiCols.map(c => qi(c).as(c)) :+
        col("_n").as("group_size") :+
        round(col("_ds").cast("double") / denom, 6).as("t_value"): _*)
  }

  /** ENTROPY l-diversity report (Machanavajjhala 2006 §3.2 — the
    * stronger instantiation: a class passes when the entropy of its
    * sensitive-value distribution is at least ln(l), so a class of
    * {flu: 99, cold: 1} fails at l = 2 even though it has 2 distinct
    * values — distinct l-diversity's blind spot). One-row report.
    *
    * Determinism: class entropy accumulates as INTEGER MICRO-NATS —
    * each (class, value) cell contributes round((c/n)·ln(n/c)·1e6),
    * rounded PER TERM so the within-class sum is an order-free integer
    * sum (a raw double Σ would be partition-order dependent, the q149
    * float-sum lesson); the ln(l)·1e6 bar rounds the same way. Scale
    * shape matches [[lDiversity]] plus one struct-keyed totals join
    * over the cells table: one (qi, sensitive)-keyed count, one
    * class-keyed totals agg joined back null-safely, one report row —
    * no Window over the qi key (hot under high-cardinality sensitive
    * columns). */
  def lDiversityEntropy(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, l: Int): DataFrame = {
    require(l >= 2 && l <= 1000000, s"l must be in [2, 1000000], got $l")
    val barMicro = math.round(math.log(l.toDouble) * 1e6)
    val classes = cellsWithClassTotals(df, qiCols, sensitiveCol)
      .withColumn("_t", round(col("_c").cast("double") / col("_n") *
        log(col("_n").cast("double") / col("_c")) * 1e6).cast("bigint"))
      .groupBy(col("_qi"))
      .agg(sum(col("_t")).as("_e"), first(col("_n")).as("_n"))
    classes.agg(
        coalesce(sum(col("_n")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_classes"),
        coalesce(sum(when(col("_e") < barMicro, col("_n")).otherwise(0L)),
          lit(0L)).as("n_rows_below"),
        coalesce(sum(when(col("_e") < barMicro, 1L).otherwise(0L)),
          lit(0L)).as("n_classes_below"),
        min(col("_e")).as("_minE"))
      .select(lit(l.toLong).as("l"),
        round(lit(barMicro.toDouble) / 1e6, 6).as("entropy_bar"),
        col("n_rows"), col("n_classes"), col("n_rows_below"),
        col("n_classes_below"),
        round(coalesce(col("_minE"), lit(0L)).cast("double") / 1e6, 6)
          .as("min_entropy"),
        round(col("n_rows_below").cast("double") /
          greatest(col("n_rows"), lit(1L)).cast("double"), 6)
          .as("frac_rows_below"))
  }

  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns, got ${cols.size}")
    require(cols.distinct.size == cols.size, "columns must be distinct")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    def scaled(c: String) =
      round(col(c).cast("double") * 1e6).cast("decimal(38,0)")
    val aggs = pairs.zipWithIndex.flatMap { case ((a, b), k) =>
      val both = col(a).isNotNull && col(b).isNotNull
      def s(e: org.apache.spark.sql.Column, name: String) =
        sum(when(both, e)).as(s"_${name}_$k")
      Seq(sum(when(both, 1L).otherwise(0L)).as(s"_n_$k"),
        s(scaled(a), "sx"), s(scaled(b), "sy"),
        s(scaled(a) * scaled(a), "sxx"), s(scaled(b) * scaled(b), "syy"),
        s(scaled(a) * scaled(b), "sxy"))
    }
    val m = df.agg(aggs.head, aggs.tail: _*).head()
    def d(name: String, k: Int) = {
      val i = m.fieldIndex(s"_${name}_$k")
      // A null sum with n > 0 means DECIMAL(38,0) OVERFLOWED (values
      // beyond ~1e12 after the ×1e6 scaling): fail loudly — a coalesce
      // here would silently zero the statistics ("exact" turning into
      // garbage is worse than an error telling the caller to pre-scale).
      if (m.isNullAt(i)) {
        if (m.getAs[Long](s"_n_${k}") > 0)
          throw new IllegalStateException(
            s"correlationMatrix: moment sum ${name}_$k overflowed " +
              "DECIMAL(38,0) — pre-scale the column (values must stay " +
              "below ~1e12 in magnitude)")
        0.0
      } else m.getAs[java.math.BigDecimal](i).doubleValue()
    }
    val rows = pairs.zipWithIndex.map { case ((a, b), k) =>
      val n = m.getAs[Long](s"_n_$k").toDouble
      val (sx, sy) = (d("sx", k), d("sy", k))
      val (sxx, syy, sxy) = (d("sxx", k), d("syy", k), d("sxy", k))
      val cov = n * sxy - sx * sy
      val vx = n * sxx - sx * sx
      val vy = n * syy - sy * sy
      val corr =
        if (n < 2 || vx <= 0 || vy <= 0) None
        else Some(math.rint(cov / math.sqrt(vx) / math.sqrt(vy) * 1e6) / 1e6)
      (a, b, n.toLong, corr)
    }
    val spark = df.sparkSession
    import spark.implicits._
    rows.toDF("col_a", "col_b", "n", "corr")
  }
}
