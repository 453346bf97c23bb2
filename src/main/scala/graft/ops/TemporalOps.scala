package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal joins the reference expresses imperatively over event streams
  * (reference docetl pipelines join per-entity timelines row-by-row in
  * Python; SURVEY.md §2.4 covers the relational joins) — re-expressed as
  * the two standard distributed shapes:
  *
  *   - [[asofJoin]]: for every left row, the LATEST right row at-or-before
  *     its timestamp with the same key (optionally within a tolerance).
  *     The naive formulation is an inequality join (quadratic per key); the
  *     scale shape is union → repartition by key → one sorted pass per
  *     partition carrying O(1) state — the merge-join an ASOF JOIN compiles
  *     to in columnar engines, expressed on Spark's shuffle machinery.
  *
  *   - [[windowJoin]]: all (left, right) pairs with the same key whose
  *     timestamps lie within ±window of each other. The naive |L|×|R|
  *     band predicate becomes an equi-join by BANDING: the right side
  *     explodes to its bucket and both neighbors (3× one side, never
  *     pairs), the join key is (key, bucket), and the exact band predicate
  *     filters the bucket-collocated candidates. Every qualifying pair is
  *     produced exactly once (left keeps its single bucket; a pair within
  *     ±w spans at most adjacent buckets, so exactly one exploded copy of
  *     the right row lands in the left row's bucket).
  *
  * Both are deterministic under ties: asof resolves equal timestamps by the
  * larger payload struct (documented below), windowJoin is a set join with
  * no order sensitivity.
  */
object TemporalOps {

  /** Timestamp column as a BIGINT the integer gap/window/tolerance
    * arithmetic can run on: numeric columns cast straight through (the
    * caller owns the unit), TIMESTAMP/TIMESTAMP_NTZ columns convert to
    * epoch MICROseconds (NTZ via the session time zone — pin it to UTC for
    * determinism, as every graft entry point does). Without this, a parquet
    * TIMESTAMP(MICROS) column fails analysis on `cast(ts as bigint)`. */
  private def tsLong(df: DataFrame, c: String): org.apache.spark.sql.Column =
    df.schema(c).dataType match {
      case TimestampType    => unix_micros(col(c))
      case TimestampNTZType => unix_micros(col(c).cast(TimestampType))
      case _                => col(c).cast("long")
    }

  /** Backward as-of join.
    *
    * For each left row, append the payload of the latest right row with
    * `right(rightTs) <= left(leftTs)` and equal key; null payload when no
    * right row qualifies (left rows are always kept — LEFT OUTER shape).
    * `tolerance` (same unit as the timestamp columns — the benchmark tables
    * carry int64 nanoseconds) additionally requires
    * `left.ts - right.ts <= tolerance`.
    *
    * Tie semantics, fully deterministic: among right rows sharing the
    * maximal qualifying timestamp, the one with the LARGEST payload struct
    * (field-wise comparison in `rightPayload` order) wins — the sorted pass
    * overwrites in (ts, payload) order, so the last writer is the max.
    *
    * Scale shape: both sides project to (key, ts, tag, payload) and union —
    * a shuffle-free concatenation; ONE hash repartition by key co-locates
    * each key's timeline; a per-partition sort by (key, ts, tag, payload)
    * and a single forward pass with two variables of carried state (current
    * key + last right payload) produce every match. Per-key state never
    * materializes more than one right row, so a 100 TB timeline streams
    * through constant memory; skewed keys cost sort time, not memory. Right
    * rows sort BEFORE left rows at equal timestamps (tag 0 < 1), which is
    * what makes the join inclusive (`<=`).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      tolerance: Option[Long] = None,
      suffix: String = "_asof"): DataFrame = {
    require(rightPayload.nonEmpty, "asofJoin: rightPayload must name at least one column")
    val keyType = left.schema(leftKey).dataType
    require(right.schema(rightKey).dataType == keyType,
      s"asofJoin: key types differ (${keyType.simpleString} vs " +
        right.schema(rightKey).dataType.simpleString)

    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val rStruct = struct(rightPayload.map(col).toIndexedSeq: _*)
    val lStructType = StructType(left.schema.fields.toIndexedSeq)
    val rStructType = StructType(rightPayload.map(p => right.schema(p)))

    val lTagged = left.select(
      col(leftKey).as("_graft_k"),
      tsLong(left, leftTs).as("_graft_t"),
      lit(1).as("_graft_tag"),
      lStruct.as("_graft_l"),
      lit(null).cast(rStructType).as("_graft_r"))
    val rTagged = right.select(
      col(rightKey).as("_graft_k"),
      tsLong(right, rightTs).as("_graft_t"),
      lit(0).as("_graft_tag"),
      lit(null).cast(lStructType).as("_graft_l"),
      rStruct.as("_graft_r"))

    // Null timestamps can never satisfy an as-of comparison (SQL
    // three-valued semantics): a null RIGHT row must not become carried
    // state, and a null LEFT row gets the no-match payload. Filtering
    // right-side nulls here also keeps the per-partition pass free of
    // getLong-on-null crashes; null-ts LEFT rows re-enter with the
    // no-match payload below.
    val nullLeft = lTagged.filter(col("_graft_t").isNull)
    val timeline = lTagged.filter(col("_graft_t").isNotNull)
      .unionByName(rTagged.filter(col("_graft_t").isNotNull))
      .repartition(col("_graft_k"))
      .sortWithinPartitions(
        col("_graft_k"), col("_graft_t"), col("_graft_tag"), col("_graft_r"))

    // Output: every left column, then each payload column (suffixed on
    // collision with a left name) — the join must never shadow left data.
    val lNames = left.columns
    val outPayloadNames = rightPayload.map(p =>
      if (lNames.contains(p)) s"$p$suffix" else p)
    val outSchema = StructType(
      left.schema.fields.toIndexedSeq ++
        outPayloadNames.zip(rStructType.fields).map { case (n, f) =>
          StructField(n, f.dataType, nullable = true)
        })
    val nPayload = rightPayload.length
    val tol = tolerance

    val matched = timeline.mapPartitions { it =>
      var curKey: Any = null
      var haveKey = false
      var lastR: Row = null
      var lastT = 0L
      it.flatMap { row =>
        val k = row.get(0)
        if (!haveKey || k != curKey) { curKey = k; haveKey = true; lastR = null }
        if (row.getInt(2) == 0) { // right row: advance carried state
          lastR = row.getStruct(4)
          lastT = row.getLong(1)
          Iterator.empty
        } else {
          val l = row.getStruct(3)
          val inTol = lastR != null && tol.forall(row.getLong(1) - lastT <= _)
          val payload =
            if (inTol) lastR.toSeq
            else Seq.fill[Any](nPayload)(null)
          Iterator(Row.fromSeq(l.toSeq ++ payload))
        }
      }
    }(Encoders.row(outSchema))
    val nullLeftOut = nullLeft.mapPartitions(
      _.map(row => Row.fromSeq(
        row.getStruct(3).toSeq ++ Seq.fill[Any](nPayload)(null))))(
      Encoders.row(outSchema))
    matched.unionByName(nullLeftOut)
  }

  /** Gap-based batch sessionization: a new session starts whenever the
    * time since the key's previous event exceeds `gap` (same unit as the
    * timestamp column). Appends `outCol` = the 1-based per-key session
    * ordinal. The streaming analog (with bounded keyed state and TTL
    * eviction) is [[graft.streaming.Streams.sessionize]]; this is the
    * batch shape: two windows PARTITIONED BY the key — lag to detect gaps,
    * running sum to number sessions — so work distributes across keys and
    * no global ordering ever exists. Event ties at the same timestamp are
    * ordered by `tieBreak` for a deterministic lag.
    */
  def sessionize(
      df: DataFrame,
      key: String,
      ts: String,
      gap: Long,
      tieBreak: String,
      outCol: String = "session_id"): DataFrame = {
    require(gap > 0, s"sessionize: gap must be positive, got $gap")
    require(!df.columns.contains(outCol), s"input already has $outCol")
    import org.apache.spark.sql.expressions.Window
    val t = tsLong(df, ts)
    val w = Window.partitionBy(col(key)).orderBy(t, col(tieBreak))
    val delta = t - lag(t, 1).over(w)
    df.withColumn("_graft_new",
        when(delta.isNull || delta > gap, 1L).otherwise(0L))
      .withColumn(outCol,
        sum(col("_graft_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_graft_new")
  }

  /** Per-session aggregate view: one row per (key, session) with start/end
    * timestamps, event count, and duration. Same two keyed windows as
    * [[sessionize]] plus one keyed aggregation — never a global sort. */
  def sessions(
      df: DataFrame,
      key: String,
      ts: String,
      gap: Long,
      tieBreak: String): DataFrame =
    sessionize(df, key, ts, gap, tieBreak)
      .groupBy(col(key), col("session_id"))
      .agg(
        min(tsLong(df, ts)).as("session_start"),
        max(tsLong(df, ts)).as("session_end"),
        count(lit(1)).as("n_events"))
      .withColumn("duration", col("session_end") - col("session_start"))

  /** Banded time-window join: all (left, right) pairs with equal key and
    * `|left.ts - right.ts| <= window`. Output = left columns + payload
    * columns (suffixed on collision).
    *
    * Scale shape: the RIGHT side explodes to buckets {b-1, b, b+1} of width
    * `window` (3× right, linear — never pairs), the join is a pure
    * equi-join on (key, bucket) that Catalyst plans as a shuffled hash /
    * sort-merge join (no BroadcastNestedLoopJoin at any size), and the
    * exact band predicate prunes bucket neighbors that miss the window.
    * Bucket width = window keeps candidate inflation at most 3×; a skewed
    * (key, bucket) is a data hot spot the AQE skew-join split handles —
    * the band predicate itself never multiplies it.
    */
  def windowJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      window: Long,
      rightPayload: Seq[String],
      suffix: String = "_near"): DataFrame = {
    require(window > 0, s"windowJoin: window must be positive, got $window")
    require(rightPayload.nonEmpty, "windowJoin: rightPayload must name at least one column")
    // Exact floored bucket in INTEGER arithmetic: ns-epoch timestamps
    // (~1.7e18) exceed double's 53-bit exact range, so floor(t / w) through
    // double division can mis-bucket rows near a boundary — and a
    // mis-bucket on the band join is a silently DROPPED pair. pmod keeps
    // everything in long: (t - pmod(t, w)) is an exact multiple of w, so
    // truncating `div` on it IS floor division for any sign.
    def bucket(name: String) =
      expr(s"($name - pmod($name, ${window}L)) div ${window}L")
    val lNames = left.columns
    val l = left
      .withColumn("_graft_lt", tsLong(left, leftTs))
      .withColumn("_graft_b", bucket("_graft_lt"))
    val rPayloadCols = rightPayload.map { p =>
      val out = if (lNames.contains(p)) s"$p$suffix" else p
      col(p).as(out)
    }
    val r = right
      .select((col(rightKey).as("_graft_rk") +:
        tsLong(right, rightTs).as("_graft_rt") +: rPayloadCols): _*)
      .withColumn("_graft_rb", bucket("_graft_rt"))
      .withColumn("_graft_rbk",
        explode(array(col("_graft_rb") - 1, col("_graft_rb"), col("_graft_rb") + 1)))
      .drop("_graft_rb")
    l.join(r,
      col(leftKey) === col("_graft_rk") &&
        col("_graft_b") === col("_graft_rbk") &&
        abs(col("_graft_lt") - col("_graft_rt")) <= window)
      .drop("_graft_b", "_graft_rbk", "_graft_lt", "_graft_rk", "_graft_rt")
  }

  /** Data-freshness report — the age-distribution band a continuous-
    * ingestion datacard quotes ("how stale is this snapshot?"): per
    * optional group, the count, rows timestamped AFTER `asOfMicros`
    * (clock skew / timezone bugs surface here), and min/mean/quantile/
    * max age in microseconds relative to `asOfMicros`. `asOfMicros` is
    * an explicit parameter (never wall-clock) so replays are
    * deterministic. Ages of future rows are negative — they pull the
    * min, and are INCLUDED in the quantiles (dropping them would hide
    * exactly the skew this report exists to expose).
    *
    * Quantiles use the same EXACT `percentile` aggregate as
    * [[CorpusStats]] (linear interpolation — identical to DuckDB
    * quantile_cont). ONE keyed aggregation, no driver state. */
  def freshness(df: DataFrame, tsCol: String, asOfMicros: Long,
      groupCols: Seq[String] = Nil,
      quantiles: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall(q => q > 0 && q < 1),
      s"quantiles must lie in (0, 1), got ${quantiles.mkString(",")}")
    val age = s"(${asOfMicros}L - cast($tsCol as bigint))"
    val qCols = quantiles.map { q =>
      round(expr(s"percentile(cast($age as double), $q)"), 4)
        .as("age_" + CorpusStats.label(q))
    }
    val aggs = Seq(
      count(lit(1)).as("n"),
      expr(s"cast(sum(case when $age < 0 then 1 else 0 end) as bigint)")
        .as("n_future"),
      // unstamped rows are surfaced, not silently folded into the mean
      expr(s"cast(count(1) - count($age) as bigint)").as("n_null_ts"),
      expr(s"min($age)").as("age_min"),
      // mean from the EXACT integer sum, one final division — ages run
      // to ~1e12 µs, where a distributed double avg()'s partition-order
      // drift is the same magnitude as the 4th decimal. Denominator is
      // count(age), NOT count(1): null timestamps leave the sum, so a
      // row-count denominator would bias the mean low and disagree
      // with min/max/quantiles (which also skip nulls).
      expr(s"round(sum($age) / cast(count($age) as double), 4)")
        .as("age_mean"),
      expr(s"max($age)").as("age_max")) ++ qCols
    if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
