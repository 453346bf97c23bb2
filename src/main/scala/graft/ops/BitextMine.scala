package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Margin-based bitext mining (Artetxe & Schwenk 2019; the
  * LASER / CCMatrix / NLLB parallel-corpus recipe): candidate sentence
  * pairs across two embedding spaces score by the RATIO MARGIN
  *
  *   margin(x, y) = cos(x, y) / ((avgK(x→tgt) + avgK(y→src)) / 2)
  *
  * where avgK are the mean cosines of each side's k nearest neighbors
  * in the OTHER corpus — a pair only mines well if it stands out from
  * both neighborhoods, which kills the hubness false positives a raw
  * cosine threshold admits. The reference has no cross-corpus mining
  * story — §2.14 engine extension, pairing with [[HardNegatives]] on
  * the training-pair prep shelf.
  *
  * Determinism: neighbor scores are the round-6 cosines
  * [[graft.ann.Ann.bruteForce]] emits; the k-NN means accumulate as
  * EXACT integer micro-units (round-6 score × 10⁶ is an integer), so
  * the margin is one double division of exact integers per pair — no
  * distributed float-sum ordering anywhere (the q149 lesson).
  *
  * Scale shape: [[margin]] uses brute-force k-NN (the correctness
  * baseline — query side broadcasts, corpus streams); at the 100 TB
  * end feed [[marginFromKnn]] from [[graft.ann.Ann.ivfSearch]] (or any
  * (query, neighbor, score) provider) — the margin arithmetic is
  * identical and stays keyed-join + keyed-agg shaped: candidates are
  * the union of both k-NN lists (≤ 2k per row, never |src|×|tgt|). */
object BitextMine {

  /** Both directions' brute-force k-NN, shaped (src_id, tgt_id, score). */
  private def bruteKnn(src: DataFrame, srcId: String, srcEmb: String,
      tgt: DataFrame, tgtId: String, tgtEmb: String,
      k: Int): (DataFrame, DataFrame) = {
    val fwd = graft.ann.Ann.bruteForce(tgt, tgtId, tgtEmb,
      src, srcId, srcEmb, k, excludeSelf = false)
      .select(col("query_id").as("src_id"),
        col("neighbor_id").as("tgt_id"), col("score"))
    val bwd = graft.ann.Ann.bruteForce(src, srcId, srcEmb,
      tgt, tgtId, tgtEmb, k, excludeSelf = false)
      .select(col("neighbor_id").as("src_id"),
        col("query_id").as("tgt_id"), col("score"))
    (fwd, bwd)
  }

  /** Mine candidates with exact brute-force k-NN on both sides. */
  def margin(src: DataFrame, srcId: String, srcEmb: String,
      tgt: DataFrame, tgtId: String, tgtEmb: String,
      k: Int = 4, threshold: Double = 1.0,
      mutualBest: Boolean = false): DataFrame = {
    require(k >= 1 && k <= 128, s"k must be in [1, 128], got $k")
    val (fwd, bwd) = bruteKnn(src, srcId, srcEmb, tgt, tgtId, tgtEmb, k)
    marginFromKnn(fwd, bwd, threshold, mutualBest)
  }

  /** [[marginFromKnnAudit]] over the brute-force k-NN — always reports
    * zero drops when both sides are non-empty (every row has k
    * neighbors), so it doubles as the exactness baseline an IVF audit
    * compares against. */
  def marginAudit(src: DataFrame, srcId: String, srcEmb: String,
      tgt: DataFrame, tgtId: String, tgtEmb: String,
      k: Int = 4): DataFrame = {
    require(k >= 1 && k <= 128, s"k must be in [1, 128], got $k")
    val (fwd, bwd) = bruteKnn(src, srcId, srcEmb, tgt, tgtId, tgtEmb, k)
    marginFromKnnAudit(fwd, bwd)
  }

  /** The IVF-fed scale arm: both directions' k-NN come from
    * [[graft.ann.Ann.ivfSearch]] over per-side coarse quantizers
    * (each side's centroids train on ITS corpus, since each serves as
    * the search target of the other direction), then the identical
    * [[marginFromKnn]] arithmetic. With `nProbe = nCells` every cell
    * is probed, so the result is bit-identical to [[margin]] (the
    * spec-pinned property); at `nProbe < nCells` the k-NN lists are
    * approximate and recall tunes via the two knobs. Scan cost per
    * direction drops by ~nCells/nProbe vs the brute baseline — the
    * arm a 100 TB mining run should configure. Because BOTH sides of a
    * bitext job are corpus-sized, neither direction broadcasts its
    * query side: each probe join is a plain cell-keyed shuffle (size
    * nCells to the corpora — cells are the join's parallelism units).
    * An empty side returns an empty frame, matching [[margin]]. */
  def marginIvf(src: DataFrame, srcId: String, srcEmb: String,
      tgt: DataFrame, tgtId: String, tgtEmb: String,
      k: Int = 4, threshold: Double = 1.0, mutualBest: Boolean = false,
      nCells: Int = 256, nProbe: Int = 8, seed: Long = 42): DataFrame = {
    require(k >= 1 && k <= 128, s"k must be in [1, 128], got $k")
    require(nProbe >= 1 && nProbe <= nCells, "nProbe in [1, nCells]")
    // Per-side training-sample collects double as the emptiness probes
    // (an empty side ⟺ an empty seeded sample) — the old separate
    // src.isEmpty/tgt.isEmpty actions were two extra scan jobs per run.
    ivfKnnOpt(src, srcId, srcEmb, tgt, tgtId, tgtEmb,
        k, nCells, nProbe, seed) match {
      case Some((fwd, bwd)) => marginFromKnn(fwd, bwd, threshold, mutualBest)
      case None =>
        val spark = src.sparkSession
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("src_id",
            src.schema(src.schema.fieldIndex(srcId)).dataType),
          org.apache.spark.sql.types.StructField("tgt_id",
            tgt.schema(tgt.schema.fieldIndex(tgtId)).dataType),
          org.apache.spark.sql.types.StructField("score",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("margin",
            org.apache.spark.sql.types.DoubleType)))
        spark.createDataFrame(spark.sparkContext
          .emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }

  /** Both directions' IVF k-NN (per-side coarse quantizers, plain
    * cell-keyed shuffle joins — neither corpus-sized side broadcasts),
    * or None when either side is empty (detected from the training
    * samples themselves — no separate isEmpty scan jobs). */
  private def ivfKnnOpt(src: DataFrame, srcId: String, srcEmb: String,
      tgt: DataFrame, tgtId: String, tgtEmb: String, k: Int,
      nCells: Int, nProbe: Int,
      seed: Long): Option[(DataFrame, DataFrame)] = {
    val ann = graft.ann.Ann
    // ONE union job trains BOTH sides' quantizers (guide §1.2/§2.4):
    // two per-side sample collects were two full-corpus scan jobs per
    // mining run. Per-side samples — and therefore centroids — are
    // bit-identical to the two-job form (Round19Spec pins it), and an
    // empty side is known from the same collect (no extra probe).
    val (srcCentOpt, tgtCentOpt) = ann.trainCentroidsDualOpt(
      src, srcEmb, tgt, tgtEmb, nCells, seed = seed)
    if (tgtCentOpt.isEmpty || srcCentOpt.isEmpty) return None
    val (tgtCent, srcCent) = (tgtCentOpt.get, srcCentOpt.get)
    val fwd = ann.ivfSearch(ann.ivfAssign(tgt, tgtEmb, tgtCent),
      tgtId, tgtEmb, src, srcId, srcEmb, tgtCent, k, nProbe,
      excludeSelf = false, broadcastQueries = false)
      .select(col("query_id").as("src_id"),
        col("neighbor_id").as("tgt_id"), col("score"))
    val bwd = ann.ivfSearch(ann.ivfAssign(src, srcEmb, srcCent),
      srcId, srcEmb, tgt, tgtId, tgtEmb, srcCent, k, nProbe,
      excludeSelf = false, broadcastQueries = false)
      .select(col("neighbor_id").as("src_id"),
        col("query_id").as("tgt_id"), col("score"))
    Some((fwd, bwd))
  }

  /** [[marginFromKnnAudit]] over the IVF k-NN — the observability arm
    * for approximate mining runs: at nProbe < nCells on skewed corpora
    * some rows' probes can return NO neighbors, and every candidate
    * touching such a row is dropped (its margin is incomputable).
    * Without this count the recall leak is invisible; with it a mining
    * job can gate on n_dropped / n_candidates before shipping pairs.
    * Empty sides report an all-zero row (no centroids to train). */
  def marginIvfAudit(src: DataFrame, srcId: String, srcEmb: String,
      tgt: DataFrame, tgtId: String, tgtEmb: String,
      k: Int = 4, nCells: Int = 256, nProbe: Int = 8,
      seed: Long = 42): DataFrame = {
    require(k >= 1 && k <= 128, s"k must be in [1, 128], got $k")
    require(nProbe >= 1 && nProbe <= nCells, "nProbe in [1, nCells]")
    ivfKnnOpt(src, srcId, srcEmb, tgt, tgtId, tgtEmb,
        k, nCells, nProbe, seed) match {
      case Some((fwd, bwd)) => marginFromKnnAudit(fwd, bwd)
      case None => src.sparkSession.range(1).select(
        lit(0L).as("n_candidates"), lit(0L).as("n_scored"),
        lit(0L).as("n_dropped"), lit(0L).as("n_missing_src_avg"),
        lit(0L).as("n_missing_tgt_avg"))
    }
  }

  /** The margin arithmetic over precomputed k-NN lists — the seam an
    * IVF/LSH provider plugs into. `fwd` = each src row's neighbors in
    * tgt, `bwd` = each tgt row's neighbors in src; both shaped
    * (src_id, tgt_id, score) with round-6 cosine scores.
    *
    * Approximate-provider caveat: a candidate joins INNER against both
    * sides' k-NN averages, so a pair whose counterpart row has an
    * EMPTY k-NN list (possible under IVF/LSH when no probe returns a
    * neighbor) is dropped rather than surfaced — the margin is
    * incomputable without both neighborhood means. The brute-force
    * path can never hit this (every row has k neighbors whenever the
    * other corpus is non-empty). [[marginFromKnnAudit]] makes the drop
    * OBSERVABLE: one report row counting candidates the inner joins
    * lose — gate approximate mining runs on it. */
  def marginFromKnn(fwd: DataFrame, bwd: DataFrame,
      threshold: Double = 1.0, mutualBest: Boolean = false): DataFrame = {
    val (srcAvg, tgtAvg) = knnAverages(fwd, bwd)
    val scored = candidates(fwd, bwd)
      .join(srcAvg, "src_id")
      .join(tgtAvg, "tgt_id")
      .withColumn("margin", round(col("score") /
        ((col("_sm").cast("double") / col("_sn") +
          col("_tm").cast("double") / col("_tn")) / 2.0 / 1e6), 6))
      .filter(col("margin") >= threshold)
      .select("src_id", "tgt_id", "score", "margin")
    if (!mutualBest) scored
    else {
      // keep a pair only when it is BOTH sides' best margin — the
      // high-precision intersection arm of the published recipe
      val ws = org.apache.spark.sql.expressions.Window
        .partitionBy("src_id")
        .orderBy(col("margin").desc, col("tgt_id"))
      val wt = org.apache.spark.sql.expressions.Window
        .partitionBy("tgt_id")
        .orderBy(col("margin").desc, col("src_id"))
      scored
        .withColumn("_rs", row_number().over(ws))
        .withColumn("_rt", row_number().over(wt))
        .filter(col("_rs") === 1 && col("_rt") === 1)
        .drop("_rs", "_rt")
    }
  }

  /** The two k-NN mean tables [[marginFromKnn]] scores against —
    * integer micro-unit sums (round-6 score × 10⁶ is exact). */
  private def knnAverages(fwd: DataFrame,
      bwd: DataFrame): (DataFrame, DataFrame) = {
    val micro = (c: Column) => round(c * 1e6).cast("bigint")
    val srcAvg = fwd.groupBy("src_id")
      .agg(sum(micro(col("score"))).as("_sm"),
        count(lit(1)).as("_sn"))
    val tgtAvg = bwd.groupBy("tgt_id")
      .agg(sum(micro(col("score"))).as("_tm"),
        count(lit(1)).as("_tn"))
    (srcAvg, tgtAvg)
  }

  /** Distinct candidate pairs — the union of both k-NN lists. */
  private def candidates(fwd: DataFrame, bwd: DataFrame): DataFrame =
    fwd.unionByName(bwd).dropDuplicates("src_id", "tgt_id")

  /** One-row observability report for the inner-join drop
    * [[marginFromKnn]]'s scaladoc documents: a candidate whose
    * counterpart row has an EMPTY k-NN list under an approximate
    * provider is dropped (its margin is incomputable without both
    * neighborhood means). Left-joins the SAME candidates against the
    * SAME two average tables the mining arm uses and counts what the
    * inner joins would lose — the [[graft.dedup.DedupReport]]
    * precedent: the audit shares the op's own plan, so the counts
    * cannot drift from the mining result. Columns: n_candidates,
    * n_scored, n_dropped (= candidates minus scored),
    * n_missing_src_avg / n_missing_tgt_avg (a candidate missing both
    * counts in each, once in n_dropped). Brute-force k-NN can never
    * drop (every row has k neighbors when the other corpus is
    * non-empty); at nProbe ≪ nCells this is the recall-leak gauge. */
  def marginFromKnnAudit(fwd: DataFrame, bwd: DataFrame): DataFrame = {
    val (srcAvg, tgtAvg) = knnAverages(fwd, bwd)
    candidates(fwd, bwd)
      .join(srcAvg.select(col("src_id"), lit(1).as("_hs")),
        Seq("src_id"), "left")
      .join(tgtAvg.select(col("tgt_id"), lit(1).as("_ht")),
        Seq("tgt_id"), "left")
      .agg(
        count(lit(1)).as("n_candidates"),
        coalesce(sum(when(col("_hs").isNotNull && col("_ht").isNotNull,
          1L).otherwise(0L)), lit(0L)).as("n_scored"),
        coalesce(sum(when(col("_hs").isNull || col("_ht").isNull,
          1L).otherwise(0L)), lit(0L)).as("n_dropped"),
        coalesce(sum(when(col("_hs").isNull, 1L).otherwise(0L)),
          lit(0L)).as("n_missing_src_avg"),
        coalesce(sum(when(col("_ht").isNull, 1L).otherwise(0L)),
          lit(0L)).as("n_missing_tgt_avg"))
  }
}
