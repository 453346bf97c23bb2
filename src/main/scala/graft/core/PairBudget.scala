package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew diagnostics for intra-bucket pair explosions.
  *
  * Blocked all-pairs stages (resolve candidate generation, LLM-verified
  * equijoins) are quadratic in their hottest bucket: one degenerate blocking
  * key turns a linear stage into n²/2 pairs SILENTLY — the job doesn't fail,
  * it just burns 100× the LLM budget and wall-clock (reference analog: the
  * 500-pair batch solver in resolve.py:592-613 surfaces the same hazard as
  * batch count). These helpers surface the hazard from O(rows) aggregations
  * over the BUCKETED side — never by materializing the pairs themselves.
  */
object PairBudget {

  final case class BucketStats(
      bucket: String, rows: Long, pairs: Long, totalPairs: Long)

  /** Pair-count warning threshold: ~the LLM-call budget a user plausibly
    * accepts for one blocking bucket before it's a config bug. */
  val DefaultWarnPairs: Long = 1000000L

  /** Last emitted warning, for tests (warnings also go to stderr — the
    * engine has no logger dependency by design). */
  @volatile var lastWarning: Option[String] = None

  /** Bounded queue of recent warnings so runners can surface them in their
    * execution summary (RunPipeline does) without scraping stderr. */
  private val recent = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val RecentMax = 32

  /** Drain and return the warnings accumulated since the last drain. */
  def drainWarnings(): Seq[String] = {
    val b = Seq.newBuilder[String]
    var w = recent.poll()
    while (w != null) { b += w; w = recent.poll() }
    b.result()
  }

  /** Hottest bucket of a self-join candidate stage, from one O(rows) agg:
    * per-bucket row counts n → pairs n(n-1)/2, max + sum. Returns None on an
    * empty input. */
  def selfJoinStats(df: DataFrame, bucketCol: String): Option[BucketStats] = {
    val pairsCol = (col("n") * (col("n") - 1) / 2).cast("long").as("p")
    val top = df.groupBy(col(bucketCol).cast("string").as("b"))
      .agg(count(lit(1)).as("n"))
      .select(col("b"), col("n"), pairsCol)
      .agg(
        max_by(struct(col("p"), col("n"), col("b")), col("p")).as("top"),
        sum(col("p")).as("total"))
      .collect()
    top.headOption.filterNot(_.isNullAt(0)).map { r =>
      val t = r.getStruct(0)
      BucketStats(t.getString(2), t.getLong(1), t.getLong(0), r.getLong(1))
    }
  }

  /** Hottest key of a two-sided equi join, from one O(rows) agg per side
    * plus a join of the (distinct-key-sized) count tables: per-key pairs =
    * leftCount × rightCount. */
  def equiJoinStats(
      left: DataFrame, leftKeys: Seq[String],
      right: DataFrame, rightKeys: Seq[String]): Option[BucketStats] = {
    def keyCounts(df: DataFrame, keys: Seq[String], cnt: String) = {
      val named = keys.zipWithIndex.map { case (k, i) => col(k).cast("string").as(s"_k$i") }
      df.select(named: _*)
        .groupBy(keys.indices.map(i => col(s"_k$i")): _*)
        .agg(count(lit(1)).as(cnt))
        .select(concat_ws("|", keys.indices.map(i => col(s"_k$i")): _*).as("b"), col(cnt))
    }
    val lc = keyCounts(left, leftKeys, "_nl")
    val rc = keyCounts(right, rightKeys, "_nr")
    val top = lc.join(rc, Seq("b"))
      .select(col("b"), (col("_nl") + col("_nr")).as("n"),
        (col("_nl") * col("_nr")).cast("long").as("p"))
      .agg(
        max_by(struct(col("p"), col("n"), col("b")), col("p")).as("top"),
        sum(col("p")).as("total"))
      .collect()
    top.headOption.filterNot(_.isNullAt(0)).map { r =>
      val t = r.getStruct(0)
      BucketStats(t.getString(2), t.getLong(1), t.getLong(0), r.getLong(1))
    }
  }

  /** Emit a message through the engine's notice channel (stderr +
    * `lastWarning` + the bounded queue RunPipeline drains into its summary).
    * Used for skew warnings and for no-silent-caps events like an operator
    * switching to its indexed large-corpus path. */
  def notice(msg: String): Unit = {
    lastWarning = Some(msg)
    recent.add(msg)
    while (recent.size() > RecentMax) recent.poll()
    System.err.println(msg)
  }

  /** Warn (stderr + `lastWarning`) when the hottest bucket exceeds
    * `warnPairs`; pass through the stats either way. */
  def warnIfSkewed(
      stats: Option[BucketStats], context: String,
      warnPairs: Long = DefaultWarnPairs): Option[BucketStats] = {
    stats.filter(_.pairs > warnPairs).foreach { s =>
      notice(s"[graft] $context: hottest blocking bucket " +
        s"'${s.bucket.take(80)}' yields ${s.pairs} candidate pairs from " +
        s"${s.rows} rows (${s.totalPairs} pairs total); consider a finer " +
        "blocking key, limit_comparisons, or max_pairs_per_bucket")
    }
    stats
  }
}
