package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches — per-slice Apache DataSketches
  * HLL state as a PORTABLE binary column (Spark's native
  * `hll_sketch_agg` family, standard HllSketch wire format): build a
  * sketch per (dump, slice) ONCE at ingest, then answer "distinct
  * tokens/urls/ids across ANY union of dumps" by merging sketch bytes —
  * never re-scanning 100 TB of history. The explicit-artifact sibling
  * of the `approx` HLL++ knobs the reporting ops already use
  * internally ([[Datacard]], [[Profile]]): those estimate inside one
  * query; this EXPORTS state that composes across ingests, the same
  * accumulated-state discipline as [[graft.dedup.Dedup]]'s
  * signatureTable and [[graft.dedup.Bloom]]'s filter table.
  *
  * Scale shape: building is one keyed aggregation with map-side partial
  * sketches (the agg is associative by construction); a sketch is
  * ≤ ~2^lgK registers regardless of cardinality; merging unions
  * fixed-size states. Estimates are driver-free expressions.
  */
object DistinctSketch {

  /** One sketch row per `sliceCol` value: (slice, sketch: binary,
    * estimate: bigint, n_rows). `lgK` trades size for accuracy
    * (default 12 ≈ 1.6% rel. stderr, 4 KB per sketch). */
  def build(df: DataFrame, sliceCol: String, valueExpr: String,
      lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4, 21], got $lgK")
    df.groupBy(col(sliceCol).as("slice"))
      .agg(hll_sketch_agg(expr(valueExpr), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))
      .withColumn("estimate",
        hll_sketch_estimate(col("sketch")).cast("bigint"))
      .select("slice", "sketch", "estimate", "n_rows")
  }

  /** Merge per-slice sketch tables from several ingests (same schema as
    * [[build]] output): one row per slice with the UNIONED sketch and
    * its estimate — distinct-across-dumps without rescanning any dump. */
  def merge(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("slice"))
      .agg(hll_union_agg(col("sketch"), lit(true)).as("sketch"),
        sum(col("n_rows")).as("n_rows"))
      .withColumn("estimate",
        hll_sketch_estimate(col("sketch")).cast("bigint"))
      .select("slice", "sketch", "estimate", "n_rows")
}
