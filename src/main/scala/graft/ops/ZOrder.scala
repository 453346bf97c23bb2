package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimension file skipping —
  * the standard lakehouse technique (publicly described for Delta Lake's
  * `OPTIMIZE ZORDER BY` and Iceberg's sort-order rewrite; the reference has
  * no layout story at all — §2.14 engine extension).
  *
  * Why it matters at 100 TB: min/max footer stats prune parquet files only
  * for the leading sort column. Interleaving the bits of several columns
  * into one sort key keeps files "cubic" in all dimensions, so predicates on
  * ANY of the z-ordered columns skip most files.
  *
  * Scale shape: one O(#cols) min/max aggregate (driver state = 2×#cols
  * scalars), then a pure codegen'd per-row expression — the bit interleave
  * unrolls to `bits × #cols` shift/or terms inside WholeStageCodegen, no
  * UDF, no shuffle. [[layout]] adds the single range-partitioning shuffle
  * any global sort needs.
  *
  * Buckets are equi-WIDTH over the observed [min, max] (closed-form integer
  * arithmetic, deterministic, oracle-replayable). Equi-depth would need a
  * quantile sketch whose boundaries are estimation-dependent — wrong trade
  * for a correctness-gated layout key; heavily skewed columns should be
  * pre-transformed (e.g. log) by the caller.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each column: bit `i` of column `j`
    * lands at position `i * n + j`. Inputs must already be in
    * `[0, 2^bits)` — see [[zvalue]] for the scaling wrapper. */
  def interleave(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, "zorder needs at least one column")
    require(n * bits <= 62, s"zorder: $n cols x $bits bits exceeds 62")
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("bigint"), i).bitwiseAND(lit(1L)),
      i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Append the z-value of `cols` (numeric), equi-width bucketed to `bits`
    * bits per column over each column's observed min/max. */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int = 8,
      outCol: String = "zvalue"): DataFrame = {
    require(cols.nonEmpty, "zorder needs at least one column")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("bigint"), max(col(c)).cast("bigint")))
    val mm = df.agg(aggs.head, aggs.tail: _*).head() // 2 x #cols driver scalars
    val buckets = cols.zipWithIndex.map { case (c, j) =>
      val mn = mm.getLong(2 * j)
      val mx = mm.getLong(2 * j + 1)
      // Divisor-form equi-width bucket: width = range/2^bits + 1, bucket =
      // (v - mn) DIV width — exact BIGINT arithmetic in [0, 2^bits) with NO
      // multiplication, so wide-range columns cannot overflow (the
      // (v-mn)*2^bits form wraps past range ~2^55 — e.g. ns-epoch
      // timestamps more than ~400 days apart) and no double division can
      // round the max value into a dropped bit. Trade: when range+1 is not
      // a multiple of 2^bits the top buckets may sit empty — harmless for
      // a layout key. Both engines replay the identical integer formula.
      // The span itself is BigInt-checked: past 2^62 even (v - mn) wraps,
      // and a column spanning most of int64 has no locality worth
      // clustering — pre-scale it (e.g. DIV a coarse unit) instead.
      val span = BigInt(mx) - BigInt(mn)
      require(span <= (BigInt(1L) << 62),
        s"zorder: column '${cols(j)}' spans $span (> 2^62) — pre-scale it " +
          "to a coarser unit before z-ordering")
      val width = (span / (1L << bits) + 1).toLong
      call_function("div", col(c).cast("bigint") - lit(mn), lit(width))
    }
    df.withColumn(outCol, interleave(buckets, bits))
  }

  /** Full layout pass: z-value, range-partition into `numFiles` output
    * partitions, sort within each — writing this through any sink yields
    * files whose per-column min/max ranges are tight in every z-ordered
    * dimension. One shuffle (the range partitioner), as any global layout
    * requires; AQE-safe. */
  def layout(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = 8, outCol: String = "zvalue"): DataFrame =
    zvalue(df, cols, bits, outCol)
      .repartitionByRange(numFiles, col(outCol))
      .sortWithinPartitions(outCol)
}
