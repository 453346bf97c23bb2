package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fill-in-the-middle (FIM) transformation — the code-corpus augmentation
  * that teaches a causal LM to infill: with probability `rate` a document
  * is split at two random character offsets into (prefix, middle, suffix)
  * and re-serialized with sentinel tokens so the middle becomes the
  * training target. Publicly standard: Bavarian et al. 2022 ("Efficient
  * Training of Language Models to Fill in the Middle"), applied by
  * StarCoder / Code Llama pretraining; the routing signal
  * [[graft.ops.Readability.codeDetect]] produces (q169) is exactly what
  * selects the corpora this op feeds on. The reference has no
  * pretraining-transform story — §2.14 engine extension next to the
  * pack/chunk tensorization family.
  *
  * Two serializations (Bavarian et al. §3, Code Llama notation):
  *  - PSM: `<PRE>prefix<SUF>suffix<MID>middle`
  *  - SPM (joined): `<PRE><SUF>suffix<MID>prefix middle` — prefix and
  *    middle stay adjacent, which trains the cache-friendly inference
  *    layout; chosen per-row with probability `spmRate` among transformed
  *    rows.
  *
  * All randomness is SEEDED md5 arithmetic on (id, seed, tag) — the
  * engine's portable hash — so the transform is deterministic,
  * reproducible across partitionings, and the character-offset splits
  * replay exactly in the DuckDB oracle as `substr` arithmetic. Pure
  * per-row codegen expressions: no UDF, no shuffle, no driver state.
  */
object Fim {

  /** Sentinel tokens; defaults are the Bavarian et al. spelling. */
  final case class Sentinels(
      prefix: String = "<fim_prefix>",
      suffix: String = "<fim_suffix>",
      middle: String = "<fim_middle>")

  /** 52-bit seeded hash on (id, seed, tag) — md5 prefix, oracle-portable. */
  private def h(id: Column, seed: Long, tag: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(s":$seed:$tag"))),
      1, 13), 16, 10).cast("bigint")

  /** Append `outCol` (the FIM-serialized text; untransformed rows pass
    * through verbatim) plus `fim_applied`, `fim_mode` ("psm" / "spm" /
    * null), and the split offsets `fim_lo` / `fim_hi` ([lo, hi) is the
    * middle, in characters). */
  def apply(df: DataFrame, idCol: String, textCol: String,
      rate: Double = 0.5, spmRate: Double = 0.5, seed: Long = 0L,
      sentinels: Sentinels = Sentinels(),
      outCol: String = "fim_text"): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    require(spmRate >= 0 && spmRate <= 1,
      s"spmRate must be in [0,1], got $spmRate")
    val id = col(idCol)
    // null text coalesces to '' (the sibling-op convention): a selected
    // row must never report fim_applied=true with a null payload.
    val text = coalesce(col(textCol), lit(""))
    val len = length(text)
    val applied = h(id, seed, "apply") % 1000000L <
      lit(math.round(rate * 1e6))
    val spm = h(id, seed, "mode") % 1000000L <
      lit(math.round(spmRate * 1e6))
    val cut1 = h(id, seed, "cut1") % (len + 1)
    val cut2 = h(id, seed, "cut2") % (len + 1)
    val lo = least(cut1, cut2)
    val hi = greatest(cut1, cut2)
    val pre = text.substr(lit(1), lo)
    val mid = text.substr(lo + 1, hi - lo)
    val suf = text.substr(hi + 1, len - hi)
    val psmText = concat(lit(sentinels.prefix), pre,
      lit(sentinels.suffix), suf, lit(sentinels.middle), mid)
    val spmText = concat(lit(sentinels.prefix), lit(sentinels.suffix), suf,
      lit(sentinels.middle), pre, mid)
    df.withColumn(outCol, when(applied, when(spm, spmText).otherwise(psmText))
        .otherwise(text))
      .withColumn("fim_applied", applied)
      .withColumn("fim_mode", when(!applied, lit(null).cast("string"))
        .when(spm, lit("spm")).otherwise(lit("psm")))
      .withColumn("fim_lo",
        when(applied, lo).otherwise(lit(null)).cast("bigint"))
      .withColumn("fim_hi",
        when(applied, hi).otherwise(lit(null)).cast("bigint"))
  }
}
