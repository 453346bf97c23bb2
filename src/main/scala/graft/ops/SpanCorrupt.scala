package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T5-style span-corruption prep — the denoising-objective transform
  * (Raffel et al. 2020 §3.1.4): replace spans of the input with numbered
  * sentinel tokens and emit the dropped content as the target sequence
  * (`inputs`: "the <extra_id_0> sat <extra_id_1>", `targets`:
  * "<extra_id_0> cat <extra_id_1> on the mat"). Together with [[Fim]]
  * (infilling) this completes the pretraining-transform family; the
  * reference has no pretraining story — §2.14 engine extension.
  *
  * Span selection is BLOCK-based (a documented approximation of T5's
  * sampled span lengths): words group into fixed `spanLen` blocks and
  * each block corrupts independently with probability `rate` via the
  * engine's seeded md5 arithmetic on (id, seed, block). Deterministic
  * across partitionings and engines — no RNG state, every decision
  * replayable in the DuckDB oracle. Adjacent corrupted blocks keep their
  * own sentinels (T5 merges; with block sampling the distinction is the
  * sentinel count, not the corrupted content).
  *
  * Scale shape: ONE fold over the word array with a
  * struct(inp: array, tgt: array, i, k) accumulator — per-word O(1)
  * pointer work (interpreted HOF rebuilds carry references), block
  * membership is integer division, the corruption decision is one md5
  * per word. No UDF, no shuffle, O(|text|) per row.
  */
object SpanCorrupt {

  private def blockCorrupted(id: Column, seed: Long, block: Column,
      rate: Double): Column =
    conv(substring(md5(concat(id.cast("string"), lit(s":$seed:"),
      block.cast("string"))), 1, 13), 16, 10).cast("bigint") %
      1000000L < lit(math.round(rate * 1e6))

  /** Append `inputsOut` / `targetsOut` / `n_corrupted_spans`. */
  def apply(df: DataFrame, idCol: String, textCol: String,
      rate: Double = 0.15, spanLen: Int = 3, seed: Long = 0L,
      inputsOut: String = "inputs", targetsOut: String = "targets"): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    require(spanLen >= 1, s"spanLen must be >= 1, got $spanLen")
    val id = col(idCol)
    val words = filter(split(coalesce(col(textCol), lit("")), " "),
      w => length(w) > 0)
    val emptyArr = array().cast("array<string>")
    val zero = struct(emptyArr.as("inp"), emptyArr.as("tgt"),
      lit(0).as("i"), lit(0).as("k"))
    val folded = aggregate(words, zero, (acc, w) => {
      val i = acc.getField("i")
      val k = acc.getField("k")
      val inp = acc.getField("inp")
      val tgt = acc.getField("tgt")
      // Column./ is DOUBLE division — truncate back to the int block id
      // or the hash input becomes "0.3333...".
      val corrupted = blockCorrupted(id, seed, (i / spanLen).cast("int"),
        rate)
      val blockStart = i % spanLen === 0
      val sentinel = concat(lit("<extra_id_"), k.cast("string"), lit(">"))
      when(!corrupted,
        struct(concat(inp, array(w)).as("inp"), tgt.as("tgt"),
          (i + 1).as("i"), k.as("k")))
        .when(blockStart, // corrupted block opens: sentinel to both sides
          struct(concat(inp, array(sentinel)).as("inp"),
            concat(tgt, array(sentinel, w)).as("tgt"),
            (i + 1).as("i"), (k + 1).as("k")))
        .otherwise( // corrupted continuation: word goes to targets only
          struct(inp.as("inp"), concat(tgt, array(w)).as("tgt"),
            (i + 1).as("i"), k.as("k")))
    })
    // One fold, three consumers: stage the struct in its own column so
    // the plan evaluates it once (CollapseProject keeps a multiply-
    // referenced non-cheap expression staged rather than inlining it).
    df.withColumn("_graft_sc", folded)
      .withColumn(inputsOut, array_join(col("_graft_sc.inp"), " "))
      .withColumn(targetsOut, array_join(col("_graft_sc.tgt"), " "))
      .withColumn("n_corrupted_spans", col("_graft_sc.k").cast("bigint"))
      .drop("_graft_sc")
  }
}
