package graft.core

/** Shared numeric conventions for oracle-gated outputs. */
object Num {

  /** Round to 6 decimals with HALF-EVEN ties (`math.rint`) — the ONE
    * rounding convention every driver-side statistic uses so Spark
    * outputs stay bit-compatible with the DuckDB oracles (and with the
    * in-plan `bround`, which is also half-even). Fix rounding here,
    * not in per-op copies. */
  def rnd6(x: Double): Double = math.rint(x * 1e6) / 1e6
}
