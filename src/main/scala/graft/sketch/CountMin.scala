package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) — fixed-memory
  * frequency estimation over an unbounded key space: `depth` hash rows ×
  * `width` counters summarize every key's count with one-sided error
  * (estimate ≥ truth; overestimate ≤ εN with ε ≈ e/width at probability
  * 1-δ, δ ≈ e^-depth). The streaming/ingest companion to the exact
  * `groupBy(key).count()`: the exact plan shuffles a VOCABULARY-sized
  * aggregate, the sketch is `depth×width` longs no matter how many
  * billions of distinct keys flow through — the right trade for heavy-
  * hitter screening, per-key rate limiting, and repeated-ngram scoring at
  * 100 TB. §2.14 engine extension next to [[graft.dedup.BloomFilter]]
  * (membership : bloom :: frequency : count-min).
  *
  * Build = one explode + (row, pos) keyed aggregation — at most
  * `depth × width` rows reach the driver. Probe = a pure `least(...)`
  * expression over the broadcast counter literals — no join, no shuffle.
  * Hashing is the same Kirsch–Mitzenmacher double-hash chain as the bloom
  * filter (ONE md5 per key; h1/h2 from hex substrings), so the DuckDB
  * oracle replays estimates bit-exactly.
  */
object CountMin {

  /** A built sketch: `counters(i)` is hash row i's `width` counters. */
  final case class Sketch(depth: Int, width: Long,
      counters: Array[Array[Long]]) {
    /** Driver-side estimate (tests / spot checks). */
    def estimate(key: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(key.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val h1 = java.lang.Long.parseLong(hex.substring(0, 13), 16)
      val h2 = java.lang.Long.parseLong(hex.substring(13, 26), 16) | 1L
      (0 until depth).map { i =>
        counters(i)(((h1 + i * h2) % width).toInt)
      }.min
    }
  }

  /** Element-wise sum of two same-shape sketches — count-min is a linear
    * sketch, so per-shard (or per-ingest-batch) sketches merge exactly:
    * estimate(merge(a, b)) sees the union stream. The incremental-corpus
    * story: keep one sketch per dump, merge on read. */
  def merge(a: Sketch, b: Sketch): Sketch = {
    require(a.depth == b.depth && a.width == b.width,
      s"sketch shapes differ: ${a.depth}x${a.width} vs ${b.depth}x${b.width}")
    Sketch(a.depth, a.width,
      a.counters.zip(b.counters).map { case (ra, rb) =>
        ra.zip(rb).map { case (x, y) => x + y }
      })
  }

  /** SQL for hash position `i` of `keyExpr` in [0, width). */
  private def posSql(keyExpr: String, width: Long, i: Int): String = {
    val key = s"CAST(($keyExpr) AS STRING)"
    val h1 = s"CAST(conv(substring(md5($key), 1, 13), 16, 10) AS BIGINT)"
    val h2 = s"(CAST(conv(substring(md5($key), 14, 13), 16, 10) AS BIGINT) | 1)"
    s"(($h1 + $i * $h2) % $width)"
  }

  /** Build a sketch over every value of `keyExpr` in `df`, each occurrence
    * weighted by `weightExpr` (default 1). Null keys insert nothing. */
  def build(df: DataFrame, keyExpr: String, width: Long = 1L << 14,
      depth: Int = 4, weightExpr: String = "1"): Sketch = {
    require(width >= 1 && width <= (1L << 24),
      s"width must be in [1, 2^24], got $width")
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    val rows = (0 until depth).map(i =>
      s"named_struct('r', $i, 'p', ${posSql(keyExpr, width, i)})").mkString(", ")
    val agg = df
      .where(s"($keyExpr) IS NOT NULL")
      .selectExpr(s"explode(array($rows)) AS rp",
        s"CAST(($weightExpr) AS BIGINT) AS w")
      .groupBy(col("rp.r").as("r"), col("rp.p").as("p"))
      .agg(sum(col("w")).as("c"))
      .collect() // <= depth*width rows by construction
    val counters = Array.fill(depth)(new Array[Long](width.toInt))
    agg.foreach(r => counters(r.getInt(0))(r.getLong(1).toInt) = r.getLong(2))
    Sketch(depth, width, counters)
  }

  /** Estimated count of `key`: min over hash rows of the addressed
    * counter — a pure expression against the broadcast counter literals. */
  def estimateCol(key: Column, sketch: Sketch): Column = {
    val digest = md5(key.cast("string"))
    val h1 = conv(substring(digest, 1, 13), 16, 10).cast("bigint")
    val h2 = conv(substring(digest, 14, 13), 16, 10).cast("bigint")
      .bitwiseOR(lit(1L))
    val terms = (0 until sketch.depth).map { i =>
      val p = (h1 + lit(i.toLong) * h2) % sketch.width
      element_at(typedlit(sketch.counters(i).toSeq), p.cast("int") + 1)
    }
    if (terms.size == 1) terms.head else least(terms: _*)
  }

  /** Append `outCol` = estimated frequency of `keyCol` under the sketch. */
  def estimate(df: DataFrame, keyCol: String, sketch: Sketch,
      outCol: String = "est_count"): DataFrame =
    df.withColumn(outCol, estimateCol(col(keyCol), sketch))
}
