package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Bloom-filter membership against an already-ingested reference corpus —
  * the fixed-memory alternative to [[Decontaminate]]'s broadcast gram set
  * and [[MinHashDedup.cleanAgainstReference]]'s band join for the
  * incremental-ingest pre-filter ("is this key definitely new?").
  *
  * Why at 100 TB: a join against the reference shuffles or broadcasts data
  * proportional to the REFERENCE size; the bloom filter is a fixed
  * `m`-bit array (config-bounded, e.g. 2^26 bits = 8 MB) regardless of how
  * many billions of keys it summarizes. Build is one narrow
  * explode+bit_or aggregation (driver state = exactly `m/64` longs); probe
  * is a pure per-row expression against the broadcast word array — no
  * shuffle, no join, runs inside the scan.
  *
  * Semantics (standard Bloom guarantees): `false` = key definitely NOT in
  * the reference (no false negatives); `true` = key present OR a false
  * positive, rate ≈ (1 - e^{-k·n/m})^k for n inserted keys.
  *
  * Hashing is Kirsch–Mitzenmacher double hashing (the standard k-from-2
  * construction, asymptotically the same FP rate as k independent hashes):
  * ONE md5 per key yields h1 (hex chars 1-13) and h2 (chars 14-26, forced
  * odd so the stride is invertible mod the power-of-two m), and position i
  * is `(h1 + i·h2) % m` — so per-key hash cost is one digest regardless of
  * k, and the scheme stays engine-portable (the DuckDB oracle replays
  * bit-exact membership from the same two hex substrings).
  */
object BloomFilter {

  /** A built filter: `words(i)` holds bits [64i, 64i+64). */
  final case class Filter(m: Long, k: Int, words: Array[Long]) {
    /** Driver-side probe (tests / spot checks). */
    def mightContain(key: String): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(key.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val h1 = java.lang.Long.parseLong(hex.substring(0, 13), 16)
      val h2 = java.lang.Long.parseLong(hex.substring(13, 26), 16) | 1L
      (0 until k).forall { i =>
        val p = (h1 + i * h2) % m
        (words((p / 64).toInt) >> (p % 64).toInt & 1L) == 1L
      }
    }
  }

  /** SQL for hash position `i` of `keyExpr` in [0, m): double hashing —
    * h1/h2 are substrings of one md5 (repeated md5 subexpressions collapse
    * in codegen's subexpression elimination, so each key digests once). */
  private def posSql(keyExpr: String, m: Long, i: Int): String = {
    val key = s"CAST(($keyExpr) AS STRING)"
    val h1 = s"CAST(conv(substring(md5($key), 1, 13), 16, 10) AS BIGINT)"
    val h2 = s"(CAST(conv(substring(md5($key), 14, 13), 16, 10) AS BIGINT) | 1)"
    s"(($h1 + $i * $h2) % $m)"
  }

  /** Build a filter over every value of `keyExpr` in `ref`. One explode +
    * (word, bit_or) aggregation; at most `m/64` rows reach the driver. */
  def build(ref: DataFrame, keyExpr: String, m: Long = 1L << 22,
      k: Int = 3): Filter = {
    require(m >= 64 && m % 64 == 0, s"m must be a positive multiple of 64, got $m")
    require(m <= (1L << 30), s"m > 2^30 bits exceeds the sane driver budget")
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")
    val posArr = (0 until k).map(i => posSql(keyExpr, m, i)).mkString(", ")
    val agg = ref
      // a null key hashes to null positions; inserting nothing for it is
      // the only sensible membership (probe of null is null too) — without
      // the filter the (w=null) group NPEs the driver-side word fill
      .where(s"($keyExpr) IS NOT NULL")
      .selectExpr(s"explode(array($posArr)) AS p")
      .selectExpr("CAST(p DIV 64 AS INT) AS w", "CAST(p % 64 AS INT) AS b")
      .groupBy("w")
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), b))").as("bits"))
      .collect() // <= m/64 rows by construction
    val words = new Array[Long]((m / 64).toInt)
    agg.foreach(r => words(r.getInt(0)) = r.getLong(1))
    Filter(m, k, words)
  }

  /** Append `outCol`: true iff every hash bit of `keyExpr` is set in the
    * filter. The word array ships as one broadcast literal; the probe is a
    * per-row expression chain (no join, no shuffle). */
  def probe(df: DataFrame, keyExpr: String, filter: Filter,
      outCol: String = "bloom_hit"): DataFrame = {
    val hit = (0 until filter.k).map { i =>
      val p = posSql(keyExpr, filter.m, i)
      s"((shiftright(element_at(_bf_words, CAST(($p) DIV 64 AS INT) + 1), " +
        s"CAST(($p) % 64 AS INT)) & 1) = 1)"
    }.mkString(" AND ")
    df.withColumn("_bf_words", typedlit(filter.words.toSeq))
      .withColumn(outCol, expr(hit))
      .drop("_bf_words")
  }

  /** Column-level probe of every element of an array column: returns
    * array<boolean>, one membership verdict per key, against the broadcast
    * word-array literal. Mirrors [[probe]]'s hash chain exactly but stays a
    * pure expression over arrays — usable per-row in streaming plans where
    * an explode + re-aggregate would force stateful append-mode machinery. */
  def probeValues(keys: Column, filter: Filter): Column = {
    val words = typedlit(filter.words.toSeq)
    transform(keys, key => {
      val digest = md5(key.cast("string"))
      val h1 = conv(substring(digest, 1, 13), 16, 10).cast("bigint")
      val h2 = conv(substring(digest, 14, 13), 16, 10).cast("bigint")
        .bitwiseOR(lit(1L))
      (0 until filter.k).map { i =>
        val p = (h1 + lit(i.toLong) * h2) % filter.m
        call_function("shiftright", element_at(words, (p / 64).cast("int") + 1),
          (p % 64).cast("int")).bitwiseAND(lit(1L)) === 1L
      }.reduce(_ && _)
    })
  }

  /** Per-document n-gram hit counts against a reference corpus's gram
    * filter — bloom-based decontamination/ingest dedup: `n_grams` distinct
    * word n-grams, `n_hits` of them (possibly) present in the reference.
    * `n_hits = 0` rows are guaranteed gram-disjoint from the reference. */
  def gramHits(df: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refTextCol: String, n: Int = 4, m: Long = 1L << 22,
      k: Int = 3): DataFrame = {
    val refGrams = ref.select(
      explode(array_distinct(TextFunctions.shingles(col(refTextCol), n)))
        .as("_g"))
    gramHits(df, idCol, textCol, build(refGrams, "_g", m, k), n)
  }

  /** [[gramHits]] against an ALREADY-BUILT filter — the deployment shape:
    * the reference filter is static state built once and probed by every
    * ingest batch, so callers (and benchmarks) shouldn't re-pay the build
    * per probe pass. */
  def gramHits(df: DataFrame, idCol: String, textCol: String,
      filter: Filter, n: Int): DataFrame = {
    val newGrams = df.select(col(idCol),
      explode(array_distinct(TextFunctions.shingles(col(textCol), n)))
        .as("_g"))
    probe(newGrams, "_g", filter, "_hit")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("_hit"), 1L).otherwise(0L)).as("n_hits"))
  }

  /** Keep only rows with at most `maxHits` reference grams — the
    * fixed-memory incremental-ingest pre-filter. No false negatives means
    * nothing contaminated survives; false positives drop clean rows at the
    * configured rate (size `m` for the reference cardinality). */
  def cleanAgainstReference(df: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refTextCol: String, n: Int = 4, m: Long = 1L << 22,
      k: Int = 3, maxHits: Long = 0L): DataFrame =
    // anti-join on the CONTAMINATED ids (not semi-join on the clean ones):
    // a null-text row produces no gram rows at all, so it is absent from
    // gramHits — it is trivially gram-disjoint from the reference and must
    // be KEPT, exactly as Decontaminate.clean's left_anti keeps it.
    df.join(
      gramHits(df, idCol, textCol, ref, refTextCol, n, m, k)
        .filter(col("n_hits") > maxHits)
        .select(col(idCol)),
      Seq(idCol), "left_anti")
}
