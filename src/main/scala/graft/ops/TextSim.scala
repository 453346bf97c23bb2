package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram overlap F1 (ROUGE-N with clipped counts — Lin 2004) between a
  * candidate and a reference text column: the standard gate for
  * summary/answer quality AND the instruction-dedup filter self-instruct
  * style pipelines apply (drop a generated instruction when its ROUGE
  * overlap with an existing one exceeds a threshold).
  *
  * Scale shape: grams build as per-row array expressions fused into the
  * scan; clipped-overlap counting then runs as TWO keyed aggregations
  * and ONE (id, order, gram)-keyed join — count candidate grams per
  * key, count reference grams per key, join, sum least(c, r). All
  * shuffles key on (id, order, gram), so a book-length document costs
  * its gram count, never gram² — the row-local alternative (fold over
  * distinct grams × filter per gram) is quadratic per row and banned by
  * the HOF invariant. Totals ride the same aggregations (word metrics)
  * or are closed form from lengths (char/BLEU); every metric is a
  * ratio of exact BIGINT counts.
  *
  * The multi-order metrics ([[bleu]], [[chrF]]) share ONE gram-structs
  * builder and ONE clipped-overlap pipeline — [[orderedGramStructs]] /
  * [[clippedOverlap]] — so another multi-order metric composes them
  * instead of cloning the machinery. [[ngramF1]] (single order)
  * deliberately keeps a plain-string gram path: the (order, gram)
  * struct key and the flatten-over-orders wrapper each measured ~10×
  * slower on single-order shapes (the r17 q193 bench regression),
  * while the multi-order metrics amortize them across orders.
  */
object TextSim {

  /** Lowercased alphanumeric word tokens (shared with [[Cooccur]]). */
  private def tokens(c: Column): Column =
    graft.functions.TextFunctions.alnumTokens(c)

  /** (order, gram) structs for every order in `orders` over a STAGED
    * container column — `sizeOf`/`gramAt` abstract words (token
    * arrays) vs characters (whitespace-stripped strings). One flatten
    * builds all orders per row; callers must pass a plain column
    * reference (not an expression) as `src`, so the HOF lambdas
    * re-evaluate a column read per element, never the upstream
    * cleaning chain (the staging rule — it cost q282 6.6 s once).
    * Orders with too few units contribute an empty array (guarding
    * Spark's descending sequence(1, 0)). */
  private def orderedGramStructs(src: Column, orders: Range,
      sizeOf: Column => Column,
      gramAt: (Column, Column, Int) => Column): Column =
    flatten(array(orders.map { n =>
      when(sizeOf(src) >= n,
        transform(sequence(lit(1), sizeOf(src) - (n - 1)),
          i => struct(lit(n).as("_n"), gramAt(src, i, n).as("_g"))))
        .otherwise(array().cast("array<struct<_n:int,_g:string>>"))
    }: _*))

  /** Word n-grams (space-joined token windows) for `orders`. */
  private def wordGramStructs(toksCol: Column, orders: Range): Column =
    orderedGramStructs(toksCol, orders, size,
      (t, i, n) => array_join(slice(t, i, lit(n)), " "))

  /** Character n-grams (substrings) for `orders`. */
  private def charGramStructs(strCol: Column, orders: Range): Column =
    orderedGramStructs(strCol, orders, length,
      (s, i, n) => s.substr(i, lit(n)))

  /** Clipped multiset overlap per (id, order): explode both sides'
    * (order, gram) structs, count multiplicities keyed by
    * (ids, _n, _g), join, and sum least(c, r) per (ids, _n) — the one
    * shuffle the whole metric family pays. Rows/orders with no shared
    * gram are simply absent (callers left-join and coalesce to 0). */
  private def clippedOverlap(base: DataFrame, idCols: Seq[String],
      candGrams: Column, refGrams: Column): DataFrame = {
    val ids = idCols.map(col)
    def counted(src: Column, out: String) = base
      .select(ids :+ explode(src).as("_x"): _*)
      .select(ids :+ col("_x._n").as("_n") :+ col("_x._g").as("_g"): _*)
      .groupBy(ids :+ col("_n") :+ col("_g"): _*)
      .agg(count(lit(1)).as(out))
    counted(candGrams, "_cc")
      .join(counted(refGrams, "_rc"), idCols :+ "_n" :+ "_g")
      .groupBy(ids :+ col("_n"): _*)
      .agg(sum(least(col("_cc"), col("_rc"))).as("_ov"))
  }

  /** Per-row ROUGE-N: (idCols..., cand_grams, ref_grams, overlap,
    * precision, recall, f1) at gram order `n`. `overlap` is the clipped
    * multiset intersection size: Σ over distinct grams of
    * least(count_in_candidate, count_in_reference). Rows where either
    * side has no grams report 0.0 metrics (not null — a gate-friendly
    * sentinel; an empty candidate genuinely earns zero). */
  def ngramF1(df: DataFrame, idCols: Seq[String], candCol: String,
      refCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val ids = idCols.map(col)
    val staged = df.select(ids :+ tokens(col(candCol)).as("_ctf") :+
      tokens(col(refCol)).as("_rtf"): _*)
    // single-order fast path: PLAIN string grams, no (order, gram)
    // structs and no flatten(array(...)) wrapper — Probe17 measured the
    // multi-order machinery 10x slower on single-order shapes (structs
    // and the flatten wrapper each cost ~10x independently; BENCH r51's
    // q193 1.49s vs 0.12s regression), while the multi-order metrics
    // ([[bleu]]/[[chrF]]) amortize it across orders and stay flat
    def gramsOf(c: Column): Column =
      when(size(c) >= n,
        transform(sequence(lit(1), size(c) - (n - 1)),
          i => array_join(slice(c, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
    val base = staged.select(ids :+ gramsOf(col("_ctf")).as("_cg") :+
      gramsOf(col("_rtf")).as("_rg"): _*)
    val totals = base.select(ids :+ size(col("_cg")).cast("bigint")
      .as("cand_grams") :+ size(col("_rg")).cast("bigint")
      .as("ref_grams"): _*)
    def counted(g: String, out: String) = base
      .select(ids :+ explode(col(g)).as("_g"): _*)
      .groupBy(ids :+ col("_g"): _*)
      .agg(count(lit(1)).as(out))
    val overlap = counted("_cg", "_cc")
      .join(counted("_rg", "_rc"), idCols :+ "_g")
      .groupBy(ids: _*)
      .agg(sum(least(col("_cc"), col("_rc"))).as("overlap"))
    val joined = totals.join(overlap, idCols, "left")
      .withColumn("overlap", coalesce(col("overlap"), lit(0L)))
    val p = when(col("cand_grams") > 0,
      col("overlap").cast("double") / col("cand_grams")).otherwise(0.0)
    val r = when(col("ref_grams") > 0,
      col("overlap").cast("double") / col("ref_grams")).otherwise(0.0)
    joined
      .withColumn("precision", round(p, 6))
      .withColumn("recall", round(r, 6))
      .withColumn("f1",
        round(when(p + r > 0, lit(2.0) * p * r / (p + r)).otherwise(0.0), 6))
  }

  /** Longest-common-subsequence length between two token arrays — the
    * two-row DP (O(min) memory, O(m·n) time). */
  private[graft] def lcsLen(a: Array[String], b: Array[String]): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    // iterate over the longer side, keep DP rows sized by the shorter
    val (lo, hi) = if (a.length <= b.length) (a, b) else (b, a)
    var prev = new Array[Int](lo.length + 1)
    var cur = new Array[Int](lo.length + 1)
    var i = 1
    while (i <= hi.length) {
      var j = 1
      while (j <= lo.length) {
        cur(j) =
          if (hi(i - 1) == lo(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(lo.length)
  }

  /** Character-level Levenshtein distance over the strings themselves —
    * no per-character boxing: the r17 [[cer]] staged every character as
    * a one-char String through a Tungsten array (10k boxed elements per
    * side per row at the default clamp) and then paid a String-equality
    * compare per DP cell; this kernel reads `charAt` on the two String
    * objects directly (primitive char compares, zero staging arrays).
    * The common prefix and suffix strip first (the rapidfuzz /
    * python-Levenshtein optimization — exact, not approximate: edits
    * never touch an agreeing margin), so the DP cost scales with the
    * DIFFERING span, not the document length. */
  private[graft] def editDistChars(a: String, b: String): Int = {
    var s = 0
    val maxS = math.min(a.length, b.length)
    while (s < maxS && a.charAt(s) == b.charAt(s)) s += 1
    var ea = a.length
    var eb = b.length
    while (ea > s && eb > s && a.charAt(ea - 1) == b.charAt(eb - 1)) {
      ea -= 1; eb -= 1
    }
    val la = ea - s
    val lb = eb - s
    if (la == 0) return lb
    if (lb == 0) return la
    // two-row DP over the shorter differing span (O(min) memory)
    val (lo, hi, loLen, hiLen) =
      if (la <= lb) (a, b, la, lb) else (b, a, lb, la)
    var prev = Array.tabulate(loLen + 1)(identity)
    var cur = new Array[Int](loLen + 1)
    var i = 1
    while (i <= hiLen) {
      cur(0) = i
      val hc = hi.charAt(s + i - 1)
      var j = 1
      while (j <= loLen) {
        val sub = prev(j - 1) + (if (hc == lo.charAt(s + j - 1)) 0 else 1)
        cur(j) = math.min(sub, math.min(prev(j) + 1, cur(j - 1) + 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(loLen)
  }

  /** Word-level Levenshtein distance — the two-row DP ([[lcsLen]]'s
    * memory shape: O(min) rows, O(m·n) time). */
  private[graft] def editDist(a: Array[String], b: Array[String]): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    val (lo, hi) = if (a.length <= b.length) (a, b) else (b, a)
    var prev = Array.tabulate(lo.length + 1)(identity)
    var cur = new Array[Int](lo.length + 1)
    var i = 1
    while (i <= hi.length) {
      cur(0) = i
      var j = 1
      while (j <= lo.length) {
        val sub = prev(j - 1) + (if (hi(i - 1) == lo(j - 1)) 0 else 1)
        cur(j) = math.min(sub, math.min(prev(j) + 1, cur(j - 1) + 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(lo.length)
  }

  /** Banded (Ukkonen 1985) word-level Levenshtein: exact distance when
    * it is <= `band`, -1 when it provably exceeds it. The DP visits
    * only cells within `band` of the diagonal — O(n·band) instead of
    * O(n·m) — and exits the moment an entire band row exceeds the
    * bound (DP values are non-decreasing along any path, so no
    * continuation can come back under it). This is the thresholded
    * (`max_rate`) arm's kernel: a QA filter at rate t only ever needs
    * edits <= floor(t·ref_len), so the 100 TB cost per row is
    * length × t·length, not length². */
  private[graft] def editDistWithin(a: Array[String], b: Array[String],
      band: Int): Int = {
    if (band < 0) return -1
    val (lo, hi) = if (a.length <= b.length) (a, b) else (b, a)
    bandedDp(lo.length, hi.length, band,
      (i, j) => hi(i - 1) == lo(j - 1))
  }

  /** Character sibling of [[editDistWithin]] — [[editDistChars]]'s
    * prefix/suffix strip first (exact), then the banded DP over
    * `charAt` on the differing span. */
  private[graft] def editDistCharsWithin(a: String, b: String,
      band: Int): Int = {
    if (band < 0) return -1
    var s = 0
    val maxS = math.min(a.length, b.length)
    while (s < maxS && a.charAt(s) == b.charAt(s)) s += 1
    var ea = a.length
    var eb = b.length
    while (ea > s && eb > s && a.charAt(ea - 1) == b.charAt(eb - 1)) {
      ea -= 1; eb -= 1
    }
    val la = ea - s
    val lb = eb - s
    val (lo, hi, loLen, hiLen) =
      if (la <= lb) (a, b, la, lb) else (b, a, lb, la)
    bandedDp(loLen, hiLen, band,
      (i, j) => hi.charAt(s + i - 1) == lo.charAt(s + j - 1))
  }

  /** The shared banded two-row DP (unit-agnostic via the `eq` probe):
    * cells outside |i−j| <= band are INF (band+1); reads off the
    * previous row's band edge guard to INF; returns -1 when the final
    * distance exceeds `band`. */
  private def bandedDp(loLen: Int, hiLen: Int, band: Int,
      eq: (Int, Int) => Boolean): Int = {
    if (hiLen - loLen > band) return -1
    if (loLen == 0) return hiLen // <= band by the length check
    val inf = band + 1
    var prev = new Array[Int](loLen + 1)
    var cur = new Array[Int](loLen + 1)
    var j0 = 0
    while (j0 <= loLen) { prev(j0) = if (j0 <= band) j0 else inf; j0 += 1 }
    var i = 1
    while (i <= hiLen) {
      val jLo = math.max(1, i - band)
      val jHi = math.min(loLen, i + band)
      cur(0) = if (i <= band) i else inf
      var rowMin = cur(0)
      var j = jLo
      while (j <= jHi) {
        val sub = prev(j - 1) + (if (eq(i, j)) 0 else 1)
        val del = if (j <= i - 1 + band) prev(j) + 1 else inf
        val ins = if (j - 1 >= i - band) cur(j - 1) + 1 else inf
        val v = math.min(inf, math.min(sub, math.min(del, ins)))
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin >= inf) return -1
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(loLen) > band) -1 else prev(loLen)
  }

  /** Per-row word error rate — the ASR/generation transcription gate:
    * word-level Levenshtein edits (substitutions + insertions +
    * deletions) over the reference length. WER of an empty reference
    * against a non-empty candidate is edits/max(ref,1) = cand_tokens
    * (every candidate token is an insertion), documented rather than
    * NaN. Output: (idCols..., cand_tokens, ref_tokens, edits, wer,
    * truncated); with `maxRate` set, a `within` boolean precedes
    * `truncated` and exceeded rows carry the sentinels edits = -1 /
    * wer = -1.0 (the banded DP certifies only that wer > maxRate).
    *
    * Scale shape: [[rougeL]]'s exactly — one mapPartitions kernel, no
    * join/shuffle; the DP is O(m·n) per row so both sides clamp to
    * `maxTokens` with the truncation OBSERVABLE via the flag. The
    * `maxRate` arm drops the per-row cost to O(m·maxRate·m) via the
    * Ukkonen band ([[editDistWithin]]) — the 100 TB shape for a
    * transcription QA FILTER, where only the accept/reject at rate t
    * matters. */
  def wer(df: DataFrame, idCols: Seq[String], candCol: String,
      refCol: String, maxTokens: Int = 2000,
      maxRate: Option[Double] = None): DataFrame = {
    import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType, StructField}
    require(maxTokens >= 1 && maxTokens <= 20000,
      s"maxTokens must be in [1, 20000], got $maxTokens")
    maxRate.foreach(t => require(t > 0 && t <= 10,
      s"maxRate must be in (0, 10], got $t"))
    maxRate match {
      case None =>
        dpMetricTokens(df, idCols, candCol, refCol, maxTokens, "tokens",
          tokens,
          Seq(StructField("edits", LongType, nullable = false),
            StructField("wer", DoubleType, nullable = false)),
          (c, r) => {
            val e = editDist(c, r)
            Seq[Any](e.toLong,
              graft.core.Num.rnd6(e.toDouble / math.max(r.length, 1)))
          })
      case Some(t) =>
        // thresholded arm: a QA gate at rate t only needs to know
        // whether edits <= floor(t·max(ref,1)) — the banded DP costs
        // O(len·t·len) per row and certifies an exceedance exactly.
        // Exceeded rows report the SENTINELS edits = -1 / wer = -1.0
        // (not NULL: a nullable BIGINT gate column degrades to float64
        // in pandas and the driver's hasher flags every row)
        dpMetricTokens(df, idCols, candCol, refCol, maxTokens, "tokens",
          tokens,
          Seq(StructField("edits", LongType, nullable = false),
            StructField("wer", DoubleType, nullable = false),
            StructField("within", BooleanType, nullable = false)),
          (c, r) => {
            val denom = math.max(r.length, 1)
            val band = math.floor(t * denom).toInt
            val e = editDistWithin(c, r, band)
            if (e >= 0)
              Seq[Any](e.toLong, graft.core.Num.rnd6(e.toDouble / denom),
                true)
            else Seq[Any](-1L, -1.0, false)
          })
    }
  }

  /** Per-row character error rate — WER's character-level sibling (the
    * other standard ASR/OCR gate): character Levenshtein edits over
    * the reference's character count. Characters are those of the
    * CANONICAL token form — lowercased alphanumeric tokens joined by
    * single spaces (the same [[tokens]] normalization WER ranks on, so
    * the two metrics always see consistent text). Empty-reference
    * convention matches [[wer]]: edits/max(ref, 1). Output:
    * (idCols..., cand_chars, ref_chars, edits, cer, truncated).
    *
    * Scale shape: [[wer]]'s exactly — the shared [[dpMetric]]
    * scaffolding, one mapPartitions kernel, clamp observable — but the
    * unit container is the canonical STRING itself, never an array of
    * one-char strings: the DP ([[editDistChars]]) reads `charAt`
    * directly, so no 10k-element boxed array rides through Tungsten
    * per side per row and no String-equality runs per DP cell (the r17
    * staging regression — the VERDICT r17 #1 finding). */
  def cer(df: DataFrame, idCols: Seq[String], candCol: String,
      refCol: String, maxChars: Int = 10000,
      maxRate: Option[Double] = None): DataFrame = {
    import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType, StructField}
    require(maxChars >= 1 && maxChars <= 100000,
      s"maxChars must be in [1, 100000], got $maxChars")
    maxRate.foreach(t => require(t > 0 && t <= 10,
      s"maxRate must be in (0, 10], got $t"))
    // the canonical form is ASCII by construction ([[tokens]] keeps
    // [a-z0-9] + spaces), so Spark's code-point length/substring and
    // the JVM's UTF-16 charAt agree on every index
    val canon = (c: Column) => concat_ws(" ", tokens(c))
    val fields = Seq(
      StructField("edits", LongType, nullable = false),
      StructField("cer", DoubleType, nullable = false)) ++
      maxRate.map(_ => StructField("within", BooleanType,
        nullable = false))
    dpMetric[String](df, idCols, candCol, refCol, maxChars, "chars",
      canon, (c, m) => substring(c, 1, m), length,
      (row, i) => if (row.isNullAt(i)) "" else row.getString(i),
      _.length, fields,
      (c, r) => maxRate match {
        case None =>
          val e = editDistChars(c, r)
          Seq[Any](e.toLong,
            graft.core.Num.rnd6(e.toDouble / math.max(r.length, 1)))
        case Some(t) =>
          // thresholded arm — [[wer]]'s banded semantics at the
          // character level (sentinels, not NULLs, on exceeded rows)
          val denom = math.max(r.length, 1)
          val band = math.floor(t * denom).toInt
          val e = editDistCharsWithin(c, r, band)
          if (e >= 0)
            Seq[Any](e.toLong, graft.core.Num.rnd6(e.toDouble / denom),
              true)
          else Seq[Any](-1L, -1.0, false)
      })
  }

  /** Shared scaffolding for the per-row DP metrics ([[rougeL]],
    * [[wer]], [[cer]]): stage both sides' unit containers (token
    * ARRAYS via the `Array[String]` overload below, or the canonical
    * STRING itself for character metrics — [[cer]] passes substring/
    * length/getString so no per-character boxing ever happens), clamp
    * to `maxUnits` with the OBSERVABLE `truncated` flag, and run
    * `metric` over the clamped pair in one mapPartitions kernel (no
    * join, no shuffle). Output: (idCols..., cand_<unit>, ref_<unit>,
    * metricFields..., truncated); `metric` returns the metricFields
    * values in order. */
  private def dpMetric[U](df: DataFrame, idCols: Seq[String],
      candCol: String, refCol: String, maxUnits: Int, unit: String,
      stage: Column => Column,
      clamp: (Column, Int) => Column,
      sizeOf: Column => Column,
      read: (org.apache.spark.sql.Row, Int) => U,
      lenOf: U => Int,
      metricFields: Seq[org.apache.spark.sql.types.StructField],
      metric: (U, U) => Seq[Any]): DataFrame = {
    require(idCols.nonEmpty, "need at least one id column")
    // backstop only — each public metric enforces its own NAMED bound
    // (rougeL/wer 20k tokens, cer 100k chars) with its parameter name
    // in the message, so a config error maps to the offending key
    require(maxUnits >= 1 && maxUnits <= 100000,
      s"max units must be in [1, 100000], got $maxUnits")
    val ids = idCols.map(col)
    val staged = df.select(ids :+ stage(col(candCol)).as("_ctf") :+
      stage(col(refCol)).as("_rtf"): _*)
    val proj = staged.select(ids :+
      clamp(col("_ctf"), maxUnits).as("_ct") :+
      clamp(col("_rtf"), maxUnits).as("_rt") :+
      (sizeOf(col("_ctf")) > maxUnits || sizeOf(col("_rtf")) > maxUnits)
        .as("_trunc"): _*)
    val nIds = idCols.length
    import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}
    val outSchema = StructType(
      (proj.schema.fields.take(nIds) ++ Seq(
        StructField(s"cand_$unit", LongType, nullable = false),
        StructField(s"ref_$unit", LongType, nullable = false)) ++
        metricFields) :+
        StructField("truncated", BooleanType, nullable = false))
    proj.mapPartitions { it =>
      it.map { row =>
        val c = read(row, nIds)
        val r = read(row, nIds + 1)
        val trunc = !row.isNullAt(nIds + 2) && row.getBoolean(nIds + 2)
        // Seq[Any]: a mixed Long/Double Seq literal infers Seq[Double]
        // and silently widens the counts — the encoder then rejects them
        org.apache.spark.sql.Row.fromSeq(row.toSeq.take(nIds) ++
          ((Seq[Any](lenOf(c).toLong, lenOf(r).toLong) ++
            metric(c, r)) :+ trunc))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** The token-array instantiation of [[dpMetric]] — shared by
    * [[rougeL]] and [[wer]] (slice-clamped `Array[String]` units). */
  private def dpMetricTokens(df: DataFrame, idCols: Seq[String],
      candCol: String, refCol: String, maxUnits: Int, unit: String,
      stage: Column => Column,
      metricFields: Seq[org.apache.spark.sql.types.StructField],
      metric: (Array[String], Array[String]) => Seq[Any]): DataFrame =
    dpMetric[Array[String]](df, idCols, candCol, refCol, maxUnits, unit,
      stage, (c, m) => slice(c, 1, m), size,
      (row, i) =>
        if (row.isNullAt(i)) Array.empty[String]
        else row.getSeq[String](i).toArray,
      _.length, metricFields, metric)

  /** Per-row sentence BLEU (Papineni et al. 2002): the geometric mean
    * of clipped word n-gram precisions for n = 1..maxN times the
    * brevity penalty min(1, exp(1 − ref_len/cand_len)). UNSMOOTHED by
    * design (the paper's corpus formula applied per row): any order
    * with zero candidate grams OR zero clipped matches zeroes the
    * score — the standard behavior short/degenerate candidates get
    * without a smoothing method, documented here rather than picking
    * one of the seven smoothing variants silently.
    *
    * Determinism: per-order ln(pₙ) rounds to INTEGER MICRO units before
    * the over-orders sum (order-free — the q149 rule); the brevity
    * penalty is one exp over a ratio of exact token counts.
    *
    * Scale shape: identical to [[chrF]] — one per-row flatten builds
    * all orders' grams ([[orderedGramStructs]]), clipped overlap is
    * the shared (id, n, gram)-keyed join ([[clippedOverlap]]),
    * per-order totals are closed form from token counts. Output:
    * (idCols..., cand_tokens, ref_tokens, bleu). */
  def bleu(df: DataFrame, idCols: Seq[String], candCol: String,
      refCol: String, maxN: Int = 4): DataFrame = {
    require(idCols.nonEmpty, "bleu needs at least one id column")
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1, 8], got $maxN")
    val ids = idCols.map(col)
    val base = df.select(ids :+ tokens(col(candCol)).as("_ct") :+
      tokens(col(refCol)).as("_rt"): _*)
    val overlap = clippedOverlap(base, idCols,
      wordGramStructs(col("_ct"), 1 to maxN),
      wordGramStructs(col("_rt"), 1 to maxN))
    val skeleton = base
      .select(ids :+ size(col("_ct")).cast("bigint").as("_lc") :+
        size(col("_rt")).cast("bigint").as("_lr"): _*)
      .withColumn("_n", explode(sequence(lit(1), lit(maxN))))
      .withColumn("_tot", greatest(col("_lc") - col("_n") + 1, lit(0L)))
    val perOrder = skeleton
      .join(overlap, idCols :+ "_n", "left")
      .withColumn("_ov", coalesce(col("_ov"), lit(0L)))
      .withColumn("_zero", col("_tot") === 0 || col("_ov") === 0)
      .withColumn("_lnMicro", when(col("_zero"), lit(0L))
        .otherwise(round(log(col("_ov").cast("double") / col("_tot")) * 1e6)
          .cast("bigint")))
    val bp = when(col("_lc") >= col("_lr"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("_lr").cast("double") / col("_lc")))
    perOrder.groupBy(ids: _*)
      .agg(first(col("_lc")).as("_lc"), first(col("_lr")).as("_lr"),
        max(when(col("_zero"), 1).otherwise(0)).as("_anyZero"),
        sum(col("_lnMicro")).as("_sln"))
      .withColumn("bleu",
        round(when(col("_anyZero") === 1 || col("_lc") === 0, 0.0)
          .otherwise(bp *
            exp(col("_sln").cast("double") / (maxN * 1e6))), 6))
      .select(ids :+ col("_lc").as("cand_tokens") :+
        col("_lr").as("ref_tokens") :+ col("bleu"): _*)
  }

  /** Per-row chrF (Popović 2015): character n-gram F-score, the
    * tokenization-free MT/generation gate — robust to morphology and
    * spacing differences that word-level ROUGE punishes. Characters
    * are whitespace-stripped (the sacrebleu convention, case kept);
    * for each order n = 1..maxN the clipped-overlap precision and
    * recall compute from exact counts, averages over orders combine as
    * chrP/chrR, and chrF = (1+β²)·chrP·chrR / (β²·chrP + chrR) with
    * β = 2 by default (recall-weighted, the published choice).
    * Simplification vs sacrebleu: every order up to maxN contributes
    * to the average (an order with no candidate grams contributes
    * P = 0) rather than the "effective order" rule — deterministic on
    * degenerate inputs and documented here.
    *
    * Determinism: per-(row, order) precisions/recalls round to INTEGER
    * MICRO units before the over-orders sum (a raw double Σ over the
    * orders group would be partition-order dependent — the q149 rule).
    *
    * Scale shape: grams for ALL orders build in one per-row flatten
    * ([[orderedGramStructs]] over the STAGED cleaned-string column, so
    * HOF lambdas never re-evaluate the cleaning chain per element);
    * clipped overlap is the shared [[clippedOverlap]] machinery keyed
    * by (id, n, gram); per-order totals are CLOSED FORM from the
    * cleaned lengths (len − n + 1), so only the overlap join shuffles.
    * Output: (idCols..., chrf). */
  def chrF(df: DataFrame, idCols: Seq[String], candCol: String,
      refCol: String, maxN: Int = 6, beta: Double = 2.0): DataFrame = {
    require(idCols.nonEmpty, "chrF needs at least one id column")
    require(maxN >= 1 && maxN <= 10, s"maxN must be in [1, 10], got $maxN")
    require(beta > 0, s"beta must be > 0, got $beta")
    val ids = idCols.map(col)
    def cleaned(c: Column): Column =
      coalesce(regexp_replace(c, "\\s+", ""), lit(""))
    val base = df.select(ids :+ cleaned(col(candCol)).as("_cs") :+
      cleaned(col(refCol)).as("_rs"): _*)
    val overlap = clippedOverlap(base, idCols,
      charGramStructs(col("_cs"), 1 to maxN),
      charGramStructs(col("_rs"), 1 to maxN))
    // per-(row, order) skeleton with closed-form totals; left join
    // pulls in the (possibly absent) overlap
    val skeleton = base
      .select(ids :+ length(col("_cs")).as("_lc") :+
        length(col("_rs")).as("_lr"): _*)
      .withColumn("_n", explode(sequence(lit(1), lit(maxN))))
      .withColumn("_ct", greatest(col("_lc") - col("_n") + 1, lit(0)))
      .withColumn("_rt", greatest(col("_lr") - col("_n") + 1, lit(0)))
    val perOrder = skeleton
      .join(overlap, idCols :+ "_n", "left")
      .withColumn("_ov", coalesce(col("_ov"), lit(0L)))
      .withColumn("_pMicro", when(col("_ct") > 0,
        round(col("_ov") * 1e6 / col("_ct")).cast("bigint"))
        .otherwise(lit(0L)))
      .withColumn("_rMicro", when(col("_rt") > 0,
        round(col("_ov") * 1e6 / col("_rt")).cast("bigint"))
        .otherwise(lit(0L)))
    val b2 = beta * beta
    perOrder.groupBy(ids: _*)
      .agg(sum(col("_pMicro")).as("_sp"), sum(col("_rMicro")).as("_sr"))
      .withColumn("_chrP", col("_sp").cast("double") / (maxN * 1e6))
      .withColumn("_chrR", col("_sr").cast("double") / (maxN * 1e6))
      .withColumn("chrf",
        round(when(lit(b2) * col("_chrP") + col("_chrR") > 0,
          lit(1 + b2) * col("_chrP") * col("_chrR") /
            (lit(b2) * col("_chrP") + col("_chrR")))
          .otherwise(0.0), 6))
      .select(ids :+ col("chrf"): _*)
  }

  /** Per-row ROUGE-L (Lin 2004 §3): LCS-based precision/recall/F1 over
    * word tokens — order-sensitive where ROUGE-N's bag-of-grams is not
    * (a reversed summary keeps its bigrams but loses its LCS), the
    * second standard summary-quality gate. Output: (idCols...,
    * cand_tokens, ref_tokens, lcs, precision, recall, f1, truncated);
    * either side empty reports 0.0 metrics (the [[ngramF1]] sentinel
    * convention).
    *
    * Scale shape: one mapPartitions kernel (the encode-kernel shape: no
    * join, no shuffle); the DP is O(m·n) per row, so both sides clamp
    * to their FIRST `maxTokens` tokens — at the default 2000 the worst
    * row costs 4M cell updates; a book-length reference should be
    * chunked first, not LCS'd whole. Truncation is OBSERVABLE, not just
    * documented: `truncated` is true when either side exceeded
    * `maxTokens` pre-clamp (cand_tokens/ref_tokens report post-clamp
    * lengths, so without the flag a truncated row is indistinguishable
    * from a genuinely short one). */
  def rougeL(df: DataFrame, idCols: Seq[String], candCol: String,
      refCol: String, maxTokens: Int = 2000): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField}
    require(maxTokens >= 1 && maxTokens <= 20000,
      s"maxTokens must be in [1, 20000], got $maxTokens")
    dpMetricTokens(df, idCols, candCol, refCol, maxTokens, "tokens", tokens,
      Seq(StructField("lcs", LongType, nullable = false),
        StructField("precision", DoubleType, nullable = false),
        StructField("recall", DoubleType, nullable = false),
        StructField("f1", DoubleType, nullable = false)),
      (c, r) => {
        val l = lcsLen(c, r)
        val p = if (c.length > 0) l.toDouble / c.length else 0.0
        val rc = if (r.length > 0) l.toDouble / r.length else 0.0
        val f = if (p + rc > 0) 2.0 * p * rc / (p + rc) else 0.0
        Seq[Any](l.toLong, graft.core.Num.rnd6(p),
          graft.core.Num.rnd6(rc), graft.core.Num.rnd6(f))
      })
  }
}
