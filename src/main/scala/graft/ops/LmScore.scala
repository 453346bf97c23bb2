package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-language-model quality scoring: per-document average token
  * surprisal -ln p(token) under the corpus's own unigram distribution —
  * the CCNet-style "LM perplexity" filter with a unigram model standing in
  * for KenLM in this offline container. The seam is identical either way: a
  * (token, log-prob) table joined to the exploded corpus; swapping in an
  * externally-trained model is a different left side of the same join.
  * Low-surprisal docs are repetitive boilerplate; high-surprisal docs are
  * noise/garble — both ends are the usual pretraining-filter targets.
  *
  * Scale shape: one explode → vocabulary count aggregation (vocab-sized,
  * broadcast-able) → token join → per-doc average. The only driver value is
  * the total token count, which is exact in both engines (a sum of integer
  * counts). Everything else is keyed aggregation — linear in token count.
  */
object UnigramScore {

  /** (idCol, nll): average -ln p(w) over the doc's tokens, rounded to 6dp. */
  def perDoc(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(split(col(textCol), " ")).as("_t"))
    val freq = toks.groupBy(col("_t")).agg(count(lit(1)).cast("double").as("_c"))
    val total = freq.agg(sum("_c")).collect()(0).getDouble(0)
    toks.join(freq, Seq("_t"))
      .groupBy(col(idCol))
      .agg(round(avg(-log(col("_c") / total)), 6).as("nll"))
  }

  /** The input rows with `nll` attached (passthrough join on `idCol`). */
  def apply(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.join(perDoc(df, idCol, textCol), Seq(idCol))

  /** CCNet-style head/middle/tail perplexity bucketing (public: the CCNet
    * paper splits each language by LM perplexity tertile; head = best LM
    * fit, tail = noise — downstream pipelines keep head+middle or reweight
    * by bucket). Buckets are EXACT equal-frequency tertiles by rank
    * arithmetic — `(rank-1)*n DIV total` over a range-partitioned sort
    * ([[RankOp.withGlobalRank]], never a single-task empty-window
    * row_number, no approximate quantile sketch), so bucket membership is
    * deterministic and oracle-replayable. Driver state = one exact count.
    *
    * With `nBuckets = 3` the label column is head/middle/tail; other sizes
    * get the numeric bucket as a string. */
  def ccnetBuckets(df: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 3): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    Seq("nll", "ppl_bucket").foreach(c =>
      require(!df.columns.contains(c), s"input already has $c"))
    val scored = apply(df, idCol, textCol)
    val total = math.max(scored.count(), 1L)
    val ranked = RankOp.withGlobalRank(scored,
      Seq(col("nll").asc, col(idCol).asc))
      .withColumn("_b", expr(s"CAST(((_rank - 1) * $nBuckets) DIV $total AS INT)"))
      .drop("_rank")
    val labeled =
      if (nBuckets == 3)
        ranked.withColumn("ppl_bucket",
          when(col("_b") === 0, "head")
            .when(col("_b") === 1, "middle").otherwise("tail"))
      else ranked.withColumn("ppl_bucket", col("_b").cast("string"))
    labeled.drop("_b")
  }
}

/** Interpolated bigram-LM surprisal — one order up from [[UnigramScore]],
  * the closer deterministic stand-in for CCNet's KenLM perplexity filter:
  *
  *   p(w_i | w_{i-1}) = lambda * c(w_{i-1} w_i) / c(w_{i-1} *)
  *                      + (1 - lambda) * c(w_i) / N
  *
  * (Jelinek-Mercer interpolation, public textbook smoothing) — the unigram
  * backoff keeps every observed-in-corpus continuation finite. Documents
  * with fewer than two tokens have no bigram and are absent from the
  * output; filter or score them with the unigram model.
  *
  * Scale shape: one bigram explode (arrays_zip of adjacent slices — never a
  * self-join), three keyed count aggregations (bigram, context, unigram —
  * each vocabulary-sized), then hash joins back to the exploded stream and
  * a per-doc average. The only driver scalar is the exact integer token
  * total. Linear in corpus token count at any scale.
  */
object BigramScore {

  /** (idCol, bigram_nll): average -ln p(w_i | w_{i-1}), rounded to 6dp. */
  def perDoc(
      df: DataFrame,
      idCol: String,
      textCol: String,
      lambda: Double = 0.75): DataFrame = {
    require(lambda > 0 && lambda <= 1, s"lambda must be in (0,1], got $lambda")
    val toksCol = split(col(textCol), " ")
    val pairs = df.select(col(idCol),
      explode(arrays_zip(
        slice(toksCol, lit(1), size(toksCol) - 1),
        slice(toksCol, lit(2), size(toksCol) - 1))).as("_p"))
      .select(col(idCol), col("_p")("0").as("_ctx"), col("_p")("1").as("_nxt"))
    val bigramCnt = pairs.groupBy(col("_ctx"), col("_nxt"))
      .agg(count(lit(1)).cast("double").as("_cb"))
    val ctxCnt = bigramCnt.groupBy(col("_ctx")).agg(sum("_cb").as("_cctx"))
    val toks = df.select(explode(split(col(textCol), " ")).as("_nxt"))
    val uni = toks.groupBy(col("_nxt")).agg(count(lit(1)).cast("double").as("_cu"))
    val total = uni.agg(sum("_cu")).collect()(0).getDouble(0)
    pairs
      .join(bigramCnt, Seq("_ctx", "_nxt"))
      .join(ctxCnt, Seq("_ctx"))
      .join(uni, Seq("_nxt"))
      .groupBy(col(idCol))
      .agg(round(avg(-log(
        col("_cb") / col("_cctx") * lambda +
          col("_cu") / total * (1 - lambda))), 6).as("bigram_nll"))
  }

  /** The input rows with `bigram_nll` attached; sub-two-token docs drop
    * (inner join — they have no bigram to score). */
  def apply(df: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.75): DataFrame =
    df.join(perDoc(df, idCol, textCol, lambda), Seq(idCol))
}

/** Trigram Stupid Backoff scoring — the LM-quality signal that actually
  * ships at web scale (publicly: Brants et al. 2007, "Large Language
  * Models in Machine Translation": no normalized smoothing, just
  *
  *   S(w3 | w1 w2) = c(w1w2w3)/c(w1w2)        if the trigram was seen
  *                 = α · c(w2w3)/c(w2)         else if the bigram was
  *                 = α² · c(w3)/N              else (α² / N for OOV)
  *
  * with α = 0.4 — a SCORE, not a probability, which is exactly why it
  * scales: counts need no discounting pass). Counts train on a REFERENCE
  * corpus (`ref`, default = the scored frame itself — note self-scoring
  * never exercises the backoff arms, since every trigram of the corpus is
  * in its own counts).
  *
  * Scale shape: one trigram explode (arrays_zip of three adjacent slices
  * — never a self-join), three vocabulary-sized count aggregations on the
  * reference, LEFT hash joins back to the exploded stream (unseen = null
  * → next backoff arm), one per-doc average. Driver state = the exact
  * integer reference token total.
  */
object StupidBackoff {

  /** (idCol, sb_nll): average −ln S(w3 | w1 w2) over the doc's trigram
    * positions, 6 decimals; sub-three-token docs are absent. */
  def perDoc(df: DataFrame, idCol: String, textCol: String,
      ref: Option[DataFrame] = None, alpha: Double = 0.4): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val corpus = ref.getOrElse(df)
    def toks(c: org.apache.spark.sql.Column) =
      filter(split(c, " "), w => length(w) > 0)

    // Tokenize the reference ONCE (PersistScope-released): uni/total/bi/
    // tri all read the cached token arrays instead of re-running the
    // split per consumer — the same single-pass discipline as
    // NaiveBayes.train. Rows with fewer tokens than an n-gram needs are
    // filtered BEFORE the adjacent-slice zips (slice length would go
    // negative on an empty/whitespace-only document and kill the job).
    val refT = graft.core.PersistScope.register(
      corpus.select(toks(col(textCol)).as("_t")).persist())
    val uni = refT.select(explode(col("_t")).as("_w3"))
      .groupBy("_w3").agg(count(lit(1)).cast("double").as("_c1"))
    val total = uni.agg(sum("_c1")).head() match {
      case r if r.isNullAt(0) => 0.0
      case r => r.getDouble(0)
    }
    require(total > 0, "stupid backoff: empty reference corpus")
    val bi = refT.filter(size(col("_t")) >= 2)
      .select(explode(arrays_zip(
        slice(col("_t"), lit(1), size(col("_t")) - 1),
        slice(col("_t"), lit(2), size(col("_t")) - 1))).as("_p"))
      .select(col("_p")("0").as("_w2"), col("_p")("1").as("_w3"))
      .groupBy("_w2", "_w3").agg(count(lit(1)).cast("double").as("_c2"))
    val ctx2 = bi.groupBy("_w2").agg(sum("_c2").as("_cw2"))
    val tri = refT.filter(size(col("_t")) >= 3)
      .select(explode(arrays_zip(
        slice(col("_t"), lit(1), size(col("_t")) - 2),
        slice(col("_t"), lit(2), size(col("_t")) - 2),
        slice(col("_t"), lit(3), size(col("_t")) - 2))).as("_p"))
      .select(col("_p")("0").as("_w1"), col("_p")("1").as("_w2"),
        col("_p")("2").as("_w3"))
      .groupBy("_w1", "_w2", "_w3")
      .agg(count(lit(1)).cast("double").as("_c3"))
    val ctx3 = tri.groupBy("_w1", "_w2").agg(sum("_c3").as("_cw12"))

    val scored = df.select(col(idCol), toks(col(textCol)).as("_t"))
      .filter(size(col("_t")) >= 3)
      .select(col(idCol), explode(arrays_zip(
        slice(col("_t"), lit(1), size(col("_t")) - 2),
        slice(col("_t"), lit(2), size(col("_t")) - 2),
        slice(col("_t"), lit(3), size(col("_t")) - 2))).as("_p"))
      .select(col(idCol), col("_p")("0").as("_w1"), col("_p")("1").as("_w2"),
        col("_p")("2").as("_w3"))
      .join(tri, Seq("_w1", "_w2", "_w3"), "left")
      .join(ctx3, Seq("_w1", "_w2"), "left")
      .join(bi, Seq("_w2", "_w3"), "left")
      .join(ctx2, Seq("_w2"), "left")
      .join(uni, Seq("_w3"), "left")
    val score =
      when(col("_c3").isNotNull, col("_c3") / col("_cw12"))
        .when(col("_c2").isNotNull, lit(alpha) * col("_c2") / col("_cw2"))
        .otherwise(lit(alpha * alpha) *
          coalesce(col("_c1"), lit(1.0)) / total)
    scored.groupBy(col(idCol))
      .agg(round(avg(-log(score)), 6).as("sb_nll"))
  }

  /** The input rows with `sb_nll` attached; sub-three-token docs drop. */
  def apply(df: DataFrame, idCol: String, textCol: String,
      ref: Option[DataFrame] = None, alpha: Double = 0.4): DataFrame =
    df.join(perDoc(df, idCol, textCol, ref, alpha), Seq(idCol))

  /** EXPORT the reference counts as one portable model table — rows
    * (n, w1, w2, w3, cnt, ctx): n = gram order; w1/w2 are '' where the
    * order doesn't use them; `ctx` is the context total the score
    * divides by (the corpus total for unigrams). Train ONCE per
    * reference corpus and store (parquet/ShardedSink) — each crawl then
    * scores against the stored table instead of recounting 100 TB of
    * history, the same accumulated-state discipline as the minhash
    * signatureTable and bloom word array. [[perDocWithModel]] consumes
    * it bit-identically to [[perDoc]] (spec-asserted). */
  def trainModel(corpus: DataFrame, textCol: String): DataFrame = {
    def toks(c: org.apache.spark.sql.Column) =
      filter(split(c, " "), w => length(w) > 0)
    val refT = graft.core.PersistScope.register(
      corpus.select(toks(col(textCol)).as("_t")).persist())
    val uni = refT.select(explode(col("_t")).as("w3"))
      .groupBy("w3").agg(count(lit(1)).as("cnt"))
    val totalRow = uni.agg(coalesce(sum("cnt"), lit(0L))).head()
    val total = totalRow.getLong(0)
    require(total > 0, "stupid backoff: empty reference corpus")
    val uniRows = uni.select(lit(1).as("n"), lit("").as("w1"),
      lit("").as("w2"), col("w3"), col("cnt"), lit(total).as("ctx"))
    val bi = refT.filter(size(col("_t")) >= 2)
      .select(explode(arrays_zip(
        slice(col("_t"), lit(1), size(col("_t")) - 1),
        slice(col("_t"), lit(2), size(col("_t")) - 1))).as("_p"))
      .select(col("_p")("0").as("w2"), col("_p")("1").as("w3"))
      .groupBy("w2", "w3").agg(count(lit(1)).as("cnt"))
    val ctx2 = bi.groupBy("w2").agg(sum("cnt").as("ctx"))
    val biRows = bi.join(ctx2, "w2")
      .select(lit(2).as("n"), lit("").as("w1"), col("w2"), col("w3"),
        col("cnt"), col("ctx"))
    val tri = refT.filter(size(col("_t")) >= 3)
      .select(explode(arrays_zip(
        slice(col("_t"), lit(1), size(col("_t")) - 2),
        slice(col("_t"), lit(2), size(col("_t")) - 2),
        slice(col("_t"), lit(3), size(col("_t")) - 2))).as("_p"))
      .select(col("_p")("0").as("w1"), col("_p")("1").as("w2"),
        col("_p")("2").as("w3"))
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("cnt"))
    val ctx3 = tri.groupBy("w1", "w2").agg(sum("cnt").as("ctx"))
    val triRows = tri.join(ctx3, Seq("w1", "w2"))
      .select(lit(3).as("n"), col("w1"), col("w2"), col("w3"),
        col("cnt"), col("ctx"))
    uniRows.unionByName(biRows).unionByName(triRows)
  }

  /** Score against a STORED [[trainModel]] table — the joins and backoff
    * arms of [[perDoc]], reading counts instead of recounting. */
  def perDocWithModel(df: DataFrame, idCol: String, textCol: String,
      model: DataFrame, alpha: Double = 0.4): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    def toks(c: org.apache.spark.sql.Column) =
      filter(split(c, " "), w => length(w) > 0)
    val m = graft.core.PersistScope.register(model.persist())
    val uni = m.filter(col("n") === 1).select(col("w3"),
      col("cnt").cast("double").as("_c1"))
    val totalRow = m.filter(col("n") === 1)
      .agg(coalesce(max(col("ctx")), lit(0L))).head()
    val total = totalRow.getLong(0).toDouble
    require(total > 0, "stupid backoff: empty model")
    val bi = m.filter(col("n") === 2).select(col("w2"), col("w3"),
      col("cnt").cast("double").as("_c2"),
      col("ctx").cast("double").as("_cw2"))
    val tri = m.filter(col("n") === 3).select(col("w1"), col("w2"),
      col("w3"), col("cnt").cast("double").as("_c3"),
      col("ctx").cast("double").as("_cw12"))
    val scored = df.select(col(idCol), toks(col(textCol)).as("_t"))
      .filter(size(col("_t")) >= 3)
      .select(col(idCol), explode(arrays_zip(
        slice(col("_t"), lit(1), size(col("_t")) - 2),
        slice(col("_t"), lit(2), size(col("_t")) - 2),
        slice(col("_t"), lit(3), size(col("_t")) - 2))).as("_p"))
      .select(col(idCol), col("_p")("0").as("w1"), col("_p")("1").as("w2"),
        col("_p")("2").as("w3"))
      .join(tri, Seq("w1", "w2", "w3"), "left")
      .join(bi, Seq("w2", "w3"), "left")
      .join(uni, Seq("w3"), "left")
    val score =
      when(col("_c3").isNotNull, col("_c3") / col("_cw12"))
        .when(col("_c2").isNotNull, lit(alpha) * col("_c2") / col("_cw2"))
        .otherwise(lit(alpha * alpha) *
          coalesce(col("_c1"), lit(1.0)) / total)
    scored.groupBy(col(idCol))
      .agg(round(avg(-log(score)), 6).as("sb_nll"))
  }
}
