package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{CosineSimilarity, VectorFunctions}

/** RAG context injection (reference `retriever` on any op, base.py:212-233 +
  * docetl/retrievers/lancedb.py): for each input row, the top-k most relevant
  * corpus rows are rendered and attached under `_{name}_retrieved_context`,
  * which prompts can then reference with `{{ input._name_retrieved_context }}`.
  *
  * Spark-first shapes (no external index service):
  *   - `byEmbedding`: input and corpus both carry embedding columns; the
  *     corpus is broadcast (an index is small relative to the data being
  *     processed), scored with the native cosine expression, top-k per row
  *     via a window.
  *   - `byTermOverlap`: lexical retrieval — score = |query tokens ∩ doc
  *     tokens|, the degenerate-but-cheap BM25 cousin that needs no corpus
  *     statistics at plan time.
  *
  * Every method has BOTH a small-corpus broadcast shape and a large-corpus
  * indexed shape (inverted-index postings join for lexical, IVF cell join
  * for vector, their union for hybrid), selected by an O(gate) limited
  * count — no corpus size makes a retriever throw or cross-product.
  */
object RetrieverOp {

  /** One term's BM25 contribution (the Robertson/Lucene variant with
    * idf = ln((N−df+0.5)/(df+0.5)+1)) — the ONE formula shared by
    * [[byBm25]], [[graft.ops.HardNegatives]], and the q17 oracle;
    * keep it here so the retriever and the training-pair miner cannot
    * drift apart. */
  private[ops] def bm25Contribution(tf: Column, df: Column, dl: Column,
      n: Double, avgdl: Double, k1: Double, b: Double): Column =
    log((lit(n) - df + 0.5) / (df + 0.5) + 1.0) *
      tf * (k1 + 1.0) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / avgdl))

  def byEmbedding(
      df: DataFrame,
      name: String,
      queryEmbCol: String,
      corpus: DataFrame,
      corpusEmbCol: String,
      corpusRenderExpr: String,
      k: Int = 3,
      /** Corpus rows above which the broadcast-cross is refused and retrieval
        * routes through the IVF index (train centroids on a sample, probe the
        * nProbe nearest cells per query row). Checked with an O(gate) limited
        * count. */
      corpusGate: Int = 100000,
      nCentroids: Int = 64,
      nProbe: Int = 8): DataFrame = {
    val outKey = s"_${name}_retrieved_context"
    val rowId = s"_graft_rid_$name"
    val withId = df.withColumn(rowId, monotonically_increasing_id())
    val c = corpus.select(
      col(corpusEmbCol).as("_ce"),
      expr(corpusRenderExpr).cast("string").as("_ctext"))
    val small = c.limit(corpusGate + 1).count() <= corpusGate
    if (!small) graft.core.PairBudget.notice(
      s"[graft] retriever '$name': corpus exceeds corpusGate=$corpusGate — " +
        s"switching to the IVF-indexed path (approximate: only the $nProbe " +
        "probed cells per query are scored)")
    val scored =
      if (small)
        graft.core.Joins.boundedCrossBroadcast(withId, c, col(rowId), col("_ctext"),
            maxRows = corpusGate, context = s"retriever '$name'")
          .withColumn("_score", CosineSimilarity(col(queryEmbCol), col("_ce")))
      else {
        // Large-corpus path: IVF (Ann.scala shapes). Centroids train on an
        // order-invariant sample; the corpus partitions by cell; each query
        // row probes only its nProbe nearest cells, so the join is a cell-key
        // hash join (AQE picks broadcast vs shuffle), never a cross.
        val centroids = graft.ann.Ann.trainCentroids(c, "_ce", nCentroids)
        val assigned = graft.ann.Ann.ivfAssign(c, "_ce", centroids)
        val probeCells = graft.ann.Ann.probeCellsCol(col(queryEmbCol),
          centroids, math.min(nProbe, centroids.length))
        val q = withId.withColumn("_cell", explode(probeCells))
        assigned.join(q, Seq("_cell"))
          .withColumn("_score", CosineSimilarity(col(queryEmbCol), col("_ce")))
          .drop("_cell")
      }
    attachTopK(withId, scored, rowId, outKey, k)
  }

  def byTermOverlap(
      df: DataFrame,
      name: String,
      queryTextCol: String,
      corpus: DataFrame,
      corpusTextCol: String,
      corpusRenderExpr: String,
      k: Int = 3,
      /** Corpus rows above which the broadcast is refused and scoring routes
        * through the inverted-index join (same postings shape as byBm25 with
        * the idf/tf weighting dropped). Zero-overlap (query, doc) pairs are
        * excluded on BOTH sides of the gate — the indexed path never
        * materializes them and the broadcast path filters `_score > 0` to
        * match — so a query sharing no token with any corpus doc gets a null
        * context regardless of corpus size, and crossing the gate never
        * changes retrieval output (Round9Spec pins the A/B equality). */
      corpusGate: Int = 100000,
      maxPostingSize: Option[Int] = None): DataFrame = {
    val outKey = s"_${name}_retrieved_context"
    val rowId = s"_graft_rid_$name"
    val withId = df.withColumn(rowId, monotonically_increasing_id())
    val c = corpus.select(
      split(col(corpusTextCol), " ").as("_ctoks"),
      expr(corpusRenderExpr).cast("string").as("_ctext"))
    val small = c.limit(corpusGate + 1).count() <= corpusGate
    if (!small) graft.core.PairBudget.notice(
      s"[graft] retriever '$name': corpus exceeds corpusGate=$corpusGate — " +
        "switching to the inverted-index postings path" +
        maxPostingSize.fold("")(cap => s" (postings over $cap docs banned)"))
    val scored =
      if (small)
        graft.core.Joins.boundedCrossBroadcast(withId, c, col(rowId), col("_ctext"),
            maxRows = corpusGate, context = s"retriever '$name'")
          .withColumn("_score",
            size(array_intersect(split(col(queryTextCol), " "), col("_ctoks"))).cast("double"))
          .filter(col("_score") > 0)
      else {
        // Large-corpus path: |query ∩ doc| = count of matched postings after
        // per-side distinct — a term-key hash join, no cross at any size.
        val cid = c.withColumn("_cdid", monotonically_increasing_id())
        termOverlapPairs(withId, rowId, queryTextCol, cid, maxPostingSize)
          .withColumnRenamed("_ov", "_score")
          .join(cid.select(col("_cdid"), col("_ctext")), Seq("_cdid"))
      }
    attachTopK(withId, scored, rowId, outKey, k)
  }

  /** Distinct-term-overlap counts per (query row, corpus doc) as an
    * inverted-index join: corpus explodes to (term, doc) postings, queries
    * explode to (row, term), join ON TERM, count per pair. Only pairs sharing
    * ≥1 token are ever materialized. `maxPostingSize` bans terms whose
    * posting list exceeds the cap (stopword pruning — the hot-posting analog
    * of the dedup bucket ban): a stopword shared by every corpus doc would
    * otherwise join each query row against the whole corpus. Banned terms
    * stop counting toward overlap, the accepted idf-floor trade. */
  private def termOverlapPairs(
      queries: DataFrame, rowId: String, queryTextCol: String,
      corpusWithId: DataFrame, maxPostingSize: Option[Int] = None): DataFrame = {
    val postings0 = corpusWithId.select(
      col("_cdid"), explode(array_distinct(col("_ctoks"))).as("_term"))
    val postings = maxPostingSize.fold(postings0) { cap =>
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("_term"))
      postings0.withColumn("_graft_pn", count(lit(1)).over(w))
        .filter(col("_graft_pn") <= cap).drop("_graft_pn")
    }
    val qTerms = queries.select(
      col(rowId), explode(array_distinct(split(col(queryTextCol), " "))).as("_term"))
    qTerms.join(postings, Seq("_term"))
      .groupBy(col(rowId), col("_cdid"))
      .agg(count(lit(1)).cast("double").as("_ov"))
  }

  /** BM25 full-text retrieval (reference lancedb.py fts mode is BM25-backed;
    * scoring identical to TopKOp.bm25, ops/Sampling.scala, but with a
    * per-row query instead of a constant term list). Distributed shape: an
    * inverted-index join — corpus explodes to (term, doc, tf, dl) postings,
    * query rows explode to (row, term), the two join ON TERM, and per-(row,
    * doc) BM25 contributions sum. No cross product at any corpus size; only
    * rows sharing at least one term ever meet, which is also why docs with
    * zero overlap are never retrieved (BM25 score 0). */
  def byBm25(
      df: DataFrame,
      name: String,
      queryTextCol: String,
      corpus: DataFrame,
      corpusTextCol: String,
      corpusRenderExpr: String,
      k: Int = 3,
      k1: Double = 1.2,
      b: Double = 0.75,
      /** Ban terms whose posting list exceeds this many docs (stopword
        * pruning): such terms join every query against most of the corpus
        * while their idf contribution is near zero. Opt-in; None preserves
        * exact BM25. */
      maxPostingSize: Option[Int] = None): DataFrame = {
    val outKey = s"_${name}_retrieved_context"
    val rowId = s"_graft_rid_$name"
    val withId = df.withColumn(rowId, monotonically_increasing_id())
    val c = corpus.select(
      split(col(corpusTextCol), " ").as("_ctoks"),
      expr(corpusRenderExpr).cast("string").as("_ctext"))
      .withColumn("_cdid", monotonically_increasing_id())
    // Corpus stats: N and avgdl — two doubles to the driver.
    val statsRow = c.agg(
      count(lit(1)).cast("double"), avg(size(col("_ctoks")).cast("double"))).collect()(0)
    val n = statsRow.getDouble(0)
    val avgdl = statsRow.getDouble(1)
    val postings0 = c
      .select(col("_cdid"), col("_ctext"),
        size(col("_ctoks")).cast("double").as("_dl"),
        explode(col("_ctoks")).as("_term"))
      .groupBy("_term", "_cdid", "_ctext", "_dl")
      .agg(count(lit(1)).cast("double").as("_tf"))
    val postings = maxPostingSize.fold(postings0) { cap =>
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("_term"))
      postings0.withColumn("_graft_pn", count(lit(1)).over(w))
        .filter(col("_graft_pn") <= cap).drop("_graft_pn")
    }
    val docfreq = postings.groupBy("_term")
      .agg(count(lit(1)).cast("double").as("_df"))
    val queryTerms = withId.select(col(rowId),
      explode(array_distinct(split(col(queryTextCol), " "))).as("_term"))
    val contrib = queryTerms
      .join(postings, Seq("_term"))
      .join(docfreq, Seq("_term"))
      .withColumn("_c", bm25Contribution(col("_tf"), col("_df"),
        col("_dl"), n, avgdl, k1, b))
    val scored = contrib.groupBy(col(rowId), col("_cdid"), col("_ctext"))
      .agg(sum(col("_c")).as("_score"))
    attachTopK(withId, scored, rowId, outKey, k)
  }

  /** Hybrid retrieval (reference lancedb.py hybrid mode): convex blend of
    * the cosine score and a min-max-normalized term-overlap score. Below
    * `corpusGate` one broadcast join computes both scores exactly; above it,
    * the candidate set is the UNION of the inverted-index term matches and
    * the IVF-probed cells, and both score components are computed exactly on
    * those candidates (cosine from the joined-back embeddings, overlap
    * coalesced to 0 for vector-only candidates). A doc is missed only if it
    * shares no token AND sits outside every probed cell — i.e. it scores
    * near-zero on both components. */
  def byHybrid(
      df: DataFrame,
      name: String,
      queryEmbCol: String,
      queryTextCol: String,
      corpus: DataFrame,
      corpusEmbCol: String,
      corpusTextCol: String,
      corpusRenderExpr: String,
      k: Int = 3,
      vectorWeight: Double = 0.5,
      corpusGate: Int = 100000,
      nCentroids: Int = 64,
      nProbe: Int = 8): DataFrame = {
    require(vectorWeight >= 0 && vectorWeight <= 1, "vectorWeight in [0,1]")
    val outKey = s"_${name}_retrieved_context"
    val rowId = s"_graft_rid_$name"
    val withId = df.withColumn(rowId, monotonically_increasing_id())
    val c = corpus.select(
      col(corpusEmbCol).as("_ce"),
      split(col(corpusTextCol), " ").as("_ctoks"),
      expr(corpusRenderExpr).cast("string").as("_ctext"))
    val qToks = split(col(queryTextCol), " ")
    val small = c.limit(corpusGate + 1).count() <= corpusGate
    if (!small) graft.core.PairBudget.notice(
      s"[graft] retriever '$name': corpus exceeds corpusGate=$corpusGate — " +
        "switching to the union-of-arms indexed path (candidates = term " +
        s"matches ∪ $nProbe probed IVF cells; both-zero-signal docs are not scored)")
    val scored =
      if (small) {
        val overlap = size(array_intersect(qToks, col("_ctoks"))).cast("double")
        graft.core.Joins.boundedCrossBroadcast(withId, c, col(rowId), col("_ctext"),
            maxRows = corpusGate, context = s"retriever '$name'")
          .withColumn("_score",
            lit(vectorWeight) * CosineSimilarity(col(queryEmbCol), col("_ce")) +
              lit(1 - vectorWeight) * overlap / greatest(size(qToks).cast("double"), lit(1.0)))
      } else {
        val cid = c.withColumn("_cdid", monotonically_increasing_id())
        val termPairs = termOverlapPairs(withId, rowId, queryTextCol, cid)
        val centroids = graft.ann.Ann.trainCentroids(cid, "_ce", nCentroids)
        val assigned = graft.ann.Ann.ivfAssign(cid, "_ce", centroids)
          .select(col("_cdid"), col("_cell"))
        val probeCells = graft.ann.Ann.probeCellsCol(col(queryEmbCol),
          centroids, math.min(nProbe, centroids.length))
        val ivfPairs = withId
          .select(col(rowId), explode(probeCells).as("_cell"))
          .join(assigned, Seq("_cell"))
          .select(col(rowId), col("_cdid"))
        // ivfPairs is duplicate-free by construction (probeCells are
        // distinct cells and each doc sits in exactly one cell), so no
        // distinct() — it would cost a full extra shuffle.
        val cands = termPairs
          .join(ivfPairs, Seq(rowId, "_cdid"), "full_outer")
          .na.fill(0.0, Seq("_ov"))
        cands
          .join(cid.select(col("_cdid"), col("_ce"), col("_ctext")), Seq("_cdid"))
          .join(withId.select(col(rowId), col(queryEmbCol).as("_qe"),
            qToks.as("_qtoks")), Seq(rowId))
          .withColumn("_score",
            lit(vectorWeight) * CosineSimilarity(col("_qe"), col("_ce")) +
              lit(1 - vectorWeight) * col("_ov") /
                greatest(size(col("_qtoks")).cast("double"), lit(1.0)))
      }
    attachTopK(withId, scored, rowId, outKey, k)
  }

  private def attachTopK(
      base: DataFrame, scored: DataFrame, rowId: String,
      outKey: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(rowId))
      .orderBy(col("_score").desc, col("_ctext").asc)
    val topk = scored
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .groupBy(col(rowId))
      .agg(concat_ws("\n---\n",
        sort_array(collect_list(struct(col("_rn"), col("_ctext"))))
          .getField("_ctext")).as(outKey))
    base.join(topk, Seq(rowId), "left").drop(rowId)
  }
}
