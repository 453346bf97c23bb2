package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Greedy in-order sequence packing — the training-prep step that groups
  * documents into fixed token-budget batches (one "pack" ≈ one training
  * sequence). Publicly standard in LLM data pipelines (e.g. the T5 /
  * GPT-NeoX packing recipes); the reference engine has no analog, but a 100
  * TB training-data engine needs it, so it is first-class here.
  *
  * Semantics: within each group (`groupCols`), rows in ascending `orderCol`
  * order append to the current pack while the pack's token total stays
  * within `budget`; a row that would overflow starts the next pack. A row
  * larger than the whole budget gets a pack of its own (never split, never
  * dropped — flag or split upstream with `SplitOp` if needed). Output = the
  * input columns plus `pack_id`, the 0-based per-group pack sequence.
  *
  * Scale design: packing is order-dependent, so each GROUP is inherently
  * sequential — the group key is the parallelism unit, exactly how
  * production pipelines pack per output shard. The plan is repartition by
  * group, sort within partitions by (group, order), then ONE streaming pass
  * per partition holding two scalars (current fill, pack counter) — no
  * group materialization, constant memory at any group size. Choose group
  * granularity (shard id, language × shard, …) to size the sequential unit;
  * there is no global coordination between groups.
  */
object PackOp {

  def apply(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      tokenExpr: String,
      budget: Long): DataFrame = {
    require(budget > 0, "pack budget must be positive")
    require(groupCols.nonEmpty, "pack needs at least one group column")
    require(!df.columns.contains("pack_id"), "input already has pack_id")
    require(!df.columns.contains("_graft_tok"), "reserved column _graft_tok")

    // Negative token counts are nonsensical for packing; clamp so a bad
    // expression degrades to "free" rows instead of corrupting fills.
    val projected = df.withColumn("_graft_tok",
      greatest(lit(0L), expr(tokenExpr).cast("long")))
    val parts = projected.repartition(groupCols.map(col): _*)
      .sortWithinPartitions((groupCols :+ orderCol).map(col): _*)

    // Plan-time positional indices (executor rows may be schema-less
    // GenericRows when object operators chain — see graft.llm.Template).
    val schema = projected.schema
    val gIdx = groupCols.map(schema.fieldIndex)
    val tokIdx = schema.fieldIndex("_graft_tok")
    val budgetB = budget

    val newSchema = StructType(
      df.schema.fields :+ StructField("pack_id", LongType, nullable = false))

    parts.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var packId = 0L
      var fill = 0L
      it.map { r =>
        val key = gIdx.map(r.get)
        if (key != curKey) { curKey = key; packId = 0L; fill = 0L }
        val tok = if (r.isNullAt(tokIdx)) 0L else r.getLong(tokIdx)
        if (fill > 0 && fill + tok > budgetB) { packId += 1; fill = tok }
        else fill += tok
        Row.fromSeq(r.toSeq.dropRight(1) :+ packId)
      }
    }(Encoders.row(newSchema))
  }

  /** Fixed-length sequence chunking — the GPT-style pretraining shape that
    * [[apply]]'s greedy packing is NOT: documents concatenate in
    * (`groupCols`, `orderCol`) order into one token stream per group, the
    * stream cuts at EXACTLY every `seqLen` tokens, and a document
    * straddling a cut is SPLIT across the adjacent chunks (no padding, no
    * waste). Output = one row per (document, chunk) overlap with
    * `chunk_id` (0-based per group), `tok_start` (offset within the
    * document), and `tok_len` — the slice of the document that lands in
    * that chunk. Downstream slices the text/token array with these
    * offsets; emitting offsets instead of materialized slices keeps the
    * shuffle payload to three longs per overlap.
    *
    * Scale shape: each document's stream offset is a keyed running-sum
    * window (partitioned by group — distributes across groups); the
    * (doc, chunk) fan-out is a bounded `sequence()` explode
    * (ceil(tokens/seqLen)+1 rows per doc). No sequential pass at all — the
    * chunk arithmetic is closed-form from the offset, so unlike greedy
    * packing this shape has no per-group serial dependency beyond the
    * window sum.
    */
  /** Best-fit-decreasing packing — the UTILIZATION-optimizing sibling of
    * [[apply]] (classic BFD bin packing, ≤ 11/9·OPT + 6/9 by Dósa's
    * bound): rows sort by token count DESC within the group and each row
    * lands in the open pack with the LEAST remaining capacity that still
    * fits (ties → lowest pack id; equal token counts → `orderCol` asc),
    * else opens a new pack. Use when packs are an unordered batch
    * inventory (padding waste = money); use [[apply]] when document
    * ORDER inside the group must survive (curriculum, dedup locality).
    *
    * Scale shape: same group-sequential plan as [[apply]] (repartition +
    * in-partition streaming pass), but per-group state is the open-pack
    * capacity multiset — O(#packs of the group) entries with O(log) per
    * row via a TreeMap, vs greedy's two scalars. Size groups (shards)
    * so a group's pack count fits comfortably in a task — the same
    * granularity choice packing already imposes. */
  def packBestFit(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      tokenExpr: String,
      budget: Long): DataFrame = {
    require(budget > 0, "pack budget must be positive")
    require(groupCols.nonEmpty, "pack needs at least one group column")
    require(!df.columns.contains("pack_id"), "input already has pack_id")
    require(!df.columns.contains("_graft_tok"), "reserved column _graft_tok")
    val projected = df.withColumn("_graft_tok",
      greatest(lit(0L), expr(tokenExpr).cast("long")))
    val parts = projected.repartition(groupCols.map(col): _*)
      .sortWithinPartitions(
        groupCols.map(col) ++ Seq(col("_graft_tok").desc, col(orderCol)): _*)
    val schema = projected.schema
    val gIdx = groupCols.map(schema.fieldIndex)
    val tokIdx = schema.fieldIndex("_graft_tok")
    val budgetB = budget
    val newSchema = StructType(
      df.schema.fields :+ StructField("pack_id", LongType, nullable = false))
    parts.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var nextPack = 0L
      // remaining capacity -> open pack ids with that capacity
      var open: java.util.TreeMap[Long, java.util.TreeSet[Long]] = null
      it.map { r =>
        val key = gIdx.map(r.get)
        if (key != curKey) {
          curKey = key; nextPack = 0L
          open = new java.util.TreeMap[Long, java.util.TreeSet[Long]]()
        }
        val tok = if (r.isNullAt(tokIdx)) 0L else r.getLong(tokIdx)
        val entry = open.ceilingEntry(tok)
        val packId =
          if (entry == null) {
            val id = nextPack; nextPack += 1
            val rem = budgetB - tok
            if (rem > 0) open.computeIfAbsent(rem,
              _ => new java.util.TreeSet[Long]()).add(id)
            id
          } else {
            val rem = entry.getKey
            val ids = entry.getValue
            val id = ids.first()
            ids.remove(id)
            if (ids.isEmpty) open.remove(rem)
            val left = rem - tok
            if (left > 0) open.computeIfAbsent(left,
              _ => new java.util.TreeSet[Long]()).add(id)
            id
          }
        Row.fromSeq(r.toSeq.dropRight(1) :+ packId)
      }
    }(Encoders.row(newSchema))
  }

  /** Truncation-budget report for a context length `seqLen`: ONE row —
    * how many documents exceed the budget, and what token mass a
    * hard-truncate-at-L collator would drop. The pre-flight between
    * [[graft.ops.Truncate]] (which cuts) and packing (which
    * concatenates): run this first to pick L, then cut. One aggregation
    * over integer sums — exact, order-free. */
  def truncationReport(df: DataFrame, lenExpr: String,
      seqLen: Long): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val len = expr(lenExpr).cast("bigint")
    val over = when(len > seqLen, lit(1L)).otherwise(lit(0L))
    val lost = when(len > seqLen, len - seqLen).otherwise(lit(0L))
    df.agg(
      count(lit(1)).as("docs"),
      sum(over).as("docs_over"),
      sum(len).as("tokens_total"),
      sum(lost).as("tokens_lost"))
      .select(col("docs"), col("docs_over"), col("tokens_total"),
        col("tokens_lost"),
        round(col("docs_over") / col("docs").cast("double"), 6)
          .as("frac_docs_over"),
        round(col("tokens_lost") /
          greatest(col("tokens_total"), lit(1L)).cast("double"), 6)
          .as("frac_tokens_lost"))
  }

  /** [[truncationReport]] over a GRID of candidate context lengths:
    * one row per seqLen, so the L-vs-loss tradeoff is one query instead
    * of a re-scan per candidate. The per-row length projects ONCE; the
    * bounded grid explodes against it (|grid| rows per doc, 2 narrow
    * columns) into a grid-keyed aggregation — integer sums, exact. */
  def truncationCurve(df: DataFrame, lenExpr: String,
      seqLens: Seq[Long]): DataFrame = {
    require(seqLens.nonEmpty, "need at least one seqLen")
    require(seqLens.forall(_ >= 1), s"seqLens must be >= 1, got $seqLens")
    require(seqLens.size <= 64, s"grid too large: ${seqLens.size} > 64")
    val sortedLens = seqLens.distinct.sorted
    val grid = array(sortedLens.map(lit): _*)
    val agg = df.select(expr(lenExpr).cast("bigint").as("_len"))
      .select(col("_len"), explode(grid).as("seq_len"))
      .groupBy("seq_len")
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("_len") > col("seq_len"), 1L).otherwise(0L))
          .as("docs_over"),
        sum(col("_len")).as("tokens_total"),
        sum(when(col("_len") > col("seq_len"),
          col("_len") - col("seq_len")).otherwise(0L)).as("tokens_lost"))
    // an EMPTY input still reports every grid row (zero counts, null
    // fracs) — a consumer indexing the curve by seq_len must not find
    // grid points silently missing
    val spark = df.sparkSession
    import spark.implicits._
    sortedLens.toDF("seq_len")
      .join(agg, Seq("seq_len"), "left")
      .select(col("seq_len"),
        coalesce(col("docs"), lit(0L)).as("docs"),
        coalesce(col("docs_over"), lit(0L)).as("docs_over"),
        coalesce(col("tokens_total"), lit(0L)).as("tokens_total"),
        coalesce(col("tokens_lost"), lit(0L)).as("tokens_lost"))
      .select(col("seq_len"), col("docs"), col("docs_over"),
        col("tokens_total"), col("tokens_lost"),
        when(col("docs") === 0, lit(null).cast("double"))
          .otherwise(round(col("docs_over") / col("docs").cast("double"),
            6)).as("frac_docs_over"),
        when(col("docs") === 0, lit(null).cast("double"))
          .otherwise(round(col("tokens_lost") /
            greatest(col("tokens_total"), lit(1L)).cast("double"), 6))
          .as("frac_tokens_lost"))
  }

  def chunkFixed(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      tokenExpr: String,
      seqLen: Long): DataFrame = {
    require(seqLen > 0, "chunkFixed seqLen must be positive")
    require(groupCols.nonEmpty, "chunkFixed needs at least one group column")
    Seq("chunk_id", "tok_start", "tok_len", "_graft_tok", "_graft_off")
      .foreach(c => require(!df.columns.contains(c), s"reserved column $c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val withOff = df
      .withColumn("_graft_tok", greatest(lit(0L), expr(tokenExpr).cast("long")))
      .withColumn("_graft_off",
        coalesce(sum(col("_graft_tok")).over(w), lit(0L)))
    withOff
      .filter(col("_graft_tok") > 0)
      .withColumn("chunk_id", explode(sequence(
        expr(s"_graft_off div ${seqLen}L"),
        expr(s"(_graft_off + _graft_tok - 1) div ${seqLen}L"))))
      .withColumn("tok_start",
        greatest(lit(0L), col("chunk_id") * seqLen - col("_graft_off")))
      .withColumn("tok_len",
        least(col("_graft_off") + col("_graft_tok"), (col("chunk_id") + 1) * seqLen)
          - greatest(col("_graft_off"), col("chunk_id") * seqLen))
      .drop("_graft_tok", "_graft_off")
  }
}
