package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-to-many / document-structure operators (SURVEY.md §2.8). */
object SplitOp {

  /** Chunk a text field (reference docetl/operations/split.py:11-162).
    *
    * Emits one row per chunk carrying `{splitKey}_chunk`, a per-source-doc id
    * `{name}_id`, and 1-based `{name}_chunk_num` (reference split.py:54-62).
    * The whole op is generator expressions (`posexplode` over a computed
    * chunk array) — fully distributed, no driver materialization.
    *
    * `docIdExpr`: the reference mints a uuid4 per source doc; callers that
    * need deterministic output (oracle tests) pass an expression over existing
    * columns instead. Default "uuid()" matches the reference.
    */
  def byTokenCount(
      df: DataFrame,
      name: String,
      splitKey: String,
      numTokens: Int,
      docIdExpr: String = "uuid()"): DataFrame = {
    require(numTokens > 0, "num_tokens must be positive")
    // Whitespace tokenization; the reference uses tiktoken (split.py:95-115) —
    // model tokenizers are not available offline, whitespace is the documented
    // stand-in and is what the oracle replicates.
    val tokens = split(col(splitKey), " ")
    val nChunks = ceil(size(tokens).cast("double") / numTokens).cast("int")
    val chunks = transform(
      sequence(lit(0), nChunks - 1),
      i => concat_ws(" ", slice(tokens, i * numTokens + 1, lit(numTokens))))
    explodeChunks(df, name, splitKey, chunks, docIdExpr)
  }

  /** Delimiter method: split on `delimiter`, group `numSplitsToGroup` pieces
    * per chunk, re-joined with the delimiter (reference split.py:117-160). */
  def byDelimiter(
      df: DataFrame,
      name: String,
      splitKey: String,
      delimiter: String,
      numSplitsToGroup: Int = 1,
      docIdExpr: String = "uuid()"): DataFrame = {
    require(numSplitsToGroup > 0, "num_splits_to_group must be positive")
    val pieces = split(col(splitKey), java.util.regex.Pattern.quote(delimiter))
    val n = numSplitsToGroup
    val nChunks = ceil(size(pieces).cast("double") / n).cast("int")
    val chunks = transform(
      sequence(lit(0), nChunks - 1),
      i => concat_ws(delimiter, slice(pieces, i * n + 1, lit(n))))
    explodeChunks(df, name, splitKey, chunks, docIdExpr)
  }

  private def explodeChunks(
      df: DataFrame,
      name: String,
      splitKey: String,
      chunks: Column,
      docIdExpr: String): DataFrame =
    df.withColumn(s"${name}_id", expr(docIdExpr))
      .select(col("*"), posexplode(chunks).as(Seq(s"${name}_chunk_num", s"${splitKey}_chunk")))
      .withColumn(s"${name}_chunk_num", col(s"${name}_chunk_num") + 1)
}

object UnnestOp {

  /** List field -> one row per element, element replaces the key (reference
    * docetl/operations/unnest.py:8-253). `keepEmpty` emits a null-element row
    * for empty/null lists (`explode_outer`). `recursive`+`depth` re-unnests.
    */
  def list(
      df: DataFrame,
      key: String,
      keepEmpty: Boolean = false,
      recursive: Boolean = false,
      depth: Int = 1): DataFrame = {
    val rounds = if (recursive) depth else 1
    (1 to rounds).foldLeft(df) { (d, _) =>
      val gen = if (keepEmpty) explode_outer(col(key)) else explode(col(key))
      d.withColumn(key, gen)
    }
  }

  /** Struct field -> expand `expandFields` into the parent row, keeping the
    * original column (reference unnest.py:95-103 dict case). */
  def struct(df: DataFrame, key: String, expandFields: Seq[String]): DataFrame =
    expandFields.foldLeft(df)((d, f) => d.withColumn(f, col(s"$key.$f")))
}

object UnnestColumnsOp {

  /** Struct column -> one top-level column per field (subset via `keys`),
    * source column dropped (reference docetl/operations/unnest_columns.py:8-109). */
  def apply(df: DataFrame, column: String, keys: Option[Seq[String]] = None): DataFrame = {
    val fields = keys.getOrElse {
      df.schema(column).dataType match {
        case s: org.apache.spark.sql.types.StructType => s.fieldNames.toSeq
        case other => throw new IllegalArgumentException(
          s"unnest_columns needs a struct column, got $other")
      }
    }
    fields.foldLeft(df)((d, f) => d.withColumn(f, col(s"$column.$f"))).drop(column)
  }
}

object GatherOp {

  /** Reassemble chunk context (reference docetl/operations/gather.py:9-363):
    * within each `docIdKey` group ordered by `orderKey`, render each chunk
    * with `previousCount` preceding and `nextCount` following chunks, writing
    * `{contentKey}_rendered` (gather.py:45-50,139-141).
    *
    * Spark-first: a single window (`partitionBy(docId).orderBy(order)`) with
    * bounded `rowsBetween` frames — one shuffle on the doc id, no
    * per-group driver logic, scales to any number of documents.
    *
    * Rendered format (ours, documented): previous chunks joined by "\n", then
    * the marked current chunk, then next chunks, sections separated by "\n".
    * Sections outside the window get a skip marker like the reference's
    * "[... N characters skipped ...]" when `skipMarkers` is set.
    */
  def apply(
      df: DataFrame,
      contentKey: String,
      docIdKey: String,
      orderKey: String,
      previousCount: Int = 1,
      nextCount: Int = 1,
      /** Adds "[... N characters skipped ...]" markers for document content
        * outside the rendered window (reference gather.py skipped-content
        * markers). Computed with two more bounded window sums — no extra
        * shuffle (same window spec). */
      skipMarkers: Boolean = false,
      /** Markdown header-hierarchy breadcrumbs (reference gather.py
        * `doc_header_key`): a column of array<struct<level:int,
        * header:string>> per chunk; the rendering is prefixed with the most
        * recent header at each level above the current chunk — computed with
        * `last(_, ignoreNulls)` over the same window, no extra shuffle. */
      headersCol: Option[String] = None,
      maxHeaderLevel: Int = 3): DataFrame = {
    val w = Window.partitionBy(col(docIdKey)).orderBy(col(orderKey))
    val prev = collect_list(col(contentKey)).over(w.rowsBetween(-previousCount, -1))
    val next = collect_list(col(contentKey)).over(w.rowsBetween(1, nextCount))
    // Empty sections become NULL so concat_ws drops them (no stray separators
    // on the first/last chunk) — mirrored exactly by the DuckDB oracle's
    // lag/lead NULL behavior.
    def section(c: Column): Column = when(size(c) > 0, concat_ws("\n", c))
    val skippedBefore = sum(length(col(contentKey)))
      .over(w.rowsBetween(Window.unboundedPreceding, -previousCount - 1))
    val skippedAfter = sum(length(col(contentKey)))
      .over(w.rowsBetween(nextCount + 1, Window.unboundedFollowing))
    def marker(c: Column): Column =
      when(c.isNotNull && c > 0, concat(lit("[... "), c, lit(" characters skipped ...]")))
    // Breadcrumbs: per level, the last header at that level seen up to and
    // including this chunk (ignoreNulls over an unbounded-preceding frame).
    val breadcrumbs = headersCol.map { hc =>
      val levels = (1 to maxHeaderLevel).map { l =>
        val atLevel = try_element_at(
          filter(col(hc), h => h.getField("level") === l).getField("header"), lit(-1))
        val carried = last(atLevel, ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, 0))
        when(carried.isNotNull, concat(lit("#" * l + " "), carried))
      }
      concat_ws("\n", levels: _*)
    }
    val parts =
      breadcrumbs.map(b => when(length(b) > 0, b)).toSeq ++
        (if (skipMarkers) Seq(marker(skippedBefore)) else Nil) ++
        Seq(section(prev),
          concat(lit("--- current ---\n"), col(contentKey)),
          section(next)) ++
        (if (skipMarkers) Seq(marker(skippedAfter)) else Nil)
    df.withColumn(s"${contentKey}_rendered", concat_ws("\n", parts: _*))
  }
}
