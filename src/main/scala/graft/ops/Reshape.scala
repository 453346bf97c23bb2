package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
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

  /** One side's peripheral sections (reference gather.py:234-292
    * `process_peripheral_chunks`): `head` = the first `headCount` chunks of
    * the side's list, `tail` = its last `tailCount`, `middle` = everything
    * between rendered with an alternate (summary) content key when
    * configured; un-sectioned chunks collapse into
    * "[... N characters skipped ...]" runs. Each section may use its own
    * content key; a non-default key tags the chunk "(Summary)". */
  final case class SectionSpec(
      headCount: Int = 0, headContentKey: Option[String] = None,
      hasMiddle: Boolean = false, middleContentKey: Option[String] = None,
      tailCount: Int = 0, tailContentKey: Option[String] = None)

  /** Full-fidelity peripheral rendering (reference gather.py:144-292): the
    * "--- Previous Context --- / --- End Previous Context ---" framing,
    * "[Chunk <order>]" prefixes, per-section content keys with "(Summary)"
    * tags, skipped-character runs, and `_Current Section:_` hierarchy
    * headers from `docHeaderKey`.
    *
    * Plan shape: ONE window (docId, order) producing each row's whole
    * preceding/following side as a collected struct array, assembled by an
    * executor-local UDF. The per-row side arrays make the rendered output
    * O(chunks²) characters per document — inherent to the semantics (the
    * reference renders the same); keep documents bounded (they are chunk
    * groups of one source doc) or configure head/tail counts without
    * `middle` so the skip runs replace the body. */
  def withPeripheralSections(
      df: DataFrame,
      contentKey: String,
      docIdKey: String,
      orderKey: String,
      previous: SectionSpec = SectionSpec(),
      next: SectionSpec = SectionSpec(),
      mainChunkStart: String = "--- Begin Main Chunk ---",
      mainChunkEnd: String = "--- End Main Chunk ---",
      docHeaderKey: Option[String] = None): DataFrame = {
    val w = Window.partitionBy(col(docIdKey)).orderBy(col(orderKey))
    // Scala UDFs cannot take struct (Row) inputs — chunks pack into
    // array<string> [order, content, headC, midC, tailC], headers into
    // "level\u0001header" strings.
    def sideChunk(spec: SectionSpec) = array(
      col(orderKey).cast("string"),
      col(contentKey).cast("string"),
      col(spec.headContentKey.getOrElse(contentKey)).cast("string"),
      col(spec.middleContentKey.getOrElse(contentKey)).cast("string"),
      col(spec.tailContentKey.getOrElse(contentKey)).cast("string"))
    val prevSide = collect_list(sideChunk(previous))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val nextSide = collect_list(sideChunk(next))
      .over(w.rowsBetween(1, Window.unboundedFollowing))
    val headersUpTo = docHeaderKey match {
      case Some(hk) => collect_list(coalesce(
          transform(col(hk), h => concat_ws("\u0001",
            h.getField("level").cast("string"), h.getField("header"))),
          array().cast("array<string>")))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
      case None => lit(null).cast("array<array<string>>")
    }
    val prevB = previous; val nextB = next
    val ck = contentKey
    val renderUdf = udf((prev: Seq[Seq[String]], nxt: Seq[Seq[String]], content: String,
        headers: Seq[Seq[String]]) => {
      val parts = Seq.newBuilder[String]
      parts += "--- Previous Context ---"
      parts ++= renderSide(prev, prevB, ck)
      parts += "--- End Previous Context ---\n"
      val hdr = renderHierarchyHeaders(headers)
      if (hdr.nonEmpty) parts += hdr
      parts += mainChunkStart
      parts += content
      parts += mainChunkEnd
      parts += "\n--- Next Context ---"
      parts ++= renderSide(nxt, nextB, ck)
      parts += "--- End Next Context ---"
      parts.result().mkString("\n")
    })
    df.withColumn(s"${contentKey}_rendered",
      renderUdf(prevSide, nextSide, col(contentKey).cast("string"), headersUpTo))
  }

  /** Port of process_peripheral_chunks (gather.py:234-292). Chunk layout
    * (fixed at construction): [order, content, headC, midC, tailC] —
    * content (index 1) is the skip-char counting basis. */
  private def renderSide(chunks: Seq[Seq[String]], spec: SectionSpec, contentKey: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val total = if (chunks == null) 0 else chunks.length
    var inSkip = false
    var skipChars = 0L
    var i = 0
    while (i < total) {
      val chunk = chunks(i)
      val sectionOpt =
        if (i < spec.headCount) Some((2, spec.headContentKey))
        else if (i >= total - spec.tailCount) Some((4, spec.tailContentKey))
        else if (spec.hasMiddle) Some((3, spec.middleContentKey))
        else None
      sectionOpt match {
        case None =>
          val skipped = Option(chunk(1)).map(_.length).getOrElse(0)
          if (!inSkip) { skipChars = skipped; inSkip = true } else skipChars += skipped
        case Some((fieldIdx, keyOpt)) =>
          if (inSkip) {
            out += s"[... $skipChars characters skipped ...]"
            inSkip = false; skipChars = 0
          }
          val isSummary = keyOpt.exists(_ != contentKey)
          val suffix = if (isSummary) " (Summary)" else ""
          out += s"[Chunk ${chunk.head}$suffix]"
          out += String.valueOf(chunk(fieldIdx))
      }
      i += 1
    }
    if (inSkip) out += s"[... $skipChars characters skipped ...]"
    out.result()
  }

  /** Port of render_hierarchy_headers (gather.py:294-363): hierarchy of the
    * most recent header per level across all chunks up to the current one,
    * rendered above the main chunk for levels higher than the current
    * chunk's own highest header. Headers arrive packed as
    * "<level>\u0001<header>" strings. */
  private def renderHierarchyHeaders(headersUpTo: Seq[Seq[String]]): String = {
    if (headersUpTo == null || headersUpTo.isEmpty) return ""
    def unpack(s: String): Option[(Int, String)] = {
      val i = if (s == null) -1 else s.indexOf('\u0001')
      if (i <= 0) None
      else s.substring(0, i).toIntOption.map(_ -> s.substring(i + 1))
    }
    val currentHeaders = Option(headersUpTo.last).getOrElse(Seq.empty).flatMap(unpack)
    if (currentHeaders.isEmpty) return ""
    val highest = currentHeaders.map(_._1).min
    val hierarchy = scala.collection.mutable.SortedMap[Int, String]()
    headersUpTo.foreach { hs =>
      Option(hs).getOrElse(Seq.empty).flatMap(unpack).foreach { case (l, h) =>
        if (h.nonEmpty && l > 0) {
          hierarchy(l) = h
          hierarchy.keys.filter(_ > l).toSeq.foreach(hierarchy.remove)
        }
      }
    }
    val rendered = hierarchy.toSeq.collect {
      case (l, h) if l < highest => s"${"#" * l} $h"
    }.mkString(" > ")
    if (rendered.nonEmpty) s"_Current Section:_ $rendered" else ""
  }
}
