package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Markdown section segmentation — the structure-aware splitter for RAG
  * and document-QA prep: one row per heading-delimited section with its
  * level, heading text, and body. Where [[Segment]] respects SENTENCE
  * structure and `chunk_fixed` respects nothing, this respects the
  * AUTHOR's structure — the chunking that keeps "Installation" separate
  * from "License" (publicly standard: every RAG framework's
  * markdown/header text splitter; pairs with [[graft.sources
  * .HtmlToMarkdown]], whose output is exactly this op's input).
  *
  * Scale shape: the same marker technique as
  * [[CdcChunk.chunksByBoundary]] — heading lines (`^#{1,6} `) get a unit
  * marker prepended, ONE array_join + one split recover the sections,
  * and per-section heading/level/body are anchored regexp extracts.
  * Pure per-row expressions, O(|text|), no UDF, no shuffle,
  * oracle-replayable (RE2-safe anchored patterns).
  */
object MarkdownSegment {

  private val RS = "\u001e"

  /** One row per section: (id, section_idx, level, heading, body).
    * Content before the first heading becomes section 0 with level 0 and
    * an empty heading; a document with no headings is one such section.
    * Empty sections (back-to-back headings) keep their row — the heading
    * still carries retrieval signal — but a fully empty document yields
    * no rows. */
  def sections(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = split(coalesce(col(textCol), lit("")), "\n")
    val marked = transform(lines, l =>
      when(l.rlike("^#{1,6} "), concat(lit(RS), l)).otherwise(l))
    val secs = filter(split(array_join(marked, "\n"), RS),
      s => length(s) > 0)
    val exploded = df
      .select(col(idCol), posexplode(secs).as(Seq("section_idx", "_sec")))
    val sec = col("_sec")
    val hashes = regexp_extract(sec, "^(#{1,6}) ", 1)
    val level = length(hashes).cast("bigint")
    val heading = when(level > 0,
      regexp_extract(sec, "^#{1,6} ([^\n]*)", 1)).otherwise(lit(""))
    val body = regexp_replace(
      when(level > 0, regexp_replace(sec, "^#{1,6} [^\n]*\n?", ""))
        .otherwise(sec),
      "\n$", "")
    exploded.select(col(idCol),
      col("section_idx").cast("bigint").as("section_idx"),
      level.as("level"), heading.as("heading"), body.as("body"))
  }
}
