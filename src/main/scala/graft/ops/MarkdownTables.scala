package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Markdown pipe-table extraction — explode GFM tables into typed
  * (table, row, column, header, cell) rows: the structure-aware
  * companion to [[MarkdownSegment]] for RAG/document-QA prep, where a
  * table's cells answer questions its prose never states. Follows the
  * publicly documented GitHub-Flavored-Markdown table grammar: a run of
  * `| … |` lines whose SECOND line is the `|---|:---:|` delimiter row;
  * runs without a valid delimiter are prose and yield nothing.
  *
  * Scale shape: entirely ROW-LOCAL — table runs are recovered with the
  * same unit-marker technique as [[MarkdownSegment]] (mark each run's
  * first line, ONE array_join + split), then tables/rows/cells are
  * nested posexplodes of per-row arrays with the header carried as an
  * array alongside (element_at lookup — never a join back to the header
  * row). No UDF, no shuffle; fan-out is the true cell count. Escaped
  * pipes (`\|`) stage through a unit separator so cell text survives.
  */
object MarkdownTables {

  private val RS = "\u001e"   // run-start marker
  private val PIPE = "\u001f" // escaped-pipe placeholder

  private def isTableLine(l: Column): Column =
    l.rlike("^\\s*\\|.*\\|\\s*$")

  /** One row per cell: (id, table_idx, row_idx, col_idx, header, cell).
    * `table_idx` numbers valid tables per document in order; `row_idx`
    * numbers DATA rows (header and delimiter are structural); `header`
    * is the column's header text ('' when the data row is wider than
    * the header). Cells trim surrounding whitespace; `\|` escapes
    * produce literal pipes. */
  def cells(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = regexp_replace(coalesce(col(textCol), lit("")),
      "\\\\\\|", PIPE)
    val lines = split(text, "\n")
    // Mark the FIRST line of every table-line run, then one join+split
    // recovers blocks beginning at each run (block 0 may be preamble).
    val marked = zip_with(lines,
      concat(array(lit("")), slice(lines, lit(1),
        greatest(size(lines) - 1, lit(0)))),
      (l, prev) => when(isTableLine(l) && !isTableLine(prev),
        concat(lit(RS), l)).otherwise(l))
    val blocks = filter(split(array_join(marked, "\n"), RS),
      b => length(b) > 0)
    // A block's table = its LEADING table lines; valid iff line 2 is the
    // GFM delimiter row — EVERY cell must be `:?-+:?` (a lax any-mix-of-
    // dash/colon/space check would validate prose blocks real Markdown
    // renderers reject).
    def delimCells(line: Column): Column = transform(
      split(regexp_replace(regexp_replace(line,
        "^\\s*\\|", ""), "\\|\\s*$", ""), "\\|"),
      c => trim(c))
    val tables = filter(
      transform(blocks, b =>
        filter(split(b, "\n"), l => isTableLine(l))),
      t => {
        val d = coalesce(get(t, lit(1)), lit(""))
        size(t) >= 2 &&
          isTableLine(coalesce(get(t, lit(0)), lit(""))) &&
          isTableLine(d) &&
          forall(delimCells(d), c => c.rlike("^:?-+:?$"))
      })
    // Keep only the CONTIGUOUS leading run: filter(split(b)) above would
    // also swallow a second table in the same block — impossible, since
    // every run start opens a new block by construction.
    def cellsOf(line: Column): Column = transform(
      split(regexp_replace(regexp_replace(line,
        "^\\s*\\|", ""), "\\|\\s*$", ""), "\\|"),
      c => regexp_replace(trim(c), PIPE, "|"))
    val withTables = df
      .select(col(idCol),
        posexplode(tables).as(Seq("table_idx", "_t")))
      .select(col(idCol), col("table_idx").cast("bigint").as("table_idx"),
        cellsOf(get(col("_t"), lit(0))).as("_hdr"),
        posexplode(slice(col("_t"), lit(3),
          greatest(size(col("_t")) - 2, lit(0))))
          .as(Seq("row_idx", "_row")))
    withTables
      .select(col(idCol), col("table_idx"),
        col("row_idx").cast("bigint").as("row_idx"), col("_hdr"),
        posexplode(cellsOf(col("_row"))).as(Seq("col_idx", "cell")))
      .select(col(idCol), col("table_idx"), col("row_idx"),
        col("col_idx").cast("bigint").as("col_idx"),
        coalesce(get(col("_hdr"), col("col_idx")), lit(""))
          .as("header"),
        col("cell"))
  }
}
