package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset parsing operator: applies a named parsing tool to a file column
  * and emits one output row per parsed document — the Spark shape of the
  * reference's dataset `parsing:` list, where each string a tool returns
  * becomes a copy of the item with `output_key` set
  * (reference docetl/dataset.py `_apply_parsing_tools`).
  *
  * The input column is the `content` binary column of a `binaryFile` load
  * (or any binary column); `txt` also accepts a string column. Parsing is a
  * pure narrow map — no shuffle, scales with input partitions; per-file
  * parse cost is bounded by the file's own size. Files-to-rows fan-out
  * happens via `explode`, so a deck of 40 slides parsed `doc_per_slide`
  * becomes 40 rows with every other column of the file's row carried along.
  */
object ParseOp {

  final case class Config(
      function: String, // txt | docx | pptx | xlsx | pdf (reference *_to_string)
      inputKey: String = "content",
      outputKey: String = "text",
      // function_kwargs (reference parsing_tools.py signatures):
      orientation: String = "col", // xlsx: col | row
      docPerSheet: Boolean = false, // xlsx
      docPerSlide: Boolean = false, // pptx
      docPerPage: Boolean = false, // pdf
      dropInput: Boolean = true, // drop the (large) binary column after parse
      posKey: Option[String] = None) // also emit the doc's index within its file

  /** Canonical function names, accepting the reference's `*_to_string`
    * aliases (parsing_tools.py:100-226). */
  private def canonical(name: String): String =
    name.stripSuffix("_to_string") match {
      case f @ ("txt" | "docx" | "pptx" | "xlsx" | "pdf") => f
      case other => throw new IllegalArgumentException(
        s"unknown parsing function '$other'; known: txt, docx, pptx, xlsx, pdf " +
          "(whisper/OCR/azure parsers need native runtimes outside this library)")
    }

  def apply(df: DataFrame, cfg: Config): DataFrame = {
    val f = canonical(cfg.function)
    val in = df.schema(cfg.inputKey).dataType.typeName match {
      case "binary" => col(cfg.inputKey)
      case "string" if f == "txt" => col(cfg.inputKey).cast("binary")
      case other => throw new IllegalArgumentException(
        s"parse input '${cfg.inputKey}' must be binary (got $other)")
    }
    val docs: Column = f match {
      case "txt" => txtUdf(in)
      case "docx" => docxUdf(in)
      case "pptx" => pptxUdf(lit(cfg.docPerSlide))(in)
      case "xlsx" => xlsxUdf(lit(cfg.orientation), lit(cfg.docPerSheet))(in)
      case "pdf" => pdfUdf(lit(cfg.docPerPage))(in)
    }
    val kept = df.columns
      .filter(c => !(cfg.dropInput && c == cfg.inputKey) && c != cfg.outputKey)
      .map(col).toSeq
    cfg.posKey match {
      case Some(p) => df.select(kept :+ posexplode(docs).as(Seq(p, cfg.outputKey)): _*)
      case None => df.select(kept :+ explode(docs).as(cfg.outputKey): _*)
    }
  }

  // Plain Scala UDFs: the parsers allocate (zip inflate, XML events) per
  // file, so codegen'd Expressions would buy nothing — the work is the
  // parse itself, not the row plumbing.
  private val txtUdf = udf((b: Array[Byte]) =>
    if (b == null) Seq.empty[String] else ParsingTools.txtToString(b))
  private val docxUdf = udf((b: Array[Byte]) =>
    if (b == null) Seq.empty[String] else ParsingTools.docxToString(b))
  private def pptxUdf(perSlide: Column) = udf((b: Array[Byte], ps: Boolean) =>
    if (b == null) Seq.empty[String] else ParsingTools.pptxToString(b, ps))
    .apply(_: Column, perSlide)
  private def xlsxUdf(orientation: Column, perSheet: Column) =
    udf((b: Array[Byte], o: String, s: Boolean) =>
      if (b == null) Seq.empty[String] else ParsingTools.xlsxToString(b, o, s))
      .apply(_: Column, orientation, perSheet)
  private def pdfUdf(perPage: Column) = udf((b: Array[Byte], pp: Boolean) =>
    if (b == null) Seq.empty[String] else ParsingTools.pdfToString(b, pp))
    .apply(_: Column, perPage)
}
