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
      docPerChapter: Boolean = false, // epub
      dropInput: Boolean = true, // drop the (large) binary column after parse
      posKey: Option[String] = None, // also emit the doc's index within its file
      /** Corrupt-file policy: a file whose parse throws yields ZERO rows
        * instead of failing the query. Off by default (fail loudly); at
        * 100 TB one truncated archive in a million files must not kill a
        * day-long job, so batch-ingest pipelines turn this on. */
      skipOnError: Boolean = false)

  /** Canonical function names, accepting the reference's `*_to_string`
    * aliases (parsing_tools.py:100-226). */
  private def canonical(name: String): String =
    name.stripSuffix("_to_string") match {
      case f @ ("txt" | "docx" | "pptx" | "xlsx" | "pdf" | "warc" |
                "eml" | "mbox" | "epub") => f
      case other => throw new IllegalArgumentException(
        s"unknown parsing function '$other'; known: txt, docx, pptx, xlsx, " +
          "pdf, warc, eml, mbox, epub " +
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
    val skip = lit(cfg.skipOnError)
    val docs: Column = f match {
      case "txt" => txtUdf(skip)(in)
      case "docx" => docxUdf(skip)(in)
      case "pptx" => pptxUdf(lit(cfg.docPerSlide), skip)(in)
      case "xlsx" => xlsxUdf(lit(cfg.orientation), lit(cfg.docPerSheet), skip)(in)
      case "pdf" => pdfUdf(lit(cfg.docPerPage), skip)(in)
      case "warc" => warcUdf(skip)(in)
      case "eml" => emlUdf(skip)(in)
      case "mbox" => mboxUdf(skip)(in)
      case "epub" => epubUdf(lit(cfg.docPerChapter), skip)(in)
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
  private def guarded(skip: Boolean)(parse: => Seq[String]): Seq[String] =
    if (!skip) parse
    else try parse catch { case _: Exception => Seq.empty[String] }
  private def txtUdf(skip: Column) = udf((b: Array[Byte], sk: Boolean) =>
    if (b == null) Seq.empty[String] else guarded(sk)(ParsingTools.txtToString(b)))
    .apply(_: Column, skip)
  private def docxUdf(skip: Column) = udf((b: Array[Byte], sk: Boolean) =>
    if (b == null) Seq.empty[String] else guarded(sk)(ParsingTools.docxToString(b)))
    .apply(_: Column, skip)
  private def pptxUdf(perSlide: Column, skip: Column) =
    udf((b: Array[Byte], ps: Boolean, sk: Boolean) =>
      if (b == null) Seq.empty[String] else guarded(sk)(ParsingTools.pptxToString(b, ps)))
      .apply(_: Column, perSlide, skip)
  private def xlsxUdf(orientation: Column, perSheet: Column, skip: Column) =
    udf((b: Array[Byte], o: String, s: Boolean, sk: Boolean) =>
      if (b == null) Seq.empty[String] else guarded(sk)(ParsingTools.xlsxToString(b, o, s)))
      .apply(_: Column, orientation, perSheet, skip)
  private def pdfUdf(perPage: Column, skip: Column) =
    udf((b: Array[Byte], pp: Boolean, sk: Boolean) =>
      if (b == null) Seq.empty[String] else guarded(sk)(ParsingTools.pdfToString(b, pp)))
      .apply(_: Column, perPage, skip)
  private def warcUdf(skip: Column) = udf((b: Array[Byte], sk: Boolean) =>
    if (b == null) Seq.empty[String] else guarded(sk)(ParsingTools.warcToString(b)))
    .apply(_: Column, skip)
  private def emlUdf(skip: Column) = udf((b: Array[Byte], sk: Boolean) =>
    if (b == null) Seq.empty[String] else guarded(sk)(ParsingTools.emlToString(b)))
    .apply(_: Column, skip)
  private def mboxUdf(skip: Column) = udf((b: Array[Byte], sk: Boolean) =>
    if (b == null) Seq.empty[String] else guarded(sk)(ParsingTools.mboxToString(b)))
    .apply(_: Column, skip)
  private def epubUdf(perChapter: Column, skip: Column) =
    udf((b: Array[Byte], pc: Boolean, sk: Boolean) =>
      if (b == null) Seq.empty[String]
      else guarded(sk)(ParsingTools.epubToString(b, pc)))
      .apply(_: Column, perChapter, skip)
}
