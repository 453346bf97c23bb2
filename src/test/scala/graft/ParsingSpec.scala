package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.{ParseOp, ParsingTools => PT}

/** Round-5: pure-JVM office parsers (reference parsing_tools.py:100-226)
  * and the parse operator over binaryFile loads. */
class ParsingToolsSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("txt decodes utf-8") {
    assert(PT.txtToString("héllo\nwörld".getBytes("UTF-8")) == Seq("héllo\nwörld"))
  }

  test("docx round-trip: paragraphs, escaping, one document") {
    val paras = Seq("first para", "a & b < c > d \"quoted\"", "", "last")
    val docs = PT.docxToString(PT.makeDocx(paras))
    assert(docs == Seq(paras.mkString("\n")))
  }

  test("docx without document.xml yields empty text") {
    assert(PT.docxToString(PT.makePptx(Seq(Seq("x")))) == Seq(""))
  }

  test("pptx round-trip: slide numeric order past 9, per-slide and whole-deck") {
    // 12 slides so lexicographic entry order (slide10 < slide2) would fail
    val slides = (1 to 12).map(i => Seq(s"slide $i title", s"slide $i body"))
    val bytes = PT.makePptx(slides)
    val perSlide = PT.pptxToString(bytes, docPerSlide = true)
    assert(perSlide.length == 12)
    assert(perSlide(9) == "slide 10 title\nslide 10 body")
    val whole = PT.pptxToString(bytes)
    assert(whole == Seq(slides.map(_.mkString("\n")).mkString("\n")))
  }

  test("xlsx round-trip: row and col orientation") {
    val bytes = PT.makeXlsx(Seq("name", "qty"), Seq(Seq("ax", "1"), Seq("by", "2")))
    assert(PT.xlsxToString(bytes, orientation = "row") ==
      Seq("name: ax | qty: 1\nname: by | qty: 2"))
    assert(PT.xlsxToString(bytes, orientation = "col") ==
      Seq("name: ax\nby\n\nqty: 1\n2\n"))
  }

  test("xlsx shared-string and typed cells parse (external producer shape)") {
    // Hand-built archive using sharedStrings + numeric/bool cells — the
    // parts a real Excel writer emits (our writer uses inline strings).
    val sheet =
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2"><v>42</v></c><c r="C2" t="b"><v>1</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val shared =
      """<?xml version="1.0"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<si><t>k</t></si><si><t>n</t></si><si><t>ok</t></si><si><t>row one</t></si>
        |</sst>""".stripMargin
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    Seq("xl/worksheets/sheet1.xml" -> sheet, "xl/sharedStrings.xml" -> shared).foreach {
      case (n, c) =>
        z.putNextEntry(new java.util.zip.ZipEntry(n)); z.write(c.getBytes("UTF-8")); z.closeEntry()
    }
    z.close()
    assert(PT.xlsxToString(bos.toByteArray, orientation = "row") ==
      Seq("k: row one | n: 42 | ok: true"))
  }

  test("column letters map to indices") {
    assert(PT.colIndex("A") == 0)
    assert(PT.colIndex("Z") == 25)
    assert(PT.colIndex("AA") == 26)
    assert(PT.colIndex("AB") == 27)
  }
}

class ParseOpSpec extends SparkSpec {

  test("binaryFile -> docx parse explodes one row per file, drops bytes") {
    val dir = Files.createTempDirectory("graft_parseop").toString
    Seq("alpha one" -> "a.docx", "beta two\ngamma" -> "b.docx").foreach { case (text, name) =>
      Files.write(Paths.get(dir, name), PT.makeDocx(text.split("\n").toSeq))
    }
    val files = spark.read.format("binaryFile").load(dir)
    val out = ParseOp(files, ParseOp.Config(function = "docx"))
    assert(!out.columns.contains("content"))
    val byName = out.selectExpr("regexp_extract(path, '([ab])\\\\.docx', 1) f", "text")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byName == Map("a" -> "alpha one", "b" -> "beta two\ngamma"))
  }

  test("pptx doc_per_slide with posKey numbers slides") {
    val dir = Files.createTempDirectory("graft_parseop").toString
    Files.write(Paths.get(dir, "d.pptx"), PT.makePptx(Seq(Seq("s0"), Seq("s1"), Seq("s2"))))
    val out = ParseOp(
      spark.read.format("binaryFile").load(dir),
      ParseOp.Config(function = "pptx", docPerSlide = true, posKey = Some("slide")))
    assert(out.select("slide", "text").collect().map(r => (r.getInt(0), r.getString(1)))
      .sortBy(_._1).toSeq == Seq((0, "s0"), (1, "s1"), (2, "s2")))
  }

  test("txt accepts a string column") {
    val schema = StructType(Seq(StructField("body", StringType)))
    val out = ParseOp(df(schema, Row("plain")),
      ParseOp.Config(function = "txt_to_string", inputKey = "body", outputKey = "text",
        dropInput = false))
    assert(out.select("body", "text").collect().toSeq == Seq(Row("plain", "plain")))
  }

  test("pdf round-trips text through FlateDecode streams") {
    val pages = Seq(
      Seq("first line", "second (with parens)", "back\\slash"),
      Seq("page two"))
    val bytes = PT.makePdf(pages)
    // whole-doc mode: pages joined by newline
    assert(PT.pdfToString(bytes) ==
      Seq("first line\nsecond (with parens)\nback\\slash\npage two"))
    // per-page mode
    assert(PT.pdfToString(bytes, docPerPage = true) ==
      Seq("first line\nsecond (with parens)\nback\\slash", "page two"))
    // the output is a structurally valid PDF: header, xref, trailer
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(s.startsWith("%PDF-1.4") && s.contains("xref") && s.endsWith("%%EOF\n"))
  }

  test("pdf /Length delimits an uncompressed stream containing 'endstream'") {
    // An uncompressed content stream whose TEXT contains the word
    // "endstream": the declared /Length must frame it (the keyword scan
    // alone would truncate the stream mid-string).
    val content = "BT (before endstream after) Tj ET"
    val pdf = s"%PDF-1.4\n1 0 obj\n<< /Length ${content.length} >>\nstream\n" +
      content + "\nendstream\nendobj\n%%EOF\n"
    val bytes = pdf.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PT.pdfToString(bytes) == Seq("before endstream after"))
    // A stale /Length (no endstream at the declared offset) falls back to
    // the scan instead of mis-framing.
    val bad = s"%PDF-1.4\n1 0 obj\n<< /Length 9999 >>\nstream\nBT (ok) Tj ET\nendstream\nendobj\n"
    assert(PT.pdfToString(bad.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)) ==
      Seq("ok"))
  }

  test("pdf parse op explodes pages to rows") {
    val schema = StructType(Seq(StructField("content", BinaryType)))
    val bytes = PT.makePdf(Seq(Seq("alpha"), Seq("beta")))
    val out = ParseOp(df(schema, Row(bytes)),
      ParseOp.Config(function = "pdf", docPerPage = true))
    assert(out.collect().map(_.getString(0)).toSeq == Seq("alpha", "beta"))
  }

  test("unknown function fails loudly") {
    val schema = StructType(Seq(StructField("content", BinaryType)))
    intercept[IllegalArgumentException] {
      ParseOp(df(schema, Row(Array[Byte]())), ParseOp.Config(function = "whisper"))
    }
  }

  test("yaml pipeline applies dataset parsing list") {
    val dir = Files.createTempDirectory("graft_parseyaml").toString
    Files.write(Paths.get(dir, "doc.docx"), PT.makeDocx(Seq("from yaml")))
    val yaml =
      s"""datasets:
         |  files:
         |    path: $dir
         |    format: binaryFile
         |    parsing:
         |      - function: docx_to_string
         |        output_key: text
         |pipeline:
         |  steps:
         |    - name: s1
         |      input: files
         |      operations:
         |        - type: select
         |          columns: ["text"]
         |""".stripMargin
    val out = graft.api.Pipeline.runYaml(yaml, spark)
    assert(out.collect().map(_.getString(0)).toSeq == Seq("from yaml"))
  }
}
