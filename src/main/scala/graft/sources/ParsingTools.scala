package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** Pure-JVM document parsers — the JVM-feasible subset of the reference's
  * parsing tools (reference docetl/parsing_tools.py:100-226: txt_to_string,
  * docx_to_string, xlsx_to_string, pptx_to_string). Office OOXML formats are
  * zip archives of XML parts, so `java.util.zip` + the JDK's StAX reader
  * cover them with no external codecs. Audio (whisper) and OCR parsers need
  * native models and are out of sandbox scope — their load path
  * (`binaryFile` datasets) is shared with these.
  *
  * Every parser maps one file's bytes to a list of documents, mirroring the
  * reference contract where each returned string becomes its own item copy
  * (dataset.py `_apply_parsing_tools`).
  *
  * The matching `make*` writers build minimal valid archives for the same
  * parts the parsers read. They exist for round-trip tests and fixtures, and
  * double as simple sinks.
  */
object ParsingTools {

  // -------------------------------------------------------------- readers

  /** UTF-8 decode, one document (parsing_tools.py:157). */
  def txtToString(bytes: Array[Byte]): Seq[String] = Seq(new String(bytes, UTF_8))

  // ---- RFC 5322 email / mbox (email corpora are a standard training-data
  // source; formats are fully public: RFC 5322 message syntax, RFC 2045
  // Content-Transfer-Encoding, the classic mboxo mailbox layout)

  /** One parsed message: lowercased unfolded header map + DECODED body. */
  final case class EmlMessage(headers: Map[String, String], body: String) {
    def subject: String = headers.getOrElse("subject", "")
    def from: String = headers.getOrElse("from", "")
  }

  /** RFC 5322 single-part message parser: headers unfold (continuation
    * lines starting with WSP re-join), the body decodes per
    * `Content-Transfer-Encoding` (quoted-printable / base64 / identity).
    * Multipart messages return their raw body undecoded (the outer
    * envelope has no transfer encoding to undo) — splitting MIME parts is
    * the caller's policy decision. */
  def parseEml(bytes: Array[Byte]): EmlMessage = {
    val s = new String(bytes, UTF_8)
    // the header block ends at whichever blank line comes FIRST — an
    // LF-terminated message whose body happens to contain a CRLF blank
    // line must still split at its own (earlier) LF separator
    val iCrlf = s.indexOf("\r\n\r\n")
    val iLf = s.indexOf("\n\n")
    val sep =
      if (iCrlf >= 0 && (iLf < 0 || iCrlf <= iLf)) ("\r\n\r\n", "\r\n")
      else ("\n\n", "\n")
    val cut = s.indexOf(sep._1)
    val (headText, body) =
      if (cut < 0) (s, "") else (s.substring(0, cut), s.substring(cut + sep._1.length))
    // unfold: a line starting with space/tab continues the previous header
    val unfolded = scala.collection.mutable.ArrayBuffer.empty[String]
    headText.split(sep._2, -1).foreach { line =>
      if (line.nonEmpty && (line.head == ' ' || line.head == '\t') &&
        unfolded.nonEmpty)
        unfolded(unfolded.length - 1) = unfolded.last + " " + line.trim
      else unfolded += line
    }
    val headers = unfolded.iterator.flatMap { line =>
      val i = line.indexOf(':')
      if (i <= 0) None
      else Some(line.substring(0, i).trim.toLowerCase ->
        line.substring(i + 1).trim)
    }.toMap
    val decoded =
      headers.getOrElse("content-transfer-encoding", "").toLowerCase match {
        case "quoted-printable" => decodeQuotedPrintable(body)
        case "base64" => new String(
          java.util.Base64.getMimeDecoder.decode(body.trim), UTF_8)
        case _ => body
      }
    EmlMessage(headers, decoded)
  }

  /** RFC 2045 quoted-printable decode: `=XX` hex escapes + `=`‑newline
    * soft line breaks; anything malformed passes through literally (the
    * robustness rule the RFC prescribes for decoders). */
  private[graft] def decodeQuotedPrintable(s: String): String = {
    val out = new ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=' && i + 1 < s.length && s.charAt(i + 1) == '\n') i += 2
      else if (c == '=' && i + 2 < s.length && s.charAt(i + 1) == '\r' &&
        s.charAt(i + 2) == '\n') i += 3
      else if (c == '=' && i + 2 < s.length &&
        isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else { out.write(s.charAt(i).toInt & 0xff); i += 1 }
    }
    // QP operates on bytes; our writer only encodes ASCII inputs, and
    // multi-byte escapes concatenate as raw UTF-8 bytes here.
    new String(out.toByteArray, UTF_8)
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')

  /** Split a classic mboxo mailbox into messages: separator = a line
    * starting with `"From "`; body lines that start with `From ` are
    * `>`-stuffed by the writer and un-stuffed here (one `>` removed from
    * any `>...>From ` line, per the mboxo convention). */
  def mboxMessages(bytes: Array[Byte]): Seq[EmlMessage] = {
    val lines = new String(bytes, UTF_8).split("\n", -1)
    val msgs = scala.collection.mutable.ArrayBuffer
      .empty[scala.collection.mutable.ArrayBuffer[String]]
    lines.foreach { line =>
      if (line.startsWith("From "))
        msgs += scala.collection.mutable.ArrayBuffer.empty[String]
      else if (msgs.nonEmpty) {
        val unstuffed =
          if (line.matches("^>+From .*")) line.substring(1) else line
        msgs.last += unstuffed
      }
    }
    // the mailbox's final "\n" leaves one trailing empty line per split —
    // drop it so message bytes round-trip exactly
    msgs.toSeq.map { ls =>
      val t = if (ls.nonEmpty && ls.last.isEmpty) ls.init else ls.toSeq
      parseEml(t.mkString("\n").getBytes(UTF_8))
    }
  }

  /** One document per message: decoded body text (headers reachable via
    * [[mboxMessages]] for structured use). */
  def mboxToString(bytes: Array[Byte]): Seq[String] =
    mboxMessages(bytes).map(_.body)

  def emlToString(bytes: Array[Byte]): Seq[String] =
    Seq(parseEml(bytes).body)

  // writers ----------------------------------------------------------

  /** Build a single-part RFC 5322 message. `encoding`: `7bit` (identity),
    * `quoted-printable` (every `=` escaped plus a deterministic extra
    * escape per 5th char, soft-wrapped at 72), or `base64` (MIME-wrapped
    * at 76). */
  def makeEml(headers: Seq[(String, String)], body: String,
      encoding: String = "7bit"): Array[Byte] = {
    val (cte, encoded) = encoding match {
      case "7bit" => ("7bit", body)
      case "quoted-printable" =>
        val sb = new StringBuilder
        var lineLen = 0
        body.getBytes(UTF_8).zipWithIndex.foreach { case (b, i) =>
          val piece =
            if (b == '='.toByte || b < 0x20 && b != '\n'.toByte || b < 0 ||
              i % 5 == 0) f"=${b & 0xff}%02X"
            else (b & 0xff).toChar.toString
          if (lineLen + piece.length > 72) { sb.append("=\n"); lineLen = 0 }
          sb.append(piece); lineLen += piece.length
        }
        ("quoted-printable", sb.toString)
      case "base64" =>
        ("base64", java.util.Base64.getMimeEncoder(76, "\n".getBytes)
          .encodeToString(body.getBytes(UTF_8)))
      case other => throw new IllegalArgumentException(
        s"makeEml encoding must be 7bit|quoted-printable|base64, got '$other'")
    }
    val head = (headers ++ Seq(
      "MIME-Version" -> "1.0",
      "Content-Type" -> "text/plain; charset=utf-8",
      "Content-Transfer-Encoding" -> cte))
      .map { case (k, v) => s"$k: $v" }.mkString("\n")
    (head + "\n\n" + encoded).getBytes(UTF_8)
  }

  /** Concatenate messages into a classic mboxo mailbox (`From ` separator
    * lines, body `From `-lines `>`-stuffed). */
  def makeMbox(messages: Seq[Array[Byte]]): Array[Byte] = {
    val sb = new StringBuilder
    messages.foreach { m =>
      sb.append("From graft@localhost Thu Jan  1 00:00:00 1970\n")
      new String(m, UTF_8).split("\n", -1).foreach { line =>
        if (line.matches("^>*From .*")) sb.append('>')
        sb.append(line).append('\n')
      }
    }
    sb.toString.getBytes(UTF_8)
  }

  /** One parsed WARC record: lowercased header map + raw payload bytes. */
  final case class WarcRecord(headers: Map[String, String],
      payload: Array[Byte]) {
    def recordType: String = headers.getOrElse("warc-type", "")
    def targetUri: String = headers.getOrElse("warc-target-uri", "")
  }

  /** REAL WARC (ISO 28500 / Common Crawl) record parser: walk
    * `WARC/1.x` version lines, read `Key: Value` headers to the blank
    * line, then exactly `Content-Length` payload BYTES (never split on
    * markers inside payloads — a page containing the literal text
    * "WARC/1.0" must not fracture the archive). Byte-accurate and
    * allocation-bounded by the file's own size; tolerant of leading
    * garbage between records (resyncs on the next version line). */
  def warcRecords(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    val n = bytes.length
    def crlfAt(j: Int): Boolean =
      j + 1 < n && bytes(j) == '\r' && bytes(j + 1) == '\n'
    def lineEnd(from: Int): Int = {
      var j = from
      while (j < n && !crlfAt(j)) j += 1
      j
    }
    def startsWith(j: Int, s: String): Boolean =
      j + s.length <= n && s.indices.forall(k => bytes(j + k) == s.charAt(k))
    var i = 0
    while (i < n) {
      if (startsWith(i, "WARC/")) {
        var j = lineEnd(i) + 2 // past the version line
        val headers = Map.newBuilder[String, String]
        var blank = false
        while (!blank && j < n) {
          val e = lineEnd(j)
          if (e == j) { blank = true; j += 2 } // empty line ends headers
          else {
            val line = new String(bytes, j, e - j, StandardCharsets.ISO_8859_1)
            val ci = line.indexOf(':')
            if (ci > 0)
              headers += line.substring(0, ci).trim
                .toLowerCase(java.util.Locale.ROOT) ->
                line.substring(ci + 1).trim
            j = e + 2
          }
        }
        val hm = headers.result()
        val len = hm.get("content-length").flatMap(_.toIntOption)
          .filter(_ >= 0).getOrElse(0)
        val end = math.min(n, j + len)
        out += WarcRecord(hm, java.util.Arrays.copyOfRange(bytes, j, end))
        i = end
      } else i += 1
    }
    out.toSeq
  }

  /** HTTP message body: bytes after the first CRLFCRLF when the payload
    * is an HTTP message, the whole payload otherwise. */
  def httpBody(payload: Array[Byte]): Array[Byte] = {
    val isHttp = payload.length >= 5 &&
      new String(payload, 0, 5, StandardCharsets.ISO_8859_1) == "HTTP/"
    if (!isHttp) return payload
    var j = 0
    while (j + 3 < payload.length) {
      if (payload(j) == '\r' && payload(j + 1) == '\n' &&
        payload(j + 2) == '\r' && payload(j + 3) == '\n')
        return java.util.Arrays.copyOfRange(payload, j + 4, payload.length)
      j += 1
    }
    payload
  }

  /** Inflate a (possibly multi-member) gzip stream — Common Crawl `.warc.gz`
    * files gzip each record as its own member; `GZIPInputStream` reads
    * concatenated members as one stream. Non-gzip bytes pass through. */
  private def gunzipIfNeeded(bytes: Array[Byte]): Array[Byte] = {
    val gz = bytes.length >= 2 &&
      (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b
    if (!gz) return bytes
    val in = new java.util.zip.GZIPInputStream(new ByteArrayInputStream(bytes))
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** WARC -> documents: each `response` record's HTTP body as UTF-8 text,
    * in archive order (the shape crawl-ingest pipelines read). Transparent
    * for `.warc.gz` (gzip magic dispatch, multi-member-safe). */
  def warcToString(bytes: Array[Byte]): Seq[String] =
    warcRecords(gunzipIfNeeded(bytes))
      .filter(_.recordType == "response")
      .map(r => new String(httpBody(r.payload), UTF_8))

  /** EPUB: zip of XHTML chapters ordered by the OPF spine (EPUB is a
    * publicly specified format — OCF zip container + OPF package manifest
    * / spine + XHTML content documents; book corpora are a standard
    * training-data source). Chapter markup strips through
    * [[HtmlToMarkdown]]. Falls back to name-sorted (x)html entries when
    * no OPF resolves — real-world EPUBs occasionally lack a clean spine.
    * `docPerChapter` yields one document per spine item. */
  def epubToString(bytes: Array[Byte],
      docPerChapter: Boolean = false): Seq[String] = {
    val entries = zipEntries(bytes)(n => Some(n)).toMap
    val opf = entries.collectFirst {
      case (name, data) if name.endsWith(".opf") => (name, data)
    }
    val chapterNames: Seq[String] = opf match {
      case Some((opfName, opfData)) =>
        val opfXml = new String(opfData, UTF_8)
        val dir = opfName.lastIndexOf('/') match {
          case -1 => ""
          case i => opfName.substring(0, i + 1)
        }
        val items = raw"""<item\b[^>]*>""".r.findAllIn(opfXml).toSeq
        // XML attributes may be single- OR double-quoted; matching only
        // one style would silently drop the spine and scramble chapter
        // order through the name-sorted fallback
        def attr(tag: String, name: String): Option[String] =
          raw"""$name\s*=\s*(?:"([^"]*)"|'([^']*)')""".r
            .findFirstMatchIn(tag)
            .map(m => Option(m.group(1)).getOrElse(m.group(2)))
        val hrefById = items.flatMap(t =>
          for (i <- attr(t, "id"); h <- attr(t, "href")) yield i -> h).toMap
        val spine = raw"""<itemref\b[^>]*>""".r.findAllIn(opfXml).toSeq
          .flatMap(t => attr(t, "idref")).flatMap(hrefById.get)
          .map(dir + _)
        if (spine.nonEmpty) spine
        else entries.keys.filter(n => n.endsWith(".xhtml") ||
          n.endsWith(".html") || n.endsWith(".htm")).toSeq.sorted
      case None =>
        entries.keys.filter(n => n.endsWith(".xhtml") ||
          n.endsWith(".html") || n.endsWith(".htm")).toSeq.sorted
    }
    val chapters = chapterNames.flatMap(entries.get)
      .map(data => HtmlToMarkdown(new String(data, UTF_8)))
    if (docPerChapter) chapters else Seq(chapters.mkString("\n\n"))
  }

  /** Minimal valid EPUB (OCF container + OPF spine + XHTML chapters) —
    * fixture writer / simple sink, mirroring the other `make*`s. */
  def makeEpub(chapters: Seq[String]): Array[Byte] = {
    val manifest = chapters.indices.map(i =>
      s"""<item id="c$i" href="ch$i.xhtml" media-type="application/xhtml+xml"/>""")
      .mkString("\n")
    val spine = chapters.indices.map(i => s"""<itemref idref="c$i"/>""")
      .mkString("\n")
    val opf =
      s"""<?xml version="1.0"?>
         |<package xmlns="http://www.idpf.org/2007/opf" version="3.0">
         |<manifest>
         |$manifest
         |</manifest>
         |<spine>
         |$spine
         |</spine>
         |</package>""".stripMargin
    val container =
      """<?xml version="1.0"?>
        |<container version="1.0">
        |<rootfiles><rootfile full-path="OEBPS/content.opf"/></rootfiles>
        |</container>""".stripMargin
    // Escape markup characters: a chapter containing '<' or '&' must
    // round-trip through the XHTML, not be parsed as a (broken) tag.
    def esc(t: String): String = t.replace("&", "&amp;")
      .replace("<", "&lt;").replace(">", "&gt;")
    zip(Seq(
      "mimetype" -> "application/epub+zip",
      "META-INF/container.xml" -> container,
      "OEBPS/content.opf" -> opf) ++
      chapters.zipWithIndex.map { case (text, i) =>
        s"OEBPS/ch$i.xhtml" ->
          s"<html><body><p>${esc(text)}</p></body></html>"
      }: _*)
  }

  /** Word: paragraphs of `word/document.xml` (`<w:p>`, runs' `<w:t>` text)
    * joined by newline, one document (parsing_tools.py:172-186). */
  def docxToString(bytes: Array[Byte]): Seq[String] = {
    val xml = zipEntry(bytes, "word/document.xml").getOrElse(return Seq(""))
    Seq(paragraphText(xml, para = "p", text = "t").mkString("\n"))
  }

  /** PowerPoint: slides in `ppt/slides/slideN.xml` numeric order; per slide
    * the text-body paragraphs (`<a:p>` of each `<p:txBody>`) joined by
    * newline (parsing_tools.py:189-226). `docPerSlide` returns one document
    * per slide instead of one for the deck. */
  def pptxToString(bytes: Array[Byte], docPerSlide: Boolean = false): Seq[String] = {
    val SlideName = raw"ppt/slides/slide(\d+)\.xml".r
    val slides = zipEntries(bytes) { name =>
      name match { case SlideName(n) => Some(n.toInt); case _ => None }
    }.sortBy(_._1).map { case (_, xml) => paragraphText(xml, para = "p", text = "t").mkString("\n") }
    if (docPerSlide) slides else Seq(slides.mkString("\n"))
  }

  /** Excel: cell grid of each `xl/worksheets/sheetN.xml` (shared-string,
    * inline-string and literal cells), rendered like the reference
    * (parsing_tools.py:100-153): first row is the header row; `col`
    * orientation emits "header: v1\nv2…" blocks separated by blank lines,
    * `row` orientation emits one "h1: v1 | h2: v2" line per data row.
    * Default is the first sheet only; `docPerSheet` yields one document per
    * sheet. */
  def xlsxToString(bytes: Array[Byte], orientation: String = "col",
      docPerSheet: Boolean = false): Seq[String] = {
    val shared: IndexedSeq[String] =
      zipEntry(bytes, "xl/sharedStrings.xml")
        .map(xml => paragraphText(xml, para = "si", text = "t").toIndexedSeq)
        .getOrElse(IndexedSeq.empty)
    val SheetName = raw"xl/worksheets/sheet(\d+)\.xml".r
    val sheets = zipEntries(bytes) { name =>
      name match { case SheetName(n) => Some(n.toInt); case _ => None }
    }.sortBy(_._1).map { case (_, xml) => renderSheet(parseSheet(xml, shared), orientation) }
    if (docPerSheet) sheets else sheets.take(1)
  }

  /** PDF: text runs of every page content stream, in file order — the
    * JVM-feasible slice of the reference's pdf parsers
    * (parsing_tools.py azure/docling/paddle pdf paths all reduce to
    * "bytes -> page texts"; those need cloud/OCR runtimes, this covers the
    * born-digital case). Supports FlateDecode (JDK Inflater) and
    * uncompressed streams; text comes from the `Tj` / `'` / `"` / `TJ`
    * show operators, one output line per show op. Streams are located by
    * their `<<dict>> stream...endstream` framing, so object order == page
    * order (true for the writer below and linearly-written PDFs).
    * `docPerPage` yields one document per page content stream. */
  def pdfToString(bytes: Array[Byte], docPerPage: Boolean = false): Seq[String] = {
    val pages = pdfStreams(bytes)
      .map(s => new String(s, StandardCharsets.ISO_8859_1))
      .filter(_.contains("BT")) // text-bearing content streams only
      .map(extractPdfText)
    if (docPerPage) pages else Seq(pages.mkString("\n"))
  }

  /** Decoded bytes of every `stream ... endstream` object. When the stream
    * dict carries a direct `/Length N` (not an indirect `n g R` reference),
    * N delimits the data — an uncompressed stream whose CONTENT contains
    * "endstream" would otherwise truncate. The endstream scan remains the
    * fallback for indirect/absent lengths. */
  private def pdfStreams(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    val hay = new String(bytes, StandardCharsets.ISO_8859_1)
    val LenRe = raw"/Length\s+(\d+)(\s+\d+\s+R)?".r
    var from = 0
    while ({ val i = hay.indexOf("stream", from); i >= 0 && {
      // dict immediately before this `stream` keyword
      val dictEnd = hay.lastIndexOf(">>", i)
      val dictStart = if (dictEnd >= 0) hay.lastIndexOf("<<", dictEnd) else -1
      val dict = if (dictStart >= 0) hay.substring(dictStart, dictEnd + 2) else ""
      var dataStart = i + "stream".length
      if (dataStart < hay.length && hay.charAt(dataStart) == '\r') dataStart += 1
      if (dataStart < hay.length && hay.charAt(dataStart) == '\n') dataStart += 1
      val scanEnd = hay.indexOf("endstream", dataStart)
      if (scanEnd < 0) false
      else {
        // Direct /Length, sanity-checked: `endstream` (after EOL padding)
        // must actually follow dataStart + N, else the length is stale and
        // the scan wins.
        val byLength = LenRe.findFirstMatchIn(dict)
          .filter(_.group(2) == null).map(_.group(1).toLong)
          .collect { case n if dataStart + n <= hay.length => (dataStart + n).toInt }
          .flatMap { e =>
            var p = e
            while (p < hay.length &&
              (hay.charAt(p) == '\r' || hay.charAt(p) == '\n' || hay.charAt(p) == ' ')) p += 1
            if (hay.startsWith("endstream", p)) Some((e, p + "endstream".length)) else None
          }
        val (dataEnd, next) = byLength.getOrElse {
          var de = scanEnd
          if (de > dataStart && hay.charAt(de - 1) == '\n') de -= 1
          if (de > dataStart && hay.charAt(de - 1) == '\r') de -= 1
          (de, scanEnd + "endstream".length)
        }
        val raw = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
        out += (if (dict.contains("FlateDecode")) inflate(raw) else raw)
        from = next
        true
      }
    }}) ()
    out.result()
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) bos.write(buf, 0, n) else if (n == 0 && !inf.finished()) return bos.toByteArray
      }
      bos.toByteArray
    } catch { case _: java.util.zip.DataFormatException => Array.emptyByteArray }
    finally inf.end()
  }

  /** Text of one content stream: PDF strings consumed by the show operators,
    * one line per show op (`TJ` concatenates its array's strings). */
  private def extractPdfText(cs: String): String = {
    val lines = Seq.newBuilder[String]
    var i = 0
    var pending = List.empty[String] // strings seen since the last operator
    def readString(start: Int): (String, Int) = {
      val sb = new StringBuilder
      var depth = 1
      var j = start + 1
      while (j < cs.length && depth > 0) {
        cs.charAt(j) match {
          case '\\' if j + 1 < cs.length =>
            cs.charAt(j + 1) match {
              case 'n' => sb.append('\n'); j += 2
              case 'r' => sb.append('\r'); j += 2
              case 't' => sb.append('\t'); j += 2
              case 'b' => sb.append('\b'); j += 2
              case 'f' => sb.append('\f'); j += 2
              case '(' => sb.append('('); j += 2
              case ')' => sb.append(')'); j += 2
              case '\\' => sb.append('\\'); j += 2
              case '\n' => j += 2 // line continuation
              case d if d >= '0' && d <= '7' =>
                val oct = cs.substring(j + 1, math.min(j + 4, cs.length)).takeWhile(c => c >= '0' && c <= '7')
                sb.append(Integer.parseInt(oct, 8).toChar); j += 1 + oct.length
              case other => sb.append(other); j += 2
            }
          case '(' => depth += 1; sb.append('('); j += 1
          case ')' => depth -= 1; if (depth > 0) sb.append(')'); j += 1
          case c => sb.append(c); j += 1
        }
      }
      (sb.toString, j)
    }
    while (i < cs.length) {
      cs.charAt(i) match {
        case '(' =>
          val (s, j) = readString(i); pending ::= s; i = j
        case 'T' if i + 1 < cs.length && (cs.charAt(i + 1) == 'j' || cs.charAt(i + 1) == 'J') =>
          if (pending.nonEmpty) lines += pending.reverse.mkString
          pending = Nil; i += 2
        case '\'' | '"' =>
          if (pending.nonEmpty) lines += pending.reverse.mkString
          pending = Nil; i += 1
        case '[' => pending = Nil; i += 1 // TJ array begins: collect its strings
        case _ => i += 1
      }
    }
    lines.result().mkString("\n")
  }

  private def renderSheet(grid: Seq[Map[Int, String]], orientation: String): String = {
    if (grid.isEmpty) return ""
    val headerRow = grid.head
    val nCols = (grid.iterator.flatMap(_.keys) ++ Iterator(-1)).max + 1
    val headers = (0 until nCols).map(i => headerRow.getOrElse(i, ""))
    val data = grid.tail
    if (orientation == "row")
      data.map { r =>
        headers.zipWithIndex.collect {
          case (h, i) if h.nonEmpty => s"$h: ${r.getOrElse(i, "")}"
        }.mkString(" | ")
      }.mkString("\n")
    else
      headers.zipWithIndex.flatMap { case (h, i) =>
        Seq(s"$h: " + data.map(_.getOrElse(i, "")).mkString("\n"), "")
      }.mkString("\n")
  }

  /** Sheet XML -> row-major sparse grid of rendered cell values. */
  private def parseSheet(xml: Array[Byte], shared: IndexedSeq[String]): Seq[Map[Int, String]] = {
    val rows = Seq.newBuilder[Map[Int, String]]
    var row: Map[Int, String] = null
    var cellCol = -1; var cellType = ""; var inV = false; var inIsT = false
    val sb = new StringBuilder
    val r = reader(xml)
    try while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "row" => row = Map.empty
        case "c" =>
          val ref = attr(r, "r")
          cellCol = if (ref == null) (if (row == null) 0 else row.size)
                    else colIndex(ref.takeWhile(_.isLetter))
          cellType = Option(attr(r, "t")).getOrElse("")
          sb.clear()
        case "v" => inV = true
        case "t" if cellType == "inlineStr" => inIsT = true
        case _ =>
      }
      case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
        if (inV || inIsT) sb.append(r.getText)
      case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
        case "v" => inV = false
        case "t" => inIsT = false
        case "c" if cellCol >= 0 =>
          val raw = sb.toString
          val value = cellType match {
            case "s" => raw.toIntOption.flatMap(shared.lift).getOrElse("")
            case "b" => if (raw == "1") "true" else "false"
            case _ => raw // n, str, inlineStr accumulate the same way
          }
          if (row != null && value.nonEmpty) row += cellCol -> value
          cellCol = -1
        case "row" => rows += row; row = null
        case _ =>
      }
      case _ =>
    } finally r.close()
    rows.result()
  }

  /** "AB" -> 27: spreadsheet column letters to 0-based index. */
  private[graft] def colIndex(letters: String): Int =
    letters.foldLeft(0)((acc, c) => acc * 26 + (c.toUpper - 'A' + 1)) - 1

  // ------------------------------------------------------- xml/zip helpers

  private def factory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    // Documents are untrusted bytes: no DTDs, no external entities.
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  private def reader(xml: Array[Byte]) =
    factory.createXMLStreamReader(new ByteArrayInputStream(xml), "UTF-8")

  private def attr(r: javax.xml.stream.XMLStreamReader, name: String): String = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == name) return r.getAttributeValue(i)
      i += 1
    }
    null
  }

  /** Concatenated text of every `<text>` descendant, grouped per `<para>`
    * element — the shared shape of docx paragraphs, pptx text bodies and
    * xlsx shared strings (namespace-insensitive by local name). */
  private def paragraphText(xml: Array[Byte], para: String, text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var depth = 0 // nesting count of `para` elements (w:p never nests, a:p can't either)
    var inText = false
    val r = reader(xml)
    try while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT =>
        val n = r.getLocalName
        if (n == para) { if (depth == 0) sb.clear(); depth += 1 }
        else if (n == text && depth > 0) inText = true
        else if ((n == "br" || n == "tab") && depth > 0)
          sb.append(if (n == "tab") '\t' else '\n')
      case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
        if (inText) sb.append(r.getText)
      case XMLStreamConstants.END_ELEMENT =>
        val n = r.getLocalName
        if (n == para) { depth -= 1; if (depth == 0) out += sb.toString }
        else if (n == text) inText = false
      case _ =>
    } finally r.close()
    out.result()
  }

  private def zipEntry(bytes: Array[Byte], name: String): Option[Array[Byte]] =
    zipEntries(bytes)(n => if (n == name) Some(0) else None).headOption.map(_._2)

  /** All zip entries whose name `select`s, with the selector's key. */
  private def zipEntries[K](bytes: Array[Byte])(select: String => Option[K]): Seq[(K, Array[Byte])] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Seq.newBuilder[(K, Array[Byte])]
    try {
      var e: ZipEntry = zin.getNextEntry
      while (e != null) {
        select(e.getName).foreach(k => out += k -> zin.readAllBytes())
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  // -------------------------------------------------------------- writers

  /** Minimal valid WARC file: one warcinfo record, then one `response`
    * record per (uri, body) with an HTTP/1.1 envelope — byte-accurate
    * Content-Lengths, so [[warcRecords]] must honor lengths (not markers)
    * to round-trip. */
  def makeWarc(docs: Seq[(String, String)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def record(tpe: String, uri: Option[String], payload: Array[Byte]): Unit = {
      val hdr = new StringBuilder()
        .append("WARC/1.0\r\n")
        .append(s"WARC-Type: $tpe\r\n")
      uri.foreach(u => hdr.append(s"WARC-Target-URI: $u\r\n"))
      hdr.append(s"Content-Length: ${payload.length}\r\n\r\n")
      out.write(hdr.toString.getBytes(StandardCharsets.ISO_8859_1))
      out.write(payload)
      out.write("\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1))
    }
    record("warcinfo", None, "software: graft-fixture\r\n".getBytes(UTF_8))
    docs.foreach { case (uri, body) =>
      val bodyBytes = body.getBytes(UTF_8)
      val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain; " +
        s"charset=utf-8\r\nContent-Length: ${bodyBytes.length}\r\n\r\n")
        .getBytes(StandardCharsets.ISO_8859_1) ++ bodyBytes
      record("response", Some(uri), http)
    }
    out.toByteArray
  }

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;")

  private def zip(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes(UTF_8))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  private val ContentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="xml" ContentType="application/xml"/>
      |</Types>""".stripMargin

  /** One paragraph per element. */
  def makeDocx(paragraphs: Seq[String]): Array[Byte] = {
    val body = paragraphs.map(p =>
      s"<w:p><w:r><w:t xml:space=\"preserve\">${esc(p)}</w:t></w:r></w:p>").mkString
    zip(
      "[Content_Types].xml" -> ContentTypes,
      "word/document.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
           |<w:body>$body</w:body></w:document>""".stripMargin)
  }

  /** One slide per outer element; inner elements are the slide's paragraphs
    * (all in a single text body). */
  def makePptx(slides: Seq[Seq[String]]): Array[Byte] = {
    val slideEntries = slides.zipWithIndex.map { case (paras, i) =>
      val body = paras.map(p =>
        s"<a:p><a:r><a:t>${esc(p)}</a:t></a:r></a:p>").mkString
      s"ppt/slides/slide${i + 1}.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"
           | xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main">
           |<p:cSld><p:spTree><p:sp><p:txBody>$body</p:txBody></p:sp></p:spTree></p:cSld></p:sld>""".stripMargin
    }
    zip(("[Content_Types].xml" -> ContentTypes) +: slideEntries: _*)
  }

  /** Minimal valid PDF: one page per outer element, inner elements are the
    * page's text lines (one `Tj` each). Content streams are FlateDecode-
    * compressed so the reader's inflate path round-trips; xref offsets are
    * real, so standard viewers open the output. */
  def makePdf(pages: Seq[Seq[String]]): Array[Byte] = {
    def pdfEsc(s: String): String =
      s.flatMap { case '\\' => "\\\\"; case '(' => "\\("; case ')' => "\\)"
                  case c if c > 255 => "?" // Latin-1 strings only in this writer
                  case c => c.toString }
    val n = pages.length
    val fontObj = 3 + 2 * n
    val kids = (0 until n).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    val objects = Seq.newBuilder[(Int, Array[Byte])]
    objects += 1 -> s"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n".getBytes(StandardCharsets.ISO_8859_1)
    objects += 2 -> s"2 0 obj\n<< /Type /Pages /Kids [$kids] /Count $n >>\nendobj\n".getBytes(StandardCharsets.ISO_8859_1)
    pages.zipWithIndex.foreach { case (lines, i) =>
      val pageId = 3 + 2 * i
      val contentId = pageId + 1
      objects += pageId -> (s"$pageId 0 obj\n<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792] /Resources << /Font << /F1 $fontObj 0 R >> >> " +
        s"/Contents $contentId 0 R >>\nendobj\n").getBytes(StandardCharsets.ISO_8859_1)
      val text = lines.zipWithIndex.map { case (l, j) =>
        (if (j == 0) "" else "0 -14 Td\n") + s"(${pdfEsc(l)}) Tj\n"
      }.mkString
      val cs = s"BT\n/F1 12 Tf\n72 720 Td\n${text}ET\n".getBytes(StandardCharsets.ISO_8859_1)
      val deflated = {
        val d = new java.util.zip.Deflater()
        d.setInput(cs); d.finish()
        val bos = new ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!d.finished()) { val k = d.deflate(buf); bos.write(buf, 0, k) }
        d.end()
        bos.toByteArray
      }
      val head = (s"$contentId 0 obj\n<< /Length ${deflated.length} /Filter /FlateDecode >>\n" +
        "stream\n").getBytes(StandardCharsets.ISO_8859_1)
      val tail = "\nendstream\nendobj\n".getBytes(StandardCharsets.ISO_8859_1)
      objects += contentId -> (head ++ deflated ++ tail)
    }
    objects += fontObj -> (s"$fontObj 0 obj\n<< /Type /Font /Subtype /Type1 " +
      "/BaseFont /Helvetica >>\nendobj\n").getBytes(StandardCharsets.ISO_8859_1)

    val bos = new ByteArrayOutputStream()
    bos.write("%PDF-1.4\n".getBytes(StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.Map[Int, Int]()
    objects.result().sortBy(_._1).foreach { case (id, body) =>
      offsets(id) = bos.size()
      bos.write(body)
    }
    val xrefPos = bos.size()
    val total = fontObj + 1
    val xref = new StringBuilder(s"xref\n0 $total\n0000000000 65535 f \n")
    (1 until total).foreach(id => xref.append(f"${offsets(id)}%010d 00000 n \n"))
    xref.append(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    bos.write(xref.toString.getBytes(StandardCharsets.ISO_8859_1))
    bos.toByteArray
  }

  /** Single sheet; first row is the header row. Cells are written as inline
    * strings, so the archive needs no shared-string part. */
  def makeXlsx(headers: Seq[String], rows: Seq[Seq[String]]): Array[Byte] = {
    def cellRef(rowIdx: Int, colIdx: Int): String = {
      var c = colIdx + 1; val sb = new StringBuilder
      while (c > 0) { sb.insert(0, ('A' + (c - 1) % 26).toChar); c = (c - 1) / 26 }
      sb.toString + (rowIdx + 1)
    }
    val allRows = headers +: rows
    val body = allRows.zipWithIndex.map { case (cells, ri) =>
      val cs = cells.zipWithIndex.map { case (v, ci) =>
        s"""<c r="${cellRef(ri, ci)}" t="inlineStr"><is><t xml:space="preserve">${esc(v)}</t></is></c>"""
      }.mkString
      s"""<row r="${ri + 1}">$cs</row>"""
    }.mkString
    zip(
      "[Content_Types].xml" -> ContentTypes,
      "xl/workbook.xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |<sheets><sheet name="Sheet1" sheetId="1"/></sheets></workbook>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
           |<sheetData>$body</sheetData></worksheet>""".stripMargin)
  }
}
