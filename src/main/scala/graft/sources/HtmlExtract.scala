package graft.sources

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Density-based HTML main-content extraction — the boilerplate-removal
  * step between a crawl fetch and the text pipeline (publicly the
  * jusText / Boilerpipe idea: navigation, footers, and link farms are
  * SHORT and LINK-DENSE; article text is long prose with few links; the
  * big crawl corpora — C4, RefinedWeb — all run a block-level density
  * filter of this family). Complements [[HtmlToMarkdown]], which
  * converts ALL of a page; this keeps only the content blocks.
  *
  * Blocks split at block-level tags (p/div/li/td/h1-6/section/...);
  * each block scores (text length, link-character density); a block
  * survives when it has at least `minChars` of text AND at most
  * `maxLinkDensity` of it inside anchors. `<script>`/`<style>` bodies
  * are dropped wholesale.
  *
  * Scale shape: one bounded per-row pass over the page's own bytes (a
  * UDF by necessity — tag context is stateful), no shuffle; the op is a
  * narrow projection like the document parsers.
  */
object HtmlExtract {

  private val BlockTags = Set("p", "div", "td", "li", "h1", "h2", "h3",
    "h4", "h5", "h6", "article", "section", "header", "footer", "nav",
    "ul", "ol", "table", "tr", "blockquote", "pre", "br", "body", "html")

  private[graft] final case class Block(text: String, linkChars: Int)

  private def decode(s: String): String = s
    .replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
    .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")

  /** Split `html` into text blocks with per-block anchor-text counts. */
  private[graft] def blocks(html: String): Seq[Block] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Block]
    val cur = new StringBuilder
    var curLink = 0
    var linkDepth = 0
    var skipUntil: Option[String] = None // inside <script>/<style>
    def flush(): Unit = {
      val t = decode(cur.toString).trim
      if (t.nonEmpty) out += Block(t, math.min(curLink, t.length))
      cur.clear(); curLink = 0
    }
    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        val end = html.indexOf('>', i + 1)
        if (end < 0) { i = n } // truncated tag: drop the tail
        else {
          val inner = html.substring(i + 1, end).trim
          val closing = inner.startsWith("/")
          val name = inner.dropWhile(_ == '/').takeWhile(ch =>
            ch.isLetterOrDigit).toLowerCase
          skipUntil match {
            case Some(t) =>
              if (closing && name == t) skipUntil = None
            case None =>
              // a self-closed <script .../> has no body to skip — setting
              // skipUntil for it would swallow the rest of the page
              if (!closing && !inner.endsWith("/") &&
                (name == "script" || name == "style"))
                skipUntil = Some(name)
              else if (name == "a") {
                if (closing) linkDepth = math.max(0, linkDepth - 1)
                else if (!inner.endsWith("/")) linkDepth += 1
              } else if (BlockTags.contains(name)) flush()
          }
          i = end + 1
        }
      } else {
        if (skipUntil.isEmpty) {
          cur.append(c)
          if (linkDepth > 0) curLink += 1
        }
        i += 1
      }
    }
    flush()
    out.toSeq
  }

  /** The page's main content: surviving blocks joined by "\n\n". */
  def mainContent(html: String, minChars: Int = 25,
      maxLinkDensity: Double = 0.33): String = {
    if (html == null) return ""
    blocks(html).filter { b =>
      b.text.length >= minChars &&
        b.linkChars.toDouble / b.text.length <= maxLinkDensity
    }.map(_.text).mkString("\n\n")
  }

  /** Append `outCol` = extracted main content of `htmlCol`. */
  def extract(df: DataFrame, htmlCol: String,
      outCol: String = "main_content", minChars: Int = 25,
      maxLinkDensity: Double = 0.33): DataFrame = {
    val f = udf((h: String) => mainContent(h, minChars, maxLinkDensity))
    df.withColumn(outCol, f(col(htmlCol)))
  }
}
