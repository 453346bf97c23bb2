package graft.sources

/** Pure-JVM HTML → markdown conversion for the web_fetch
  * `convert_to_markdown` stage (reference web_fetch.py:48-52 delegates to
  * the markdownify library with ATX headings; this is the clean-room subset
  * that conversion actually produces for article-shaped pages).
  *
  * Sequential regex/state passes, executor-local per row — no DOM, no
  * dependencies. Handled: comments + script/style/head removal, h1-h6 (ATX),
  * p/div/br paragraph breaks, ul/ol list items (ordered items numbered per
  * list), blockquote, pre/code fences, inline code, strong/b, em/i, links,
  * images, hr, table cells flattened to pipe-separated lines, entity
  * decoding, whitespace normalization. Unknown tags drop their markup and
  * keep their text — the same degradation markdownify applies.
  */
object HtmlToMarkdown {

  private val dropBlocks =
    raw"(?is)<(script|style|head|noscript|svg|iframe)\b.*?</\1\s*>".r
  private val comments = raw"(?s)<!--.*?-->".r

  def apply(html: String): String = {
    if (html == null) return ""
    var s = html
    s = comments.replaceAllIn(s, "")
    s = dropBlocks.replaceAllIn(s, "")

    // Fenced blocks first so later passes don't touch their contents.
    s = raw"(?is)<pre\b[^>]*>\s*(?:<code\b[^>]*>)?(.*?)(?:</code\s*>)?\s*</pre\s*>".r
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        "\n```\n" + decodeEntities(m.group(1)).trim + "\n```\n"))

    // Headings: <hN>text</hN> -> ATX.
    for (n <- 1 to 6) {
      val hashes = "#" * n
      s = raw"(?is)<h$n\b[^>]*>(.*?)</h$n\s*>".r.replaceAllIn(s,
        m => java.util.regex.Matcher.quoteReplacement(
          s"\n\n$hashes ${inline(m.group(1)).trim}\n\n"))
    }

    // Ordered lists: number items per <ol> scope.
    s = raw"(?is)<ol\b[^>]*>(.*?)</ol\s*>".r.replaceAllIn(s, m => {
      var i = 0
      java.util.regex.Matcher.quoteReplacement("\n" +
        raw"(?is)<li\b[^>]*>(.*?)</li\s*>".r.replaceAllIn(m.group(1), li => {
          i += 1
          java.util.regex.Matcher.quoteReplacement(s"\n$i. ${inline(li.group(1)).trim}")
        }) + "\n")
    })
    // Unordered (and any stray) list items.
    s = raw"(?is)<li\b[^>]*>(.*?)</li\s*>".r.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement(s"\n- ${inline(m.group(1)).trim}"))
    s = raw"(?i)</?[uo]l\b[^>]*>".r.replaceAllIn(s, "\n")

    // Blockquotes: prefix each line of the content.
    s = raw"(?is)<blockquote\b[^>]*>(.*?)</blockquote\s*>".r.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement("\n" +
        inline(m.group(1)).trim.linesIterator.map(l => s"> $l").mkString("\n") + "\n"))

    // Tables: one line per row, cells pipe-separated.
    s = raw"(?is)<tr\b[^>]*>(.*?)</tr\s*>".r.replaceAllIn(s, m => {
      val cells = raw"(?is)<t[hd]\b[^>]*>(.*?)</t[hd]\s*>".r
        .findAllMatchIn(m.group(1)).map(c => inline(c.group(1)).trim).toSeq
      java.util.regex.Matcher.quoteReplacement("\n| " + cells.mkString(" | ") + " |")
    })

    s = inline(s)
    s = raw"(?i)<hr\b[^>]*/?>".r.replaceAllIn(s, "\n\n---\n\n")
    s = raw"(?i)<br\b[^>]*/?>".r.replaceAllIn(s, "\n")
    s = raw"(?is)</?(p|div|section|article|main|header|footer|table|tbody|thead|figure)\b[^>]*>".r
      .replaceAllIn(s, "\n\n")
    s = raw"(?s)<[^>]+>".r.replaceAllIn(s, "") // residual tags: keep text only
    s = decodeEntities(s)
    // Normalize: strip trailing spaces, collapse 3+ blank lines to one blank.
    s = s.linesIterator.map(_.replaceAll("\\s+$", "")).mkString("\n")
    s = raw"\n{3,}".r.replaceAllIn(s, "\n\n")
    s.trim
  }

  /** Inline markup inside an already-extracted block. */
  private def inline(x: String): String = {
    var s = x
    s = raw"""(?is)<a\b[^>]*href\s*=\s*["']([^"']*)["'][^>]*>(.*?)</a\s*>""".r
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        s"[${raw"(?s)<[^>]+>".r.replaceAllIn(m.group(2), "").trim}](${m.group(1)})"))
    s = raw"""(?i)<img\b[^>]*src\s*=\s*["']([^"']*)["'][^>]*/?>""".r
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(s"![](${m.group(1)})"))
    s = raw"(?is)<(strong|b)\b[^>]*>(.*?)</\1\s*>".r.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement(s"**${m.group(2).trim}**"))
    s = raw"(?is)<(em|i)\b[^>]*>(.*?)</\1\s*>".r.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement(s"*${m.group(2).trim}*"))
    s = raw"(?is)<code\b[^>]*>(.*?)</code\s*>".r.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement(s"`${m.group(1)}`"))
    s
  }

  private def decodeEntities(s: String): String = {
    val named = s
      .replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&apos;", "'")
    // Out-of-range entities pass through unchanged; supplementary
    // codepoints (> 0xFFFF) decode to surrogate pairs, not a truncated
    // char; surrogate-range references (U+D800..U+DFFF) become U+FFFD like
    // HTML5 mandates — toChars would emit an ill-formed lone surrogate
    // that corrupts on the next UTF-8 encode.
    val numeric = raw"&#(\d+);".r.replaceAllIn(named, { m =>
      val digits = m.group(1)
      val cp = if (digits.length <= 8) digits.toLong else Long.MaxValue
      val decoded =
        if (cp >= 0xD800 && cp <= 0xDFFF) "�"
        else if (cp >= 0 && cp <= Character.MAX_CODE_POINT)
          new String(Character.toChars(cp.toInt))
        else m.matched
      java.util.regex.Matcher.quoteReplacement(decoded)
    })
    numeric.replace("&amp;", "&") // last, so &amp;lt; decodes to &lt; not <
  }

  /** The reference's is-this-HTML heuristic (web_fetch.py:166). */
  def looksLikeHtml(content: String): Boolean = {
    val t = if (content == null) "" else content.trim.toLowerCase
    t.startsWith("<!") || t.startsWith("<html")
  }

  /** `body_only` (reference web_fetch.py:39-45): keep only the <body>
    * content; pages without a body tag pass through whole. */
  def extractBody(html: String): String =
    raw"(?is)<body\b[^>]*>(.*?)</body\s*>".r.findFirstMatchIn(html)
      .map(_.group(1)).getOrElse(html)
}
