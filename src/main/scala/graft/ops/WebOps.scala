package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

import graft.llm.Template

/** External-I/O operators (reference docetl/operations/web_search.py:15-197,
  * web_fetch.py:1-324): per-row web search / URL fetch.
  *
  * The HTTP layer is a pluggable [[HttpClient]] trait — this container has
  * zero egress, so the default is [[StubHttpClient]], which answers
  * deterministically from the request string. The Spark plumbing (per-row
  * templated queries via `mapPartitions`, bounded result arrays, typed result
  * schema, nondeterministic-op discipline) is the real implementation; a
  * production deployment swaps in an HTTP-backed client with per-executor
  * rate limiting, nothing else changes.
  */
trait HttpClient extends Serializable {
  /** Search: returns (title, description, url) triples. */
  def search(query: String, maxResults: Int): Seq[(String, String, String)]
  /** Fetch: returns the page body as markdown-ish text. */
  def fetch(url: String): String
}

/** Deterministic offline stand-in: results derived from the request text. */
final case class StubHttpClient() extends HttpClient {
  def search(query: String, maxResults: Int): Seq[(String, String, String)] =
    (1 to maxResults).map(i => (
      s"result $i for: $query",
      s"stub description $i (${query.length} chars)",
      s"https://example.invalid/${query.replaceAll("\\W+", "-").toLowerCase}/$i"))
  def fetch(url: String): String = s"# stub page\nfetched: $url\n"
}

object WebSearchOp {

  private val resultType = ArrayType(StructType(Seq(
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("url", StringType))))

  /** Appends `search_results` (reference web_search.py result shape, capped
    * at `maxResults`). */
  def apply(
      df: DataFrame,
      name: String,
      queryTemplate: String,
      maxResults: Int = 3,
      http: HttpClient = StubHttpClient()): DataFrame = {
    val tpl = Template(queryTemplate, df.schema)
    val newSchema = df.schema.add(StructField("search_results", resultType))
    df.mapPartitions { it =>
      it.map { row =>
        val results = http.search(tpl.render(row), maxResults)
          .map { case (t, d, u) => Row(t, d, u) }
        Row.fromSeq(row.toSeq :+ results)
      }
    }(Encoders.row(newSchema))
  }
}

object WebFetchOp {

  /** Fetches the URL in `urlKey` per row, appending `{name}_content`
    * (reference web_fetch.py). `convertToMarkdown` mirrors the reference's
    * `convert_to_markdown` stage (web_fetch.py:48-52,185): HTML-looking
    * responses (web_fetch.py:166 heuristic) convert via the pure-JVM
    * [[graft.sources.HtmlToMarkdown]]; non-HTML content passes through. */
  def apply(
      df: DataFrame,
      name: String,
      urlKey: String,
      http: HttpClient = StubHttpClient(),
      convertToMarkdown: Boolean = false): DataFrame = {
    val idx = df.schema.fieldIndex(urlKey)
    val newSchema = df.schema.add(StructField(s"${name}_content", StringType))
    df.mapPartitions { it =>
      it.map { row =>
        val url = if (row.isNullAt(idx)) "" else row.getString(idx)
        val raw = http.fetch(url)
        val content =
          if (convertToMarkdown && graft.sources.HtmlToMarkdown.looksLikeHtml(raw))
            graft.sources.HtmlToMarkdown(raw)
          else raw
        Row.fromSeq(row.toSeq :+ content)
      }
    }(Encoders.row(newSchema))
  }
}
