package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hyperlink extraction — explode HTML documents into an
  * (src, dst_host, dst_path, anchor, kind) edge table: the bridge from
  * the parse layer ([[HtmlExtract]]) to the link-graph layer
  * ([[graft.graph.PageRank]] domain authority, anchor-text corpora,
  * crawl frontier seeding). The `<a href>` / anchor-text structure is
  * the publicly documented HTML semantics; resolution policy follows
  * what crawl pipelines keep: absolute http(s) links resolve to their
  * own authority, root-relative links to the document's host,
  * non-root-relative ones are classified but left unresolved (resolving
  * them needs the document's full base path — callers that track it can
  * concat before this op), and mailto:/javascript:/fragment-only hrefs
  * drop.
  *
  * Scale shape: tag extraction is ONE regexp_extract_all staged through
  * an explode boundary (per the HOF-lambda invariant: the tag array is
  * materialized once, per-tag field pulls then run on the exploded
  * COLUMN, never re-running the big regex per element); everything
  * after is pure per-row expressions fused into the scan — no UDF, no
  * shuffle, no driver state. Output size is the true link count, the
  * quantity any downstream graph op has to hold anyway.
  */
object HtmlLinks {

  private val TagRe = "(?is)<a\\b[^>]*\\bhref\\s*=\\s*(?:\"[^\"]*\"|'[^']*')[^>]*>.*?</a>"

  /** Strip inner tags and collapse whitespace: the anchor TEXT. */
  private def anchorText(tag: Column): Column =
    trim(regexp_replace(
      regexp_replace(regexp_extract(tag, "(?is)^<a\\b[^>]*>(.*)</a>$", 1),
        "(?s)<[^>]*>", " "),
      "\\s+", " "))

  /** Explode each (`idCol`, `htmlCol`, `hostCol`) document into its
    * links: (<id cols>, href, anchor, dst_host, dst_path, kind,
    * internal). `kind` is absolute | root_relative | relative;
    * `dst_path` strips query/fragment and defaults to "/"; `internal`
    * marks links whose resolved host equals the document's own. */
  def extract(df: DataFrame, idCols: Seq[String], htmlCol: String,
      hostCol: String): DataFrame = {
    val tags = regexp_extract_all(col(htmlCol), lit(TagRe), lit(0))
    val exploded = df
      .select((idCols :+ hostCol).map(col) :+ tags.as("_tags"): _*)
      .select((idCols :+ hostCol).map(col) :+
        explode(col("_tags")).as("_tag"): _*)
    val href = trim(regexp_extract(col("_tag"),
      "(?is)\\bhref\\s*=\\s*[\"']([^\"']*)[\"']", 1))
    val withHref = exploded
      .withColumn("href", href)
      .withColumn("anchor", anchorText(col("_tag")))
      .drop("_tag")
      // fragment-only, empty, and non-navigational schemes drop
      .filter(length(col("href")) > 0 &&
        !col("href").startsWith("#") &&
        !lower(col("href")).rlike("^(mailto|javascript|tel|data):"))
    val isAbs = col("href").rlike("(?i)^https?://")
    val isRoot = col("href").startsWith("/")
    val absHost = graft.ops.UrlOps.host(col("href"))
    // path of an absolute URL: after the authority, before ? or #
    val absPath = regexp_extract(col("href"),
      "(?i)^https?://[^/?#]+([^?#]*)", 1)
    val rootPath = regexp_extract(col("href"), "^([^?#]*)", 1)
    withHref
      .withColumn("kind",
        when(isAbs, lit("absolute"))
          .when(isRoot, lit("root_relative"))
          .otherwise(lit("relative")))
      .withColumn("dst_host",
        when(isAbs, absHost)
          .when(isRoot, col(hostCol))
          .otherwise(lit(null).cast("string")))
      .withColumn("dst_path",
        when(isAbs, when(length(absPath) > 0, absPath).otherwise(lit("/")))
          .when(isRoot, when(length(rootPath) > 0, rootPath)
            .otherwise(lit("/")))
          .otherwise(lit(null).cast("string")))
      .withColumn("internal",
        when(col("dst_host").isNotNull, col("dst_host") === col(hostCol)))
  }

  /** Host-graph aggregation of [[extract]] output: weighted edges
    * (src_host, dst_host, n_links) over external resolved links — the
    * input [[graft.graph.PageRank]] expects. One keyed aggregation. */
  def hostEdges(links: DataFrame, hostCol: String): DataFrame =
    links
      .filter(col("dst_host").isNotNull && col("dst_host") =!= col(hostCol) &&
        length(col("dst_host")) > 0)
      .groupBy(col(hostCol).as("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"))

  /** Anchor-text corpus from [[extract]] output: the top `k` most
    * frequent non-empty anchor texts per destination host — how the web
    * DESCRIBES each host, the classic relevance signal search/retrieval
    * corpora mine from link graphs (Brin & Page 1998 §2.2; anchor text
    * often describes a page better than the page itself). One
    * (dst_host, anchor)-keyed count, then `row_number <= k` per host —
    * which plans as WindowGroupLimit: a map-side partial top-k BEFORE
    * the shuffle, so a mega-host's million anchors never congregate in
    * one task un-pruned. */
  def anchorTexts(links: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counted = links
      .filter(col("dst_host").isNotNull && length(col("dst_host")) > 0 &&
        length(col("anchor")) > 0)
      .groupBy(col("dst_host"), col("anchor"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dst_host"))
      .orderBy(col("n").desc, col("anchor").asc)
    counted.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
  }
}
