package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL curation for web-corpus pipelines — the source-level filter every
  * public pretraining set applies before any text-level pass (C4's URL
  * filters, RefinedWeb's blocklist stage): extract the host, then drop
  * documents whose host matches a blocked domain or any of its subdomains.
  *
  * Pure `Column` expressions (codegen'd regexp/array ops) plus one
  * broadcast-able anti-join for the blocklist — the list side is
  * domain-count-sized (thousands to low millions), the corpus side streams.
  */
object UrlFunctions {

  /** Lower-cased host of a URL; empty string when the value has no
    * `scheme://host` shape. RE2-compatible (the DuckDB oracle replays it). */
  def domain(c: Column): Column =
    lower(regexp_extract(c, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))

  /** All dot-suffixes of the host, most-specific first:
    * "a.b.example.org" -> ["a.b.example.org", "b.example.org",
    * "example.org", "org"]. Blocking joins on these, so an entry
    * "example.org" blocks every subdomain without regex scans. */
  def domainSuffixes(c: Column): Column = {
    val labels = split(domain(c), "\\.")
    // right-fold over the reversed labels, never a
    // transform(sequence(...)) whose lambda closes over `labels`: a HOF
    // lambda re-evaluates closed-over expressions per element, which
    // re-ran the domain regex + split once PER SUFFIX. aggregate's
    // lambda sees only (acc, element), so the label array is evaluated
    // exactly once; suffix strings are byte-identical (dot-join of the
    // same label slices).
    reverse(aggregate(
      reverse(labels),
      struct(array().cast("array<string>").as("arr"),
        lit("").as("cur")),
      (acc, l) => {
        // first-element test = empty accumulator, NOT cur === "" — an
        // empty label (trailing-dot host) makes cur legitimately ""
        val cur = when(size(acc.getField("arr")) === 0, l)
          .otherwise(concat(l, lit("."), acc.getField("cur")))
        struct(concat(acc.getField("arr"), array(cur)).as("arr"),
          cur.as("cur"))
      },
      acc => acc.getField("arr")))
  }

  /** Rows whose URL host matches no blocklist entry (exact or subdomain).
    * The blocklist is a one-column DataFrame of lower-case domains; it
    * broadcasts (hint applied — blocklists are small next to the corpus)
    * and the corpus side never shuffles: explode suffixes, LEFT ANTI join,
    * keep rows with zero hits via a semi-join back on the originals. */
  def filterBlockedDomains(
      df: DataFrame,
      urlCol: String,
      blocklist: DataFrame): DataFrame = {
    val blockCol = blocklist.columns.head
    val blocked = broadcast(blocklist.select(
      lower(col(blockCol)).as("_graft_blocked")).distinct())
    val hit = df.select(col(urlCol),
        explode(domainSuffixes(col(urlCol))).as("_graft_sfx"))
      .join(blocked, col("_graft_sfx") === col("_graft_blocked"))
      .select(col(urlCol)).distinct()
    df.join(hit, Seq(urlCol), "left_anti")
  }

  /** Rows whose URL host matches no entry of an in-code blocklist: the
    * expression-only variant for short literal lists — stays inside
    * WholeStageCodegen, no join at all. */
  def filterBlockedDomains(
      df: DataFrame,
      urlCol: String,
      blocklist: Seq[String]): DataFrame = {
    require(blocklist.nonEmpty, "empty blocklist: nothing to filter")
    val dom = domain(col(urlCol))
    val bad = blocklist.map(_.toLowerCase).map(b =>
      dom === b || dom.endsWith("." + b)).reduce(_ || _)
    // A null URL matches no blocked domain — keep it, matching the
    // DataFrame-blocklist overload's left_anti semantics (a bare !bad
    // would drop null-URL rows under three-valued logic).
    df.filter(!coalesce(bad, lit(false)))
  }
}
