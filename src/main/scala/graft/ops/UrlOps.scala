package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and host/domain analytics — the first step of every
  * web-corpus curation pipeline (publicly described for C4/Common Crawl
  * processing, RefinedWeb's URL filtering, and Dolma's URL taggers; the
  * reference's web ops fetch URLs but never normalize them — §2.14 engine
  * extension alongside the PII/blocklist curation family).
  *
  * Why it matters at 100 TB: crawl corpora key dedup, blocklists, and
  * per-site quotas on the URL. Un-normalized URLs split one logical page
  * into many keys (`HTTP://Host:80/a/#frag` vs `http://host/a`), silently
  * defeating exact dedup and per-domain budgets.
  *
  * Every function is a pure codegen'd regexp/array expression — no UDF, no
  * shuffle, fused into the scan; [[hostStats]] adds the one keyed agg its
  * output needs. Patterns avoid lookaround so any RE2-class engine (and the
  * DuckDB oracle) replays them.
  *
  * Canonical form = lowercase scheme+host, fragment stripped, default ports
  * (:80/:443) stripped, `utm_*` tracking params stripped (empty `?` cleaned
  * up), trailing slashes stripped. Deliberately NOT done: query-param
  * sorting (reorders semantics on some sites) and percent-decoding (changes
  * byte identity) — both belong to site-specific policy, not the engine.
  */
object UrlOps {

  /** Lowercased host (no port): the authority between `://` and the first
    * `/ : ? #`. Empty string when the input has no scheme-ed authority. */
  def host(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))

  /** Registered domain: last two host labels, or last three when the TLD is
    * 2 letters and the second-level label is a common public-suffix prefix
    * (`co`, `com`, `net`, `org`, `gov`, `ac`, `edu`) — the `example.co.uk`
    * case. A full public-suffix list is policy data the caller can swap in;
    * this heuristic covers the overwhelming bulk of crawl traffic. */
  def registeredDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val tld = element_at(labels, -1)
    val sld = when(n >= 2, element_at(labels, -2)).otherwise(lit(""))
    val three = n >= 3 && length(tld) === 2 &&
      sld.isin("co", "com", "net", "org", "gov", "ac", "edu")
    when(n <= 1, hostCol)
      .when(three, concat_ws(".", element_at(labels, -3), sld, tld))
      .otherwise(concat_ws(".", sld, tld))
  }

  /** Registered domain under an explicit PUBLIC-SUFFIX TABLE — the
    * swappable-policy form of [[registeredDomain]] (whose 7-prefix
    * heuristic stays the zero-config default). `suffixes` is one string
    * column of suffixes ("com", "co.uk", "ac.jp", ... — the
    * publicsuffix.org list minus wildcard/exception rules, which are <1%
    * of entries; a caller needing them pre-expands against its hosts).
    *
    * Longest-match semantics: the registered domain is one label plus the
    * LONGEST listed suffix that tail-matches the host; a host that IS a
    * suffix stays itself; a host matching nothing falls back to the PSL
    * default rule (`*` — last label is the suffix, so last two labels).
    *
    * Scale shape: `maxLabels` BROADCAST hash joins (the suffix table is
    * ~9k rows), one per candidate tail length, longest first — no explode,
    * no re-aggregation shuffle, runs map-side in the scan stage. */
  def registeredDomainViaTable(df: DataFrame, hostCol: String,
      suffixes: DataFrame, outCol: String = "domain",
      maxLabels: Int = 4): DataFrame = {
    require(suffixes.columns.length == 1,
      s"suffix table must have exactly one column, got ${suffixes.columns.toSeq}")
    val sfxCol = suffixes.columns.head
    val host = col(hostCol)
    val labels = split(host, "\\.")
    val n = size(labels)
    // candidate tail of k labels (null when the host is too short — a null
    // join key matches nothing)
    def cand(k: Int): Column =
      when(n >= k, concat_ws(".", slice(labels, -k, k))).otherwise(lit(null))
    val withCands = (1 to maxLabels).foldLeft(df) { (d, k) =>
      d.withColumn(s"_cand_$k", cand(k))
    }
    val joined = (1 to maxLabels).foldLeft(withCands) { (d, k) =>
      d.join(
        broadcast(suffixes.select(col(sfxCol).as(s"_sfx_$k")).distinct()),
        d(s"_cand_$k") === col(s"_sfx_$k"), "left")
    }
    // longest matched suffix wins; one label in front of it if there is one
    val matched = (maxLabels to 1 by -1).map { k =>
      val dom = when(n > k,
        concat_ws(".", element_at(labels, -(k + 1)), col(s"_cand_$k")))
        .otherwise(host)
      (col(s"_sfx_$k").isNotNull, dom)
    }
    val fallback = when(n <= 1, host)
      .otherwise(concat_ws(".", element_at(labels, -2), element_at(labels, -1)))
    val domain = matched.foldRight(fallback) { case ((hit, dom), rest) =>
      when(hit, dom).otherwise(rest)
    }
    joined.withColumn(outCol, domain)
      .drop((1 to maxLabels).flatMap(k => Seq(s"_cand_$k", s"_sfx_$k")): _*)
  }

  /** Number of non-empty path segments (`https://h/a/b/` -> 2). */
  def pathDepth(url: Column): Column = {
    val afterHost = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val path = regexp_replace(afterHost, "[?#].*$", "")
    size(filter(split(path, "/"), s => s =!= ""))
  }

  /** Canonical URL (see object doc for the exact rule set). */
  def canonicalize(url: Column): Column = {
    // 1. strip fragment
    val noFrag = regexp_replace(url, "#.*$", "")
    // 2. lowercase scheme + authority (only that prefix)
    val auth = regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val lowered = concat(lower(auth), rest)
    // 3. strip default ports (host ends the authority, so :80/:443 sit
    //    directly before /, ? or end — capture the boundary, no lookahead)
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(https://[^/:?#]*):443([/?]|$)", "$1$2"),
      "^(http://[^/:?#]*):80([/?]|$)", "$1$2")
    // 4. drop utm_* tracking params — anchored at a [?&] boundary so a
    //    param merely ENDING in "utm_…" (`?xutm_a=1`) or a path segment
    //    (`/p/utm_source=x/q`) is never touched; the run form consumes
    //    consecutive utm params in one match (regexp_replace scans the
    //    original string, so `?utm_a=1&utm_b=2` must fall to ONE match —
    //    the boundary of the second was consumed by the first)
    val noUtm = regexp_replace(noPort,
      "([?&])utm_[a-z]+=[^&#]*(&utm_[a-z]+=[^&#]*)*&?", "$1")
    val tidied = regexp_replace(noUtm, "[?&]$", "")
    // 5. strip trailing slashes of the PATH only: the run directly before
    //    the FIRST '?' (the query delimiter), or at end-of-string when no
    //    '?' exists. `[^?]*?` cannot cross a '?', so with a query string
    //    present the `$` branch is unreachable and slashes inside
    //    query-param VALUES (`?next=/home/`) stay untouched — param
    //    semantics are deliberately not the engine's to rewrite. Anchored
    //    at ^, so the global regexp_replace fires at most once; non-greedy
    //    `*?` is RE2-safe (no lookaround).
    regexp_replace(tidied, "^([^?]*?)/+([?]|$)", "$1$2")
  }

  /** Append `url_canon`, `host`, `domain`, `path_depth`. */
  def parse(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    val h = host(u)
    df.withColumn("url_canon", canonicalize(u))
      .withColumn("host", h)
      .withColumn("domain", registeredDomain(h))
      .withColumn("path_depth", pathDepth(u).cast("bigint"))
  }

  /** Per-registered-domain corpus stats: page count, distinct hosts, mean
    * path depth — the table per-site quotas and blocklist audits read.
    * `suffixes`: optional public-suffix table re-deriving `domain` via
    * [[registeredDomainViaTable]] before the aggregation. */
  def hostStats(df: DataFrame, urlCol: String,
      suffixes: Option[DataFrame] = None): DataFrame = {
    val parsed = parse(df, urlCol)
    suffixes.fold(parsed)(s =>
      registeredDomainViaTable(parsed, "host", s, "domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_pages"),
        countDistinct(col("host")).as("n_hosts"),
        round(avg(col("path_depth")), 6).as("avg_path_depth"))
  }
}
