package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt politeness evaluation — the crawl-side gate every fetch
  * pipeline consults before touching a URL (RFC 9309, the Robots
  * Exclusion Protocol): parse per-host robots.txt bodies into rule
  * tables and evaluate (host, path) pairs against them. Completes the
  * crawl family around [[UrlOps]] (canonicalize/quota) and the
  * [[graft.ops.WebOps]] fetch seam; publicly standard semantics —
  * group selection by user-agent (specific group if one exists, else
  * `*`), longest-path-match wins, allow wins ties, no match = allowed,
  * `*` wildcard and `$` end-anchor supported.
  *
  * Scale shape: parsing is ONE per-row fold over the file's lines
  * (struct accumulator carrying the current user-agent run — O(1)
  * pointer work per line) exploded into a (host, agent, allow, prefix)
  * rule table; evaluation is two HOST-keyed joins (has-specific-group,
  * then the applicable rules) + one (url)-keyed max-struct aggregation —
  * all keyed shuffles bounded by rule-table size, no driver state. Rule
  * patterns become anchored regexes per row (rules per host are few —
  * tens, not thousands — so the non-foldable rlike is bounded).
  */
object RobotsTxt {

  /** Parse a robots.txt body into array<struct<agent, allow, prefix>>.
    * Field names are case-insensitive; comments (`# …`) strip; a rule
    * line binds to every agent of the PRECEDING `User-agent:` run;
    * empty-value Disallow lines (allow-all idiom) contribute nothing. */
  /** Whitespace trim covering tabs (Spark's `trim` strips 0x20 only). */
  private def wsTrim(c: Column): Column =
    regexp_replace(c, "^\\s+|\\s+$", "")

  def rulesCol(content: Column): Column = {
    val lines = split(coalesce(content, lit("")), "\r?\n")
    val emptyRules = array().cast(
      "array<struct<agent:string,allow:boolean,prefix:string>>")
    val zero = struct(
      array().cast("array<string>").as("agents"),
      lit(false).as("inRun"),
      emptyRules.as("rules"))
    val folded = aggregate(lines, zero, (acc, raw) => {
      val line = wsTrim(regexp_replace(raw, "#.*$", ""))
      val hasColon = line.contains(":")
      val field = lower(wsTrim(substring_index(line, ":", 1)))
      // Everything after the FIRST colon (paths may legally contain ':'
      // — 'Disallow: /api:v2/' must keep '/api:v2/'); a colon-less line
      // has no value and can never fabricate a rule.
      val value = when(hasColon,
        wsTrim(regexp_replace(line, "^[^:]*:", ""))).otherwise(lit(""))
      val agents = acc.getField("agents")
      val inRun = acc.getField("inRun")
      val rules = acc.getField("rules")
      val isUa = field === "user-agent" && length(value) > 0
      val isRule = (field === "allow" || field === "disallow") &&
        length(value) > 0
      when(isUa,
        struct(
          when(inRun, concat(agents, array(lower(value))))
            .otherwise(array(lower(value))).as("agents"),
          lit(true).as("inRun"),
          rules.as("rules")))
        .when(isRule,
          struct(agents.as("agents"), lit(false).as("inRun"),
            concat(rules, transform(agents, a => struct(
              a.as("agent"),
              (field === "allow").as("allow"),
              value.as("prefix")))).as("rules")))
        .otherwise(
          struct(agents.as("agents"), lit(false).as("inRun"),
            rules.as("rules")))
    })
    folded.getField("rules")
  }

  /** Explode (host, robots body) rows into (host, sitemap) — the
    * `Sitemap:` directives (RFC 9309 §2.3 allows them anywhere in the
    * file, outside any group), the crawl-frontier seed list. Pure
    * per-row regexp explode. */
  def sitemaps(df: DataFrame, hostCol: String,
      contentCol: String): DataFrame =
    df.select(col(hostCol).as("host"),
      explode(regexp_extract_all(coalesce(col(contentCol), lit("")),
        lit("(?im)^\\s*sitemap\\s*:\\s*(\\S+)"), lit(1))).as("sitemap"))

  /** Explode (host, robots body) rows into (host, agent,
    * delay_seconds) — the `Crawl-delay:` extension directive (not in
    * RFC 9309 but honored by most major engines' published parsers):
    * binds to the PRECEDING `User-agent:` run exactly like rules, so a
    * fetcher picks its delay with the same group selection as
    * [[isAllowed]]. Non-numeric values drop; same one-fold-per-row
    * shape as [[rulesCol]]. */
  def crawlDelays(df: DataFrame, hostCol: String,
      contentCol: String): DataFrame = {
    // \r?\n split + full-whitespace trim: CRLF bodies and tab-separated
    // values (both legal per the RFC 9309 grammar) parse identically to
    // LF/space ones
    val lines = split(coalesce(col(contentCol), lit("")), "\r?\n")
    val empty = array().cast("array<struct<agent:string,delay:double>>")
    val zero = struct(
      array().cast("array<string>").as("agents"),
      lit(false).as("inRun"),
      empty.as("delays"))
    val folded = aggregate(lines, zero, (acc, raw) => {
      val line = wsTrim(regexp_replace(raw, "#.*$", ""))
      val hasColon = line.contains(":")
      val field = lower(wsTrim(substring_index(line, ":", 1)))
      val value = when(hasColon,
        wsTrim(regexp_replace(line, "^[^:]*:", ""))).otherwise(lit(""))
      val agents = acc.getField("agents")
      val inRun = acc.getField("inRun")
      val delays = acc.getField("delays")
      val isUa = field === "user-agent" && length(value) > 0
      // regex-gate BEFORE the cast: ANSI mode throws on a malformed
      // cast even inside an unmatched when() condition
      val numOk = value.rlike("^[0-9]+(\\.[0-9]+)?$")
      val num = when(numOk, value.cast("double"))
      val isDelay = field === "crawl-delay" && numOk
      when(isUa,
        struct(
          when(inRun, concat(agents, array(lower(value))))
            .otherwise(array(lower(value))).as("agents"),
          lit(true).as("inRun"),
          delays.as("delays")))
        .when(isDelay,
          struct(agents.as("agents"), lit(false).as("inRun"),
            concat(delays, transform(agents, a =>
              struct(a.as("agent"), num.as("delay")))).as("delays")))
        .otherwise(
          struct(agents.as("agents"), lit(false).as("inRun"),
            delays.as("delays")))
    })
    df.select(col(hostCol).as("host"),
      explode(folded.getField("delays")).as("_d"))
      .select(col("host"), col("_d.agent").as("agent"),
        col("_d.delay").as("delay_seconds"))
  }

  /** Effective crawl delay per host for `agent` — the same RFC 9309
    * product-token group selection as [[isAllowed]] applied to a
    * [[crawlDelays]] table: the LONGEST group agent that prefixes the
    * crawler's product token wins; hosts with only a `*` delay fall
    * back to it; hosts with NO applicable delay row emit
    * `defaultDelay`. When a winning group carries several delay lines,
    * the MAXIMUM applies (the polite reading). One host-keyed
    * aggregation over the (small) delays table + one host-keyed join
    * back onto `hosts` (single `host` column, deduplicated). */
  def effectiveDelay(hosts: DataFrame, delays: DataFrame, agent: String,
      defaultDelay: Double = 0.0): DataFrame = {
    val token = agent.toLowerCase(java.util.Locale.ROOT)
      .split("/", 2)(0).trim
    // lower() on the table side: crawlDelays emits lowercase agents,
    // but externally-written delay tables may not
    val d = delays.select(col("host").as("_dhost"),
      lower(col("agent")).as("_dagent"),
      col("delay_seconds").as("_dsec"))
    val applicable = d.filter(col("_dagent") === "*" ||
      lit(token).startsWith(col("_dagent")))
    // pick the LONGEST matching agent per host ('*' has length 1, so a
    // specific group always outranks it), then the max delay in it
    val best = applicable
      .groupBy(col("_dhost"))
      .agg(max(struct(
        when(col("_dagent") === "*", lit(0))
          .otherwise(length(col("_dagent"))).as("l"),
        col("_dagent").as("a"))).as("_m"))
      .select(col("_dhost").as("_bhost"), col("_m.a").as("_ba"))
    val winner = applicable
      .join(best, col("_dhost") === col("_bhost") &&
        col("_dagent") === col("_ba"))
      .groupBy(col("_dhost").as("host"))
      .agg(max(col("_dsec")).as("_sec"))
    hosts.select(col("host")).distinct()
      .join(winner, Seq("host"), "left")
      .select(col("host"),
        coalesce(col("_sec"), lit(defaultDelay)).as("delay_seconds"))
  }

  /** Explode (host, robots body) rows into the rule table
    * (host, agent, allow, prefix). */
  def parseRules(df: DataFrame, hostCol: String,
      contentCol: String): DataFrame =
    df.select(col(hostCol).as("host"),
      explode(rulesCol(col(contentCol))).as("_r"))
      .select(col("host"), col("_r.agent").as("agent"),
        col("_r.allow").as("allow"), col("_r.prefix").as("prefix"))

  /** RFC 9309 pattern → anchored Java/RE2 regex: escape regex
    * metachars, `*` → `.*`, a trailing `$` stays an anchor. */
  private def patternRegex(prefix: Column): Column = {
    val escaped = regexp_replace(prefix,
      "([.^$+?(){}\\[\\]|\\\\])", "\\\\$1")
    val starred = regexp_replace(escaped, "\\*", ".*")
    // the escape pass turned a trailing $ into \$ — restore the anchor
    val anchored = regexp_replace(starred, "\\\\\\$$", "\\$")
    concat(lit("^"), anchored)
  }

  /** Evaluate each (idCol, hostCol, pathCol) row of `urls` against
    * `rules` ([[parseRules]] output) for `agent`: appends `allowed`
    * plus the deciding `matched_rule` prefix ('' when no rule matched).
    * Group selection per RFC 9309 §2.2.1 product-token matching: the
    * crawler's product token (the `agent` string lowercased, version
    * tail after `/` stripped) selects the LONGEST group user-agent that
    * is a prefix of it — so `graftbot/1.2` and `graftbot-news` both
    * bind to a `graftbot` group (and `graftbot-news` prefers a
    * `graftbot-news` group when the host has one), falling through to
    * `*` only when NO group prefixes the token. Longest matched rule
    * wins; ties go to allow (then lexicographically-max prefix, for
    * determinism). Two host-keyed joins + one url-keyed max-struct
    * aggregation. */
  def isAllowed(urls: DataFrame, idCol: String, hostCol: String,
      pathCol: String, rules: DataFrame, agent: String): DataFrame = {
    val token = agent.toLowerCase(java.util.Locale.ROOT)
      .split("/", 2)(0).trim
    val r = rules.select(col("host").as("_rhost"),
      col("agent").as("_ragent"), col("allow").as("_rallow"),
      col("prefix").as("_rprefix"))
    val bestGroup = r.filter(col("_ragent") =!= "*")
      .filter(lit(token).startsWith(col("_ragent")))
      .groupBy(col("_rhost"))
      .agg(max(struct(length(col("_ragent")).as("l"),
        col("_ragent").as("a"))).as("_m"))
      .select(col("_rhost").as("_shost"), col("_m.a").as("_eff"))
    val withAgent = urls
      .join(bestGroup, col(hostCol) === col("_shost"), "left")
      .drop("_shost")
      .withColumn("_eff_agent", coalesce(col("_eff"), lit("*")))
      .drop("_eff")
    val joined = withAgent.join(r,
      col(hostCol) === col("_rhost") &&
        col("_ragent") === col("_eff_agent"), "left")
    val matched = col("_rprefix").isNotNull &&
      regexp_like(col(pathCol), patternRegex(col("_rprefix")))
    val score = when(matched, length(col("_rprefix"))).otherwise(lit(-1))
    val allowInt = when(col("_rallow"), lit(1)).otherwise(lit(0))
    // Verdict keyed by idCol alone (the row key), joined BACK onto the
    // input so every url column survives and duplicate ids fan out
    // instead of collapsing — the appends-columns contract.
    val verdict = joined.groupBy(col(idCol))
      .agg(max(struct(score.as("s"), allowInt.as("a"),
        coalesce(col("_rprefix"), lit("")).as("p"))).as("_best"))
      .select(col(idCol),
        (col("_best.s") < 0 || col("_best.a") === 1).as("allowed"),
        when(col("_best.s") < 0, lit("")).otherwise(col("_best.p"))
          .as("matched_rule"))
    urls.join(verdict, Seq(idCol), "left")
  }
}
