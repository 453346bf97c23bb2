package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Consistent pseudonymization — PII replacement that PRESERVES
  * coreference: every occurrence of the same entity inside a document
  * maps to the same numbered placeholder (`EMAIL_1`, `EMAIL_2`, …), so
  * "bob@x.com wrote to amy@y.org; amy@y.org replied" stays a readable
  * two-party exchange instead of three anonymous blobs. The standard
  * anonymization recipe (Presidio-style entity numbering) and the
  * privacy upgrade over [[Hygiene]]'s flat `[EMAIL]` redaction: flat
  * redaction destroys structure that conversation/thread corpora need.
  *
  * Determinism: entity numbers come from the SORTED distinct match list
  * (not first-occurrence order), so the mapping is independent of
  * partitioning and replayable in any engine. Replacement applies
  * longest-entity-first so one matched entity that is a substring of
  * another (a@b.co inside xa@b.com) cannot corrupt the longer match.
  *
  * Scale shape: pure per-row expressions — one regexp_extract_all +
  * distinct/sort (O(|text|)), then a fold over the MATCH list (bounded
  * by per-document entity count) doing one literal replace pass each;
  * no UDF, no shuffle, no driver state.
  */
object Pseudonymize {

  /** The engine's email pattern. Arbitrary `pattern`s are safe — the
    * fold's pair encoding parses at the FIRST ':' (the digit-only
    * `<len>|<idx>` head can contain neither delimiter), so matches
    * containing ':' or '|' round-trip intact (Round13Spec pins it). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Append `outCol` = `textCol` with every `pattern` match replaced by
    * `<label>_<k>` (k = 1-based rank of the match in sorted distinct
    * order), plus `n_<lower(label)>_entities`. */
  def apply(df: DataFrame, textCol: String,
      pattern: String = EmailPattern, label: String = "EMAIL",
      outCol: String = "text_pseudo"): DataFrame = {
    val text = coalesce(col(textCol), lit(""))
    val found = sortedMatches(text, pattern)
    // sequence(1, 0) yields a DESCENDING [1, 0] in Spark (not empty), so
    // the zero-match case must bypass the pair machinery entirely.
    df.withColumn(outCol,
      when(size(found) === 0, text)
        .otherwise(foldReplace(found, text, label)))
      .withColumn(s"n_${label.toLowerCase(java.util.Locale.ROOT)}_entities",
        size(found).cast("bigint"))
  }

  /** CONVERSATION-scoped pseudonymization: numbering is consistent
    * across every message of the `messagesCol`
    * (array<struct<role, content>>) conversation — "bob@x.com" in turn
    * 1 and turn 5 maps to the same EMAIL_k, which per-message
    * application cannot guarantee (each turn would restart numbering
    * from ITS sorted match list). The privacy pass SFT/DPO chat corpora
    * need between [[graft.ops.ChatOps.fromEventLog]] and render.
    *
    * The match list extracts ONCE per conversation into a real column
    * (staged — a HOF lambda re-evaluates closed-over EXPRESSIONS per
    * element, which would re-scan the whole conversation per message),
    * then each message folds the shared list. Matches are extracted PER
    * MESSAGE and union-distinct'ed — never from a joined transcript, so
    * a pattern that can cross whitespace (`\s`, `[\s\S]`) cannot invent
    * phantom entities spanning a message boundary (which would silently
    * consume placeholder ranks and inflate the entity count). */
  def conversation(df: DataFrame, messagesCol: String,
      pattern: String = EmailPattern, label: String = "EMAIL",
      outCol: String = "messages_pseudo"): DataFrame = {
    val msgs = col(messagesCol)
    val perMsg = array_sort(array_distinct(flatten(
      transform(msgs, m => regexp_extract_all(
        coalesce(m.getField("content"), lit("")), lit(pattern), lit(0))))))
    val nCol = s"n_${label.toLowerCase(java.util.Locale.ROOT)}_entities"
    df.withColumn("_graft_found",
      coalesce(perMsg, array().cast("array<string>")))
      .withColumn(outCol, transform(msgs, m => {
        val content = coalesce(m.getField("content"), lit(""))
        // withField preserves every OTHER struct field (name, ts,
        // tool-call payloads) — rebuilding (role, content) would
        // silently drop them
        m.withField("content",
          when(size(col("_graft_found")) === 0, content)
            .otherwise(foldReplace(col("_graft_found"), content, label)))
      }))
      .withColumn(nCol, size(col("_graft_found")).cast("bigint"))
      .drop("_graft_found")
  }

  /** [[conversation]] for TYPED-content-parts messages
    * (`parts: array<struct<type, text, ...>>` — the
    * [[graft.ops.ChatOps.partsToContent]] shape): the match list
    * extracts per TEXT part (union-distinct, same no-phantom contract
    * as the flat form), numbering is consistent across every text part
    * of the conversation, and replacement applies inside text parts
    * only — image/audio reference parts pass through untouched
    * (withField all the way down, so no part or message field is
    * dropped). */
  def conversationParts(df: DataFrame, messagesCol: String,
      pattern: String = EmailPattern, label: String = "EMAIL",
      outCol: String = "messages_pseudo"): DataFrame = {
    val msgs = col(messagesCol)
    val emptyS = array().cast("array<string>")
    val perPart = array_sort(array_distinct(flatten(
      transform(msgs, m => coalesce(flatten(
        transform(m.getField("parts"), p =>
          when(p.getField("type") === "text",
            regexp_extract_all(coalesce(p.getField("text"), lit("")),
              lit(pattern), lit(0)))
            .otherwise(emptyS))), emptyS)))))
    val nCol = s"n_${label.toLowerCase(java.util.Locale.ROOT)}_entities"
    df.withColumn("_graft_found", coalesce(perPart, emptyS))
      .withColumn(outCol, transform(msgs, m =>
        m.withField("parts", transform(m.getField("parts"), p => {
          val ptxt = coalesce(p.getField("text"), lit(""))
          when(p.getField("type") === "text",
            p.withField("text",
              when(size(col("_graft_found")) === 0, ptxt)
                .otherwise(foldReplace(col("_graft_found"), ptxt, label))))
            .otherwise(p)
        }))))
      .withColumn(nCol, size(col("_graft_found")).cast("bigint"))
      .drop("_graft_found")
  }

  /** Sorted distinct matches of `pattern` in `text` — the shared
    * numbering base: ranks come from THIS order, so the mapping is
    * partition-independent and replayable in any engine. */
  private def sortedMatches(text: Column, pattern: String): Column =
    array_sort(array_distinct(
      regexp_extract_all(text, lit(pattern), lit(0))))

  /** Replace every `found` match in `text` with `<label>_<k>`
    * (k = 1-based rank in `found`), longest-entity-first.
    * "<lenkey>|<idxkey>:<match>" — lenkey = 100000 - len (so a plain
    * ascending sort yields length-DESC), idxkey = zero-padded sorted
    * rank (ties break match-ascending). Both engines sort the same
    * strings, so replacement order is identical everywhere. The parse
    * is delimiter-safe: the digit-only head ends at the FIRST ':'. */
  private def foldReplace(found: Column, text: Column,
      label: String): Column = {
    val pairs = zip_with(found, sequence(lit(1), size(found)), (e, i) =>
      concat(lpad((lit(100000) - length(e)).cast("string"), 6, "0"),
        lit("|"), lpad(i.cast("string"), 6, "0"), lit(":"), e))
    aggregate(array_sort(pairs), text, (acc, p) => {
      val head = substring_index(p, ":", 1)
      val k = substring_index(head, "|", -1).cast("int").cast("string")
      val e = p.substr(length(head) + 2, length(p))
      replace(acc, e, concat(lit(label), lit("_"), k))
    })
  }
}
