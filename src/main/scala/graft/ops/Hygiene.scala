package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, col, lit}

import graft.functions.{TextFunctions => TF}

/** DataFrame-level hygiene passes shared by the Frame and YAML surfaces —
  * ONE definition each (the [[graft.core.Joins.alignByName]] convention:
  * duplicated surface logic drifts). */
object Hygiene {

  /** Append the four sequential-attribution PII count columns. */
  def piiReport(df: DataFrame, textCol: String): DataFrame =
    TF.piiCounts(col(textCol)).foldLeft(df) {
      case (acc, (name, cnt)) => acc.withColumn(name, cnt)
    }

  /** C4-style word blocklist: drop rows containing any listed token, or
    * (`report = true`) append the per-row flag instead. NULL text contains
    * no blocked word — filter mode keeps it (a bare `!blocked` would drop
    * NULL rows under three-valued logic). */
  def blocklistWords(df: DataFrame, textCol: String, words: Seq[String],
      report: Boolean = false): DataFrame = {
    val blocked = TF.containsBlockedWord(col(textCol), words)
    if (report) df.withColumn("blocked", blocked)
    else df.filter(!coalesce(blocked, lit(false)))
  }

  /** SUBSTRING-phrase sibling of [[blocklistWords]]
    * ([[TF.containsBlockedPhrase]]'s gate): drop rows containing any
    * listed phrase, or (`report = true`) append the flag plus the
    * distinct-hit count. The single home both the YAML op and the Frame
    * builder call, so the two entry points cannot drift. */
  def blocklistPhrases(df: DataFrame, textCol: String,
      phrases: Seq[String], report: Boolean = false): DataFrame = {
    val blocked = TF.containsBlockedPhrase(col(textCol), phrases)
    if (report) df.withColumn("blocked", blocked)
      .withColumn("blocked_phrases",
        TF.blockedPhraseCount(col(textCol), phrases))
    else df.filter(!blocked) // containsBlockedPhrase coalesces null text
  }
}
