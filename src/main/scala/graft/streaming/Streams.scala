package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming operators (SURVEY.md §2.12: absent from the
  * reference; extension territory the driver mandates we cover Spark-first).
  *
  * All transforms are expressed on the streaming DataFrame so the micro-batch
  * planner reuses the same Catalyst pipeline as batch: a `readStream` source
  * swaps in, the operator code is identical (the semantic mapPartitions ops
  * compose with streams too — they are object operators, legal in
  * append-mode streams).
  */
object Streams {

  /** Watermarked tumbling-window aggregation over an event stream —
    * the canonical streaming rollup (event time = `tsCol`).
    */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      windowDuration: String,
      watermarkDelay: String,
      keyCol: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  final case class SessionInfo(
      user_id: Long, session_start: Long, session_end: Long, n_events: Long)
  final case class SessionState(start: Long, last: Long, n: Long)

  /** Gap-based sessionization with custom state (`mapGroupsWithState`):
    * per user, events within `gapSeconds` extend the current session; a
    * larger gap starts a new one. Each update emits the current session
    * snapshot (Update-mode consumers keep the latest row per user). The
    * batch analog is q06_sessionize; this is the always-on form.
    *
    * Input must have columns (user_id: Long, ts_seconds: Long).
    */
  def sessionize(
      events: Dataset[Row],
      gapSeconds: Long): Dataset[SessionInfo] = {
    import events.sparkSession.implicits._
    val byUser = events
      .selectExpr("user_id", "ts_seconds")
      .as[(Long, Long)](Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .groupByKey(_._1)
    byUser.mapGroupsWithState[SessionState, SessionInfo](
      GroupStateTimeout.NoTimeout) {
      case (userId, rows, state: GroupState[SessionState]) =>
        val ts = rows.map(_._2).toSeq.sorted
        val merged = ts.foldLeft(state.getOption) {
          case (None, t) => Some(SessionState(t, t, 1))
          case (Some(s), t) if t - s.last <= gapSeconds =>
            Some(SessionState(s.start, t, s.n + 1))
          case (Some(_), t) => Some(SessionState(t, t, 1)) // gap exceeded
        }
        merged.foreach(state.update)
        val s = merged.get
        SessionInfo(userId, s.start, s.last, s.n)
    }
  }

  /** Streaming exact dedup with keyed state (`flatMapGroupsWithState`):
    * the FIRST row per normalized-text fingerprint passes, every later
    * duplicate is dropped — the always-on analog of
    * [[graft.dedup.ExactDedup]]. State per fingerprint is one boolean; on a
    * real deployment bound it with a TTL/watermark policy. Input needs
    * (id: Long, text: String) columns.
    */
  def dedupExact(rows: Dataset[Row]): Dataset[(Long, String)] = {
    import rows.sparkSession.implicits._
    def fingerprint(text: String): String = {
      val normalized = text.trim.toLowerCase.replaceAll("\\s+", " ")
      java.security.MessageDigest.getInstance("MD5")
        .digest(normalized.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    rows.selectExpr("id", "text")
      .as[(Long, String)](Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .groupByKey { case (_, text) => fingerprint(text) }
      .flatMapGroupsWithState[Boolean, (Long, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (_, items, state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // The group iterator's order after the shuffle is partition
            // order, not arrival order — pick the min id so the surviving
            // record is deterministic across runs and parallelism.
            Iterator.single(items.minBy(_._1))
          }
      }
  }

  /** Streaming sink helper: run a streaming DataFrame to memory and return
    * the table name (tests / interactive inspection). */
  def toMemorySink(df: DataFrame, name: String, outputMode: OutputMode): Unit = {
    df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .start()
      .processAllAvailable()
  }
}
