package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Run-length collapse over ordered event streams (gaps-and-islands) —
  * one row per maximal run of CONSECUTIVE equal values per key: the
  * event-log burst summarizer ("user X emitted 400 consecutive 'error'
  * events from t1 to t2"), the batch sibling of [[RepeatCollapse]]'s
  * token-level pass and the building block behind retry-storm and
  * crawler-loop detection.
  *
  * Scale shape: the classic two-window islands derivation, BOTH windows
  * PARTITIONED BY the key (state = one key's events — the natural unit;
  * never an unpartitioned sort), then one (key, run)-keyed aggregation.
  * Keys parallelize; a single key's history is inherently sequential,
  * exactly like sessionize (q06).
  */
object Runs {

  /** One row per run: (keyCol, valueCol, run_start, run_end, n_events)
    * where start/end are the `orderCol` bounds of the run. Ties in
    * `orderCol` break by `tieCol` for a deterministic run assignment. */
  def collapse(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol), col(tieCol))
    val changed = when(
      lag(col(valueCol), 1).over(w).isNull ||
        lag(col(valueCol), 1).over(w) =!= col(valueCol), 1L)
      .otherwise(0L)
    df.withColumn("_run",
      sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("_run"))
      .agg(first(col(valueCol)).as(valueCol),
        min(col(orderCol)).as("run_start"),
        max(col(orderCol)).as("run_end"),
        count(lit(1)).as("n_events"))
      .drop("_run")
  }
}
