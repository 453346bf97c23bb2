package graft.core

import org.apache.spark.sql.DataFrame

/** Registry for operator-internal `persist()` frames (MinHash/ngram dedup
  * docs, cascade scores): ops persist to avoid recomputing a shared input,
  * but the result DataFrame is lazy, so the op itself can never safely
  * unpersist. At bench scale eviction handles it; on a long-lived cluster
  * session the blocks pin executor storage memory. Runners flush between
  * queries with [[unpersistAll]] (Verify/Bench do; long-lived services
  * should too). Unpersisting is always SAFE — a re-used frame silently
  * recomputes. */
object PersistScope {
  private val frames = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Track an already-persisted frame; returns it unchanged. */
  def register(df: DataFrame): DataFrame = { frames.add(df); df }

  def registered: Int = frames.size()

  def unpersistAll(blocking: Boolean = false): Unit = {
    var df = frames.poll()
    while (df != null) {
      try df.unpersist(blocking)
      catch { case _: Exception => () } // session may already be stopped
      df = frames.poll()
    }
  }
}
