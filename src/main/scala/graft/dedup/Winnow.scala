package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
  * the MOSS algorithm): hash every word k-gram, then from each sliding
  * window of `w` consecutive hashes keep the minimum (rightmost on ties).
  * The selected (position, hash) set is the document's fingerprint, with
  * the paper's guarantee: any match of at least `w + k - 1` tokens
  * between two documents shares at least one fingerprint — so matching
  * fingerprints are a COMPLETE candidate generator for long shared
  * passages at a fraction of [[SpanDedup]]'s every-window cost (density
  * 2/(w+1) of all windows in expectation).
  *
  * Scale shape: fingerprint selection is a pure per-row expression over
  * the k-gram hash array (slice + array_min per window, O(tokens × w)
  * inside the row, no UDF); the shared-fingerprint report is one keyed
  * agg on the 52-bit hash. The DuckDB oracle replays selection exactly
  * (same md5-prefix hashes, same rightmost-min rule).
  */
object Winnow {

  /** 52-bit k-gram hash (md5 prefix — the engine's portable hash). */
  private def gramHash(g: Column): Column =
    conv(substring(md5(g), 1, 13), 16, 10).cast("bigint")

  /** Rightmost-min window selection over an ALREADY-MATERIALIZED hash
    * array column. The hash array must be a bound column, not an inline
    * expression: a lambda re-evaluates any expression it closes over PER
    * ELEMENT, which would turn the one-digest-per-gram pass into
    * O(grams²) digests (observed 60× on the oracle corpus). */
  private def selectFromHashes(hs: Column, w: Int): Column = {
    val m = size(hs)
    val wEff = least(lit(w), m)
    val nWin = m - wEff + 1
    val sel = transform(sequence(lit(1), nWin), j => {
      val win = slice(hs, j, wEff)
      val mn = array_min(win)
      // rightmost occurrence of the min: first position in the REVERSE
      val posInWin = wEff - array_position(reverse(win), mn).cast("int")
      struct((j - 1 + posInWin).cast("bigint").as("pos"),
        mn.as("hash"))
    })
    when(m >= 1, array_distinct(sel))
      .otherwise(array().cast("array<struct<pos:bigint,hash:bigint>>"))
  }

  /** Fingerprints of `text` (array<struct<pos, hash>>) for tests/ad-hoc
    * use. Prefer [[fingerprints]], which stages the hash array so the
    * selection lambda never recomputes it. */
  def fingerprintsCol(text: Column, k: Int, w: Int): Column = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(w >= 1, s"w must be >= 1, got $w")
    selectFromHashes(transform(TF.shingles(text, k), g => gramHash(g)), w)
  }

  /** One row per selected fingerprint: (id, pos, fp_hash). The k-gram
    * hash array materializes through the explode boundary (generators
    * evaluate their child once per row), so digests stay one-per-gram. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(w >= 1, s"w must be >= 1, got $w")
    val hashed = df.select(col(idCol),
      explode(array(transform(TF.shingles(col(textCol), k),
        g => gramHash(g)))).as("_hs"))
    hashed
      .select(col(idCol), explode(selectFromHashes(col("_hs"), w)).as("_fp"))
      .select(col(idCol), col("_fp.pos").as("pos"),
        col("_fp.hash").as("fp_hash"))
  }

  /** Cross-document shared-fingerprint report: fingerprints selected by
    * at least `minDocs` distinct documents — the long-shared-passage
    * candidate list (complete for matches ≥ w + k - 1 tokens). */
  def sharedFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4, minDocs: Long = 2L): DataFrame =
    sharedFromFingerprints(fingerprints(df, idCol, textCol, k, w), idCol,
      minDocs)

  /** [[sharedFingerprints]] over an ALREADY-COMPUTED fingerprint table —
    * the deployment shape: fingerprints are extracted once per corpus
    * (or stored per ingest) and every report reads them. */
  def sharedFromFingerprints(fps: DataFrame, idCol: String,
      minDocs: Long = 2L): DataFrame =
    fps.groupBy("fp_hash")
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)

  /** Candidate document pairs ranked by shared-fingerprint count — the
    * MOSS match report: (id_a, id_b, n_shared, pos_a, pos_b) with the
    * first (minimum-position) co-occurrence for localization. The
    * fingerprint self-join takes the dedup family's posting-head guard
    * (id-ordered head per hash, so a boilerplate fingerprint shared by
    * thousands of docs yields at most head² pairs, never n²). */
  def matchPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4,
      maxPostingHead: Option[Int] = Some(64)): DataFrame =
    pairsFromFingerprints(fingerprints(df, idCol, textCol, k, w), idCol,
      maxPostingHead)

  /** [[matchPairs]] over an already-computed fingerprint table. */
  def pairsFromFingerprints(fingerprintTable: DataFrame, idCol: String,
      maxPostingHead: Option[Int] = Some(64)): DataFrame = {
    val guarded = BucketGuard.head(fingerprintTable,
      Seq("fp_hash"), idCol, maxPostingHead)
    // The self-join consumes the table twice, so an UNCACHED input is
    // persisted (PersistScope-released). An ALREADY-CACHED input must NOT
    // be re-persisted: Spark's unpersist removes every cache entry
    // OCCURRING IN the unpersisted plan, so flushing a persisted
    // derivation of a long-lived cached table would evict the parent too.
    // But a CAPPED head over a cached input cannot simply recompute per
    // join side either — the head's row_number ties break arbitrarily, so
    // the two sides could keep DIFFERENT pos rows of the same tie group.
    // localCheckpoint materializes one consistent head without touching
    // the parent's cache entries.
    val alreadyCached = fingerprintTable.storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE
    val fps =
      if (!alreadyCached) graft.core.PersistScope.register(guarded.persist())
      else if (maxPostingHead.isEmpty) guarded
      else guarded.localCheckpoint()
    val a = fps.select(col(idCol).as("id_a"), col("pos").as("_pa"),
      col("fp_hash"))
    val b = fps.select(col(idCol).as("id_b"), col("pos").as("_pb"),
      col("fp_hash"))
    a.join(b, Seq("fp_hash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(countDistinct(col("fp_hash")).as("n_shared"),
        min(struct(col("_pa"), col("_pb"))).as("_first"))
      .select(col("id_a"), col("id_b"), col("n_shared"),
        col("_first._pa").as("pos_a"), col("_first._pb").as("pos_b"))
  }
}
