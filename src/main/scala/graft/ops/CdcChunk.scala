package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Content-defined chunking (CDC) and sub-document chunk dedup — the
  * text-corpus analog of the LBFS/Venti rolling-hash chunking idea: a
  * chunk boundary falls AFTER every word whose hash ≡ 0 (mod `p`), so
  * boundaries are a pure function of local content. Insert or delete a
  * paragraph and every OTHER chunk's identity is unchanged — which is what
  * makes chunk-level dedup robust to boilerplate shifts where fixed-size
  * windows resynchronize a whole document. Mean chunk length ≈ `p` words.
  *
  * The reference dedups whole documents only; this is a §2.14 engine
  * extension next to the exact/line/span dedup family (span dedup catches
  * REPEATED windows; CDC catches SHARED content across documents at
  * sub-document granularity, e.g. quoted passages and templated footers).
  *
  * Scale shape: chunking is a pure per-row fold (no shuffle, no explode
  * round-trip — boundary markers are attached per word, then one
  * string fold concatenates within chunks); dedup stats are one keyed agg
  * on the 16-byte chunk hash; [[removeDuplicateChunks]] ships (hash, doc,
  * idx) triples — never chunk text — through its shuffle and anti-joins
  * the DUPLICATE-sized side back. Everything is codegen'd expressions the
  * DuckDB oracle replays (md5-prefix hashing, like the bloom filter).
  */
object CdcChunk {

  /** unit-separator: marks a chunk boundary inside the folded string. */
  private val Sep = "\u001e"

  /** True iff a boundary falls after `word`: md5-prefix hash ≡ 0 mod p. */
  private def isBoundary(word: Column, p: Int): Column =
    conv(substring(md5(word), 1, 13), 16, 10).cast("bigint") % p === 0

  /** `text` split into word runs delimited AFTER every word satisfying
    * `boundary` (array<string>, each run space-joined). Pure expression:
    * words get a boundary marker appended, ONE `array_join` rebuilds the
    * text (boundary words now carry a trailing marker), one split on
    * "marker + space" recovers the runs, and a `$`-anchored replace
    * strips the marker a final boundary word leaves on the last run.
    * O(|text|) total — an `aggregate` fold here would copy the
    * accumulated string per word (O(words × |text|)), which book-length
    * documents cannot afford. Shared by CDC chunking (hash boundary)
    * and [[Segment]] (punctuation boundary). */
  def chunksByBoundary(text: Column, boundary: Column => Column): Column = {
    val words = filter(split(text, " "), w => length(w) > 0)
    val marked = transform(words, w =>
      when(boundary(w), concat(w, lit(Sep))).otherwise(w))
    val runs = split(array_join(marked, " "), Sep + " ")
    filter(transform(runs, c => regexp_replace(c, Sep + "$", "")),
      c => length(c) > 0)
  }

  /** `text` split into content-defined chunks (hash boundary, mod `p`). */
  def chunksCol(text: Column, p: Int): Column =
    chunksByBoundary(text, w => isBoundary(w, p))

  /** One row per chunk: (id, chunk_idx, n_words, chunk_hash, chunk). */
  def explodeChunks(df: DataFrame, idCol: String, textCol: String,
      p: Int = 16): DataFrame =
    df.select(col(idCol),
      posexplode(chunksCol(col(textCol), p)).as(Seq("chunk_idx", "chunk")))
      .select(col(idCol), col("chunk_idx").cast("bigint").as("chunk_idx"),
        size(split(col("chunk"), " ")).cast("bigint").as("n_words"),
        md5(col("chunk")).as("chunk_hash"), col("chunk"))

  /** Cross-document duplication report: every chunk occurring more than
    * `minOccurrences` times — (chunk_hash, n_docs, n_occurrences,
    * n_words). One keyed agg on the hash. */
  def duplicateChunkStats(df: DataFrame, idCol: String, textCol: String,
      p: Int = 16, minOccurrences: Long = 2L): DataFrame =
    explodeChunks(df, idCol, textCol, p)
      .groupBy("chunk_hash")
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        first(col("n_words")).as("n_words"))
      .filter(col("n_occurrences") >= minOccurrences)

  /** Rewrite each document keeping only the FIRST global occurrence of
    * every chunk (ordered by (id, chunk_idx) — deterministic): the
    * sub-document dedup pass. Duplicate occurrences are identified on the
    * hash (16 bytes through the shuffle), and only the DUPLICATE-sized
    * set joins back (left_anti), so the rebuild never reshuffles chunk
    * text. Documents whose every chunk is a duplicate come back with
    * empty text. */
  def removeDuplicateChunks(df: DataFrame, idCol: String, textCol: String,
      p: Int = 16, outCol: String = "text_dedup"): DataFrame = {
    val chunks = explodeChunks(df, idCol, textCol, p)
    val dupes = chunks.select(col(idCol), col("chunk_idx"), col("chunk_hash"))
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col("chunk_hash"))
          .orderBy(col(idCol), col("chunk_idx"))))
      .filter(col("_rk") > 1)
      .select(col(idCol), col("chunk_idx"))
    val kept = chunks.join(dupes, Seq(idCol, "chunk_idx"), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws(" ",
        array_sort(collect_list(struct(col("chunk_idx"), col("chunk"))))
          .getField("chunk")).as(outCol))
    df.join(kept, Seq(idCol), "left")
      .withColumn(outCol, coalesce(col(outCol), lit("")))
  }
}
