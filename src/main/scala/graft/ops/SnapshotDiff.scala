package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-hash diff of two corpus snapshots — the audit step between
  * incremental ingests (what changed since the last dump?) that decides
  * which rows re-enter the dedup/decontaminate/export pipeline (publicly
  * standard lakehouse practice — cf. Delta Lake CDF / Iceberg snapshot
  * diffs; the reference has no snapshot story — §2.14 engine extension
  * alongside the file-ledger incremental scan and `dedup_against`).
  *
  * Scale shape: each side reduces to (id, md5(content)) in its scan stage
  * — the join ships 16-byte hashes, never content — then ONE full outer
  * join on the id. Output is `added` / `removed` / `changed` rows only
  * (`unchanged` is the bulk at 100 TB and is implicit; emitting it would
  * make the diff corpus-sized instead of delta-sized). Downstream,
  * `added ∪ changed` is exactly the re-process set.
  */
object SnapshotDiff {

  /** Diff `next` against `prev` by `idCol` identity and `contentExpr`
    * content hash. Output: (id, status ∈ added|removed|changed,
    * prev_hash, next_hash). */
  def apply(prev: DataFrame, next: DataFrame, idCol: String,
      contentExpr: String): DataFrame = {
    // Null content hashes like the empty string (documented collision):
    // md5(null) would be null, and a row with null content present
    // UNCHANGED in both snapshots would read as perpetually 'added' —
    // reprocessSet would re-feed it into the pipeline on every ingest.
    def h(d: DataFrame, as: String) = d.select(col(idCol).as("_id"),
      md5(coalesce(expr(contentExpr).cast("string"), lit(""))).as(as))
    val p = h(prev, "prev_hash")
    val n = h(next, "next_hash")
    p.join(n, Seq("_id"), "full_outer")
      .withColumn("status",
        when(col("prev_hash").isNull, "added")
          .when(col("next_hash").isNull, "removed")
          .when(col("prev_hash") =!= col("next_hash"), "changed")
          .otherwise("unchanged"))
      .filter(col("status") =!= "unchanged")
      // absent sides surface as '' (not NULL): the delta table is an
      // export/report artifact and downstream exact-compare tooling
      // (including the oracle gate) treats NULL as unequal to itself
      .select(col("_id").as(idCol), col("status"),
        coalesce(col("prev_hash"), lit("")).as("prev_hash"),
        coalesce(col("next_hash"), lit("")).as("next_hash"))
  }

  /** The rows of `next` that need re-processing: content is new or changed
    * since `prev`. One broadcast-able semi-join of the delta ids. */
  def reprocessSet(prev: DataFrame, next: DataFrame, idCol: String,
      contentExpr: String): DataFrame = {
    val delta = apply(prev, next, idCol, contentExpr)
      .filter(col("status").isin("added", "changed"))
      .select(col(idCol))
    next.join(delta, Seq(idCol), "left_semi")
  }

  /** SCHEMA diff between two snapshots — the other half of ingest
    * drift: content diffs catch changed ROWS, this catches a provider
    * silently adding, dropping, or retyping COLUMNS between dumps (the
    * failure that breaks every downstream reader at once). Pure
    * driver-side metadata (schemas, never data — zero jobs); output is
    * one row per changed column, sorted by name:
    * (col_name, change ∈ added|removed|type_changed, prev_type,
    * cur_type), empty when the schemas agree. */
  def schemaDiff(prev: DataFrame, cur: DataFrame): DataFrame = {
    val p = prev.schema.fields.map(f => f.name -> f.dataType.sql).toMap
    val c = cur.schema.fields.map(f => f.name -> f.dataType.sql).toMap
    val rows = (p.keySet ++ c.keySet).toSeq.sorted.flatMap { name =>
      (p.get(name), c.get(name)) match {
        case (None, Some(t))            => Some((name, "added", "", t))
        case (Some(t), None)            => Some((name, "removed", t, ""))
        case (Some(a), Some(b)) if a != b =>
          Some((name, "type_changed", a, b))
        case _                          => None
      }
    }
    val spark = prev.sparkSession
    import spark.implicits._
    rows.toDF("col_name", "change", "prev_type", "cur_type")
  }
}
