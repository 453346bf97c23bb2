package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** JSON-string column parsing under the engine's own schema-string
  * dialect — the bridge between raw event/API payload columns
  * ("{\"user\": ..., \"tags\": [..]}" strings inside a parquet table,
  * the most common shape crawl metadata and instrumentation arrive in)
  * and typed columns the rest of the pipeline operates on. The schema
  * is declared in the same `str`/`int`/`list[x]`/`{k: t}` dialect the
  * semantic operators use ([[graft.core.SchemaTypes]]), so one schema
  * language covers LLM output contracts AND ingest parsing.
  *
  * Scale shape: `from_json` is a native Catalyst expression fused into
  * the scan (Jackson under the hood, no UDF); malformed rows yield null
  * fields (PERMISSIVE), which [[SchemaValidate]] then gates explicitly
  * — parse and contract-check stay separate, composable steps.
  */
object JsonOps {

  /** Parse `jsonCol` into typed top-level columns declared by `schema`
    * ((name, graft-type) pairs). Existing columns keep their values;
    * parsed fields append (name collisions are the caller's to avoid).
    * `keepRaw = false` drops the raw JSON string after parsing. */
  def parseColumn(df: DataFrame, jsonCol: String,
      schema: Seq[(String, String)], keepRaw: Boolean = true): DataFrame = {
    require(schema.nonEmpty, "parse_json needs at least one field")
    val struct = graft.core.SchemaTypes.toStruct(schema)
    val parsed = df.withColumn("_graft_json", from_json(col(jsonCol), struct))
    val withFields = schema.foldLeft(parsed) { case (acc, (name, _)) =>
      acc.withColumn(name, col(s"_graft_json.$name"))
    }
    val out = withFields.drop("_graft_json")
    if (keepRaw) out else out.drop(jsonCol)
  }
}
