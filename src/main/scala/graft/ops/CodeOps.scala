package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Native (non-LLM) row/group operators.
  *
  * The reference's `code_map` / `code_filter` / `code_reduce`
  * (reference docetl/operations/code_operations.py:190-378) run arbitrary
  * Python per row/group on the driver. Spark-first re-expression: the "code"
  * is a Spark SQL expression (or a `Column`), so everything stays inside
  * Catalyst/Tungsten — codegen'd, pushdown-able, and distributed. Arbitrary
  * Scala lambdas remain possible through `Dataset.map`, but expressions are
  * the preferred (and fast) path.
  */
object CodeMap {

  /** Add/replace computed columns, merged into the row like the reference's
    * `{**item, **output}` passthrough (reference docetl/operations/map.py:513).
    * `dropKeys` mirrors the drop-keys-only mode (map.py:358-372).
    */
  def apply(
      df: DataFrame,
      outputs: Seq[(String, String)],
      dropKeys: Seq[String] = Nil,
      limit: Option[Int] = None): DataFrame = {
    val base = limit.map(df.limit).getOrElse(df)
    // Sequential fold (not withColumns) so later outputs may reference
    // earlier ones; Catalyst's CollapseProject folds these into one node.
    val withCols = outputs.foldLeft(base) { case (d, (k, e)) => d.withColumn(k, expr(e)) }
    if (dropKeys.isEmpty) withCols else withCols.drop(dropKeys: _*)
  }
}

object CodeFilter {

  /** Keep rows where the predicate expression is true
    * (reference docetl/operations/code_operations.py:332-378). `limit` stops
    * after n kept rows — Catalyst plans this as a CollectLimit over the
    * filter, i.e. early termination, same semantics as the reference.
    */
  def apply(df: DataFrame, predicate: String, limit: Option[Int] = None): DataFrame = {
    val filtered = df.filter(expr(predicate))
    limit.map(filtered.limit).getOrElse(filtered)
  }
}

object CodeReduce {

  /** Group by `reduceKeys` and compute aggregate expressions
    * (reference docetl/operations/code_operations.py:249-329).
    *
    *   - `reduceKeys == Seq("_all")` -> one global group (reference
    *     reduce.py:265-299 `_all` semantics).
    *   - `_counts_prereduce_{name}` records the group size (reference
    *     code_operations.py:325).
    *
    * Spark plans this as partial (map-side) + final aggregation — the shuffle
    * moves only partial aggregates, not rows, so it scales to 100 TB groups.
    */
  def apply(
      df: DataFrame,
      reduceKeys: Seq[String],
      aggs: Seq[(String, String)],
      name: String,
      addCounts: Boolean = true): DataFrame = {
    val aggCols = aggs.map { case (k, e) => expr(e).as(k) } ++
      (if (addCounts) Seq(count(lit(1)).as(s"_counts_prereduce_$name")) else Nil)
    if (reduceKeys == Seq("_all")) df.agg(aggCols.head, aggCols.tail: _*)
    else df.groupBy(reduceKeys.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
  }
}

object AddUuid {

  /** Fresh uuid4 per row under `{name}_id` (reference
    * docetl/operations/add_uuid.py:30-61). Nondeterministic by design, like
    * the reference; `uuid()` is a native codegen'd expression.
    */
  def apply(df: DataFrame, name: String, idKey: Option[String] = None): DataFrame =
    df.withColumn(idKey.getOrElse(s"${name}_id"), expr("uuid()"))
}
