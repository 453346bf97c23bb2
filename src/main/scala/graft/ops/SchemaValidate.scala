package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-contract validation — the schema/content gate a
  * pipeline runs before rows enter training (publicly standard practice:
  * Great-Expectations-style column checks, HuggingFace dataset feature
  * validation). Rules are per-column predicates; a row's violations are
  * collected BY NAME so the report says exactly which contract broke.
  *
  * Checks: `not_null`, `min_length`/`max_length` (strings), `min`/`max`
  * (numerics), `regex` (full-match), `enum` (allowed values). NULL
  * handling: only `not_null` fires on a null — every other check skips
  * nulls (three-valued logic would otherwise double-report each null).
  *
  * Scale shape: every rule is a pure expression fused into the scan;
  * `report` appends two columns, `filter` is a scan-pushed predicate,
  * `summary` is one explode + (violation)-keyed agg bounded by
  * #rules. No UDF, no driver state; the DuckDB oracle replays the rule
  * expressions exactly.
  */
object SchemaValidate {

  /** One named check on one column; `violated` must be null-safe (false,
    * not null, when the check passes or does not apply). */
  final case class Rule(column: String, check: String, violated: Column) {
    def tag: String = s"$column:$check"
  }

  def notNull(column: String): Rule =
    Rule(column, "not_null", col(column).isNull)
  def minLength(column: String, n: Int): Rule =
    Rule(column, "min_length", coalesce(length(col(column)) < n, lit(false)))
  def maxLength(column: String, n: Int): Rule =
    Rule(column, "max_length", coalesce(length(col(column)) > n, lit(false)))
  def minValue(column: String, v: Double): Rule =
    Rule(column, "min", coalesce(col(column).cast("double") < v, lit(false)))
  def maxValue(column: String, v: Double): Rule =
    Rule(column, "max", coalesce(col(column).cast("double") > v, lit(false)))
  def regexMatch(column: String, pattern: String): Rule =
    Rule(column, "regex", coalesce(!col(column).rlike(pattern), lit(false)))
  def enumValues(column: String, allowed: Seq[String]): Rule =
    Rule(column, "enum", coalesce(
      !col(column).cast("string").isin(allowed: _*), lit(false)))

  /** The row's violated rule tags ("column:check"), declaration order. */
  def violationsCol(rules: Seq[Rule]): Column =
    filter(array(rules.map(r =>
      when(r.violated, lit(r.tag))): _*), v => v.isNotNull)

  /** Append `violations` (";"-joined tags — string, not array, so the
    * report serializes anywhere) and `valid`. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "schema_validate needs at least one rule")
    val v = violationsCol(rules)
    df.withColumn("violations", concat_ws(";", v))
      .withColumn("valid", size(v) === 0)
  }

  /** Keep only rows passing every rule. */
  def clean(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.filter(!rules.map(_.violated).reduce(_ || _))

  /** (violation, n_rows) totals — bounded by #rules. */
  def summary(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "schema_validate needs at least one rule")
    df.select(explode(violationsCol(rules)).as("violation"))
      .groupBy("violation").agg(count(lit(1)).as("n_rows"))
  }

  /** Rules from YAML: `rules: [{column: text, check: min_length,
    * value: 10}, {column: lang, check: enum, values: [en, de]}, ...]`. */
  def fromConf(rules: Seq[graft.api.Conf]): Seq[Rule] = rules.map { r =>
    val colName = r("column").str
    r("check").str match {
      case "not_null" => notNull(colName)
      case "min_length" => minLength(colName, r("value").int)
      case "max_length" => maxLength(colName, r("value").int)
      case "min" => minValue(colName, r("value").dbl)
      case "max" => maxValue(colName, r("value").dbl)
      case "regex" => regexMatch(colName, r("value").str)
      case "enum" => enumValues(colName, r("values").strList)
      case other => throw new IllegalArgumentException(
        s"unknown schema_validate check '$other'")
    }
  }
}
