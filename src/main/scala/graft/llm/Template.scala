package graft.llm

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** Minimal prompt-template renderer — the used subset of the reference's
  * Jinja2 `strict_render` (reference docetl/operations/utils/validation.py:42):
  * `{{ input.field }}` placeholders over the current row, with dotted access
  * into struct fields. Unknown fields raise (strict undefined), like the
  * reference.
  *
  * Field indices are resolved from the *plan-time* schema, not the runtime
  * row: rows constructed inside upstream `mapPartitions` are schema-less
  * `GenericRow`s when Catalyst elides the serialize/deserialize pair between
  * chained object operators, so `row.fieldIndex` cannot be relied on.
  */
final class Template(template: String, schema: StructType) extends Serializable {

  import Template.Placeholder

  // (top-level index, remaining path segments, nested schema) per placeholder.
  private val resolved: Map[String, (Int, List[String])] =
    Placeholder.findAllMatchIn(template).map(_.group(1)).toSeq.distinct.map { path =>
      val segs = path.split('.').toList
      path -> (schema.fieldIndex(segs.head), segs.tail)
    }.toMap

  def render(row: Row): String =
    Placeholder.replaceAllIn(template, m => {
      val (idx, rest) = resolved(m.group(1))
      val v = Template.descend(row.get(idx), rest)
      java.util.regex.Matcher.quoteReplacement(if (v == null) "" else v.toString)
    })
}

object Template {

  private[llm] val Placeholder = raw"\{\{\s*input\.([A-Za-z0-9_.]+)\s*\}\}".r

  def apply(template: String, schema: StructType): Template = new Template(template, schema)

  /** Descend remaining path segments into nested structs (reference
    * `lookup_field` dotted paths, validation.py:15). Nested rows that carry a
    * schema use it; otherwise this fails loudly (strict). */
  private def descend(value: Any, path: List[String]): Any = path match {
    case Nil => value
    case seg :: rest => value match {
      case null => null
      case r: Row => descend(r.get(r.schema.fieldIndex(seg)), rest)
      case s: Seq[_] if seg.nonEmpty && seg.forall(_.isDigit) =>
        // numeric segments index into arrays ("a.0.b" — reference
        // lookup_field, validation.py:15); out of range -> null (lenient,
        // like dict.get-chains in the reference)
        val i = seg.toInt
        if (i < s.length) descend(s(i), rest) else null
      case other =>
        throw new IllegalArgumentException(s"Cannot descend into $other with .$seg")
    }
  }

  /** Fields referenced by a template (for validation / pushdown legality). */
  def referencedFields(template: String): Seq[String] =
    Placeholder.findAllMatchIn(template).map(_.group(1).split('.').head).toSeq.distinct
}
