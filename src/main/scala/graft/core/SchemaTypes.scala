package graft.core

import org.apache.spark.sql.types._

/** Port of the reference's declared-output-schema type strings to Spark
  * `DataType`s (reference docetl/operations/utils/validation.py:137-171,
  * `convert_val`). Accepted forms:
  *
  *   - `str | text | string | varchar` -> StringType
  *   - `int | integer`                 -> LongType
  *   - `float | decimal | number`      -> DoubleType
  *   - `bool | boolean`                -> BooleanType
  *   - `list[X]`                       -> ArrayType(parse(X))  (bare `list` rejected)
  *   - `{k: t, ...}`                   -> StructType
  *   - `enum[a, b, c]`                 -> StringType (allowed values kept)
  */
object SchemaTypes {

  final case class EnumInfo(values: Seq[String])

  def parse(typeStr: String): DataType = {
    val t = typeStr.trim
    val lower = t.toLowerCase
    lower match {
      case "str" | "text" | "string" | "varchar" => StringType
      case "int" | "integer"                     => LongType
      case "float" | "decimal" | "number"        => DoubleType
      case "bool" | "boolean"                    => BooleanType
      case "list" =>
        throw new IllegalArgumentException(
          "Bare `list` not allowed; use e.g. list[str] (reference validation.py:151-152)")
      case _ if lower.startsWith("list[") && t.endsWith("]") =>
        ArrayType(parse(t.substring(5, t.length - 1)))
      case _ if lower.startsWith("enum[") && t.endsWith("]") =>
        StringType
      case _ if t.startsWith("{") && t.endsWith("}") =>
        StructType(splitTopLevel(t.substring(1, t.length - 1)).map { fld =>
          val i = indexOfTopLevelColon(fld)
          require(i > 0, s"Malformed struct field: $fld")
          StructField(fld.substring(0, i).trim, parse(fld.substring(i + 1)))
        })
      case _ =>
        throw new IllegalArgumentException(s"Unknown schema type string: $typeStr")
    }
  }

  /** Allowed values of an `enum[...]` type string, if it is one. */
  def enumValues(typeStr: String): Option[Seq[String]] = {
    val t = typeStr.trim
    if (t.toLowerCase.startsWith("enum[") && t.endsWith("]"))
      Some(t.substring(5, t.length - 1).split(",").map(_.trim).toSeq)
    else None
  }

  /** Metadata key carrying an enum field's allowed values through the
    * StructType — the channel by which clients (mock, HTTP json-schema)
    * learn the constraint, since Spark has no enum DataType. */
  val EnumMetadataKey = "graft.enum"

  /** A declared output schema (name -> type-string) as a StructType.
    * `enum[...]` fields become StringType with the allowed values attached
    * as field metadata (reference validation.py:155-160 emits a JSON-schema
    * enum; clients read [[EnumMetadataKey]] to apply the same constraint). */
  def toStruct(schema: Seq[(String, String)]): StructType =
    StructType(schema.map { case (k, v) =>
      enumValues(v) match {
        case Some(vals) => StructField(k, StringType, nullable = true,
          new MetadataBuilder().putStringArray(EnumMetadataKey, vals.toArray).build())
        case None => StructField(k, parse(v))
      }
    })

  /** Allowed enum values attached to a field, if any. */
  def enumOf(f: StructField): Option[Seq[String]] =
    if (f.metadata.contains(EnumMetadataKey))
      Some(f.metadata.getStringArray(EnumMetadataKey).toSeq)
    else None

  /** Split on commas that are not nested inside [], {} (for struct bodies). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case c @ ('[' | '{') => depth += 1; cur.append(c)
      case c @ (']' | '}') => depth -= 1; cur.append(c)
      case ',' if depth == 0 =>
        if (cur.nonEmpty) out += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString
    out.result()
  }

  private def indexOfTopLevelColon(s: String): Int = {
    var depth = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '[' | '{' => depth += 1
        case ']' | '}' => depth -= 1
        case ':' if depth == 0 => return i
        case _ =>
      }
      i += 1
    }
    -1
  }
}
