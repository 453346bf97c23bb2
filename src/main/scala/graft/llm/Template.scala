package graft.llm

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Prompt-template renderer — the subset of the reference's Jinja2
  * `strict_render` (reference docetl/operations/utils/validation.py:42) that
  * its shipped pipelines use:
  *
  *   - `{{ input.field }}` output with dotted access into struct fields and
  *     numeric indexing into arrays (`lookup_field`, validation.py:15);
  *   - `{% for x in input.list %} ... {% endfor %}` loops (reference reduce /
  *     resolve prompts iterate `{% for item in inputs %}`), with `loop.index`,
  *     `loop.index0`, `loop.first`, `loop.last`, `loop.length`;
  *   - `{% if cond %} ... {% else %} ... {% endif %}` with Jinja truthiness
  *     and `==` / `!=` literal comparison;
  *   - filters: `upper lower trim title capitalize length count join truncate
  *     default tojson first last replace`.
  *
  * Unknown top-level fields raise at *construction* (strict undefined, like
  * the reference) — field indices are resolved from the plan-time schema, not
  * the runtime row: rows constructed inside upstream `mapPartitions` are
  * schema-less `GenericRow`s when Catalyst elides the serialize/deserialize
  * pair between chained object operators, so `row.fieldIndex` cannot be
  * relied on. Loop-variable element types are likewise tracked statically
  * from the `ArrayType` element schema.
  */
final class Template(template: String, schema: StructType) extends Serializable {

  import Template._

  private val ast: Seq[Node] = compile(parse(tokenize(template)), Map("input" -> schema))

  def render(row: Row): String = {
    val sb = new StringBuilder
    emit(ast, row, Map.empty, sb)
    sb.toString
  }

  private def emit(nodes: Seq[Node], row: Row, env: Map[String, Any], sb: StringBuilder): Unit =
    nodes.foreach {
      case Text(s) => sb.append(s)
      case Output(e) => sb.append(show(e.eval(row, env)))
      case For(name, src, body) =>
        val items = src.eval(row, env) match {
          case null => Seq.empty
          case s: Seq[_] => s
          case a: Array[_] => a.toSeq
          case other => throw new IllegalArgumentException(
            s"Cannot iterate over $other in {% for $name %}")
        }
        val n = items.length
        items.zipWithIndex.foreach { case (item, i) =>
          val loop = Map("index" -> (i + 1), "index0" -> i,
            "first" -> (i == 0), "last" -> (i == n - 1), "length" -> n)
          emit(body, row, env + (name -> item) + ("loop" -> loop), sb)
        }
      case If(cond, body, orElse) =>
        emit(if (cond.eval(row, env)) body else orElse, row, env, sb)
    }
}

object Template {

  def apply(template: String, schema: StructType): Template = new Template(template, schema)

  /** Top-level `input.*` fields referenced by a template (for validation /
    * pushdown legality). Tolerant regex scan — over-collection only makes
    * rewrites more conservative. */
  def referencedFields(template: String): Seq[String] =
    raw"\binput\.([A-Za-z0-9_]+)".r.findAllMatchIn(template).map(_.group(1)).toSeq.distinct

  // ---------------------------------------------------------------- lexer

  private sealed trait Tok
  private final case class TText(s: String) extends Tok
  private final case class TOut(expr: String) extends Tok
  private final case class TTag(body: String) extends Tok

  private val Delim = raw"(?s)\{\{(.*?)\}\}|\{%(.*?)%\}".r

  private def tokenize(t: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var pos = 0
    for (m <- Delim.findAllMatchIn(t)) {
      if (m.start > pos) out += TText(t.substring(pos, m.start))
      if (m.group(1) != null) out += TOut(m.group(1).trim)
      else out += TTag(m.group(2).trim)
      pos = m.end
    }
    if (pos < t.length) out += TText(t.substring(pos))
    out.result()
  }

  // ---------------------------------------------------------------- parser

  private sealed trait PNode
  private final case class PText(s: String) extends PNode
  private final case class POut(expr: String) extends PNode
  private final case class PFor(varName: String, src: String, body: Seq[PNode]) extends PNode
  private final case class PIf(cond: String, body: Seq[PNode], orElse: Seq[PNode]) extends PNode

  private val ForTag = raw"for\s+([A-Za-z_][A-Za-z0-9_]*)\s+in\s+(.+)".r
  private val IfTag = raw"if\s+(.+)".r

  /** Recursive-descent over the token list; `stop` names the closing tags the
    * caller consumes. Returns (nodes, stop tag seen, remaining tokens). */
  private def parseBlock(toks: List[Tok], stop: Set[String]): (Seq[PNode], String, List[Tok]) = {
    val nodes = Seq.newBuilder[PNode]
    var rest = toks
    while (rest.nonEmpty) rest match {
      case Nil => rest = Nil // unreachable (loop guard); keeps the match total
      case TText(s) :: tl => nodes += PText(s); rest = tl
      case TOut(e) :: tl => nodes += POut(e); rest = tl
      case TTag(tag) :: tl => tag match {
        case t if stop.contains(t.takeWhile(!_.isWhitespace)) =>
          return (nodes.result(), t.takeWhile(!_.isWhitespace), tl)
        case ForTag(v, src) =>
          val (body, _, tl2) = parseBlock(tl, Set("endfor"))
          nodes += PFor(v, src.trim, body); rest = tl2
        case IfTag(cond) =>
          val (body, closer, tl2) = parseBlock(tl, Set("else", "endif"))
          if (closer == "else") {
            val (orElse, _, tl3) = parseBlock(tl2, Set("endif"))
            nodes += PIf(cond.trim, body, orElse); rest = tl3
          } else { nodes += PIf(cond.trim, body, Nil); rest = tl2 }
        case other => throw new IllegalArgumentException(s"Unknown template tag {% $other %}")
      }
    }
    if (stop.nonEmpty) throw new IllegalArgumentException(
      s"Unclosed block: expected {% ${stop.mkString(" or ")} %}")
    (nodes.result(), "", Nil)
  }

  private def parse(toks: List[Tok]): Seq[PNode] = parseBlock(toks, Set.empty)._1

  // ------------------------------------------------------------- compiler

  private[llm] sealed trait Node extends Serializable
  private[llm] final case class Text(s: String) extends Node
  private[llm] final case class Output(e: Expr) extends Node
  private[llm] final case class For(varName: String, src: Expr, body: Seq[Node]) extends Node
  private[llm] final case class If(cond: Cond, body: Seq[Node], orElse: Seq[Node]) extends Node

  /** Compiled value expression: path + filter chain. Steps are pre-resolved
    * against static types where known (struct field -> ordinal). */
  private[llm] final class Expr(root: String, steps: List[Step],
      filters: List[(String, List[Any])]) extends Serializable {
    def eval(row: Row, env: Map[String, Any]): Any = {
      var v: Any = root match {
        case "input" => row
        case "loop" => env.getOrElse("loop",
          throw new IllegalArgumentException("loop used outside {% for %}"))
        case name => env.getOrElse(name,
          throw new IllegalArgumentException(s"Undefined template variable '$name'"))
      }
      var ss = steps
      while (ss.nonEmpty) { v = ss.head.get(v); ss = ss.tail }
      filters.foldLeft(v)((acc, f) => applyFilter(f._1, f._2, acc))
    }
  }

  private[llm] sealed trait Step extends Serializable { def get(v: Any): Any }
  /** Struct access by pre-resolved ordinal (schema known at compile). */
  private final case class Ordinal(i: Int) extends Step {
    def get(v: Any): Any = v match {
      case null => null
      case r: Row => r.get(i)
      case other => throw new IllegalArgumentException(s"Cannot descend into $other")
    }
  }
  /** Name access resolved at runtime (static type unknown — map values,
    * loop vars over untyped seqs). Fails loudly on schema-less rows. */
  private final case class ByName(name: String) extends Step {
    def get(v: Any): Any = v match {
      case null => null
      case r: Row => r.get(r.schema.fieldIndex(name))
      case m: scala.collection.Map[_, _] =>
        m.asInstanceOf[scala.collection.Map[Any, Any]].getOrElse(name, null)
      case other => throw new IllegalArgumentException(s"Cannot descend into $other with .$name")
    }
  }
  /** Numeric index into an array; out of range -> null (lenient, like the
    * reference's dict.get-chains). */
  private final case class Index(i: Int) extends Step {
    def get(v: Any): Any = v match {
      case null => null
      case s: Seq[_] => if (i < s.length) s(i) else null
      case a: Array[_] => if (i < a.length) a(i) else null
      case other => throw new IllegalArgumentException(s"Cannot index into $other with .$i")
    }
  }

  private[llm] sealed trait Cond extends Serializable { def eval(row: Row, env: Map[String, Any]): Boolean }
  private final case class Truthy(e: Expr) extends Cond {
    def eval(row: Row, env: Map[String, Any]): Boolean = truthy(e.eval(row, env))
  }
  private final case class Compare(e: Expr, lit: Any, negate: Boolean) extends Cond {
    def eval(row: Row, env: Map[String, Any]): Boolean = {
      val v = e.eval(row, env)
      val eq = (v, lit) match {
        case (null, null) => true
        case (null, _) | (_, null) => false
        case (a: Number, b: Number) => a.doubleValue == b.doubleValue
        case (a, b) => a.toString == b.toString
      }
      eq != negate
    }
  }

  private val ExprRe = raw"([A-Za-z_][A-Za-z0-9_]*)((?:\.[A-Za-z0-9_]+)*)\s*(\|.*)?".r
  private val FilterRe = raw"\s*([A-Za-z_][A-Za-z0-9_]*)\s*(?:\(([^)]*)\))?\s*".r
  private val CmpRe = raw"(?s)(.+?)\s*(==|!=)\s*(.+)".r

  private def compile(nodes: Seq[PNode], env: Map[String, DataType]): Seq[Node] =
    nodes.map {
      case PText(s) => Text(s)
      case POut(e) => Output(compileExpr(e, env))
      case PFor(v, src, body) =>
        val srcExpr = compileExpr(src, env)
        val elemType = staticType(src, env) match {
          case Some(ArrayType(et, _)) => et
          case _ => NullType // unknown — body falls back to runtime lookup
        }
        For(v, srcExpr, compile(body, env + (v -> elemType)))
      case PIf(c, body, orElse) =>
        If(compileCond(c, env), compile(body, env), compile(orElse, env))
    }

  private def compileCond(c: String, env: Map[String, DataType]): Cond = c match {
    case CmpRe(lhs, op, rhs) => Compare(compileExpr(lhs.trim, env), literal(rhs.trim), op == "!=")
    case _ => Truthy(compileExpr(c, env))
  }

  private def literal(s: String): Any = s match {
    case "true" | "True" => true
    case "false" | "False" => false
    case "none" | "None" | "null" => null
    case _ if s.length >= 2 && ((s.head == '\'' && s.last == '\'') || (s.head == '"' && s.last == '"')) =>
      s.substring(1, s.length - 1)
    case _ if s.matches(raw"-?\d+") => s.toLong
    case _ if s.matches(raw"-?\d*\.\d+") => s.toDouble
    case _ => throw new IllegalArgumentException(s"Unsupported template literal: $s")
  }

  /** Static type of a bare path (no filters), for loop element typing. */
  private def staticType(path: String, env: Map[String, DataType]): Option[DataType] = {
    val segs = path.split('.').toList
    env.get(segs.head).flatMap { root =>
      segs.tail.foldLeft(Option(root)) {
        case (Some(st: StructType), seg) if st.fieldNames.contains(seg) =>
          Some(st(seg).dataType)
        case (Some(ArrayType(et, _)), seg) if seg.forall(_.isDigit) => Some(et)
        case _ => None
      }
    }
  }

  private def compileExpr(raw: String, env: Map[String, DataType]): Expr = raw.trim match {
    case ExprRe(root, pathStr, filterStr) =>
      val segs = if (pathStr.isEmpty) Nil else pathStr.drop(1).split('.').toList
      if (root != "input" && root != "loop" && !env.contains(root))
        throw new IllegalArgumentException(s"Undefined template variable '$root'")
      // Resolve each segment against the statically-known type when possible
      // (strict: unknown struct fields throw here, at plan time).
      var cur: Option[DataType] = env.get(root)
      val steps = segs.map { seg =>
        cur match {
          case Some(st: StructType) =>
            val i = st.fieldIndex(seg) // throws on unknown field (strict)
            cur = Some(st.fields(i).dataType); Ordinal(i)
          case Some(ArrayType(et, _)) if seg.forall(_.isDigit) =>
            cur = Some(et); Index(seg.toInt)
          case _ =>
            cur = None
            if (seg.forall(_.isDigit)) Index(seg.toInt) else ByName(seg)
        }
      }
      val filters = if (filterStr == null) Nil else
        splitOutsideQuotes(filterStr.drop(1), '|').map {
          case FilterRe(name, args) =>
            (name, if (args == null || args.trim.isEmpty) Nil
                   else splitOutsideQuotes(args, ',').map(a => literal(a.trim)))
          case f => throw new IllegalArgumentException(s"Bad template filter: $f")
        }
      new Expr(root, steps, filters)
    case other => throw new IllegalArgumentException(s"Bad template expression: $other")
  }

  /** Split on `sep` ignoring occurrences inside '...'/'...' string literals —
    * `join(', ')` must not split its quoted argument. */
  private def splitOutsideQuotes(s: String, sep: Char): List[String] = {
    val parts = List.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    s.foreach { c =>
      if (quote != 0) { cur += c; if (c == quote) quote = 0 }
      else if (c == '\'' || c == '"') { quote = c; cur += c }
      else if (c == sep) { parts += cur.toString; cur.clear() }
      else cur += c
    }
    parts += cur.toString
    parts.result()
  }

  // -------------------------------------------------------------- runtime

  private def truthy(v: Any): Boolean = v match {
    case null => false
    case b: Boolean => b
    case s: String => s.nonEmpty
    case n: Number => n.doubleValue != 0.0
    case s: Seq[_] => s.nonEmpty
    case a: Array[_] => a.nonEmpty
    case m: scala.collection.Map[_, _] => m.nonEmpty
    case _ => true
  }

  private def applyFilter(name: String, args: List[Any], v: Any): Any = (name, args) match {
    case ("default", d :: _) => if (v == null || (v.isInstanceOf[String] && v == "")) d else v
    case _ if v == null => null
    case ("upper", _) => v.toString.toUpperCase
    case ("lower", _) => v.toString.toLowerCase
    case ("trim", _) => v.toString.trim
    case ("capitalize", _) => v.toString.capitalize
    case ("title", _) => v.toString.split(' ').map(_.capitalize).mkString(" ")
    case ("length" | "count", _) => v match {
      case s: String => s.length
      case s: Seq[_] => s.length
      case a: Array[_] => a.length
      case m: scala.collection.Map[_, _] => m.size
      case r: Row => r.length
      case _ => throw new IllegalArgumentException(s"length of $v undefined")
    }
    case ("join", sepArg) =>
      val sep = sepArg.headOption.map(_.toString).getOrElse("")
      (v match {
        case s: Seq[_] => s
        case a: Array[_] => a.toSeq
        case _ => throw new IllegalArgumentException(s"join on non-sequence $v")
      }).map(show).mkString(sep)
    case ("truncate", nArg) =>
      val n = nArg.headOption.map(_.toString.toInt).getOrElse(255)
      val s = v.toString
      if (s.length <= n) s else s.take(n) + "..."
    case ("first", _) => v match {
      case s: Seq[_] => s.headOption.orNull
      case a: Array[_] => a.headOption.orNull
      case s: String => if (s.isEmpty) null else s.head.toString
      case _ => throw new IllegalArgumentException(s"first of $v undefined")
    }
    case ("last", _) => v match {
      case s: Seq[_] => s.lastOption.orNull
      case a: Array[_] => a.lastOption.orNull
      case s: String => if (s.isEmpty) null else s.last.toString
      case _ => throw new IllegalArgumentException(s"last of $v undefined")
    }
    case ("replace", (from: Any) :: (to: Any) :: _) =>
      v.toString.replace(from.toString, to.toString)
    case ("tojson", _) => toJson(v)
    case (other, _) => throw new IllegalArgumentException(s"Unknown template filter: $other")
  }

  /** Plain-text rendering of a value ({{ expr }} output). Null -> "" like
    * the previous renderer; structured values render as JSON so whole-row
    * loop vars ({{ item }}) are readable in prompts. */
  private def show(v: Any): String = v match {
    case null => ""
    case s: String => s
    case r: Row => toJson(r)
    case s: Seq[_] => toJson(s)
    case a: Array[_] => toJson(a.toSeq)
    case m: scala.collection.Map[_, _] => toJson(m)
    case other => other.toString
  }

  private def toJson(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""
    case b: Boolean => b.toString
    case n: Number => n.toString
    case r: Row =>
      val names = if (r.schema != null) r.schema.fieldNames else Array.tabulate(r.length)("_" + _)
      names.zipWithIndex.map { case (n, i) => toJson(n) + ": " + toJson(r.get(i)) }
        .mkString("{", ", ", "}")
    case s: Seq[_] => s.map(toJson).mkString("[", ", ", "]")
    case a: Array[_] => a.toSeq.map(toJson).mkString("[", ", ", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, vv) => toJson(k.toString) + ": " + toJson(vv) }.mkString("{", ", ", "}")
    case other => toJson(other.toString)
  }
}
