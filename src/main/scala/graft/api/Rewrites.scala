package graft.api

/** Equivalence-preserving config rewrites — the engine-level port of the
  * reference's plan rewriter (reference docetl/plan/rewrite.py:95-249).
  *
  * Catalyst already does relational pushdown for free, but it will NOT push
  * a filter past our semantic mapPartitions operators (object operators are
  * optimization barriers). These rewrites operate one level up, on the
  * *op-config sequence* of a pipeline step, where operator traits
  * (cardinality / fields written / row-locality — reference base.py:149-188)
  * are declared, and the goal is the reference's: save LLM calls, not CPU
  * (rewrite.py:95-139 gates on an LLM op in the hop chain).
  *
  *   - SelectionPushdown: move a `code_filter` below a 1:1, row-local,
  *     order-preserving op whose written fields don't intersect the
  *     predicate's references.
  *   - LimitPushdown: move a `limit` (or sample-first) the same way.
  *
  * Applied to fixpoint, max 20 passes (rewrite.py:210).
  */
object Rewrites {

  final case class Traits(
      oneToOne: Boolean,
      rowLocal: Boolean,
      preservesOrder: Boolean,
      isLlm: Boolean,
      fieldsWritten: Set[String],
      fieldsRead: Set[String] = Set.empty)

  def traitsOf(op: Conf): Traits = {
    val tpe = op("type").str
    def outKeys(c: Conf): Set[String] =
      c.get("output").flatMap(_.get("schema")).map(_.asOrderedMap.map(_._1).toSet)
        .getOrElse(Set.empty)
    def promptReads(c: Conf): Set[String] =
      graft.llm.Template.referencedFields(c.strOr("prompt", ""))
        .map(_.toLowerCase).toSet
    val base = tpe match {
      case "code_map" => Traits(oneToOne = true, rowLocal = true, preservesOrder = true,
        isLlm = false,
        op.get("outputs").map(_.asOrderedMap.map(_._1).toSet).getOrElse(Set.empty),
        op.get("outputs").map(_.asOrderedMap
          .flatMap(kv => referencedIdentifiers(kv._2.str)).toSet).getOrElse(Set.empty))
      case "map" => Traits(oneToOne = true, rowLocal = true, preservesOrder = true,
        isLlm = true, outKeys(op), promptReads(op))
      case "parallel_map" => Traits(oneToOne = true, rowLocal = true, preservesOrder = true,
        isLlm = true,
        op.get("prompts").map(_.asList.flatMap(p =>
          p("schema").asOrderedMap.map(_._1)).toSet).getOrElse(Set.empty),
        op.get("prompts").map(_.asList.flatMap(p =>
          graft.llm.Template.referencedFields(p.strOr("prompt", ""))
            .map(_.toLowerCase)).toSet).getOrElse(Set.empty))
      case "add_uuid" => Traits(oneToOne = true, rowLocal = true, preservesOrder = true,
        isLlm = false,
        Set(op.get("id_key").map(_.str).getOrElse(op.strOr("name", "") + "_id")))
      case "extract" => Traits(oneToOne = true, rowLocal = true, preservesOrder = true,
        isLlm = op.strOr("extraction_method", "regex") == "line_number",
        Set.empty, // written key is derived; treated as fresh (never read upstream)
        op.get("document_key").map(k => Set(k.str.toLowerCase)).getOrElse(Set.empty))
      case _ => Traits(oneToOne = false, rowLocal = false, preservesOrder = false,
        isLlm = tpe == "filter" || tpe == "reduce" || tpe == "resolve" || tpe == "rank",
        Set.empty)
    }
    // A `limit` on any op makes it row-limiting: filter(map-limit-n(X)) !=
    // map-limit-n(filter(X)), so nothing may hop below it (reference
    // map.py:620-709 limit early-stop is a cardinality change).
    if (op.get("limit").isDefined) base.copy(oneToOne = false) else base
  }

  private val SqlKeywords = Set(
    "and", "or", "not", "in", "is", "null", "true", "false", "case", "when",
    "then", "else", "end", "like", "between", "cast", "as", "bigint", "int",
    "double", "string", "boolean")

  /** Conservative identifier harvest from a SQL expression. */
  def referencedIdentifiers(sql: String): Set[String] =
    raw"[A-Za-z_][A-Za-z0-9_]*".r.findAllIn(sql)
      .map(_.toLowerCase).filterNot(SqlKeywords).toSet

  private def isPushableFilter(op: Conf): Boolean =
    (op("type").str == "code_filter" || op("type").str == "filter") &&
      op.get("limit").isEmpty

  private def isPushableLimit(op: Conf): Boolean =
    op("type").str == "limit"

  /** Fields a filter op reads: the SQL predicate's identifiers for
    * code_filter, the prompt template's referenced fields for a semantic
    * filter (reference rewrite.py pushes both, :95-139). */
  private def filterReads(op: Conf): Set[String] = op("type").str match {
    case "code_filter" => referencedIdentifiers(op("predicate").str)
    case _ => graft.llm.Template.referencedFields(op.strOr("prompt", ""))
      .map(_.toLowerCase).toSet
  }

  /** Fields a filter op WRITES while it runs: a semantic filter materializes
    * its declared schema (the decision bool is consumed, but it overwrites a
    * same-named input column in the process, plus any `_short_explanation`);
    * code_filter writes nothing. A pushed filter must not clobber a column
    * the hopped op reads. */
  private def filterWrites(op: Conf): Set[String] = op("type").str match {
    case "code_filter" => Set.empty
    case _ => op.get("output").flatMap(_.get("schema"))
      .map(_.asOrderedMap.map(_._1.toLowerCase).toSet).getOrElse(Set.empty)
  }

  /** One pass: push each pushable op one hop left when legal. */
  private def pass(ops: Seq[Conf]): (Seq[Conf], Boolean) = {
    val arr = ops.toBuffer
    var fired = false
    var i = 1
    while (i < arr.length) {
      val cur = arr(i)
      val prev = arr(i - 1)
      val t = traitsOf(prev)
      val legal =
        if (isPushableFilter(cur)) {
          t.oneToOne && t.rowLocal &&
            t.fieldsWritten.map(_.toLowerCase).intersect(filterReads(cur)).isEmpty &&
            t.fieldsRead.intersect(filterWrites(cur)).isEmpty
        } else if (isPushableLimit(cur)) {
          t.oneToOne && t.rowLocal && t.preservesOrder
        } else false
      // The LLM gate: only hop when it saves LLM work (reference
      // rewrite.py:122-126) — i.e. the op being hopped is an LLM op.
      if (legal && t.isLlm) {
        arr(i - 1) = cur
        arr(i) = prev
        fired = true
      }
      i += 1
    }
    (arr.toSeq, fired)
  }

  def apply(ops: Seq[Conf], maxPasses: Int = 20): Seq[Conf] = {
    var cur = ops
    var i = 0
    var changed = true
    while (changed && i < maxPasses) {
      val (next, fired) = pass(cur)
      cur = next
      changed = fired
      i += 1
    }
    cur
  }
}
