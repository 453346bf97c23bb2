package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native Catalyst
  * expression — the text-cleaning primitive every corpus-prep pipeline runs
  * before hashing or deduplicating text: the same rendered string can arrive
  * as precomposed (U+00E9) or decomposed (`e` + U+0301) codepoints, and
  * every hash-keyed operator downstream (exact dedup, minhash shingles,
  * line dedup, decontamination) treats those as different documents unless
  * the corpus is normalized first.
  *
  * Spark has no built-in normalizer, and a Scala UDF here would sit exactly
  * in the hottest path (full-corpus scan at 100 TB) while breaking
  * WholeStageCodegen. This expression keeps the scan fused: codegen emits a
  * direct static call into `java.text.Normalizer` with a cheap
  * `isNormalized` fast path (ASCII and already-normalized text — the vast
  * majority of a real web corpus — never allocates a new string).
  *
  * The reference has no normalizer op (its Python strings are compared
  * as-is); this is part of the beyond-reference training-data family
  * (SURVEY.md §2.14).
  */
case class UnicodeNormalize(child: Expression, form: String) extends UnaryExpression {
  UnicodeNormalize.formOf(form) // fail fast on bad form names

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize needs string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val f = UnicodeNormalize.formOf(form)
    if (Normalizer.isNormalized(s, f)) input
    else UTF8String.fromString(Normalizer.normalize(s, f))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val s = ctx.freshName("s")
      val formRef = s"java.text.Normalizer.Form.${UnicodeNormalize.formOf(form).name()}"
      s"""
         |String $s = $in.toString();
         |if (java.text.Normalizer.isNormalized($s, $formRef)) {
         |  ${ev.value} = $in;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, $formRef));
         |}
       """.stripMargin
    })

  override def prettyName: String = "unicode_normalize"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {

  private[functions] def formOf(form: String): Normalizer.Form = form.toUpperCase match {
    case "NFC" => Normalizer.Form.NFC
    case "NFD" => Normalizer.Form.NFD
    case "NFKC" => Normalizer.Form.NFKC
    case "NFKD" => Normalizer.Form.NFKD
    case other => throw new IllegalArgumentException(
      s"unknown normalization form '$other' (want NFC|NFD|NFKC|NFKD)")
  }

  def apply(text: Column, form: String): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(text), form))

  /** SQL-registration constructor: `unicode_normalize(s[, 'NFKC'])` — the
    * form must be a string literal (it parameterizes codegen). */
  def fromExpressions(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(child) => UnicodeNormalize(child, "NFC")
    case Seq(child, form) =>
      val f = form match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, StringType)
            if v != null => v.toString
        case other => throw new IllegalArgumentException(
          s"unicode_normalize form must be a string literal, got $other")
      }
      UnicodeNormalize(child, f)
    case _ => throw new IllegalArgumentException(
      "unicode_normalize takes (text[, form])")
  }
}
