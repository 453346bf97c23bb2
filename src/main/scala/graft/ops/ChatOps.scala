package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chat-template rendering with loss-mask spans — the SFT data-prep step
  * that turns a conversation (array of (role, content) messages) into one
  * training string plus the character spans the loss should cover
  * (assistant turns only). Publicly standard: HuggingFace
  * `apply_chat_template` + the `train_on_responses_only` masking recipe;
  * the reference has no conversation-data story — §2.14 engine extension
  * next to the packing/chunking family (spans survive [[PackOp]]'s
  * concatenation by offsetting with each document's pack position).
  *
  * Template (ChatML-like, fixed so both engines replay it byte-identically):
  * every message renders as `<|role|>\ncontent\n`; a span covers exactly
  * the CONTENT of each `maskRole` message (headers and separators stay
  * unmasked).
  *
  * Scale shape: one `aggregate` lambda over the per-row message array —
  * pure native expressions, no UDF, no shuffle, no explode/re-group
  * round-trip (the window-over-exploded-messages shape would shuffle every
  * conversation; the fold never leaves the row).
  */
object ChatOps {

  private def header(role: Column): Column =
    concat(lit("<|"), role, lit("|>\n"))

  /** Render `messagesCol` (array<struct<role,content>>) into `text` and
    * append `mask_spans` (array<struct<s,e>> — [start, end) character
    * offsets of every `maskRole` message's content). */
  def renderWithSpans(df: DataFrame, messagesCol: String,
      maskRole: String = "assistant", textOut: String = "text",
      spansOut: String = "mask_spans"): DataFrame = {
    val msgs = col(messagesCol)
    val zero = struct(
      lit("").as("txt"),
      array().cast("array<struct<s:bigint,e:bigint>>").as("spans"))
    val folded = aggregate(msgs, zero, (acc, m) => {
      val hdr = header(m.getField("role"))
      // A null content turn renders as EMPTY (zero-width span), not as a
      // null that concat would propagate over the whole conversation —
      // one poisoned message must not silently drop the rendered sample.
      val body = coalesce(m.getField("content"), lit(""))
      val start = (length(acc.getField("txt")) + length(hdr)).cast("bigint")
      val end = (start + length(body)).cast("bigint")
      struct(
        concat(acc.getField("txt"), hdr, body, lit("\n"))
          .as("txt"),
        when(m.getField("role") === maskRole,
          concat(acc.getField("spans"),
            array(struct(start.as("s"), end.as("e")))))
          .otherwise(acc.getField("spans")).as("spans"))
    })
    df.withColumn("_chat", folded)
      .withColumn(textOut, col("_chat.txt"))
      .withColumn(spansOut, col("_chat.spans"))
      .drop("_chat")
  }
}
