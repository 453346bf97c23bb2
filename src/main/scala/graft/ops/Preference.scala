package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Preference-pair (DPO/RLHF) conversation ops — the post-training sibling
  * of the SFT masking path ([[ChatOps]]): a training sample is a PAIR of
  * conversations sharing a prompt prefix and diverging at the final
  * assistant turn (chosen vs rejected). Publicly standard: Rafailov et al.
  * 2023 (DPO) data shape, the HuggingFace `trl` `DPOTrainer` contract
  * (prompt / chosen / rejected). The reference has no conversation-data
  * story — §2.14 engine extension.
  *
  * Everything here is pure per-row expressions (struct/array lambdas, no
  * UDF, no shuffle): pair validation re-uses [[ChatOps.validate]] on each
  * side then checks the pair-level contract (equal shared prefix,
  * divergent final responses); the divergence point is a zip_with scan
  * over character arrays; rendering is [[ChatOps.render]] twice.
  */
object Preference {

  /** Flat (prompt, chosen, rejected) columns — the `trl` dataset shape —
    * into two message arrays feeding [[validatePairs]]/[[renderPair]]. */
  def fromPromptPair(df: DataFrame, promptCol: String, chosenCol: String,
      rejectedCol: String, system: Option[String] = None,
      chosenOut: String = "messages_chosen",
      rejectedOut: String = "messages_rejected"): DataFrame = {
    val a = ChatOps.fromPromptResponse(df, promptCol, chosenCol, system,
      msgsOut = chosenOut)
    ChatOps.fromPromptResponse(a, promptCol, rejectedCol, system,
      msgsOut = rejectedOut)
  }

  /** First character index at which `a` and `b` differ — equivalently the
    * length of their common prefix (= min length when one is a prefix of
    * the other, = the shared length when equal). One zip_with over
    * character arrays; null if either side is null. */
  def divergenceCol(a: Column, b: Column): Column = {
    def chars(c: Column): Column = filter(split(c, ""), x => x =!= "")
    val ca = chars(a)
    val cb = chars(b)
    // zip_with null-pads the shorter side; (char, null) compares to null,
    // which array_position skips — so "no true found" covers both the
    // equal case and the proper-prefix case, and least(...) is right for
    // both.
    val neq = zip_with(ca, cb, (x, y) => x =!= y)
    val pos = array_position(neq, lit(true))
    when(a.isNull || b.isNull, lit(null).cast("bigint"))
      .when(pos > 0, (pos - 1).cast("bigint"))
      .otherwise(least(size(ca), size(cb)).cast("bigint"))
  }

  /** Pair-shape validation — appends `pair_valid` and
    * `pair_invalid_reason` (null when valid). Rules, in reason priority:
    *  - each side must pass [[ChatOps.validate]]'s conversation rules
    *    (`chosen_<reason>` / `rejected_<reason>`);
    *  - both sides must share every message EXCEPT the final assistant
    *    turn (`prefix_mismatch`) — the DPO contract that the implicit
    *    reward compares completions of the SAME prompt;
    *  - the final assistant contents must differ
    *    (`identical_responses`) — an equal pair carries zero preference
    *    signal. */
  def validatePairs(df: DataFrame, chosenCol: String, rejectedCol: String,
      validOut: String = "pair_valid",
      reasonOut: String = "pair_invalid_reason"): DataFrame = {
    val c = col(chosenCol)
    val r = col(rejectedCol)
    val sideChecked = ChatOps.validate(
      ChatOps.validate(df, chosenCol, "_c_valid", "_c_reason"),
      rejectedCol, "_r_valid", "_r_reason")
    val prefixMatch = size(c) === size(r) &&
      slice(c, lit(1), size(c) - 1) === slice(r, lit(1), size(r) - 1)
    val responsesDiffer =
      element_at(c, -1).getField("content") =!=
        element_at(r, -1).getField("content")
    val reason = when(!col("_c_valid"),
        concat(lit("chosen_"), col("_c_reason")))
      .when(!col("_r_valid"), concat(lit("rejected_"), col("_r_reason")))
      .when(!prefixMatch, lit("prefix_mismatch"))
      .when(!responsesDiffer, lit("identical_responses"))
      .otherwise(lit(null).cast("string"))
    sideChecked.withColumn(reasonOut, reason)
      .withColumn(validOut, col(reasonOut).isNull)
      .drop("_c_valid", "_c_reason", "_r_valid", "_r_reason")
  }

  /** [[validatePairs]] for TYPED content-part conversations (`parts:
    * true` corpora — see [[ChatOps.partsToContent]]): each side first
    * passes [[ChatOps.validateParts]]'s part-level + flat rules
    * (`chosen_<reason>` / `rejected_<reason>`), then the pair contract
    * is checked on the (role, part type, part text) PROJECTION of the
    * messages — extra carrier fields (timestamps, ids) don't break
    * prefix equality, and a changed image REF in the final turn counts
    * as a divergent response even though both refs render to the same
    * `<image>` placeholder (the flatten bridge would erase exactly that
    * signal). Reason priority matches [[validatePairs]]. Pure per-row
    * array expressions; no UDF, no shuffle. */
  def validatePairsParts(df: DataFrame, chosenCol: String,
      rejectedCol: String,
      allowedTypes: Seq[String] = Seq("text", "image", "audio", "video"),
      validOut: String = "pair_valid",
      reasonOut: String = "pair_invalid_reason"): DataFrame = {
    // (role, parts(type, text)) projection; nulls coalesce so struct
    // equality is two-valued (a null text field would three-value the
    // whole prefix comparison)
    def norm(msgs: Column): Column = transform(msgs, m =>
      struct(coalesce(m.getField("role"), lit("")).as("role"),
        coalesce(transform(m.getField("parts"), p =>
          struct(coalesce(p.getField("type"), lit("")).as("type"),
            coalesce(p.getField("text"), lit("")).as("text"))),
          array().cast("array<struct<type:string,text:string>>"))
          .as("parts")))
    val c = norm(col(chosenCol))
    val r = norm(col(rejectedCol))
    val sideChecked = ChatOps.validateParts(
      ChatOps.validateParts(df, chosenCol, allowedTypes,
        "_c_valid", "_c_reason"),
      rejectedCol, allowedTypes, "_r_valid", "_r_reason")
    val prefixMatch = size(c) === size(r) &&
      slice(c, lit(1), size(c) - 1) === slice(r, lit(1), size(r) - 1)
    val responsesDiffer =
      element_at(c, -1).getField("parts") =!=
        element_at(r, -1).getField("parts")
    val reason = when(!col("_c_valid"),
        concat(lit("chosen_"), col("_c_reason")))
      .when(!col("_r_valid"), concat(lit("rejected_"), col("_r_reason")))
      .when(!prefixMatch, lit("prefix_mismatch"))
      .when(!responsesDiffer, lit("identical_responses"))
      .otherwise(lit(null).cast("string"))
    sideChecked.withColumn(reasonOut, reason)
      .withColumn(validOut, col(reasonOut).isNull)
      .drop("_c_valid", "_c_reason", "_r_valid", "_r_reason")
  }

  /** Render both sides under `template` ([[ChatOps.render]] twice:
    * `text_chosen`/`mask_spans_chosen`, `text_rejected`/
    * `mask_spans_rejected`) and append `diverge_at` — the first character
    * offset where the rendered strings differ. Because valid pairs share
    * everything up to the final assistant content, `diverge_at` marks
    * where the pairwise loss actually has signal; tokens before it are
    * shared context (the prompt-caching boundary in DPO trainers). */
  def renderPair(df: DataFrame, chosenCol: String, rejectedCol: String,
      template: ChatOps.ChatTemplate = ChatOps.ChatTemplate.Default,
      maskRole: String = "assistant"): DataFrame = {
    val a = ChatOps.render(df, chosenCol, template, maskRole,
      textOut = "text_chosen", spansOut = "mask_spans_chosen")
    val b = ChatOps.render(a, rejectedCol, template, maskRole,
      textOut = "text_rejected", spansOut = "mask_spans_rejected")
    b.withColumn("diverge_at",
      divergenceCol(col("text_chosen"), col("text_rejected")))
  }

  /** Length-bias audit — the public RLHF/DPO length-correlation
    * concern (reward models and pairwise losses drift toward verbosity
    * when chosen responses are systematically longer; Singhal et al.
    * 2023): a ONE-ROW report over the corpus comparing the FINAL
    * assistant contents (the divergent part of a valid pair). Counts
    * are exact integers; means come from integer sums divided once at
    * the end (no distributed float accumulation). One aggregation, no
    * driver state beyond the report row. */
  def lengthBias(df: DataFrame, chosenCol: String,
      rejectedCol: String): DataFrame = {
    val lc = length(coalesce(
      element_at(col(chosenCol), -1).getField("content"), lit("")))
      .cast("bigint")
    val lr = length(coalesce(
      element_at(col(rejectedCol), -1).getField("content"), lit("")))
      .cast("bigint")
    // sums coalesce: an empty pairs corpus (drop_invalid filtered
    // everything) must report zeros, not NULL aggregates
    val agg = df.select(lc.as("_lc"), lr.as("_lr"))
      .agg(
        count(lit(1)).as("n_pairs"),
        coalesce(sum(when(col("_lc") > col("_lr"), 1L).otherwise(0L)),
          lit(0L)).as("n_chosen_longer"),
        coalesce(sum(when(col("_lc") === col("_lr"), 1L).otherwise(0L)),
          lit(0L)).as("n_equal_length"),
        coalesce(sum(col("_lc")), lit(0L)).as("_sc"),
        coalesce(sum(col("_lr")), lit(0L)).as("_sr"))
    val denom = greatest(col("n_pairs"), lit(1L)).cast("double")
    agg.select(col("n_pairs"), col("n_chosen_longer"),
      col("n_equal_length"),
      round(col("n_chosen_longer").cast("double") / denom, 6)
        .as("chosen_longer_frac"),
      round(col("_sc").cast("double") / denom, 6)
        .as("mean_chosen_chars"),
      round(col("_sr").cast("double") / denom, 6)
        .as("mean_rejected_chars"),
      round((col("_sc") - col("_sr")).cast("double") / denom, 6)
        .as("mean_length_delta"))
  }

  /** [[renderPair]] for TYPED content-part conversations: both sides
    * through [[ChatOps.renderPartsWithSpans]] (loss-mask spans cover
    * ONLY the text parts of `maskRole` turns — `<image>` placeholders
    * inside the masked final turn stay unmasked on BOTH sides), plus
    * `diverge_at` over the rendered texts. For a valid parts pair the
    * offset marks where the pairwise loss has signal exactly as in the
    * flat case; tokens before it are the shared multimodal prompt (the
    * prompt-caching boundary in DPO trainers). */
  def renderPairParts(df: DataFrame, chosenCol: String,
      rejectedCol: String,
      template: ChatOps.ChatTemplate = ChatOps.ChatTemplate.Default,
      maskRole: String = "assistant",
      placeholders: Map[String, String] =
        ChatOps.DefaultPartPlaceholders): DataFrame = {
    val a = ChatOps.renderPartsWithSpans(df, chosenCol, template, maskRole,
      placeholders, textOut = "text_chosen",
      spansOut = "mask_spans_chosen")
    val b = ChatOps.renderPartsWithSpans(a, rejectedCol, template, maskRole,
      placeholders, textOut = "text_rejected",
      spansOut = "mask_spans_rejected")
    b.withColumn("diverge_at",
      divergenceCol(col("text_chosen"), col("text_rejected")))
  }

  /** [[validatePairs]] for TOOL-CALL conversations (agentic DPO
    * corpora — traces where the divergent final turn may differ in the
    * CALLS it makes, not just its text): each side first passes
    * [[ChatOps.validateTools]]'s pending-call-id state machine
    * (`chosen_<reason>` / `rejected_<reason>`), then the pair contract
    * runs on the (role, content, tool_calls(id, name, arguments),
    * tool_call_id) PROJECTION — extra carrier fields don't break
    * prefix equality, but the call fields themselves DO count: a
    * shared prefix whose traces differ only in call ids or arguments
    * is a `prefix_mismatch` (different traces are different prompts,
    * even where a render prints them identically — ids don't print).
    * On the final turn the projection reduces to (role, content) in
    * practice, since a valid side never ends on pending calls. Reason
    * priority matches [[validatePairs]]. Pure per-row expressions. */
  def validatePairsTools(df: DataFrame, chosenCol: String,
      rejectedCol: String,
      validOut: String = "pair_valid",
      reasonOut: String = "pair_invalid_reason"): DataFrame = {
    val callsT = "array<struct<id:string,name:string,arguments:string>>"
    def norm(msgs: Column): Column = transform(msgs, m =>
      struct(coalesce(m.getField("role"), lit("")).as("role"),
        coalesce(m.getField("content"), lit("")).as("content"),
        coalesce(transform(m.getField("tool_calls"), c =>
          struct(coalesce(c.getField("id"), lit("")).as("id"),
            coalesce(c.getField("name"), lit("")).as("name"),
            coalesce(c.getField("arguments"), lit("")).as("arguments"))),
          array().cast(callsT)).as("tool_calls"),
        coalesce(m.getField("tool_call_id"), lit("")).as("tool_call_id")))
    val c = norm(col(chosenCol))
    val r = norm(col(rejectedCol))
    val sideChecked = ChatOps.validateTools(
      ChatOps.validateTools(df, chosenCol, "_c_valid", "_c_reason"),
      rejectedCol, "_r_valid", "_r_reason")
    val prefixMatch = size(c) === size(r) &&
      slice(c, lit(1), size(c) - 1) === slice(r, lit(1), size(r) - 1)
    val responsesDiffer = element_at(c, -1) =!= element_at(r, -1)
    val reason = when(!col("_c_valid"),
        concat(lit("chosen_"), col("_c_reason")))
      .when(!col("_r_valid"), concat(lit("rejected_"), col("_r_reason")))
      .when(!prefixMatch, lit("prefix_mismatch"))
      .when(!responsesDiffer, lit("identical_responses"))
      .otherwise(lit(null).cast("string"))
    sideChecked.withColumn(reasonOut, reason)
      .withColumn(validOut, col(reasonOut).isNull)
      .drop("_c_valid", "_c_reason", "_r_valid", "_r_reason")
  }

  /** [[renderPair]] for TOOL-CALL conversations: both sides through
    * [[ChatOps.renderTools]] (assistant call blocks render as Hermes
    * `<tool_call>` JSON inside the masked body; tool results wrap
    * unmasked), plus `diverge_at` over the rendered texts. Two final
    * turns differing only in CALL IDS render identically (ids don't
    * print) — pair-gate with [[validatePairsTools]] first, which sees
    * the ids; `diverge_at` then equals the common rendered length. */
  def renderPairTools(df: DataFrame, chosenCol: String,
      rejectedCol: String,
      template: ChatOps.ChatTemplate = ChatOps.ChatTemplate.Default,
      maskRole: String = "assistant"): DataFrame = {
    val a = ChatOps.renderTools(df, chosenCol, template, maskRole,
      textOut = "text_chosen", spansOut = "mask_spans_chosen")
    val b = ChatOps.renderTools(a, rejectedCol, template, maskRole,
      textOut = "text_rejected", spansOut = "mask_spans_rejected")
    b.withColumn("diverge_at",
      divergenceCol(col("text_chosen"), col("text_rejected")))
  }
}
