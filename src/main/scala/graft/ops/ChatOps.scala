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
  * The template is CONFIGURABLE per model family ([[ChatTemplate]]): each
  * message renders as `msgPrefix + content + msgSuffix` (with `{role}`
  * substituted in both), the whole conversation wrapped in `bos`/`eos`.
  * A span covers exactly the CONTENT of each `maskRole` message (headers,
  * separators, bos/eos stay unmasked).
  *
  * Scale shape: one `aggregate` lambda over the per-row message array —
  * pure native expressions, no UDF, no shuffle, no explode/re-group
  * round-trip (the window-over-exploded-messages shape would shuffle every
  * conversation; the fold never leaves the row).
  */
object ChatOps {

  /** One model family's rendering rules. `{role}` in `msgPrefix` /
    * `msgSuffix` is replaced by the message's role. */
  final case class ChatTemplate(
      bos: String = "",
      msgPrefix: String = "<|{role}|>\n",
      msgSuffix: String = "\n",
      eos: String = "")

  object ChatTemplate {
    /** The engine's original fixed template (`<|role|>\ncontent\n`). */
    val Default: ChatTemplate = ChatTemplate()
    /** OpenAI/Qwen-style ChatML. */
    val ChatML: ChatTemplate =
      ChatTemplate(msgPrefix = "<|im_start|>{role}\n", msgSuffix = "<|im_end|>\n")
    /** Alpaca-style instruction headers. */
    val Alpaca: ChatTemplate =
      ChatTemplate(msgPrefix = "### {role}:\n", msgSuffix = "\n\n")
    val builtins: Map[String, ChatTemplate] =
      Map("default" -> Default, "chatml" -> ChatML, "alpaca" -> Alpaca)
  }

  /** What a render appends after the last turn: the eos, or — under
    * the public add_generation_prompt contract — an OPEN `maskRole`
    * header with NO eos (the inference-prompt shape; the model
    * continues from the header). Shared by [[render]] and
    * [[renderPartsWithSpans]]. */
  private def renderTail(template: ChatTemplate, maskRole: String,
      generationPrompt: Boolean): Column =
    if (generationPrompt) fillRole(template.msgPrefix, lit(maskRole))
    else lit(template.eos)

  /** `tpl` with every `{role}` placeholder replaced by the role COLUMN —
    * a concat of literal segments and the role, stays pure codegen. */
  private def fillRole(tpl: String, role: Column): Column = {
    val parts = tpl.split(java.util.regex.Pattern.quote("{role}"), -1)
    if (parts.length == 1) lit(tpl)
    else concat(parts.toIndexedSeq.flatMap(p => Seq(lit(p), role))
      .dropRight(1): _*)
  }

  /** Render `messagesCol` (array<struct<role,content>>) into `textOut` and
    * append `spansOut` (array<struct<s,e>> — [start, end) character
    * offsets of every `maskRole` message's content) under `template`.
    *
    * `generationPrompt` mirrors the public `add_generation_prompt`
    * chat-template contract (HF `apply_chat_template`): append an OPEN
    * `maskRole` header after the last turn and SKIP the eos — the
    * inference-prompt shape (the model continues from the header), not
    * a training sample. Mask spans are unchanged (nothing after the
    * header exists to mask). */
  def render(df: DataFrame, messagesCol: String,
      template: ChatTemplate,
      maskRole: String = "assistant", textOut: String = "text",
      spansOut: String = "mask_spans",
      generationPrompt: Boolean = false): DataFrame = {
    val msgs = col(messagesCol)
    val zero = struct(
      lit(template.bos).as("txt"),
      array().cast("array<struct<s:bigint,e:bigint>>").as("spans"))
    val folded = aggregate(msgs, zero, (acc, m) => {
      val role = m.getField("role")
      val hdr = fillRole(template.msgPrefix, role)
      val tail = fillRole(template.msgSuffix, role)
      // A null content turn renders as EMPTY (zero-width span), not as a
      // null that concat would propagate over the whole conversation —
      // one poisoned message must not silently drop the rendered sample.
      val body = coalesce(m.getField("content"), lit(""))
      val start = (length(acc.getField("txt")) + length(hdr)).cast("bigint")
      val end = (start + length(body)).cast("bigint")
      struct(
        concat(acc.getField("txt"), hdr, body, tail).as("txt"),
        when(role === maskRole,
          concat(acc.getField("spans"),
            array(struct(start.as("s"), end.as("e")))))
          .otherwise(acc.getField("spans")).as("spans"))
    })
    df.withColumn("_chat", folded)
      .withColumn(textOut, concat(col("_chat.txt"),
        renderTail(template, maskRole, generationPrompt)))
      .withColumn(spansOut, col("_chat.spans"))
      .drop("_chat")
  }

  /** Normalize flat (prompt, response) columns — the most common raw SFT
    * shape — into a messages array (`[user: prompt, assistant: response]`,
    * optionally led by a system message), feeding [[render]]/[[validate]].
    * Pure struct construction, no shuffle. */
  def fromPromptResponse(df: DataFrame, promptCol: String,
      responseCol: String, system: Option[String] = None,
      msgsOut: String = "messages"): DataFrame = {
    val core = Seq(
      struct(lit("user").as("role"), col(promptCol).as("content")),
      struct(lit("assistant").as("role"), col(responseCol).as("content")))
    val msgs = system match {
      case Some(sys) => array(
        (struct(lit("system").as("role"), lit(sys).as("content")) +: core): _*)
      case None => array(core: _*)
    }
    df.withColumn(msgsOut, msgs)
  }

  /** Bridge from an EVENT LOG to conversations — sessionize a (key, ts,
    * role, content) stream with [[TemporalOps.sessionize]]'s gap rule and
    * collect each session's events, time-ordered, into the messages
    * array the rest of the chat family consumes ([[render]],
    * [[validate]], [[graft.ops.Preference]]). The support-ticket /
    * chat-log ingestion shape: raw interaction logs in, SFT-ready
    * conversations out.
    *
    * Scale shape: the two keyed windows sessionize already pays + ONE
    * (key, session) aggregation; ordering inside a session is
    * `array_sort` over (ts, tieBreak)-keyed structs (collect_list alone
    * is shuffle-order dependent), so the output is deterministic under
    * any partitioning. */
  def fromEventLog(df: DataFrame, keyCol: String, tsCol: String,
      roleCol: String, contentCol: String, gap: Long, tieBreak: String,
      msgsOut: String = "messages"): DataFrame = {
    val sess = TemporalOps.sessionize(df, keyCol, tsCol, gap, tieBreak)
    sess.groupBy(col(keyCol), col("session_id"))
      .agg(array_sort(collect_list(struct(
        col(tsCol).as("t"), col(tieBreak).as("tb"),
        col(roleCol).cast("string").as("role"),
        col(contentCol).cast("string").as("content")))).as("_ord"))
      .withColumn(msgsOut, transform(col("_ord"), m => struct(
        m.getField("role").as("role"),
        m.getField("content").as("content"))))
      .withColumn("n_messages", size(col(msgsOut)).cast("bigint"))
      .drop("_ord")
  }

  /** Conversation-shape validation — the drop-malformed-samples gate of
    * SFT prep: appends `conv_valid` and `conv_invalid_reason` (null when
    * valid). Rules: non-empty; at most one LEADING system message; then
    * strict user/assistant alternation starting at user; ends on an
    * assistant turn; no null/empty content anywhere. All checks are pure
    * array-lambda expressions — no UDF, no shuffle. Reason priority:
    * empty > system_not_leading > empty_content > bad_alternation >
    * unterminated. */
  def validate(df: DataFrame, messagesCol: String,
      validOut: String = "conv_valid",
      reasonOut: String = "conv_invalid_reason"): DataFrame = {
    val msgs = col(messagesCol)
    val body = when(
      size(msgs) >= 1 &&
        element_at(msgs, 1).getField("role") === "system",
      slice(msgs, lit(2), size(msgs) - 1)).otherwise(msgs)
    val emptyConv = msgs.isNull || size(msgs) === 0 || size(body) === 0
    val strayedSystem = exists(body, m => m.getField("role") === "system")
    val emptyContent = exists(msgs, m =>
      m.getField("content").isNull || length(m.getField("content")) === 0)
    val altBroken = exists(
      zip_with(body, sequence(lit(0), size(body) - 1), (m, i) =>
        m.getField("role") =!=
          when(i % 2 === 0, lit("user")).otherwise(lit("assistant"))),
      b => b)
    val unterminated = size(body) % 2 =!= 0
    val reason = when(emptyConv, lit("empty"))
      .when(strayedSystem, lit("system_not_leading"))
      .when(emptyContent, lit("empty_content"))
      .when(altBroken, lit("bad_alternation"))
      .when(unterminated, lit("unterminated"))
      .otherwise(lit(null).cast("string"))
    df.withColumn(reasonOut, reason)
      .withColumn(validOut, col(reasonOut).isNull)
  }

  /** Shift every (s, e) span by `offset` characters — how loss-mask spans
    * survive downstream concatenation: after [[PackOp]] places a rendered
    * sample at character `offset` inside its packed sequence, the sample's
    * spans move with it (closed-form, no re-render). */
  /** Merge CONSECUTIVE same-role turns — the repair between
    * [[fromEventLog]] (raw interaction logs legitimately emit two user
    * events in a row) and [[validate]] (whose alternation rule rejects
    * them): each maximal same-role run collapses to ONE message whose
    * content is the run's contents joined by `sep`; the run's FIRST
    * message keeps its other struct fields (withField, not a rebuild).
    * Pure per-row fold — no explode, no shuffle; appends `outCol` and
    * `n_merged_turns` (messages removed by merging). */
  def mergeConsecutiveRoles(df: DataFrame, messagesCol: String,
      sep: String = "\n", outCol: String = "messages_merged"): DataFrame = {
    val msgType = df.schema(df.schema.fieldIndex(messagesCol)).dataType
    val msgs = coalesce(col(messagesCol), array().cast(msgType))
    val empty = array().cast(msgType)
    val merged = aggregate(msgs, empty, (acc, m) => {
      // get() is the null-safe indexer: element_at(acc, -1) would THROW
      // on the empty accumulator even behind a size guard (ANSI `&&`
      // evaluates both operands)
      val last = get(acc, size(acc) - 1)
      val sameRole = last.getField("role") === m.getField("role")
      val fused = last.withField("content",
        concat(coalesce(last.getField("content"), lit("")), lit(sep),
          coalesce(m.getField("content"), lit(""))))
      when(coalesce(sameRole, lit(false)),
        concat(slice(acc, lit(1), size(acc) - 1), array(fused)))
        .otherwise(concat(acc, array(m)))
    })
    df.withColumn(outCol, merged)
      .withColumn("n_merged_turns",
        (size(msgs) - size(col(outCol))).cast("bigint"))
  }

  /** Per-conversation shape statistics — the SFT-datacard band: turn
    * count, per-role turn counts, total/assistant character mass, mean
    * turn length, and whether the conversation ends on an assistant
    * turn (the shape SFT loss-masking assumes). Pure array expressions
    * fused into the scan — no explode, no shuffle; pair with
    * [[validate]] (which gates) where this REPORTS. */
  def stats(df: DataFrame, messagesCol: String): DataFrame = {
    // NULL message arrays report as zero-turn conversations (the same
    // shape validate() classifies as 'empty'), not NULL stat columns
    // that vanish from downstream averages
    val msgs = coalesce(col(messagesCol), array().cast(
      df.schema(df.schema.fieldIndex(messagesCol)).dataType))
    val contentLen = (m: Column) =>
      length(coalesce(m.getField("content"), lit("")))
    val nTurns = size(msgs).cast("bigint")
    val roleCount = (r: String) => size(filter(msgs,
      m => m.getField("role") === r)).cast("bigint")
    val totalChars = aggregate(msgs, lit(0L),
      (acc, m) => acc + contentLen(m))
    val asstChars = aggregate(msgs, lit(0L), (acc, m) =>
      acc + when(m.getField("role") === "assistant", contentLen(m))
        .otherwise(lit(0L)))
    df.withColumn("n_turns", nTurns)
      .withColumn("n_user_turns", roleCount("user"))
      .withColumn("n_assistant_turns", roleCount("assistant"))
      .withColumn("total_chars", totalChars)
      .withColumn("assistant_chars", asstChars)
      .withColumn("mean_turn_chars",
        round(totalChars / greatest(nTurns, lit(1L)).cast("double"), 6))
      // get() is the null-safe indexer (ANSI element_at THROWS on an
      // empty array, even behind a boolean guard)
      .withColumn("ends_with_assistant",
        coalesce(get(msgs, nTurns.cast("int") - 1)
          .getField("role") === "assistant", lit(false)))
  }

  // ------------------------------------------------ typed content parts

  /** Default placeholders rendered for non-text parts: the standard
    * "special token" convention multimodal chat templates use. Unknown
    * part types render as `<type>`. */
  val DefaultPartPlaceholders: Map[String, String] =
    Map("image" -> "<image>", "audio" -> "<audio>", "video" -> "<video>")

  private def placeholderFor(tpe: Column,
      placeholders: Map[String, String]): Column =
    placeholders.foldLeft(
      concat(lit("<"), coalesce(tpe, lit("part")), lit(">"))) {
      case (acc, (k, v)) => when(tpe === k, lit(v)).otherwise(acc)
    }

  /** Flatten TYPED content parts — messages carrying
    * `parts: array<struct<type, text, ...>>` (the modern chat-corpus
    * shape: interleaved text and image/audio references) — into the
    * flat `content` string the rest of the chat family consumes: text
    * parts contribute their text, non-text parts their placeholder.
    * The content field is ADDED via withField, so every other message
    * field (role, ts, the parts themselves) survives; downstream
    * [[validate]]/[[stats]]/[[mergeConsecutiveRoles]] then work
    * unchanged. Pure array expressions, no shuffle. */
  def partsToContent(df: DataFrame, messagesCol: String,
      placeholders: Map[String, String] = DefaultPartPlaceholders,
      outCol: String = "messages_flat"): DataFrame = {
    val msgs = col(messagesCol)
    df.withColumn(outCol, transform(msgs, m => {
      // a NULL parts array folds to a NULL body — coalesce the RESULT
      // (fabricating an empty array of the caller's parts struct would
      // pin its field list, breaking rows carrying extra part fields)
      val body = coalesce(
        aggregate(m.getField("parts"), lit(""), (acc, p) =>
          concat(acc, when(p.getField("type") === "text",
            coalesce(p.getField("text"), lit("")))
            .otherwise(placeholderFor(p.getField("type"), placeholders)))),
        lit(""))
      m.withField("content", body)
    }))
  }

  /** [[render]] for PARTS messages with loss-mask spans that cover
    * ONLY the text parts of `maskRole` turns — a non-text placeholder
    * inside an assistant message stays unmasked (the loss must not
    * train on `<image>` tokens), which flatten-then-render cannot
    * express. Nested per-row folds (messages × parts), still pure
    * expressions: no UDF, no shuffle. */
  def renderPartsWithSpans(df: DataFrame, messagesCol: String,
      template: ChatTemplate = ChatTemplate.Default,
      maskRole: String = "assistant",
      placeholders: Map[String, String] = DefaultPartPlaceholders,
      textOut: String = "text", spansOut: String = "mask_spans",
      generationPrompt: Boolean = false): DataFrame = {
    val msgs = col(messagesCol)
    val spanT = "array<struct<s:bigint,e:bigint>>"
    val zero = struct(
      lit(template.bos).as("txt"),
      array().cast(spanT).as("spans"))
    val folded = aggregate(msgs, zero, (acc, m) => {
      val role = m.getField("role")
      val hdr = fillRole(template.msgPrefix, role)
      val tail = fillRole(template.msgSuffix, role)
      val innerZero = struct(
        (length(acc.getField("txt")) + length(hdr)).cast("bigint").as("o"),
        lit("").as("t"), array().cast(spanT).as("sp"))
      // NULL parts → NULL inner struct; coalesce its two fields below
      // (see partsToContent for why no empty-parts-array fabrication)
      val inner = aggregate(m.getField("parts"), innerZero, (pa, p) => {
        val isText = p.getField("type") === lit("text")
        val ptxt = when(isText, coalesce(p.getField("text"), lit("")))
          .otherwise(placeholderFor(p.getField("type"), placeholders))
        val s = pa.getField("o") + length(pa.getField("t")).cast("bigint")
        val e = s + length(ptxt).cast("bigint")
        struct(pa.getField("o").as("o"),
          concat(pa.getField("t"), ptxt).as("t"),
          when(coalesce(isText, lit(false)) && role === maskRole && e > s,
            concat(pa.getField("sp"), array(struct(s.as("s"), e.as("e")))))
            .otherwise(pa.getField("sp")).as("sp"))
      })
      struct(
        concat(acc.getField("txt"), hdr,
          coalesce(inner.getField("t"), lit("")), tail).as("txt"),
        concat(acc.getField("spans"),
          coalesce(inner.getField("sp"), array().cast(spanT))).as("spans"))
    })
    df.withColumn("_chatp", folded)
      .withColumn(textOut, concat(col("_chatp.txt"),
        renderTail(template, maskRole, generationPrompt)))
      .withColumn(spansOut, col("_chatp.spans"))
      .drop("_chatp")
  }

  /** [[validate]] for PARTS messages: part-level shape rules first
    * (every message carries a non-empty parts array, every part type is
    * known, every text part has text), then the flat conversation rules
    * over the [[partsToContent]] flatten (leading-system, alternation,
    * termination). Reason priority: part-level beats flat-level except
    * `empty` (an empty conversation is `empty`, not `no_parts`). */
  def validateParts(df: DataFrame, messagesCol: String,
      allowedTypes: Seq[String] = Seq("text", "image", "audio", "video"),
      validOut: String = "conv_valid",
      reasonOut: String = "conv_invalid_reason"): DataFrame = {
    val msgs = col(messagesCol)
    val noParts = exists(msgs, m =>
      m.getField("parts").isNull || size(m.getField("parts")) === 0)
    val unknownType = exists(msgs, m => coalesce(
      exists(m.getField("parts"), p =>
        p.getField("type").isNull ||
          !p.getField("type").isin(allowedTypes.map(x => x: Any): _*)),
      lit(false)))
    val emptyTextPart = exists(msgs, m => coalesce(
      exists(m.getField("parts"), p =>
        p.getField("type") === "text" &&
          (p.getField("text").isNull ||
            length(p.getField("text")) === 0)),
      lit(false)))
    val partReason = when(coalesce(noParts, lit(false)), lit("no_parts"))
      .when(coalesce(unknownType, lit(false)), lit("unknown_part_type"))
      .when(coalesce(emptyTextPart, lit(false)), lit("empty_text_part"))
      .otherwise(lit(null).cast("string"))
    val flat = validate(
      partsToContent(df, messagesCol, DefaultPartPlaceholders,
        "_graft_flat"),
      "_graft_flat", "_graft_fv", "_graft_fr")
    flat
      .withColumn(reasonOut,
        when(col("_graft_fr") === "empty", col("_graft_fr"))
          .otherwise(coalesce(partReason, col("_graft_fr"))))
      .withColumn(validOut, col(reasonOut).isNull)
      .drop("_graft_flat", "_graft_fv", "_graft_fr")
  }

  // ------------------------------------------------ tool-call turns

  /** Flatten TOOL-CALL conversations — messages carrying the public
    * agentic-SFT shape (`role` ∈ {system,user,assistant,tool},
    * assistant turns with `tool_calls: array<struct<id,name,arguments>>`,
    * tool turns with `tool_call_id`) — into renderable content: each
    * assistant tool call appends a Hermes-style
    * `<tool_call>{"name": "…", "arguments": …}</tool_call>` block after
    * the turn's content; tool results wrap in
    * `<tool_response>…</tool_response>`. The content field is REPLACED
    * via withField so every other message field survives; [[render]]
    * then masks the assistant body INCLUDING its call blocks (the model
    * must learn to emit the calls) while tool results stay unmasked —
    * the distinction a flat render cannot express. Pure per-row array
    * folds; no UDF, no shuffle. */
  def toolsToContent(df: DataFrame, messagesCol: String,
      outCol: String = "messages_flat"): DataFrame = {
    val msgs = col(messagesCol)
    // the name embeds in a JSON string literal — escape backslashes
    // then quotes (literal replace, not regex), then the common ASCII
    // control characters (\n \r \t JSON-escape; remaining <0x20 bytes
    // strip — JSON forbids them raw in string literals); arguments
    // pass through RAW as the call's own JSON value (null -> JSON
    // null), the public tool-call carrier contract
    def jsonEscape(c: Column): Column = {
      val basic = Seq("\\" -> "\\\\", "\"" -> "\\\"",
        "\n" -> "\\n", "\r" -> "\\r", "\t" -> "\\t")
        .foldLeft(c) { case (acc, (from, to)) =>
          replace(acc, lit(from), lit(to)) }
      regexp_replace(basic, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", "")
    }
    df.withColumn(outCol, transform(msgs, m => {
      val blocks = coalesce(
        aggregate(m.getField("tool_calls"), lit(""), (acc, c) =>
          concat(acc, lit("\n<tool_call>{\"name\": \""),
            jsonEscape(coalesce(c.getField("name"), lit(""))),
            lit("\", \"arguments\": "),
            coalesce(c.getField("arguments"), lit("null")),
            lit("}</tool_call>"))),
        lit(""))
      val content = coalesce(m.getField("content"), lit(""))
      val body = when(m.getField("role") === "tool",
          concat(lit("<tool_response>\n"), content,
            lit("\n</tool_response>")))
        .otherwise(concat(content, blocks))
      m.withField("content", body)
    }))
  }

  /** [[render]] for tool-call conversations: flatten through
    * [[toolsToContent]], render under `template`. Mask spans cover the
    * full assistant body — content plus emitted tool-call blocks —
    * and never the tool responses (observations are inputs, not
    * targets: the public agentic-SFT loss convention). */
  def renderTools(df: DataFrame, messagesCol: String,
      template: ChatTemplate = ChatTemplate.Default,
      maskRole: String = "assistant",
      textOut: String = "text", spansOut: String = "mask_spans",
      generationPrompt: Boolean = false): DataFrame =
    render(toolsToContent(df, messagesCol, "_graft_tools_flat"),
      "_graft_tools_flat", template, maskRole, textOut, spansOut,
      generationPrompt)
      .drop("_graft_tools_flat")

  /** [[validate]] for tool-call conversations — the agentic-SFT shape
    * gate. After the flat preliminaries (non-empty, at most one LEADING
    * system), the body must follow the tool-call state machine:
    *
    *  - `user` (non-empty content) → `assistant`;
    *  - `assistant` with `tool_calls` (content may be empty) → one
    *    `tool` result per pending call id, in any order;
    *  - `assistant` without calls needs non-empty content → `user`;
    *  - every `tool` turn must answer a PENDING id of the immediately
    *    preceding assistant turn (else `orphan_tool_result`), and all
    *    pending ids must be answered before anything else
    *    (`missing_tool_result`);
    *  - the conversation ends on a completed assistant turn
    *    (`unterminated` when expecting assistant/user flow,
    *    `unanswered_tool_calls` when calls are still pending).
    *
    * The scan reports the FIRST violation in message order (positional,
    * documented — the flat [[validate]]'s global reason priority has no
    * analog once errors are order-dependent). One per-row fold carrying
    * (pending ids, expected state, sticky reason); no UDF, no
    * shuffle. Duplicate call ids within one assistant turn are the
    * caller's contract (ids are unique in every public corpus shape). */
  def validateTools(df: DataFrame, messagesCol: String,
      validOut: String = "conv_valid",
      reasonOut: String = "conv_invalid_reason"): DataFrame = {
    val msgs = col(messagesCol)
    val body = when(
      size(msgs) >= 1 &&
        element_at(msgs, 1).getField("role") === "system",
      slice(msgs, lit(2), size(msgs) - 1)).otherwise(msgs)
    val emptyConv = msgs.isNull || size(msgs) === 0 || size(body) === 0
    val strayedSystem = exists(body, m => m.getField("role") === "system")
    val idsT = "array<string>"
    // exp: 0 = expect user, 1 = expect assistant, 2 = expect tool results
    val zero = struct(array().cast(idsT).as("pending"),
      lit(0).as("exp"), lit(null).cast("string").as("reason"))
    val folded = aggregate(body, zero, (acc, m) => {
      val r = m.getField("role")
      val hasContent =
        length(coalesce(m.getField("content"), lit(""))) > 0
      val callIds = coalesce(
        transform(m.getField("tool_calls"),
          c => coalesce(c.getField("id"), lit(""))),
        array().cast(idsT))
      val nCalls = size(callIds)
      val tid = coalesce(m.getField("tool_call_id"), lit(""))
      val exp = acc.getField("exp")
      val pending = acc.getField("pending")
      val afterTool = array_remove(pending, tid)
      val stepReason =
        when(exp === 0,
          when(r === "user" && hasContent, lit(null).cast("string"))
            .when(r === "user", lit("empty_content"))
            .when(r === "tool", lit("orphan_tool_result"))
            .otherwise(lit("bad_alternation")))
        .when(exp === 1,
          when(r === "assistant" && (nCalls > 0 || hasContent),
            lit(null).cast("string"))
            .when(r === "assistant", lit("empty_content"))
            .when(r === "tool", lit("orphan_tool_result"))
            .otherwise(lit("bad_alternation")))
        .otherwise(
          when(r =!= "tool", lit("missing_tool_result"))
            .when(!array_contains(pending, tid),
              lit("orphan_tool_result"))
            .when(!hasContent, lit("empty_content"))
            .otherwise(lit(null).cast("string")))
      val nextExp =
        when(exp === 0, lit(1))
          .when(exp === 1, when(nCalls > 0, lit(2)).otherwise(lit(0)))
          .otherwise(when(size(afterTool) === 0, lit(1)).otherwise(lit(2)))
      val nextPending =
        when(exp === 1 && nCalls > 0, callIds)
          .when(exp === 2, afterTool)
          .otherwise(array().cast(idsT))
      // sticky: once a reason fires, the rest of the scan is frozen
      when(acc.getField("reason").isNotNull, acc)
        .when(stepReason.isNotNull,
          struct(pending.as("pending"), exp.as("exp"),
            stepReason.as("reason")))
        .otherwise(struct(nextPending.as("pending"), nextExp.as("exp"),
          lit(null).cast("string").as("reason")))
    })
    val terminal =
      when(folded.getField("reason").isNotNull, folded.getField("reason"))
        .when(folded.getField("exp") === 2, lit("unanswered_tool_calls"))
        .when(folded.getField("exp") === 1, lit("unterminated"))
        .otherwise(lit(null).cast("string"))
    val reason = when(emptyConv, lit("empty"))
      .when(strayedSystem, lit("system_not_leading"))
      .otherwise(terminal)
    df.withColumn(reasonOut, reason)
      .withColumn(validOut, col(reasonOut).isNull)
  }

  /** Tool-use statistics — the agentic-datacard band beside [[stats]]:
    * call/result counts, distinct tool names, and the per-conversation
    * round count (assistant turns that issued calls). Pure array
    * expressions; no explode, no shuffle. */
  def statsTools(df: DataFrame, messagesCol: String): DataFrame = {
    val msgs = coalesce(col(messagesCol), array().cast(
      df.schema(df.schema.fieldIndex(messagesCol)).dataType))
    val callsOf = (m: Column) => coalesce(
      size(m.getField("tool_calls")), lit(0))
    val nCalls = aggregate(msgs, lit(0L),
      (acc, m) => acc + callsOf(m).cast("bigint"))
    val nResults = size(filter(msgs,
      m => m.getField("role") === "tool")).cast("bigint")
    val nRounds = size(filter(msgs, m =>
      m.getField("role") === "assistant" && callsOf(m) > 0))
      .cast("bigint")
    // null-named calls are a shape defect, not a tool named "" —
    // exclude them from the distinct-name band (n_tool_calls still
    // counts them; validateTools is where missing names should gate)
    val names = array_distinct(flatten(transform(msgs, m =>
      coalesce(filter(transform(m.getField("tool_calls"), c =>
        c.getField("name")), n => n.isNotNull),
        array().cast("array<string>")))))
    df.withColumn("n_tool_calls", nCalls)
      .withColumn("n_tool_results", nResults)
      .withColumn("n_tool_rounds", nRounds)
      .withColumn("n_distinct_tools", size(names).cast("bigint"))
      .withColumn("tools_used", array_sort(names))
  }

  /** Drop oldest turns to fit a character budget — the standard
    * long-conversation SFT repair ("keep the most recent context"):
    * keeps the LONGEST SUFFIX of messages whose total content length
    * fits `budget`, plus (optionally) the leading system message, which
    * carries the instructions and is charged against the budget first.
    * Appends `outCol` and `n_trimmed_turns`. The greedy suffix stops at
    * the FIRST overflow (no cherry-picking of smaller earlier turns —
    * context must stay contiguous). Pure per-row fold over the reversed
    * array; no explode, no shuffle. */
  def trimToBudget(df: DataFrame, messagesCol: String, budget: Long,
      keepSystem: Boolean = true,
      outCol: String = "messages_trimmed"): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val msgType = df.schema(df.schema.fieldIndex(messagesCol)).dataType
    val msgs = coalesce(col(messagesCol), array().cast(msgType))
    val contentLen = (m: Column) =>
      length(coalesce(m.getField("content"), lit(""))).cast("bigint")
    val leadSystem = when(
      lit(keepSystem) && size(msgs) >= 1 &&
        get(msgs, lit(0)).getField("role") === "system",
      slice(msgs, lit(1), lit(1))).otherwise(array().cast(msgType))
    val bodyMsgs = when(size(leadSystem) === 1,
      slice(msgs, lit(2), greatest(size(msgs) - 1, lit(0))))
      .otherwise(msgs)
    val sysCost = coalesce(
      aggregate(leadSystem, lit(0L), (a, m) => a + contentLen(m)), lit(0L))
    // reverse fold: kept suffix accumulates newest-first until the
    // budget saturates; `sat` latches so an earlier small turn cannot
    // re-enter after a larger one overflowed (contiguity)
    val zero = struct(array().cast(msgType).as("kept"),
      sysCost.as("used"), lit(false).as("sat"))
    val folded = aggregate(reverse(bodyMsgs), zero, (acc, m) => {
      val fits = !acc.getField("sat") &&
        acc.getField("used") + contentLen(m) <= budget
      struct(
        when(fits, concat(array(m), acc.getField("kept")))
          .otherwise(acc.getField("kept")).as("kept"),
        when(fits, acc.getField("used") + contentLen(m))
          .otherwise(acc.getField("used")).as("used"),
        when(fits, acc.getField("sat")).otherwise(lit(true)).as("sat")
      )
    })
    df.withColumn(outCol, concat(leadSystem, folded.getField("kept")))
      .withColumn("n_trimmed_turns",
        (size(msgs) - size(col(outCol))).cast("bigint"))
  }

  /** Per-conversation PARTS statistics — the multimodal datacard band
    * next to [[stats]]: turn count, text/non-text part counts, per-type
    * non-text histogram pairs left to the caller (type vocab is open),
    * text character mass, and image-part count (the common case).
    * Pure nested array folds, no explode, no shuffle. */
  def statsParts(df: DataFrame, messagesCol: String): DataFrame = {
    val msgs = coalesce(col(messagesCol), array().cast(
      df.schema(df.schema.fieldIndex(messagesCol)).dataType))
    // NULL parts arrays contribute 0 everywhere (the size/aggregate
    // results are coalesced — no empty-parts-array fabrication, see
    // partsToContent)
    def countParts(pred: Column => Column) = aggregate(msgs, lit(0L),
      (acc, m) => acc + coalesce(
        size(filter(m.getField("parts"), pred)).cast("bigint"), lit(0L)))
    val textParts = countParts(p => p.getField("type") === "text")
    val nonText = countParts(p => p.getField("type") =!= "text")
    val imageParts = countParts(p => p.getField("type") === "image")
    val textChars = aggregate(msgs, lit(0L), (acc, m) =>
      acc + coalesce(
        aggregate(m.getField("parts"), lit(0L), (pa, p) =>
          pa + when(p.getField("type") === "text",
            length(coalesce(p.getField("text"), lit(""))).cast("bigint"))
            .otherwise(lit(0L))), lit(0L)))
    df.withColumn("n_turns", size(msgs).cast("bigint"))
      .withColumn("n_text_parts", textParts)
      .withColumn("n_nontext_parts", nonText)
      .withColumn("n_image_parts", imageParts)
      .withColumn("text_chars", textChars)
  }

  def offsetSpans(spans: Column, offset: Column): Column =
    transform(spans, sp => struct(
      (sp.getField("s") + offset).cast("bigint").as("s"),
      (sp.getField("e") + offset).cast("bigint").as("e")))

  /** [[render]] under [[ChatTemplate.Default]] (`<|role|>\ncontent\n`). */
  def renderWithSpans(df: DataFrame, messagesCol: String,
      maskRole: String = "assistant", textOut: String = "text",
      spansOut: String = "mask_spans"): DataFrame =
    render(df, messagesCol, ChatTemplate.Default, maskRole, textOut, spansOut)
}
