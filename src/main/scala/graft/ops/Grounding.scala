package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Response-grounding score — "how much of this response is actually in
  * the source?": the fraction of the response's DISTINCT word n-grams
  * that appear in the source's n-gram set (ROUGE-n precision /
  * extractiveness, publicly standard summarization-faithfulness
  * heuristics). The SFT-QA gate next to [[ChatOps.validate]]: shape
  * validation catches malformed conversations, grounding catches
  * responses that ignore their source (low score = abstractive or
  * hallucinated; 1.0 = fully extractive).
  *
  * Pure per-row array expressions (shingle, distinct, intersect) — no
  * UDF, no shuffle, fused into the scan; DuckDB replays exactly.
  *
  * Edge semantics: a response SHORTER than `n` tokens falls back to one
  * whole-text gram (the engine's shingle convention), which only matches
  * a source gram of identical shape — so sub-n responses score 0 unless
  * the source contains them verbatim as a short text. Use n=1 for
  * token-level grounding of very short responses.
  */
object Grounding {

  /** Distinct-n-gram precision of `response` against `source`: null when
    * the response has no grams, else |resp ∩ src| / |resp| rounded to 6. */
  def scoreCol(source: Column, response: Column, n: Int = 2): Column = {
    val src = array_distinct(TF.shingles(source, n))
    val resp = array_distinct(TF.shingles(response, n))
    when(resp.isNull || size(resp) === 0, lit(null).cast("double"))
      .otherwise(round(
        size(array_intersect(resp, src)).cast("double") / size(resp), 6))
  }

  /** Append `outCol` = grounding score of `responseCol` vs `sourceCol`. */
  def apply(df: DataFrame, sourceCol: String, responseCol: String,
      n: Int = 2, outCol: String = "grounding_score"): DataFrame =
    df.withColumn(outCol, scoreCol(col(sourceCol), col(responseCol), n))
}
