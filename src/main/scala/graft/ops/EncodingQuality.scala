package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mojibake / encoding-damage detection — the crawl-hygiene signal that
  * catches text decoded with the wrong charset (UTF-8 bytes read as
  * Latin-1/CP1252 and re-encoded, the single most common corruption in web
  * corpora; the public CCNet/C4 pipelines drop or repair such pages).
  * Complements [[graft.functions.TextFunctions.cleanText]]: cleaning
  * normalizes VALID text; this DETECTS invalid decodes that normalization
  * cannot repair.
  *
  * Four codegen'd per-row signals, each a `regexp` count fused into the
  * scan (no UDF, no shuffle; RE2-safe character classes, so the DuckDB
  * oracle replays them exactly):
  *
  *  - `n_replacement` — U+FFFD replacement characters (a decoder already
  *    gave up);
  *  - `n_double_utf8` — 'Ã' followed by a char in U+0080–U+00BF: the
  *    signature of a 2-byte UTF-8 sequence (0xC3 0x80–0xBF, all Latin
  *    accents) decoded as Latin-1 ("café" → "cafÃ©");
  *  - `n_punct_mojibake` — 'â€' pairs: 3-byte UTF-8 punctuation (0xE2
  *    0x80 0x9X — curly quotes, dashes, ellipsis) decoded as CP1252
  *    ("it's" → "itâ€™s");
  *  - `n_c1_controls` — C1 control chars U+0080–U+009F, which no sane
  *    text contains (they appear when CP1252 bytes are decoded as
  *    Latin-1).
  *
  * `mojibake_score` is their sum per 1000 chars (length-normalized so a
  * long clean document with one stray marker does not outscore a short
  * ruined one); `mojibake_flag` applies the threshold.
  */
object EncodingQuality {

  /** (name, count expression) signal list over `c`. */
  def signals(c: Column): Seq[(String, Column)] = Seq(
    "n_replacement" -> regexp_count(c, lit("\uFFFD")),
    "n_double_utf8" -> regexp_count(c, lit("\u00C3[\u0080-\u00BF]")),
    "n_punct_mojibake" -> regexp_count(c, lit("\u00E2\u20AC")),
    "n_c1_controls" -> regexp_count(c, lit("[\u0080-\u009F]"))
  ).map { case (n, e) => n -> e.cast("bigint") }

  /** Append the four signal counts + `mojibake_score` (markers per 1000
    * chars, 6 decimals) + `mojibake_flag` (score > `threshold`). The
    * score/flag reference the APPENDED count columns, so each regexp
    * scans the text once — not once for its column and again inside the
    * score (codegen CSE is not guaranteed across projections). */
  def report(df: DataFrame, textCol: String,
      threshold: Double = 5.0): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val sigs = signals(t)
    val withSigs = sigs.foldLeft(df) {
      case (acc, (n, e)) => acc.withColumn(n, e)
    }
    val total = sigs.map { case (n, _) => col(n) }.reduce(_ + _)
    val score = round(total.cast("double") * 1000.0 /
      greatest(length(t), lit(1)), 6)
    withSigs.withColumn("mojibake_score", score)
      .withColumn("mojibake_flag", col("mojibake_score") > threshold)
  }

  /** Filter mode: drop rows whose score exceeds `threshold`. */
  def clean(df: DataFrame, textCol: String,
      threshold: Double = 5.0): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val total = signals(t).map(_._2).reduce(_ + _)
    df.filter(total.cast("double") * 1000.0 /
      greatest(length(t), lit(1)) <= threshold)
  }

  /** The curated (mojibake, repaired) literal table — ftfy's "sloppy
    * common cases" approach, expression-friendly (true ftfy re-encodes
    * bytes, which needs a UDF; the curated table covers the
    * overwhelmingly common western-language damage at scan speed).
    * Ordered longest-first so the 3-byte CP1252 punctuation trios repair
    * before the 2-byte accent pairs could half-match them.
    *
    *  - trios: UTF-8 punctuation (0xE2 0x80 0x9X) read as CP1252 —
    *    "â€™" → ’, "â€œ" → “, "â€“" → – …
    *  - Ã-pairs: 2-byte UTF-8 Latin accents read as Latin-1/CP1252 —
    *    "Ã©" → é, "Ã¼" → ü … (second char = codepoint − 0x40, the UTF-8
    *    continuation-byte arithmetic, generated not hand-typed)
    *  - Â-pairs: 2-byte UTF-8 symbols 0xC2 0xA0–0xBF — "Â«" → «,
    *    "Â°" → °, stray "Â" before nbsp … (second char = the codepoint
    *    itself; the repair just deletes the Â) */
  val RepairTable: Seq[(String, String)] = {
    val trios = Seq(
      "â€™" -> "’", // ’
      "â€˜" -> "‘", // ‘
      "â€“" -> "–", // –
      "â€”" -> "—", // —
      "â€œ" -> "“", // “
      // ” damages to 0xE2 0x80 0x9D; 0x9D is unmapped in CP1252, so
      // the third char here is the INVISIBLE C1 control U+009D
      "â€" -> "”", // ”
      "â€¦" -> "…", // …
      "â€¢" -> "•") // •
    val aPairs = ("áàâäãåæéèêëíìîïóòôöõøúùûüñçßýÿ" +
      "ÁÀÂÄÃÅÆÉÈÊËÍÌÎÏÓÒÔÖÕØÚÙÛÜÑÇÝ").map { ch =>
      ("Ã" + (ch - 0x40).toChar.toString) -> ch.toString
    }
    val bPairs = " «»°·±¼½¾¡¿©®µ".map { ch =>
      ("Â" + ch.toString) -> ch.toString
    }
    trios ++ aPairs ++ bPairs
  }

  /** Repair mode: apply [[RepairTable]] as a chained literal replace —
    * pure codegen, one linear pass per table entry (a bounded constant),
    * no UDF, no shuffle. Appends `outCol` plus `was_repaired`. Both
    * engines replay the identical chain, so the oracle checks repaired
    * text byte-for-byte. */
  def repair(df: DataFrame, textCol: String,
      outCol: String = "text_repaired"): DataFrame = {
    val fixed = RepairTable.foldLeft(coalesce(col(textCol), lit(""))) {
      case (acc, (bad, good)) => replace(acc, lit(bad), lit(good))
    }
    df.withColumn(outCol, fixed)
      .withColumn("was_repaired",
        coalesce(col(textCol), lit("")) =!= col(outCol))
  }

  /** The DuckDB replay of [[repair]]'s replace chain over SQL
    * expression `e` — generated from the SAME table so the two engines
    * cannot drift. */
  def repairSql(e: String): String =
    RepairTable.foldLeft(e) { case (acc, (bad, good)) =>
      s"replace($acc, '$bad', '$good')"
    }
}
