package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.QualityRules

/** Round 9f: rule-based quality filtering and data-layout ops. */
class Round9fSpec extends SparkSpec {

  // ---------------------------------------------------------- quality rules

  private val cfg = QualityRules.Config(
    minWords = 3, maxWords = 10, minAvgWordLen = 2.0, maxAvgWordLen = 6.0,
    maxDupWordFrac = 0.5, maxTop2gramFrac = 0.6, minDistinctStopwords = 1)

  test("quality rules: each rule prunes its violating doc") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val d = df(schema,
      Row(1L, "the quick brown fox jumps"), // passes all
      Row(2L, "hi the"), // too few words
      Row(3L, "the a b c d e f g h i j k"), // too many words
      Row(4L, "a b c d e"), // avg word len 1 < 2
      Row(5L, "the the the the fox"), // dup frac 0.6 > 0.5, top2gram 0.75
      Row(6L, "quick brown fox jumps high")) // zero stopwords
    val out = QualityRules.signals(d, "text", cfg)
      .select("id", "keep").collect().map(r => r.getLong(0) -> r.getBoolean(1))
      .toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false,
      5L -> false, 6L -> false))
    val kept = QualityRules.filter(d, "text", cfg)
    assert(kept.columns.toSeq == Seq("id", "text"))
    assert(kept.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("quality rules: signal values are the documented formulas") {
    val schema = StructType(Seq(StructField("text", StringType)))
    val d = df(schema, Row("the fox fox ran"))
    val r = QualityRules.signals(d, "text", cfg).head()
    assert(r.getAs[Long]("n_words") == 4L)
    assert(r.getAs[Double]("avg_word_len") == 12.0 / 4) // "thefoxfoxran"
    assert(r.getAs[Double]("dup_word_frac") == 0.25) // 3 distinct / 4
    assert(r.getAs[Double]("top_2gram_frac") == math.rint(1.0 / 3 * 1e6) / 1e6)
    assert(r.getAs[Long]("n_stopwords") == 1L)
  }

  test("quality rules plan has no shuffle") {
    val d = docsDf
    val plan = QualityRules.signals(d, "text", cfg)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
