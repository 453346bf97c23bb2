package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}

/** MinHash-LSH parameter planning — the S-curve arithmetic every
  * banding configuration decision rests on (Leskovec/Rajaraman/Ullman,
  * "Mining of Massive Datasets" ch. 3, public): with `b` bands of `r`
  * rows, a pair of Jaccard similarity `s` collides in at least one
  * band with probability `1 − (1 − s^r)^b`, and the curve's threshold
  * (steepest point) sits near `(1/b)^(1/r)`. [[Dedup.minhash]] takes
  * (numPerms, numBands) on faith; this op shows what each legal
  * banding DOES — detection probability at the similarities you care
  * about — so the choice is auditable instead of folklore.
  *
  * Scale shape: pure driver arithmetic over the divisors of numPerms
  * (≤ d(numPerms) rows — model-table state, zero corpus work, zero
  * shuffles). The output is a plain table a pipeline config can join
  * or a reviewer can read.
  */
object LshPlan {

  /** One row per legal banding (b divides numPerms): (bands,
    * rows_per_band, t_star, p_at_threshold, chosen) where t_star =
    * (1/b)^(1/r) approximates each curve's inflection, p_at_threshold
    * = detection probability AT the requested threshold, and `chosen`
    * marks the banding whose t_star lands closest to the threshold
    * (ties → fewer bands, the cheaper shuffle). All doubles rounded
    * to 6 for cross-engine replay. */
  def choose(spark: SparkSession, numPerms: Int,
      threshold: Double): DataFrame = {
    require(numPerms >= 1 && numPerms <= 65536,
      s"numPerms must be in [1, 65536], got $numPerms")
    require(threshold > 0.0 && threshold < 1.0,
      s"threshold must be in (0, 1), got $threshold")
    import spark.implicits._
    val rows = (1 to numPerms).filter(numPerms % _ == 0).map { b =>
      val r = numPerms / b
      val tStar = math.pow(1.0 / b, 1.0 / r)
      val pAt = 1.0 - math.pow(1.0 - math.pow(threshold, r.toDouble),
        b.toDouble)
      (b.toLong, r.toLong, tStar, pAt)
    }
    val best = rows.minBy { case (b, _, t, _) =>
      (math.abs(t - threshold), b)
    }._1
    rows.map { case (b, r, t, p) =>
      (b, r, rnd(t), rnd(p), b == best)
    }.toDF("bands", "rows_per_band", "t_star", "p_at_threshold", "chosen")
  }

  /** Detection-probability curve for ONE banding over a similarity
    * grid: (s, p_detect) rows — the picture `choose` summarizes. */
  def curve(spark: SparkSession, numPerms: Int, numBands: Int,
      similarities: Seq[Double]): DataFrame = {
    require(numBands >= 1 && numPerms % numBands == 0,
      s"numBands must divide numPerms, got $numPerms/$numBands")
    require(similarities.nonEmpty, "need at least one similarity point")
    require(similarities.forall(s => s >= 0.0 && s <= 1.0),
      "similarities must be in [0, 1]")
    import spark.implicits._
    val r = numPerms / numBands
    similarities.sorted.map { s =>
      (rnd(s), rnd(1.0 - math.pow(1.0 - math.pow(s, r.toDouble),
        numBands.toDouble)))
    }.toDF("s", "p_detect")
  }

  private def rnd(x: Double): Double = graft.core.Num.rnd6(x)
}
