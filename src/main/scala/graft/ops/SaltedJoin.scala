package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — the manual skew treatment [[SkewReport]]'s
  * `recommended_salt` column sizes: a hot key whose rows would all land
  * in one reducer is spread across `salts` sub-keys by salting the BIG
  * side deterministically and EXPLODING the small side across every
  * salt. Publicly standard technique (the classic skew-join recipe);
  * complements AQE's `OptimizeSkewedJoin`, which only rebalances
  * sort-merge joins at runtime — salting also covers the cases AQE
  * can't: deterministic replay requirements, skewed keys feeding a
  * downstream window/aggregation, and engines/plans where AQE is off.
  *
  * Scale shape: the left salt derives from md5 of the row's OTHER join
  * input (`saltExpr`, default the whole-row hash is NOT used — callers
  * pass a stable column like an id) so retries and replays land rows on
  * identical sub-keys; the right side replicates ×salts (small side by
  * contract — salts × |right| rows). The join stays a keyed equi-join
  * on (key, salt); no row ever needs the un-salted hot partition.
  */
object SaltedJoin {

  /** Inner-join `big` with `small` on `key`, spreading each key over
    * `salts` sub-keys. `saltExpr` is a SQL expression over BIG's columns
    * whose md5 picks the sub-key (pass a stable id column — determinism
    * across retries is the point; monotonically_increasing_id is not
    * that). Column sets must be disjoint apart from `key`. */
  def inner(big: DataFrame, small: DataFrame, key: String, salts: Int,
      saltExpr: String): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val overlap = (big.columns.toSet intersect small.columns.toSet) - key
    require(overlap.isEmpty,
      s"salted join requires disjoint columns besides '$key'; shared: " +
        overlap.mkString(", "))
    val saltCol = pmod(
      conv(substring(md5(expr(saltExpr).cast("string")), 1, 15), 16, 10)
        .cast("bigint"), lit(salts.toLong)).cast("int")
    val l = big.withColumn("_salt", saltCol)
    val r = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
