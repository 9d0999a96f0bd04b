package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins (the 100 TB failure mode AQE's skew-join
  * split doesn't always catch — e.g. a single hot key on BOTH sides of
  * a non-broadcastable join).
  *
  * Salting splits each hot left-side key across `salts` reducers and
  * replicates the right side once per salt: the shuffle for the hot key
  * is spread over `salts` tasks at the cost of `salts`× the (small)
  * right side. Deterministic — the salt is a hash of a left-side
  * discriminator column, not a random draw (reproducibility,
  * SURVEY §7.5 risk 6).
  *
  * Aggregations generally DON'T need this: Spark's partial aggregation
  * already combines hot keys map-side. Use it when a reduce-side join
  * stalls on one straggler task.
  */
object Skew {

  /** Inner-join `left ⋈ right` on `key`, salted. `discriminator` is any
    * left column with per-row variety (an id); `salts` ≈ the skew factor
    * to flatten. Result equals the unsalted join exactly. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      discriminator: String, salts: Int): DataFrame = {
    require(salts >= 1)
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(col(discriminator)), lit(salts)))
    val saltedRight = right
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Top key frequencies — the probe for "is this join skewed?"
    * (run on a sample at scale). */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 10): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(topN)
}
