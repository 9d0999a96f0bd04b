package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Point-in-interval range join.
  *
  * Spark plans `p.v BETWEEN i.lo AND i.hi` (no equality predicate) as a
  * BroadcastNestedLoopJoin — O(|points|·|intervals|) work and a
  * broadcast requirement on one side. The bin-join re-expresses it as an
  * EQUI-join: intervals explode to the bins they cover, points carry
  * their single bin, the join runs on the bin key, and the exact
  * BETWEEN filter trims bin-boundary false positives.
  *
  * Each matching (point, interval) pair meets in EXACTLY one bin (the
  * point's), so no dedup is needed. Cost: shuffle on the bin key +
  * interval replication by ceil(span/binWidth) — pick `binWidth` near
  * the median interval span so replication stays O(1) per interval.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val bin = (c: org.apache.spark.sql.Column) =>
      floor(c / binWidth).cast(LongType)
    val p = points.withColumn("__bin", bin(col(pointCol)))
    val i = intervals.withColumn("__bin",
      explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    p.join(i, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
