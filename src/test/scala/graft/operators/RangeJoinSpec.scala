package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite with SparkSpec {

  private lazy val sess = spark
  import sess.implicits._

  lazy val points = Seq(
    (1L, 0.0), (2L, 9.99), (3L, 10.0), (4L, 25.0), (5L, 47.3), (6L, 100.0))
    .toDF("pid", "v")
  lazy val intervals = Seq(
    (10L, 0.0, 10.0), (20L, 5.0, 30.0), (30L, 24.9, 25.1), (40L, 60.0, 99.9))
    .toDF("iid", "lo", "hi")

  test("bin join equals the naive BETWEEN join, bin boundaries included") {
    val binned = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi",
        binWidth = 7.0)
      .select("pid", "iid")
    val naive = points.join(intervals,
        col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid")
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
    // and the expected matches are what they should be
    val got = binned.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 10L), (2L, 20L), (3L, 10L), (3L, 20L),
      (4L, 20L), (4L, 30L)))
  }

  test("plan is an equi-join on the bin, not a nested-loop") {
    val plan = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", 7.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Join") || plan.contains("HashJoin"), plan)
  }

  test("scales: no duplicate pairs across bins") {
    val manyPoints = spark.range(0, 1000).select(
      col("id").as("pid"), (col("id") % 97).cast("double").as("v"))
    val manyIntervals = spark.range(0, 50).select(
      col("id").as("iid"),
      (col("id") * 2).cast("double").as("lo"),
      (col("id") * 2 + 10).cast("double").as("hi"))
    val out = RangeJoin.pointInInterval(manyPoints, manyIntervals,
      "v", "lo", "hi", binWidth = 5.0)
    assert(out.groupBy("pid", "iid").count().filter(col("count") > 1).isEmpty)
    val naive = manyPoints.join(manyIntervals,
      col("v") >= col("lo") && col("v") <= col("hi"))
    assert(out.count() == naive.count())
  }
}
