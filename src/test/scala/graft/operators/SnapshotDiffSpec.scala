package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SnapshotDiffSpec extends AnyFunSuite with SparkSpec {

  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("status", StringType),
    StructField("amount", DoubleType)))

  private def frame(rows: Row*) =
    spark.createDataFrame(rows.asJava, schema)

  private lazy val v1 = frame(
    Row(1L, "open", 10.0), // unchanged
    Row(2L, "open", 20.0), // status flips
    Row(3L, "open", 30.0), // both non-key cols change
    Row(4L, "open", null), // null -> value (null-safe compare)
    Row(5L, "open", 50.0)) // removed

  private lazy val v2 = frame(
    Row(1L, "open", 10.0),
    Row(2L, "closed", 20.0),
    Row(3L, "closed", 33.0),
    Row(4L, "open", 40.0),
    Row(6L, "open", 60.0)) // added

  private def diff = ChangeDetection.snapshotDiff(v1, v2, Seq("id"))

  test("classification: added/removed/changed, unchanged dropped") {
    val m = diff.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(m === Map(
      2L -> ("changed", "status"),
      3L -> ("changed", "status,amount"),
      4L -> ("changed", "amount"),
      5L -> ("removed", ""),
      6L -> ("added", "")))
  }

  test("null-safe: null==null is unchanged, null!=value is changed") {
    val both = frame(Row(7L, "x", null))
    val d = ChangeDetection.snapshotDiff(both, both, Seq("id"))
    assert(d.isEmpty, "identical null rows must not diff")
  }

  test("changed_cols respects compareCols order and subset") {
    val d = ChangeDetection.snapshotDiff(v1, v2, Seq("id"),
      compareCols = Seq("amount", "status"))
    val r3 = d.filter(col("id") === 3L).head()
    assert(r3.getString(2) === "amount,status")
    // restricting to amount only: id 2's status flip becomes invisible
    val d2 = ChangeDetection.snapshotDiff(v1, v2, Seq("id"),
      compareCols = Seq("amount"))
    assert(d2.filter(col("id") === 2L).isEmpty)
  }

  test("output volume is proportional to change volume") {
    // 1000 identical rows + 1 change: exactly one diff row
    val big = spark.range(1000).select(col("id"), lit("s").as("status"),
      (col("id") * 1.0).as("amount"))
    val tweaked = big.withColumn("amount",
      when(col("id") === 500, 999.0).otherwise(col("amount")))
    val d = ChangeDetection.snapshotDiff(big, tweaked, Seq("id"))
    assert(d.count() === 1L)
    assert(d.head().getString(2) === "amount")
  }
}
