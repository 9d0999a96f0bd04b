package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class AsOfJoinSpec extends AnyFunSuite with SparkSpec {

  private lazy val sess = spark
  import sess.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("as-of semantics: latest right at-or-before, ties match, gaps null") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")), // before any right → null
      (2L, "u1", ts("2024-01-01 12:00:00")), // exactly at r1 → ties match
      (3L, "u1", ts("2024-01-01 13:30:00")), // between r1 and r2 → r1
      (4L, "u1", ts("2024-01-01 15:00:00")), // after r2 → r2
      (5L, "u2", ts("2024-01-01 12:00:00")), // other key → u2's row
      (6L, "u3", ts("2024-01-01 12:00:00"))  // key with no right → null
    ).toDF("id", "k", "lts")
    val right = Seq(
      ("u1", ts("2024-01-01 12:00:00"), "r1"),
      ("u1", ts("2024-01-01 14:00:00"), "r2"),
      ("u2", ts("2024-01-01 11:00:00"), "r3")
    ).toDF("k", "rts", "v")

    val out = AsOfJoin.asOf(left, right, "k", "lts", "rts", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(out == Map(
      1L -> None, 2L -> Some("r1"), 3L -> Some("r1"),
      4L -> Some("r2"), 5L -> Some("r3"), 6L -> None))
  }

  test("a matched row's NULL value stays NULL (no resurrection of older rows)") {
    // right rows: 10:00 → 'old', 12:00 → NULL. A left row at 12:30 must
    // carry the 12:00 match (value NULL), not resurrect 'old' — ASOF
    // semantics are "the matched row's value", exactly what pandas
    // merge_asof and DuckDB ASOF return.
    val left = Seq((1L, "u1", ts("2024-01-01 12:30:00"))).toDF("id", "k", "lts")
    val right = Seq(
      ("u1", ts("2024-01-01 10:00:00"), Some("old")),
      ("u1", ts("2024-01-01 12:00:00"), None: Option[String])
    ).toDF("k", "rts", "v")
    val out = AsOfJoin.asOf(left, right, "k", "lts", "rts", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(out == Map(1L -> None))
  }

  test("asOfWithin: stale matches null out, fresh ones survive") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 12:30:00")), // 30 min after r1 → fresh
      (2L, "u1", ts("2024-01-01 13:30:00")), // 90 min after r1 → stale
      (3L, "u1", ts("2024-01-01 14:00:00")), // exactly at r2 → fresh (0s)
      (4L, "u2", ts("2024-01-01 12:00:00"))  // no right at all → null
    ).toDF("id", "k", "lts")
    val right = Seq(
      ("u1", ts("2024-01-01 12:00:00"), "r1"),
      ("u1", ts("2024-01-01 14:00:00"), "r2")
    ).toDF("k", "rts", "v")

    val out = AsOfJoin.asOfWithin(left, right, "k", "lts", "rts", Seq("v"),
        toleranceSeconds = 3600L)
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(out == Map(
      1L -> Some("r1"), 2L -> None, 3L -> Some("r2"), 4L -> None))
  }

  test("one shuffle on the key; no range-join explosion") {
    val left = graft.queries.table(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val right = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))
    val plan = AsOfJoin.asOf(left, right, "user_id", "ts", "o_orderdate",
      Seq("o_orderkey")).queryExecution.executedPlan.toString
    // union + window: no join operator at all, single hash-partition exchange
    assert(!plan.contains("Join"), plan)
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).size >= 1, plan)
  }
}
