package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.scalatest.funsuite.AnyFunSuite

/** Smoke + shape tests for every registered query at sf0.001.
  * Exact-value parity is covered by the driver's DuckDB oracle gate
  * (tools/check_oracle.py locally). */
class QueriesSpec extends AnyFunSuite with SparkSpec {

  test("every query runs at sf0.001 and returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry() flagship returns pricing summary groups") {
    val df = SparkEntry.entry(spark)
    assert(df.count() == 6) // 3 returnflags × 2 linestatus
    assert(df.columns.contains("sum_qty"))
  }

  test("q1 aggregates are consistent (sum >= avg * count shape)") {
    val row = CoreQueries.q1PricingSummary(spark, sf).collect().head
    val sumQty = row.getAs[Double]("sum_qty")
    val avgQty = row.getAs[Double]("avg_qty")
    val n = row.getAs[Long]("count_order")
    assert(math.abs(sumQty - avgQty * n) < 1e-6 * sumQty)
  }

  test("referential integrity holds on testdata (no orphans)") {
    val df = CoreQueries.t6ReferentialOrphans(spark, sf)
    assert(df.collect().head.getAs[Long]("orphan_count") == 0)
  }
}
