package graft.plans

import graft.SparkSpec
import graft.functions.GraftExtensions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKRewriteSpec extends AnyFunSuite with SparkSpec {

  private lazy val installed: Unit = GraftExtensions.install(spark)

  private def data: DataFrame = {
    import spark.implicits._
    // 4 keys × 50 rows, unique (v, id) order per key
    (0 until 200).map(i => (i % 4, (i * 37) % 200, i.toLong))
      .toDF("k", "v", "id")
  }

  private def windowed(df: DataFrame) = {
    val w = Window.partitionBy(col("k")).orderBy(col("v").desc, col("id"))
    df.withColumn("rn", row_number().over(w))
  }

  test("row_number()<=k filter is rewritten to the bounded-heap operator") {
    installed
    val q = windowed(data).filter(col("rn") <= 3)
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerKey"), physical)
    // the final WindowExec is gone; the map-side WindowGroupLimit
    // pre-filter (top-k per mapper BEFORE the exchange) must remain —
    // losing it would shuffle every row per key instead of ≤ k
    assert(!physical.matches("(?s).*\\sWindow \\[.*"), physical)
    assert(physical.contains("WindowGroupLimit"), physical)

    // results identical to the un-rewritten window+filter semantics
    val expected = data.collect().toSeq
      .groupBy(_.getInt(0))
      .toSeq
      .flatMap { case (k, rows) =>
        rows.sortBy(r => (-r.getInt(1), r.getLong(2))).take(3).zipWithIndex
          .map { case (r, i) => (k, r.getInt(1), r.getLong(2), i + 1) }
      }.toSet
    val got = q.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == expected)
  }

  test("extra conjuncts survive above the rewrite; rank stays referencable") {
    installed
    val q = windowed(data).filter(col("rn") <= 5 && col("v") > 100)
      .select(col("k"), col("rn"), col("v"))
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerKey"), physical)
    // every surviving row respects BOTH predicates
    q.collect().foreach { r =>
      assert(r.getInt(1) <= 5 && r.getInt(2) > 100)
    }
  }

  test("rank()/global windows/large k are NOT rewritten") {
    installed
    // rank(), not row_number
    val w = Window.partitionBy(col("k")).orderBy(col("v"))
    val r1 = data.withColumn("rn", rank().over(w)).filter(col("rn") <= 3)
    assert(!r1.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    // k beyond the heap-memory guard
    val r2 = windowed(data).filter(col("rn") <= 1000000)
    assert(!r2.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    // rn = 1 special case DOES rewrite
    val r3 = windowed(data).filter(col("rn") === 1)
    assert(r3.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(r3.count() == 4)
  }
}
