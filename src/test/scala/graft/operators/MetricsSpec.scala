package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class MetricsSpec extends AnyFunSuite with SparkSpec {

  test("batch listener records actions (E6)") {
    val l = Metrics.attach(spark)
    try {
      spark.read.parquet(s"$sf/region.parquet").count()
      spark.read.parquet(s"$sf/nation.parquet").collect()
      // listener callbacks are async
      val deadline = System.currentTimeMillis() + 10000
      while (l.totalActions < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(l.totalActions >= 2)
      assert(!l.anyFailure)
    } finally Metrics.detach(spark, l)
  }
}

class ApproxDistinctSpec extends AnyFunSuite with SparkSpec {
  import org.apache.spark.sql.functions._

  test("HLL approx distinct within 5% of exact (the at-scale P2 path)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val row = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("approx")).head()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("constraint checks switch to HLL for extreme-scale unique sets") {
    import graft.core._
    import graft.validation.Validator
    val schema = TableSchema("lineitem",
      columns = Seq("l_orderkey" -> GDataType.GInteger),
      uniqueColumns = Seq("l_orderkey"))
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val aggs = Validator.constraintAggs(li, schema, exactDistinct = false)
    val plan = li.agg(aggs.head, aggs.tail: _*)
      .queryExecution.executedPlan.toString
    assert(plan.contains("approx_count_distinct") || plan.contains("HyperLogLog"),
      plan)
  }
}
