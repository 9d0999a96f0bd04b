package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KeysSpec extends AnyFunSuite with SparkSpec {

  test("globalRank matches row_number over global order, distributed") {
    val customer = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_name"))

    val ranked = Keys.globalRank(customer, "c_custkey", "rk", buckets = 8,
        smallBytes = 0L) // force the distributed path
      .select("c_custkey", "rk")
    val expected = customer
      .withColumn("rk", row_number().over(Window.orderBy(col("c_custkey"))))
      .select("c_custkey", "rk")

    assert(ranked.exceptAll(expected).isEmpty && expected.exceptAll(ranked).isEmpty)
    // dense 1..N
    val n = customer.count()
    val agg = ranked.agg(min("rk"), max("rk"), countDistinct("rk")).head()
    assert(agg.getLong(0) == 1L && agg.getLong(1) == n && agg.getLong(2) == n)
  }

  test("globalRank on empty input yields empty output") {
    val empty = spark.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_custkey") < 0)
    assert(Keys.globalRank(empty, "c_custkey", "rk").count() == 0)
  }

  test("globalRank physical plan has no unpartitioned window over full data") {
    val customer = spark.read.parquet(s"$sf/customer.parquet")
    val plan = Keys.globalRank(customer, "c_custkey", "rk", buckets = 8,
        smallBytes = 0L)
      .queryExecution.executedPlan.toString
    // the ranking window must be partitioned (by bucket), not global
    assert(!plan.contains("Window [row_number()") ||
      plan.contains("windowspecdefinition(__bucket"))
  }

  test("distributed rank plan carries no CodegenFallback expression " +
      "(native bucket search, not the interpreted ArrayFilter walk)") {
    val customer = spark.read.parquet(s"$sf/customer.parquet")
    val ranked = Keys.globalRank(customer, "c_custkey", "rk", buckets = 8,
      smallBytes = 0L)
    ranked.collect()
    val found = graft.PlanProbe.codegenFallbacks(ranked)
    assert(found.isEmpty,
      s"interpreted expressions on the engine-wide rank path: $found")
  }

  test("graft.rank.smallBytes conf can force distributed, never re-enable the window") {
    val customer = spark.read.parquet(s"$sf/customer.parquet")
    // a huge conf value must NOT override an explicit smallBytes = 0:
    // call sites that pin the at-scale plan stay pinned
    spark.conf.set("graft.rank.smallBytes", Long.MaxValue.toString)
    try {
      val plan = Keys.globalRank(customer, "c_custkey", "rk", buckets = 8,
          smallBytes = 0L)
        .queryExecution.executedPlan.toString
      assert(plan.contains("windowspecdefinition(__bucket"), plan)
      val bad = intercept[IllegalArgumentException] {
        spark.conf.set("graft.rank.smallBytes", "not-a-number")
        Keys.globalRank(customer, "c_custkey", "rk")
      }
      assert(bad.getMessage.contains("graft.rank.smallBytes"))
    } finally spark.conf.unset("graft.rank.smallBytes")
  }

  test("closed-form NTILE/PERCENT_RANK == Spark's window functions for awkward N") {
    // w_ntile_spend derives tiles from (rank, N) arithmetic instead of a
    // global window; the oracle pins N=1500 (N%10 == 0), so the uneven
    // first-r-tiles-get-one-extra branch needs explicit coverage.
    import org.apache.spark.sql.expressions.Window
    for (n <- Seq(1, 2, 9, 17, 103)) {
      val df = spark.range(n.toLong)
        .select((col("id") * 37 % 1000).as("k"), col("id"))
      val w = Window.orderBy(col("k"), col("id"))
      val expected = df
        .withColumn("decile", ntile(10).over(w))
        .withColumn("pct_rank", percent_rank().over(w))
      val (ranked, total) = Keys.globalRankWithCount(df, "k", "rn",
        smallBytes = 0L, tieBreakers = Seq(col("id")))
      assert(total == n.toLong)
      // the PRODUCTION expressions (shared with wNtileSpend), so the
      // uneven-N branch is tested on the code that ships
      val got = ranked
        .withColumn("decile", Keys.ntileExpr(total, 10, "rn"))
        .withColumn("pct_rank", Keys.percentRankExpr(total, "rn"))
        .select(col("k"), col("id"), col("decile"), col("pct_rank"))
      val diff = got.exceptAll(expected.select("k", "id", "decile", "pct_rank"))
      assert(diff.isEmpty, s"n=$n: ${diff.collect().take(5).mkString(";")}")
    }
  }

  test("small inputs (by optimizer estimate) take the single-window path") {
    val customer = spark.read.parquet(s"$sf/customer.parquet")
    val small = Keys.globalRank(customer, "c_custkey", "rk") // default 64 MB
      .queryExecution.executedPlan.toString
    assert(small.contains("windowspecdefinition(c_custkey") ||
      small.contains("Window [row_number()"), small)
    // and it matches the distributed result exactly
    val a = Keys.globalRank(customer, "c_custkey", "rk").select("c_custkey", "rk")
    val b = Keys.globalRank(customer, "c_custkey", "rk", buckets = 8,
      smallBytes = 0L).select("c_custkey", "rk")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
