package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKPerKeySpec extends AnyFunSuite with SparkSpec {

  lazy val events = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("user_id"), col("value"))
      .filter(col("value").isNotNull)
  }

  test("heap top-k equals the window formulation on real data") {
    val viaOp = TopK.perKey(events, Seq("user_id"),
      Seq(TopK.desc("value"), TopK.asc("event_id")), k = 3)
    // the window side runs on a FRESH session: another suite may have
    // installed TopKRewriteRule on the shared one, which would rewrite
    // this very pattern to the heap operator and make the parity
    // comparison operator-vs-itself
    val clean = spark.newSession()
    clean.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val cleanEvents = clean.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("user_id"), col("value"))
      .filter(col("value").isNotNull)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    val viaWindow = cleanEvents
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
    assert(!viaWindow.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val opRows = viaOp.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val winRows = viaWindow.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(opRows == winRows)
  }

  test("physical plan is the heap operator, not Sort+Window") {
    val viaOp = TopK.perKey(events, Seq("user_id"),
      Seq(TopK.desc("value")), k = 5)
    val plan = viaOp.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey "), plan) // exec node (Exec suffix stripped in plan strings)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort"), plan)
    // the key exchange is still there (required distribution)
    assert(plan.contains("hashpartitioning(user_id"), plan)
  }

  test("groups smaller than k emit all rows; ranks are 1..n") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 5), ("b", 7)).toDF("g", "x")
    val out = TopK.perKey(df, Seq("g"), Seq(TopK.desc("x")), k = 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(out == Set(("a", 5, 1), ("a", 1, 2), ("b", 7, 1)))
  }

  test("partitioning propagates: same-key groupBy after TopK adds no exchange") {
    val grouped = TopK.perKey(events, Seq("user_id"),
        Seq(TopK.desc("value")), k = 3)
      .groupBy(col("user_id")).agg(sum("value"))
    val plan = grouped.queryExecution.executedPlan.toString
    // exactly ONE exchange (feeding TopK); the aggregate reuses it
    assert("\\bExchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("downstream operations compose (filter/agg over the rank column)") {
    val top1 = TopK.perKey(events, Seq("user_id"),
      Seq(TopK.desc("value"), TopK.asc("event_id")), k = 3)
      .filter(col("rank") === 1)
      .agg(count(lit(1)))
    assert(top1.head().getLong(0) == events.select("user_id").distinct().count())
  }
}
