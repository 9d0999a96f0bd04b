package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression tests: the properties that make these queries
  * scale (pushdown, pruning, broadcast, partial aggregation) are pinned
  * here so a refactor that silently loses one fails CI, not the cluster.
  */
class PlanSpec extends AnyFunSuite with SparkSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q1: ship-date filter is pushed to the parquet scan; columns pruned") {
    val plan = formatted(CoreQueries.q1PricingSummary(spark, sf))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "LessThanOrEqual(l_shipdate,"), plan)
    // only the 7 needed columns are read, not the full table
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"),
      readSchema)
  }

  test("s2 incremental extract: watermark predicate reaches the scan") {
    // the filter must be in the raw nanos-long domain (pre-conversion),
    // or only IsNotNull pushes and 100 TB of row groups scan anyway
    val plan = formatted(EventQueries.s2IncrementalExtract(spark, sf))
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts,"), plan)
  }

  test("q3: orders (fact-sized) is never hint-broadcast; customer (dim) is") {
    // With auto-broadcast disabled, only an explicit hint could force a
    // BroadcastHashJoin. Exactly ONE must survive — the customer dim hint.
    // A second one would mean the linearly-growing `orders` side is being
    // force-broadcast past AQE's size check (OOM at 100 TB).
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p3 = formatted(CoreQueries.q3TopCustomers(spark, sf))
      val bhj = "\\(\\d+\\) BroadcastHashJoin".r.findAllIn(p3).size
      assert(bhj == 1, s"expected exactly 1 hinted broadcast (customer), got $bhj\n$p3")
      assert(p3.contains("SortMergeJoin") || p3.contains("ShuffledHashJoin"), p3)
    } finally spark.conf.set(key, prev)
  }

  test("q5: dimension joins broadcast; fact side never shuffles for the join") {
    val p5 = formatted(CoreQueries.q5RegionRevenue(spark, sf))
    // all three dims broadcast (formatted explain lists each node twice:
    // tree + detail section — count detail headers)
    assert("\\(\\d+\\) BroadcastHashJoin".r.findAllIn(p5).size == 3, p5)
    assert(!p5.contains("SortMergeJoin"), p5)
  }

  test("aggregations are partial+final (map-side combine before shuffle)") {
    val plan = formatted(CoreQueries.q1PricingSummary(spark, sf))
    val aggs = "HashAggregate".r.findAllIn(plan).size
    assert(aggs >= 2, s"expected partial+final HashAggregate, got $aggs\n$plan")
  }

  test("t6 referential check is a broadcast left-anti join, not a shuffle") {
    val plan = formatted(CoreQueries.t6ReferentialOrphans(spark, sf))
    assert(plan.contains("LeftAnti"), plan)
    assert(plan.contains("Broadcast"), plan)
  }

  test("validator fused pass: one scan, no shuffle of raw rows") {
    val df = ValidationQueries.vRulesEvents(spark, sf)
    val plan = formatted(df)
    // a single FileScan feeding aggregates — no join, no repartition
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("boilerplate ratio: corpus scanned & shingled ONCE (window, not agg+join)") {
    // the aggregate-then-self-join spelling plans a second full scan of
    // documents (partial agg below the frequency shuffle kills exchange
    // reuse); the count-over-window form must keep exactly one scan
    val plan = formatted(TextQueries.txBoilerplateRatio(spark, sf))
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(plan).size == 1, plan)
    assert("\\(\\d+\\) Generate".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("Window"), plan)
  }

  test("funnel: one user_id shuffle feeds all three step windows") {
    val plan = formatted(EventQueries.wFunnelSteps(spark, sf))
    // hashpartitioning(user_id) appears once; the final rangepartitioning
    // is the ORDER BY, not a re-shuffle of the windows
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).size == 1, plan)
    assert("\\(\\d+\\) Window".r.findAllIn(plan).size == 3, plan)
  }

  test("q9 quantiles: windows run over pre-aggregated distinct pairs") {
    val plan = formatted(CoreQueries.q9GroupQuantiles(spark, sf))
    // the plan tree prints root-first, so an aggregate BELOW the windows
    // (compressing raw rows to distinct pairs before any sort) must
    // appear AFTER the first Window in the text — indexOf alone would
    // also accept the final post-window aggregate and prove nothing
    val winIdx = plan.indexOf("Window")
    assert(winIdx >= 0, plan)
    assert(plan.indexOf("HashAggregate", winIdx) > winIdx,
      s"no aggregate below the windows\n$plan")
    assert("\\(\\d+\\) Window".r.findAllIn(plan).size == 2, plan)
  }

  test("q8 pivot with declared values: no distinct-values pre-job, one agg") {
    val df = CoreQueries.q8PivotStatus(spark, sf)
    val plan = formatted(df)
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Expand"), plan) // pivot folds into one agg pass
  }
}
