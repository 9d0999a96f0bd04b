package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: dump the physical-plan skeleton (exchanges, scans,
  * windows, pushed filters) for named `SparkEntry` queries. The formal
  * plan assertions live in `PlanSpec`; this main is for interactive
  * plan iteration while building a query.
  *
  * Usage: `java -cp <classes:spark-jars> graft.tools.PlanProbe q1_pricing_summary …`
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (n <- args) {
      println(s"========== $n")
      val df = graft.SparkEntry.queries(n)(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      // shuffles only — "Exchange " alone would also match Broadcast-
      // and ReusedExchange and overstate the number the design cares about
      println("Shuffles: " +
        "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
          .findAllIn(plan).length +
        "  Broadcasts: " + "BroadcastExchange".r.findAllIn(plan).length +
        "  Reused: " + "ReusedExchange".r.findAllIn(plan).length +
        "  Windows: " + "Window".r.findAllIn(plan).length)
      println(plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Scan parquet") ||
        l.contains("PushedFilters") || l.contains("Window") ||
        l.contains("Expand") || l.contains("Generate")).take(25).mkString("\n"))
    }
    spark.stop()
  }
}
