package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Ad-hoc plan inspector (not part of the library API): prints the
  * formatted physical plan of one SparkEntry query, optionally with
  * `-Dkey=value`-style session confs passed as `key=value` args —
  * e.g. `PlanDump w_ntile_spend graft.rank.smallBytes=0` shows the
  * at-scale plan shape PlanAuditSpec audits. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: PlanDump <query> [k=v ...] [--run]"))
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .appName("plandump").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // production planning fidelity: the verify/bench sessions end up
    // with the graft extensions installed (wTopnOrders installs them on
    // the shared session), so dump plans under the same rules
    graft.functions.GraftExtensions.install(spark)
    args.drop(1).filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    }
    val df = graft.SparkEntry.queries(name)(spark, sf)
    println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    if (args.contains("--run")) {
      df.show(10, truncate = false)
      // post-execution plan: AQE applies exchange reuse / skew splits at
      // runtime, so this is where ReusedExchange actually shows up
      println("=== executed (AQE-final) ===")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
