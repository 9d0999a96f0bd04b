package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query re-measure against sf0.1: times each named
  * SparkEntry query N times through the noop sink (the Bench contract)
  * so a suspicious snapshot entry can be separated from host noise
  * without a full 116-query run.
  * Run: sbt "Test/runMain graft.tools.ProfQ q1 q2 ..." */
object ProfQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .appName("profq").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("tx_dsir_weights", "q17_winsorize", "tx_dup_span_removal")
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"$name%-24s run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
