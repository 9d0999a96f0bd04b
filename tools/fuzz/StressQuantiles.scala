import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 10M-continuous-value head-to-head: iterative refinement vs the
  * cumulative-count-over-distinct plan — identical exact results
  * asserted; prints wall + shuffle volume for both (SCALE.md entry). */
object StressQuantiles {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    val df = spark.range(0, 10000000).select(
      concat(lit("g"), (col("id") % 4).cast("string")).as("g"),
      (sin(col("id").cast("double")) * 1e6).as("v"))
      .localCheckpoint()
    def timed[A](f: => A): (A, Double, Double) = {
      org.apache.spark.sql.GraftShims.drainListenerBus(spark)
      shuffleBytes.set(0)
      val t0 = System.nanoTime()
      val r = f
      org.apache.spark.sql.GraftShims.drainListenerBus(spark)
      ((r, (System.nanoTime() - t0) / 1e9, shuffleBytes.get / 1048576.0))
    }
    graft.operators.Quantiles.exactQuantiles(df, "g", "v", Seq(0.5)).collect() // warm
    val (refined, tR, sR) = timed {
      graft.operators.Quantiles.exactQuantiles(df, "g", "v", Seq(0.5, 0.95))
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(3)).toMap
    }
    import org.apache.spark.sql.expressions.Window
    val (sorted, tS, sS) = timed {
      val byVal = df.groupBy($"g", $"v").agg(count(lit(1)).as("cnt"))
      val wCum = Window.partitionBy($"g").orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy($"g")
      val cums = byVal.withColumn("cum", sum($"cnt").over(wCum))
        .withColumn("n", sum($"cnt").over(wAll))
      Seq(0.5, 0.95).flatMap { q =>
        cums.filter($"cum" >= greatest(lit(1L), ceil($"n" * lit(q)).cast("long")))
          .groupBy($"g").agg(min($"v").as("v"))
          .collect().map(r => (r.getString(0), q) -> r.getDouble(1))
      }.toMap
    }
    require(refined == sorted, s"mismatch:\n$refined\n$sorted")
    println(f"refinement: $tR%.1f s, $sR%.1f MB shuffle")
    println(f"distinct-window: $tS%.1f s, $sS%.1f MB shuffle")
    spark.stop()
  }
}
