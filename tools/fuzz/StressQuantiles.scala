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

    // distributed search state on the SAME 10M rows — parity + cost
    val (dist, tD, sD) = timed {
      graft.operators.Quantiles.exactQuantilesDist(df, "g", "v",
          Seq(0.5, 0.95))
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(3)).toMap
    }
    require(dist == refined, s"dist mismatch:\n$dist\n$refined")
    println(f"refinement-dist (4 groups): $tD%.1f s, $sD%.1f MB shuffle")

    // the case the driver-map variant cannot serve: 100k groups × 100
    // continuous rows — per-pass histograms would be 100k × 2^bits
    // driver rows; the distributed descent keeps them executor-side
    val wide = spark.range(0, 10000000).select(
        (col("id") % 100000).cast("string").as("g"),
        (sin(col("id").cast("double")) * 1e6).as("v"))
      .localCheckpoint()
    val (wideGot, tW, sW) = timed {
      graft.operators.Quantiles.exactQuantilesDist(wide, "g", "v", Seq(0.5))
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    }
    // exact ground truth for a sample of groups via the distinct-window
    val check = wide.filter(col("g").isin("0", "31415", "99999"))
      .groupBy($"g", $"v").agg(count(lit(1)).as("cnt"))
    val wCum2 = Window.partitionBy($"g").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll2 = Window.partitionBy($"g")
    val exp = check.withColumn("cum", sum($"cnt").over(wCum2))
      .withColumn("n", sum($"cnt").over(wAll2))
      .filter($"cum" >= greatest(lit(1L), ceil($"n" * lit(0.5)).cast("long")))
      .groupBy($"g").agg(min($"v").as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    require(wideGot.size == 100000 && exp.forall { case (g, v) => wideGot(g) == v },
      s"wide-group mismatch: ${exp.map { case (g, v) => (g, v, wideGot(g)) }}")
    println(f"refinement-dist (100k groups): $tW%.1f s, $sW%.1f MB shuffle")

    // 1M groups × 10 rows — the extreme key-cardinality shape
    // (per-domain percentiles over a web corpus). The search-state
    // broadcast is ~1M rows here; if SafeBroadcastRule ever degrades
    // it the join falls back to shuffle and stays correct — this run
    // measures whichever plan actually executes
    val xwide = spark.range(0, 10000000).select(
        (col("id") % 1000000).cast("string").as("g"),
        (sin(col("id").cast("double")) * 1e6).as("v"))
      .localCheckpoint()
    val (xGot, tX, sX) = timed {
      graft.operators.Quantiles.exactQuantilesDist(xwide, "g", "v", Seq(0.5))
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    }
    val xcheck = xwide.filter(col("g").isin("0", "314159", "999999"))
      .groupBy($"g", $"v").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum($"cnt").over(wCum2))
      .withColumn("n", sum($"cnt").over(wAll2))
      .filter($"cum" >= greatest(lit(1L), ceil($"n" * lit(0.5)).cast("long")))
      .groupBy($"g").agg(min($"v").as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    require(xGot.size == 1000000 &&
      xcheck.forall { case (g, v) => xGot(g) == v },
      s"1M-group mismatch: ${xcheck.map { case (g, v) => (g, v, xGot(g)) }}")
    println(f"refinement-dist (1M groups): $tX%.1f s, $sX%.1f MB shuffle")

    // per-key equi-depth grids at 100k keys: cut sizing through the
    // distributed descent + bucketOfKeyed assignment; every key's
    // bucket masses must be balanced (continuous values — no
    // irreducible duplicate mass)
    val (bal, tE, sE) = timed {
      val bounds = graft.operators.Quantiles
        .equiDepthBoundsDist(wide, "g", "v", b = 8)
      graft.operators.Quantiles.bucketOfKeyed(wide, "g", "v", bounds)
        .groupBy(col("g"), col("bucket")).agg(count(lit(1)).as("m"))
        .groupBy(col("g")).agg(max(col("m")).as("mx"), sum(col("m")).as("n"))
        .filter(col("mx") > col("n") / 8 + lit(2))
        .count()
    }
    require(bal == 0L, s"$bal keys with unbalanced equi-depth buckets")
    println(f"equi-depth keyed (100k keys, b=8): $tE%.1f s, $sE%.1f MB shuffle")
    spark.stop()
  }
}
