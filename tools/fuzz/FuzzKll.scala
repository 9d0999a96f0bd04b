import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 40-trial randomized sweep for the KLL sketch family: random value
  * distributions (uniform / heavy-tied / exponential-ish spread /
  * adversarial magnitudes), random k, random partitionings, random
  * micro-batch slicings through the serialized-state merge. Per trial:
  *  - exact regime (n ≤ k): quantiles == sorted-rank ground truth,
  *    bit-exact, under a random repartition AND through a random
  *    slice-merge via KllMergeAgg;
  *  - compacted regime: every quantile is a data element whose rank
  *    error ≤ (⌈log₂(n/k)⌉+2)·n/k, again under random layouts;
  *  - sketch-vs-sketch KS against a shifted twin == brute-force KS
  *    within the summed bounds (exact when both exact-regime).
  * Any MISMATCH line is a soundness bug. */
object FuzzKll {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.NativeAgg
    val rng = new scala.util.Random(args.headOption.map(_.toLong).getOrElse(777L))
    var fails = 0

    def gen(n: Int, mode: Int): Array[Double] = mode match {
      case 0 => Array.fill(n)(rng.nextDouble() * 1000)
      case 1 => Array.fill(n)((rng.nextInt(7) + 1).toDouble) // massive ties
      case 2 => Array.fill(n)(math.exp(rng.nextDouble() * 20) *
        (if (rng.nextBoolean()) 1 else -1)) // 20-decade spread, mixed sign
      case _ => Array.fill(n)(rng.nextGaussian() * 1e-6)
    }
    def lowerQ(sorted: Array[Double], q: Double): Double =
      sorted(math.max(1L, math.ceil(q * sorted.length).toLong).toInt - 1)
    def bruteKs(x: Array[Double], y: Array[Double]): Double = {
      val xs = x.sorted
      val ys = y.sorted
      def cdf(s: Array[Double], v: Double): Double = {
        var lo = 0; var hi = s.length
        while (lo < hi) {
          val m = (lo + hi) >>> 1
          if (s(m) <= v) lo = m + 1 else hi = m
        }
        lo.toDouble / s.length
      }
      (x ++ y).distinct.map(v => math.abs(cdf(xs, v) - cdf(ys, v))).max
    }

    for (trial <- 1 to 40) {
      val mode = rng.nextInt(4)
      val exact = rng.nextBoolean()
      val k = Seq(64, 256, 1024)(rng.nextInt(3))
      val n = if (exact) 1 + rng.nextInt(k) else k * (2 + rng.nextInt(20))
      val vs = gen(n, mode)
      val sorted = vs.sorted
      val qs = Seq(rng.nextDouble() * 0.2 + 0.001, 0.5,
        1.0 - rng.nextDouble() * 0.2)
      val parts = 1 + rng.nextInt(16)
      val slices = 1 + rng.nextInt(6)
      // direct aggregate under a random partitioning
      val direct = vs.toSeq.toDF("v").repartition(parts)
        .agg(NativeAgg.kllQuantiles(col("v"), k, qs))
        .head().getSeq[Double](0)
      // slice → per-slice sketch → serialized-state merge
      val merged = vs.zipWithIndex.map { case (v, i) => (i % slices, v) }
        .toSeq.toDF("s", "v").repartition(parts)
        .groupBy(col("s")).agg(NativeAgg.kllSketch(col("v"), k).as("kll"))
        .agg(NativeAgg.kllStateQuantiles(NativeAgg.kllMerge(col("kll"), k), qs))
        .head().getSeq[Double](0)
      val bound =
        if (exact) 0.0
        else ((math.log(n.toDouble / k) / math.log(2)).ceil + 2) * n / k
      def check(label: String, got: Seq[Double]): Unit =
        qs.zip(got).foreach { case (q, v) =>
          val target = math.max(1L, math.ceil(q * n).toLong)
          val i = java.util.Arrays.binarySearch(sorted, v)
          val pos = if (i >= 0) i else { fails += 1
            println(s"MISMATCH trial $trial $label q=$q: $v not a data element"); 0 }
          // rank range of v under ties: [first, last] occurrence
          var lo = pos; while (lo > 0 && sorted(lo - 1) == v) lo -= 1
          var hi = pos; while (hi + 1 < n && sorted(hi + 1) == v) hi += 1
          val err = if (target - 1 < lo) lo - (target - 1)
            else if (target - 1 > hi) target - 1 - hi else 0L
          if (exact && v != lowerQ(sorted, q)) { fails += 1
            println(s"MISMATCH trial $trial $label exact q=$q: $v != ${lowerQ(sorted, q)}") }
          if (err > bound) { fails += 1
            println(s"MISMATCH trial $trial $label q=$q rank err $err > $bound") }
        }
      check("direct", direct)
      check("merged", merged)
      // KS vs a shifted twin
      val shift = rng.nextDouble() * 2
      val ws = vs.map(_ + shift)
      val skA = vs.toSeq.toDF("v").agg(NativeAgg.kllSketch(col("v"), k))
        .head().getAs[Array[Byte]](0)
      val skB = ws.toSeq.toDF("v").agg(NativeAgg.kllSketch(col("v"), k))
        .head().getAs[Array[Byte]](0)
      val ks = spark.range(1)
        .select(NativeAgg.kllKs(lit(skA), lit(skB))).head().getDouble(0)
      val trueKs = bruteKs(vs, ws)
      val eps = if (exact) 0.0
        else 2 * ((math.log(n.toDouble / k) / math.log(2)).ceil + 2) / k
      if (math.abs(ks - trueKs) > eps + 1e-12) { fails += 1
        println(s"MISMATCH trial $trial ks: $ks vs $trueKs (eps $eps)") }
    }
    println(if (fails == 0) "FuzzKll: 40 trials OK"
      else s"FuzzKll: $fails FAILURES")
    spark.stop()
  }
}
