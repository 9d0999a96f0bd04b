import org.apache.spark.sql.SparkSession

/** 25-trial randomized parity sweep for iterative exact quantiles:
  * massive ties, mixed-sign extreme magnitudes, random finite IEEE
  * bit patterns, planted infinities, bits down to 4 (forcing ~16
  * refinement passes). Both descent engines are checked per trial —
  * the driver-map variant and the distributed-search-state variant
  * must each equal the brute-force rank. Any MISMATCH is a bug. */
object FuzzQuantiles {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.Quantiles
    val rng = new scala.util.Random(args.headOption.map(_.toLong).getOrElse(99L))
    var fails = 0
    for (trial <- 1 to 25) {
      val n = 200 + rng.nextInt(3000)
      val rows = (1 to n).map { i =>
        val g = s"g${i % (1 + rng.nextInt(3))}"
        val v = trial % 5 match {
          case 0 => rng.nextInt(4).toDouble
          case 1 => math.pow(10, rng.nextInt(600) - 300) *
            (if (rng.nextBoolean()) 1 else -1)
          case 2 => if (i % 97 == 0) Double.NegativeInfinity
                    else rng.nextGaussian()
          case 3 => rng.nextLong().toDouble
          case _ => java.lang.Double.longBitsToDouble(
            rng.nextLong() & 0x7fefffffffffffffL) *
            (if (rng.nextBoolean()) 1 else -1)
        }
        (g, v)
      }
      val qs = Seq(0.001, 0.1, 0.33, 0.5, 0.77, 0.99, 1.0)
      val bits = Seq(4, 8, 12)(rng.nextInt(3))
      // random integer weights ride every trial: the WEIGHTED ×
      // DISTRIBUTED composition sweeps the same adversarial values
      val wrows = rows.map { case (g, v) => (g, v, 1L + rng.nextInt(7)) }
      val df = wrows.toDF("g", "v", "w").repartition(5)
      val got = Quantiles.exactQuantiles(df, "g", "v", qs, bits)
        .collect().map(r => (r.getString(0), r.getDouble(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      val gotDist = Quantiles.exactQuantilesDist(df, "g", "v", qs, bits)
        .collect().map(r => (r.getString(0), r.getDouble(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      val gotW = Quantiles.exactQuantiles(df, "g", "v", qs, bits,
          weightCol = Some("w"))
        .collect().map(r => (r.getString(0), r.getDouble(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      val gotWDist = Quantiles.exactQuantilesDist(df, "g", "v", qs, bits,
          weightCol = Some("w"))
        .collect().map(r => (r.getString(0), r.getDouble(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      wrows.groupBy(_._1).foreach { case (g, rs) =>
        val sorted = rs.map(_._2).sorted
        val nn = sorted.length.toLong
        val expanded = rs.flatMap { case (_, v, w) =>
          Seq.fill(w.toInt)(v) }.sorted
        val wn = expanded.length.toLong
        qs.foreach { q =>
          val k = math.max(1L, math.ceil(q * nn).toLong)
          val exp = (nn, sorted((k - 1).toInt))
          val kw = math.max(1L, math.ceil(q * wn).toLong)
          val expW = (wn, expanded((kw - 1).toInt))
          if (got((g, q)) != exp) {
            fails += 1
            println(s"MISMATCH trial=$trial g=$g q=$q bits=$bits (driver)")
          }
          if (gotDist((g, q)) != exp) {
            fails += 1
            println(s"MISMATCH trial=$trial g=$g q=$q bits=$bits (dist)")
          }
          if (gotW((g, q)) != expW) {
            fails += 1
            println(s"MISMATCH trial=$trial g=$g q=$q bits=$bits (weighted)")
          }
          if (gotWDist((g, q)) != expW) {
            fails += 1
            println(s"MISMATCH trial=$trial g=$g q=$q bits=$bits " +
              "(weighted dist)")
          }
        }
      }
    }
    println(s"quantile fuzz done: $fails failures / 25 trials")
    spark.stop()
  }
}
