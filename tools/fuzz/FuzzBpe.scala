import org.apache.spark.sql.SparkSession

/** 60-trial randomized parity sweep for the batched BPE trainer:
  * tiny alphabets maximize chains/self-pairs/ties, random batchTopK
  * stresses the truncation floors. Any MISMATCH line is a soundness
  * bug in BpeTrain.selectExactBatch. */
object FuzzBpe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.text.BpeTrain
    val rng = new scala.util.Random(args.headOption.map(_.toLong).getOrElse(12345L))
    var fails = 0
    for (trial <- 1 to 60) {
      val aLen = 2 + rng.nextInt(5)
      val alphabet = "abcdef".take(aLen)
      val freqs = (1 to 5 + rng.nextInt(25)).map { _ =>
        val w = (1 to (1 + rng.nextInt(7)))
          .map(_ => alphabet(rng.nextInt(aLen))).mkString
        (w, 1L + rng.nextInt(12).toLong)
      }
      val text = freqs.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }.mkString(" ")
      val wordMap = freqs.groupMapReduce(_._1)(_._2)(_ + _)
      val nMerges = 10 + rng.nextInt(50)
      val topK = Seq(4, 16, 64)(rng.nextInt(3))
      val (expM, expV) = BpeTrain.trainFromCounts(wordMap, nMerges)
      val got = BpeTrain.trainDistributedStats(
        Seq(text).toDF("text"), "text", nMerges, batchTopK = topK)
      if (got.merges.map(m => (m._1, m._2)) != expM || got.vocab != expV) {
        fails += 1
        println(s"MISMATCH trial=$trial topK=$topK nMerges=$nMerges corpus=$text")
      }
    }
    println(s"fuzz done: $fails failures / 60 trials")
    spark.stop()
  }
}
