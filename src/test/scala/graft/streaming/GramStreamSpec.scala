package graft.streaming

import graft.SparkSpec
import graft.functions.NativeAgg
import graft.similarity.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming Gram fold: associative integer scatter statistics make
  * the folded state BIT-identical to a one-shot aggregate — and the
  * power iteration over it an exact streaming PCA. */
class GramStreamSpec extends AnyFunSuite with SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("streamed gram state == one-shot aggregate; pc1 identical") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
      .toSeq
    val dir = Files.createTempDirectory("graft-gramstream").toString
    val input = MemoryStream[(Long, Seq[Float])]
    val stream = input.toDF().toDF("vec_id", "embedding")
      .withColumn("corpus", lit("all"))
    val q = Streams.gramMergeSink(stream, s"$dir/state", s"$dir/ckpt",
      Seq("corpus"), "embedding", trig = Streams.trigger(1)).start()
    try {
      (0 until 3).foreach { b =>
        input.addData(rows.filter(_._1 % 3 == b): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val folded = spark.read.parquet(s"$dir/state").head()
    val oneShot = emb
      .select(NativeAgg.gramMatrix(Similarity.quantize(col("embedding"))))
      .head().getStruct(0)
    assert(folded.getAs[Long]("n") === oneShot.getLong(0))
    assert(folded.getAs[Seq[Long]]("s") === oneShot.getSeq[Long](1),
      "component sums must fold bit-identically")
    assert(folded.getAs[Seq[Long]]("g") === oneShot.getSeq[Long](2),
      "gram entries must fold bit-identically")

    val streamedPc1 = Streams.pc1State(spark, s"$dir/state",
      Seq("corpus"), Seq("all")).collect().toSeq
    val batchPc1 = Similarity.powerIterationPc1(emb, "embedding")
      .collect().toSeq
    assert(streamedPc1 === batchPc1,
      "streaming PCA must equal the batch power iteration exactly")

    graft.core.AtomicSwap.deleteRecursively(new java.io.File(dir))
  }

  test("a dimension change across batches fails the fold loudly") {
    val spark2 = spark
    import spark2.implicits._
    val dir = Files.createTempDirectory("graft-gramdim").toString
    val d8 = Seq(("all", Seq.fill(8)(1.0f))).toDF("corpus", "embedding")
    val d16 = Seq(("all", Seq.fill(16)(1.0f))).toDF("corpus", "embedding")
    val r1 = Streams.gramMergeBatch(spark, d8, s"$dir/state",
      Seq("corpus"), "embedding", batchId = 0L)
    assert(r1.success)
    val e = intercept[Exception] {
      Streams.gramMergeBatch(spark, d16, s"$dir/state",
        Seq("corpus"), "embedding", batchId = 1L)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("dimension changed")), e.toString)
    // the stored state survives untouched (the swap never committed)
    val kept = spark.read.parquet(s"$dir/state").head()
    assert(kept.getAs[scala.collection.Seq[Long]]("s").size == 8)
    graft.core.AtomicSwap.deleteRecursively(new java.io.File(dir))
  }
}
