package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off adjudication probe for tx_pretrain_stream (round 13):
  * phase-times the streaming flagship — fixture collect, sink start
  * (checkpoint setup), each micro-batch barrier, stage read-back,
  * state teardown — and re-runs the identical composition as ONE
  * micro-batch to split per-batch machinery from computation.
  * Results land in SCALE.md; the probe stays in-tree so the
  * adjudication is reproducible. */
object PretrainStreamProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.queries.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    def run(nBatches: Int, label: String): Unit = {
      println(s"— $label —")
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val splits = t("fixture collect") {
        (0 until nBatches).map { i =>
          docs.filter(col("doc_id") > i * maxId / nBatches &&
              col("doc_id") <= (i + 1) * maxId / nBatches)
            .orderBy(col("doc_id")).collect()
            .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
        }
      }
      val work = java.nio.file.Files
        .createTempDirectory("graft_stream_probe").toString
      val input = MemoryStream[(Long, String, String)]
      val q = t("sink start (ckpt setup)") {
        graft.streaming.Streams.pretrainPipelineSink(
            input.toDF().toDF("doc_id", "source", "text"),
            s"$work/state", s"$work/cp", "doc_id", "source", "text",
            evalDocs = docs.filter(col("source") === "src0"),
            evalTextCol = "text",
            blocklistTerms = Seq("slow", "Lorem", "ipsum"),
            segment = graft.queries.segmentLines,
            trig = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
          .start()
      }
      try {
        splits.zipWithIndex.foreach { case (b, i) =>
          t(s"batch $i (${b.size} docs)") {
            input.addData(b: _*); q.processAllAvailable()
          }
        }
        t("stop") { q.stop() }
        t("stage read-back") {
          graft.streaming.Streams
            .pretrainPipelineStages(spark, s"$work/state").collect()
        }
      } finally t("teardown (delete state)") {
        graft.core.AtomicSwap.deleteRecursively(new java.io.File(work))
      }
    }

    run(3, "warmup (discard: first-run codegen/IO)")
    run(3, "3 micro-batches (the bench shape)")
    run(1, "1 micro-batch (same volume, one barrier)")
    spark.stop()
  }
}
