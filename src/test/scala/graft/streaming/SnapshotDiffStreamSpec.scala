package graft.streaming

import graft.SparkSpec
import graft.operators.ChangeDetection
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** snapshotDiffSink: CDC synthesized from successive FULL snapshots —
  * streamed changelog == sequential batch diffs, replay-safe. */
class SnapshotDiffStreamSpec extends AnyFunSuite with SparkSpec {

  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("status", StringType),
    StructField("amount", DoubleType)))

  private def frame(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(rows.asJava, schema)

  private val v0 = Seq(Row(1L, "open", 10.0), Row(2L, "open", 20.0),
    Row(3L, "open", 30.0))
  private val v1 = Seq(Row(1L, "open", 10.0), Row(2L, "closed", 20.0),
    Row(4L, "open", 40.0)) // 2 changed, 3 removed, 4 added
  private val v2 = Seq(Row(1L, "open", 11.0), Row(2L, "closed", 20.0),
    Row(4L, "open", 40.0)) // 1 changed

  test("streamed snapshots produce the sequential batch diffs") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = Files.createTempDirectory("graft-snapdiff").toString
    val input = MemoryStream[(Long, String, Double)]
    val stream = input.toDF().toDF("id", "status", "amount")
    val q = Streams.snapshotDiffSink(stream, s"$dir/state",
      s"$dir/changelog", s"$dir/ckpt", Seq("id"),
      trig = Streams.trigger(1)).start()
    try {
      Seq(v0, v1, v2).foreach { v =>
        input.addData(v.map(r => (r.getLong(0), r.getString(1),
          r.getDouble(2))): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    def changelog(batch: Long): Set[(Long, String, String)] =
      spark.read.parquet(s"$dir/changelog/batch=$batch").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

    // batch 0: everything added (empty previous snapshot)
    assert(changelog(0) === v0.map(r => (r.getLong(0), "added", "")).toSet)
    // batches 1/2 equal the batch operator on the same snapshot pairs
    def batchDiff(a: Seq[Row], b: Seq[Row]) =
      ChangeDetection.snapshotDiff(frame(a), frame(b), Seq("id"))
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getString(2))).toSet
    assert(changelog(1) === batchDiff(v0, v1))
    assert(changelog(2) === batchDiff(v1, v2))
    // state holds the latest snapshot
    val state = spark.read.parquet(s"$dir/state")
      .select("id", "status", "amount").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(state === v2.map(r => (r.getLong(0), r.getString(1),
      r.getDouble(2))).toSet)

    // replaying an already-applied batch is a no-op: the marker guards
    // against diffing the snapshot against itself and emptying the log
    val res = Streams.snapshotDiffBatch(spark, frame(v2), s"$dir/state",
      s"$dir/changelog", Seq("id"), batchId = 2L)
    assert(res.rowsLoaded === 0L)
    assert(changelog(2) === batchDiff(v1, v2), "replay must not clobber")

    graft.core.AtomicSwap.deleteRecursively(new java.io.File(dir))
  }
}
