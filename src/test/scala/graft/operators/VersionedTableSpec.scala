package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class VersionedTableSpec extends AnyFunSuite with SparkSpec {

  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("val", StringType)))

  private def frame(rows: Row*) = spark.createDataFrame(rows.asJava, schema)

  private def snapshot(path: String, asOf: Long): Map[Long, String] =
    Merge.readAsOf(spark, path, asOf, Seq("id")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("time travel: upserts, inserts, tombstones, re-inserts") {
    val dir = Files.createTempDirectory("graft-vt").toString
    try {
      Merge.appendVersion(frame(Row(1L, "a0"), Row(2L, "b0")), dir, 0L)
      Merge.appendVersion(frame(Row(2L, "b1"), Row(3L, "c1")), dir, 1L)
      Merge.appendVersion(
        frame(Row(1L, "a0")).withColumn("_deleted", lit(true)), dir, 2L)
      Merge.appendVersion(frame(Row(1L, "a3")), dir, 3L)

      assert(snapshot(dir, 0L) === Map(1L -> "a0", 2L -> "b0"))
      assert(snapshot(dir, 1L) === Map(1L -> "a0", 2L -> "b1", 3L -> "c1"),
        "v1 upsert wins over v0, insert visible")
      assert(snapshot(dir, 2L) === Map(2L -> "b1", 3L -> "c1"),
        "tombstone hides the key")
      assert(snapshot(dir, 3L) === Map(1L -> "a3", 2L -> "b1", 3L -> "c1"),
        "a re-insert after a delete is visible again")
      // reading past the newest version sees the newest state
      assert(snapshot(dir, 99L) === snapshot(dir, 3L))
    } finally graft.core.AtomicSwap.deleteRecursively(
      new java.io.File(dir))
  }

  test("compaction: reads at/after the boundary identical, history freed") {
    val dir = Files.createTempDirectory("graft-vtc").toString
    try {
      Merge.appendVersion(frame(Row(1L, "a0"), Row(2L, "b0")), dir, 0L)
      Merge.appendVersion(frame(Row(2L, "b1"), Row(3L, "c1")), dir, 1L)
      Merge.appendVersion(
        frame(Row(1L, "a0")).withColumn("_deleted", lit(true)), dir, 2L)
      Merge.appendVersion(frame(Row(4L, "d3")), dir, 3L)

      val beforeV2 = snapshot(dir, 2L)
      val beforeV3 = snapshot(dir, 3L)
      Merge.compactVersions(spark, dir, 2L, Seq("id"))
      assert(snapshot(dir, 2L) === beforeV2,
        "read at the boundary must be unchanged")
      assert(snapshot(dir, 3L) === beforeV3,
        "read after the boundary must be unchanged")
      // versions 0/1 physically gone; the compacted base holds v2 state
      val dirs = new java.io.File(dir).listFiles()
        .map(_.getName).filter(_.startsWith("version=")).toSet
      assert(dirs === Set("version=2", "version=3"))
      // the tombstoned key does not survive compaction as a row at all
      val v2rows = spark.read.parquet(s"$dir/version=2")
        .select("id").collect().map(_.getLong(0)).toSet
      assert(v2rows === Set(2L, 3L), "tombstones vanish at compaction")
    } finally graft.core.AtomicSwap.deleteRecursively(
      new java.io.File(dir))
  }

  test("readAsOf prunes newer version directories at the scan") {
    val dir = Files.createTempDirectory("graft-vtp").toString
    try {
      Merge.appendVersion(frame(Row(1L, "a")), dir, 0L)
      Merge.appendVersion(frame(Row(2L, "b")), dir, 1L)
      val plan = Merge.readAsOf(spark, dir, 0L, Seq("id"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") &&
        plan.contains("version"),
        s"version filter must prune partitions, plan:\n$plan")
    } finally graft.core.AtomicSwap.deleteRecursively(
      new java.io.File(dir))
  }
}
