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

  test("clustered compaction: z-order narrows spans on both keys, " +
      "time travel unchanged") {
    val dir = Files.createTempDirectory("graft-vtz").toString
    try {
      // two independent uniform dimensions (x = i/256, y = reversed
      // byte) — interleaved appends so unclustered files span the
      // whole range of both
      val wide = StructType(Seq(StructField("id", LongType),
        StructField("x", LongType), StructField("y", LongType),
        StructField("val", StringType)))
      def gen(v: Long) = spark.createDataFrame(
        (0L until 4096L).filter(_ % 4 == v).map { i =>
          Row(i, i / 16, ((i * 2654435761L) % 4096L), s"r$i-$v")
        }.asJava, wide)
      (0L to 3L).foreach(v => Merge.appendVersion(gen(v), dir, v))
      val before = Merge.readAsOf(spark, dir, 3L, Seq("id")).collect()
        .map(r => (r.getLong(0), r.getString(3))).toMap
      Merge.compactVersions(spark, dir, 3L, Seq("id"),
        zorderBy = Seq("x", "y"), zorderFiles = 16)
      val after = Merge.readAsOf(spark, dir, 3L, Seq("id")).collect()
        .map(r => (r.getLong(0), r.getString(3))).toMap
      assert(after === before, "clustering must not change the snapshot")
      // pruning quality: average per-file span on BOTH columns well
      // under the full range (a plain rewrite leaves ~full-range files)
      def avgSpan(c: String): Double = {
        val spans = Layout.fileSpans(spark, s"$dir/version=3", c)
        spans.map { case (lo, hi) => hi - lo }.sum / spans.length
      }
      assert(avgSpan("x") < 256.0 * 0.5,
        s"x spans must narrow, got ${avgSpan("x")}")
      assert(avgSpan("y") < 4096.0 * 0.5,
        s"y spans must narrow, got ${avgSpan("y")}")
    } finally graft.core.AtomicSwap.deleteRecursively(
      new java.io.File(dir))
  }

  test("schema evolution: column added in v2 reads at v1/v2/v3; compaction keeps it") {
    val dir = Files.createTempDirectory("graft-vte").toString
    try {
      val schema2 = StructType(Seq(
        StructField("id", LongType), StructField("val", StringType),
        StructField("tier", StringType)))
      def frame2(rows: Row*) = spark.createDataFrame(rows.asJava, schema2)
      Merge.appendVersion(frame(Row(1L, "a0"), Row(2L, "b0")), dir, 0L)
      Merge.appendVersion(frame(Row(3L, "c1")), dir, 1L)
      // v2 ADDS a column; it also re-writes key 1 with a tier
      Merge.appendVersion(frame2(Row(1L, "a2", "gold"), Row(4L, "d2", "silver")),
        dir, 2L)
      // v3 DROPS the column again (writes the original shape)
      Merge.appendVersion(frame(Row(4L, "d3")), dir, 3L)

      def snap(asOf: Long): Map[Long, (String, Option[String])] =
        Merge.readAsOf(spark, dir, asOf, Seq("id")).collect()
          .map(r => r.getLong(0) ->
            ((r.getString(1), Option(r.getAs[String]("tier"))))).toMap

      // at v1 (before the add) the union schema still exposes `tier`,
      // null-filled — values as written
      assert(snap(1L) === Map(
        1L -> ("a0", None), 2L -> ("b0", None), 3L -> ("c1", None)))
      // at v2 the new column carries the written values for v2 rows
      assert(snap(2L) === Map(
        1L -> ("a2", Some("gold")), 2L -> ("b0", None),
        3L -> ("c1", None), 4L -> ("d2", Some("silver"))))
      // at v3 key 4's LATEST version wrote no tier — null, not 'silver'
      assert(snap(3L) === Map(
        1L -> ("a2", Some("gold")), 2L -> ("b0", None),
        3L -> ("c1", None), 4L -> (("d3", None))))

      // compaction at the add boundary preserves the union schema
      val before = snap(3L)
      Merge.compactVersions(spark, dir, 2L, Seq("id"))
      assert(snap(3L) === before,
        "compaction must preserve evolved-schema reads")
      assert(Merge.readAsOf(spark, dir, 2L, Seq("id"))
        .columns.toSet === Set("id", "val", "tier"))
    } finally graft.core.AtomicSwap.deleteRecursively(
      new java.io.File(dir))
  }

  test("compaction scratch dirs are invisible to partition discovery") {
    val dir = Files.createTempDirectory("graft-vts").toString
    try {
      Merge.appendVersion(frame(Row(1L, "a0")), dir, 0L)
      Merge.appendVersion(frame(Row(2L, "b1")), dir, 1L)
      // simulate a CRASH mid-compaction: a stale underscore-prefixed
      // scratch dir left in the table root
      frame(Row(9L, "junk")).write.parquet(s"$dir/_compact_1__new")
      // readAsOf must neither see the junk rows nor mis-infer the
      // version partition type (ANSI cast of 'N__new' would throw)
      assert(snapshot(dir, 1L) === Map(1L -> "a0", 2L -> "b1"))
      // and a re-run of compaction self-heals over the leftovers
      Merge.compactVersions(spark, dir, 1L, Seq("id"))
      assert(snapshot(dir, 1L) === Map(1L -> "a0", 2L -> "b1"))
      val scratch = new java.io.File(dir).listFiles()
        .map(_.getName).filter(_.contains("__")).toSet
      assert(scratch.forall(_.startsWith("_")),
        s"scratch dirs must be underscore-prefixed: $scratch")
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
