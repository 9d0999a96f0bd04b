package graft.sources

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** S8 DDL surface: catalog-backed external parquet tables. */
class WarehouseSpec extends AnyFunSuite with SparkSpec {

  test("tableExists / createTable / ensureTable round-trip") {
    val dir = Files.createTempDirectory("graft-wh").toString
    val df = spark.range(10).selectExpr("id", "id % 3 AS grp")
    df.write.mode("overwrite").parquet(s"$dir/t")

    assert(!Warehouse.tableExists(spark, "wh_t"))
    Warehouse.createTable(spark, "wh_t", s"$dir/t", df.schema)
    assert(Warehouse.tableExists(spark, "wh_t"))
    assert(spark.table("wh_t").count() == 10)

    // idempotent: ensure on an existing table creates nothing
    assert(!Warehouse.ensureTable(spark, "wh_t", s"$dir/t", df.schema))
    Warehouse.dropTable(spark, "wh_t")
    assert(!Warehouse.tableExists(spark, "wh_t"))
    // data survives the drop (external table)
    assert(spark.read.parquet(s"$dir/t").count() == 10)
  }

  test("locations with quotes and reserved-word table names are handled") {
    // a location containing a single quote must not break the DDL string
    val dir = Files.createTempDirectory("graft-wh'q").toString
    assert(dir.contains("'"))
    val df = spark.range(5).selectExpr("id")
    df.write.mode("overwrite").parquet(s"$dir/t")
    // `table` is a reserved word — only a quoted identifier parses
    Warehouse.createTable(spark, "table", s"$dir/t", df.schema)
    try {
      assert(Warehouse.tableExists(spark, "`table`"))
      assert(spark.table("`table`").count() == 5)
    } finally Warehouse.dropTable(spark, "table")
  }

  test("partitioned table registers existing partitions and prunes") {
    val dir = Files.createTempDirectory("graft-whp").toString
    val df = spark.range(100)
      .selectExpr("id", "CAST(id % 4 AS STRING) AS part")
    df.write.mode("overwrite").partitionBy("part").parquet(s"$dir/t")

    Warehouse.createTable(spark, "wh_part", s"$dir/t",
      df.schema, partitionBy = Seq("part"))
    try {
      assert(spark.table("wh_part").count() == 100)
      val pruned = spark.table("wh_part").where("part = '1'")
      assert(pruned.count() == 25)
      // partition filter reaches the scan, not a post-filter
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters"), plan)
    } finally Warehouse.dropTable(spark, "wh_part")
  }

  test("analyze publishes table + column statistics to the catalog") {
    val dir = Files.createTempDirectory("graft-wh-an").toString
    val df = spark.range(100).selectExpr("id", "id % 7 AS grp")
    df.write.mode("overwrite").parquet(s"$dir/t")
    Warehouse.createTable(spark, "wh_an", s"$dir/t", df.schema)
    try {
      assert(Warehouse.tableRowCount(spark, "wh_an").isEmpty)
      Warehouse.analyze(spark, "wh_an", Seq("grp"))
      assert(Warehouse.tableRowCount(spark, "wh_an").contains(BigInt(100)))
      // column stats landed: NDV for grp is visible to the optimizer
      val colStats = spark.sql("DESCRIBE TABLE EXTENDED wh_an grp")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(colStats.get("distinct_count").exists(_.trim == "7"), colStats)
    } finally Warehouse.dropTable(spark, "wh_an")
  }

  test("bloom-filter writes carry the filter in every footer; data exact") {
    val dir = Files.createTempDirectory("graft-wh-bloom").toString
    val df = spark.range(10000).selectExpr("id", "CAST(id % 97 AS STRING) AS tag")
    Warehouse.writeWithBloomFilters(df, s"$dir/t", Seq("id"), ndv = 10000L)
    assert(Warehouse.hasBloomFilter(spark, s"$dir/t", "id"))
    assert(!Warehouse.hasBloomFilter(spark, s"$dir/t", "tag")) // not requested
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 10000)
    assert(back.filter(back("id") === 4321L).count() == 1)
  }

  test("clustered compaction: zorderBy narrows per-file spans, data exact") {
    val dir = Files.createTempDirectory("graft-whz").toString
    // interleaved appends: every file spans the full range of both dims
    (0 until 8).foreach { i =>
      spark.range(0, 4096).filter(s"id % 8 = $i")
        .selectExpr("id", "id / 16 AS x",
          "(id * 2654435761) % 4096 AS y", "id * 2 AS v")
        .coalesce(1).write.mode("append").parquet(s"$dir/t")
    }
    val before = spark.read.parquet(s"$dir/t")
      .collect().map(_.getLong(0)).toSet
    // small targetBytes so the rewrite keeps >= a handful of files
    val (_, nAfter) = Warehouse.compact(spark, s"$dir/t",
      targetBytes = 3L * 1024, zorderBy = Seq("x", "y"))
    val after = spark.read.parquet(s"$dir/t")
      .collect().map(_.getLong(0)).toSet
    assert(after === before, "clustering must not change the data")
    assert(nAfter >= 4L, s"need several files to measure spans: $nAfter")
    def avgSpan(c: String): Double = {
      val spans = graft.operators.Layout.fileSpans(spark, s"$dir/t", c)
      spans.map { case (lo, hi) => hi - lo }.sum / spans.length
    }
    assert(avgSpan("x") < 256.0 * 0.5, s"x spans: ${avgSpan("x")}")
    assert(avgSpan("y") < 4096.0 * 0.5, s"y spans: ${avgSpan("y")}")
  }

  test("compaction collapses many small files, preserves data exactly") {
    val dir = Files.createTempDirectory("graft-whc").toString
    // simulate a micro-batch sink: 20 appends of 50 rows → ≥20 files
    (0 until 20).foreach { i =>
      spark.range(i * 50, i * 50 + 50).selectExpr("id", "id * 2 AS v")
        .coalesce(1).write.mode("append").parquet(s"$dir/t")
    }
    val before = spark.read.parquet(s"$dir/t")
      .collect().map(_.getLong(0)).toSet
    val (nBefore, nAfter) = Warehouse.compact(spark, s"$dir/t")
    assert(nBefore >= 20L, nBefore)
    assert(nAfter < nBefore, s"$nAfter vs $nBefore")
    val after = spark.read.parquet(s"$dir/t")
      .collect().map(_.getLong(0)).toSet
    assert(after == before && after.size == 1000)
  }

  test("compaction heals every interruption point of the swap") {
    val root = Files.createTempDirectory("graft-whheal").toString
    val fsP = new org.apache.hadoop.fs.Path(root)
    val fs = fsP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fixture(p: String): Set[Long] = {
      spark.range(0, 100).selectExpr("id").coalesce(4)
        .write.parquet(p)
      spark.read.parquet(p).collect().map(_.getLong(0)).toSet
    }
    def path(n: String) = new org.apache.hadoop.fs.Path(n)

    // crash between the two renames: live dir gone, rewrite complete
    val p1 = s"$root/between"
    val rows1 = fixture(p1)
    spark.read.parquet(p1).coalesce(1)
      .write.parquet(p1 + "__compact")
    assert(fs.delete(path(p1), true)) // stands in for rename(dir, backup)…
    assert(fs.exists(path(p1 + "__compact")))
    Warehouse.compact(spark, p1)
    assert(spark.read.parquet(p1).collect().map(_.getLong(0)).toSet == rows1)
    assert(!fs.exists(path(p1 + "__compact")) &&
      !fs.exists(path(p1 + "__compact_old")))

    // crash after publishing, backup left behind: retired, data intact
    val p2 = s"$root/backup"
    val rows2 = fixture(p2)
    spark.range(500, 510).write.parquet(p2 + "__compact_old")
    Warehouse.compact(spark, p2)
    assert(spark.read.parquet(p2).collect().map(_.getLong(0)).toSet == rows2)
    assert(!fs.exists(path(p2 + "__compact_old")))

    // crash mid-write: unswapped rewrite discarded, live dir untouched
    val p3 = s"$root/stale"
    val rows3 = fixture(p3)
    spark.range(900, 950).write.parquet(p3 + "__compact")
    Warehouse.compact(spark, p3)
    assert(spark.read.parquet(p3).collect().map(_.getLong(0)).toSet == rows3)

    // the REAL between-renames state: live dir moved aside (backup
    // present) AND the complete rewrite present — heal must prefer the
    // rewrite and retire the backup, not resurrect the stale copy
    val p4 = s"$root/both"
    val rows4 = fixture(p4)
    spark.read.parquet(p4).coalesce(1).write.parquet(p4 + "__compact")
    assert(fs.rename(path(p4), path(p4 + "__compact_old")))
    Warehouse.compact(spark, p4)
    assert(spark.read.parquet(p4).collect().map(_.getLong(0)).toSet == rows4)
    assert(!fs.exists(path(p4 + "__compact")) &&
      !fs.exists(path(p4 + "__compact_old")))
  }

  test("co-bucketed tables join and aggregate with no shuffle; bucket pruning") {
    val dir = Files.createTempDirectory("graft-whb").toString
    val facts = spark.range(1000)
      .selectExpr("id % 100 AS k", "id AS v")
    val dims = spark.range(500)
      .selectExpr("id % 100 AS k", "id * 10 AS w")
    Warehouse.writeBucketed(facts, "wh_ba", s"$dir/a",
      bucketCols = Seq("k"), numBuckets = 8, sortCols = Seq("k"))
    Warehouse.writeBucketed(dims, "wh_bb", s"$dir/b",
      bucketCols = Seq("k"), numBuckets = 8, sortCols = Seq("k"))
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join must pick a distribution-sensitive
      // strategy — the point is that bucketing already satisfies it
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("wh_ba").join(spark.table("wh_bb"), "k")
      assert(joined.count() == 1000 * 5)
      val jplan = joined.queryExecution.executedPlan.toString
      assert(!jplan.contains("Exchange hashpartitioning"), jplan)

      // aggregation on the bucket key: scan partitioning satisfies the
      // aggregate's distribution — no exchange
      val agg = spark.table("wh_ba").groupBy("k").count()
      assert(agg.count() == 100)
      val aplan = agg.queryExecution.executedPlan.toString
      assert(!aplan.contains("Exchange hashpartitioning"), aplan)

      // equality filter on the bucket key reads 1 of 8 buckets.
      // autoBucketedScan drops bucket layout when no shuffle is saved,
      // which also forfeits pruning — turn it off to assert the pruned
      // read path.
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      try {
        val pruned = spark.table("wh_ba").where("k = 7")
        assert(pruned.count() == 10)
        val pplan = pruned.queryExecution.executedPlan.toString
        assert(pplan.contains("SelectedBucketsCount: 1 out of 8"), pplan)
      } finally spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      Warehouse.dropTable(spark, "wh_ba")
      Warehouse.dropTable(spark, "wh_bb")
    }
  }
}
