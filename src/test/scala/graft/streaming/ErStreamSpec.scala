package graft.streaming

import graft.SparkSpec
import graft.er.EntityResolution
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streamed-in-batches entity resolution == one-shot batch ER on the
  * same feed — the log-structured-MDM equivalence contract of
  * [[Streams.erLinkSink]] / [[Streams.erGoldenState]]. */
class ErStreamSpec extends AnyFunSuite with SparkSpec {

  private val hard = Seq("nationkey")
  private def passes = EntityResolution.customerNamePasses

  private lazy val feedRows = EntityResolution.dirtyCustomerFeed(
      spark.read.parquet(s"$sf/customer.parquet"))
    .select("rec_id", "name", "nationkey", "acctbal", "segment", "src")
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3),
      r.getString(4), r.getString(5)))
    .toSeq

  test("streamed-in-3-batches ER == batch ER (links and golden records)") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = Files.createTempDirectory("graft-erstream").toString
    val input = MemoryStream[(Long, String, Int, Double, String, String)]
    val stream = input.toDF()
      .toDF("rec_id", "name", "nationkey", "acctbal", "segment", "src")
    val q = Streams.erLinkSink(stream, s"$dir/records", s"$dir/links",
      s"$dir/ckpt", "rec_id", "name", "segment", "acctbal", hard, passes,
      trig = Streams.trigger(1)).start()
    try {
      // deterministic 3-way split that separates many (base, dup) pairs
      // across batches, so new-old linking is genuinely exercised
      (0 until 3).foreach { b =>
        input.addData(feedRows.filter(_._1 % 3 == b): _*)
        q.processAllAvailable()
        // refresh the incremental components view AFTER EVERY batch:
        // batch 0 bootstraps the assignment, batches 1-2 fold through
        // mergeComponents — links that bridge across batches must merge
        Streams.erComponentsRefresh(spark, s"$dir/links",
          s"$dir/components", "rec_id")
      }
    } finally q.stop()

    val batchFeed = EntityResolution.dirtyCustomerFeed(
      spark.read.parquet(s"$sf/customer.parquet"))

    // links: union of per-batch increments == one-shot batch link set
    val streamedLinks = spark.read.parquet(s"$dir/links")
      .select("id_a", "id_b", "lev", "score")
    val batchLinks = EntityResolution.matchLinks(
      EntityResolution.scorePairs(
        EntityResolution.candidatePairs(batchFeed, "rec_id", hard, passes),
        batchFeed, "rec_id", "name", "segment", "acctbal"))
    assert(streamedLinks.count() === streamedLinks.distinct().count(),
      "every link must be emitted exactly once across batches")
    assert(streamedLinks.exceptAll(batchLinks).isEmpty &&
      batchLinks.exceptAll(streamedLinks).isEmpty,
      "streamed link set must equal the batch link set")

    // golden records: the read-side view == batch run
    val streamedGolden = Streams.erGoldenState(spark, s"$dir/records",
      s"$dir/links", "rec_id", "name", "segment", "acctbal")
    val batchGolden = EntityResolution.run(batchFeed, "rec_id", "name",
      "segment", "acctbal", hard, passes)
    assert(streamedGolden.exceptAll(batchGolden).isEmpty &&
      batchGolden.exceptAll(streamedGolden).isEmpty,
      "streamed golden records must equal the batch golden records")

    // INCREMENTAL components view (persisted assignment folded batch by
    // batch, closure ∝ delta) must ALSO equal the batch run — including
    // the planted pairs that straddle micro-batches (bridge case)
    val incGolden = Streams.erGoldenState(spark, s"$dir/records",
      s"$dir/links", "rec_id", "name", "segment", "acctbal",
      componentsPath = Some(s"$dir/components"))
    assert(incGolden.exceptAll(batchGolden).isEmpty &&
      batchGolden.exceptAll(incGolden).isEmpty,
      "incrementally-maintained golden records must equal the batch run")
    // a second refresh with no new batches serves the persisted state
    // unchanged (marker short-circuit)
    val incAgain = Streams.erGoldenState(spark, s"$dir/records",
      s"$dir/links", "rec_id", "name", "segment", "acctbal",
      componentsPath = Some(s"$dir/components"))
    assert(incAgain.exceptAll(batchGolden).isEmpty &&
      batchGolden.exceptAll(incAgain).isEmpty)

    // FULL-CLOSURE COMPACTION: below threshold → no-op; forced → the
    // assignment is byte-identical (both paths canonicalize cluster_id
    // to the min member id), link batch dirs merge down, and the
    // links-since-closure watermark advances so a repeat is a no-op
    val compView = spark.read.parquet(s"$dir/components").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!Streams.erComponentsCompact(spark, s"$dir/links",
      s"$dir/components", "rec_id", minNewLinks = Long.MaxValue),
      "below threshold must be a no-op")
    assert(Streams.erComponentsCompact(spark, s"$dir/links",
      s"$dir/components", "rec_id", minNewLinks = 1L),
      "forced compaction must run")
    val afterCompact = spark.read.parquet(s"$dir/components").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(afterCompact == compView,
      "full closure must reproduce the incremental view exactly")
    val linkDirs = new java.io.File(s"$dir/links").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(linkDirs.size <= 2, s"link batch dirs should merge: $linkDirs")
    assert(!Streams.erComponentsCompact(spark, s"$dir/links",
      s"$dir/components", "rec_id", minNewLinks = 1L),
      "watermark advanced: immediate re-compaction must be a no-op")
    // and the golden view over the compacted state still equals batch
    val postCompact = Streams.erGoldenState(spark, s"$dir/records",
      s"$dir/links", "rec_id", "name", "segment", "acctbal",
      componentsPath = Some(s"$dir/components"))
    assert(postCompact.exceptAll(batchGolden).isEmpty &&
      batchGolden.exceptAll(postCompact).isEmpty)

    graft.core.AtomicSwap.deleteRecursively(new java.io.File(dir))
  }

  test("checkpoint loss with committed batches fails loudly") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = Files.createTempDirectory("graft-erloss").toString
    val mk = () => MemoryStream[(Long, String, Int, Double, String, String)]
    val in1 = mk()
    val s1 = in1.toDF()
      .toDF("rec_id", "name", "nationkey", "acctbal", "segment", "src")
    val q1 = Streams.erLinkSink(s1, s"$dir/records", s"$dir/links",
      s"$dir/ckpt1", "rec_id", "name", "segment", "acctbal", hard, passes,
      trig = Streams.trigger(1)).start()
    try {
      in1.addData(feedRows.take(4): _*); q1.processAllAvailable()
      in1.addData(feedRows.slice(4, 8): _*); q1.processAllAvailable()
    } finally q1.stop()

    // fresh checkpoint (lost) against the same populated store
    val in2 = mk()
    val s2 = in2.toDF()
      .toDF("rec_id", "name", "nationkey", "acctbal", "segment", "src")
    val q2 = Streams.erLinkSink(s2, s"$dir/records", s"$dir/links",
      s"$dir/ckpt2", "rec_id", "name", "segment", "acctbal", hard, passes,
      trig = Streams.trigger(1)).start()
    val ex = intercept[StreamingQueryException] {
      try { in2.addData(feedRows.take(2): _*); q2.processAllAvailable() }
      finally q2.stop()
    }
    assert(ex.getMessage.contains("checkpoint was lost") ||
      Option(ex.getCause).exists(_.getMessage.contains("checkpoint was lost")))
    graft.core.AtomicSwap.deleteRecursively(new java.io.File(dir))
  }
}
