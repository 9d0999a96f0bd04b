package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PqIndexSpec extends AnyFunSuite with SparkSpec {

  private val dim = 16

  /** Diffuse deterministic corpus (the training-time distribution). */
  private def corpusA = {
    val s = spark
    import s.implicits._
    (0 until 200).map { id =>
      (id.toLong,
        (0 until dim).map(d => (((id * 31 + d * 17) % 201) - 100).toFloat))
    }.toDF("vec_id", "embedding")
  }

  /** Drifted corpus: 8 tight clusters far outside A's value range —
    * the stale coarse cells stop separating anything and the stale PQ
    * codebooks quantize every coordinate to the same extreme centroid,
    * so ADC ranking degenerates. */
  private def corpusB = {
    val s = spark
    import s.implicits._
    (0 until 200).map { id =>
      val a = id % 8
      (id.toLong, (0 until dim).map { d =>
        val base = ((a * 97 + d * 13) % 400) + 800
        val noise = ((id * 7 + d * 3) % 21) - 10
        (base + noise).toFloat
      })
    }.toDF("vec_id", "embedding")
  }

  private def freshPath(name: String): String = {
    val p = s"/tmp/graft-pqindex-$name"
    org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(p), true)
    p
  }

  test("persisted index round-trips: disk topK == in-memory topKQ " +
      "with the same artifacts") {
    val s = spark
    import s.implicits._
    val path = freshPath("roundtrip")
    val ix = PqIndex.build(s, path, corpusA, "vec_id", "embedding",
      kCells = 8)
    val queries = corpusA.filter($"vec_id" < 20)
    val fromDisk = PqIndex.topK(s, path, queries, "vec_id", "embedding",
        k = 5, nProbe = 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .toSet
    // same artifacts, in-memory encode — identical integer ADC ranks
    val prep = corpusA.select(col("vec_id").cast("string").as("id"),
      Similarity.quantize(col("embedding")).as("q"))
    val indexed = Pq.encodeQ(
      prep.withColumn("cluster", element_at(
        Similarity.nearestCentroidsQ(col("q"), ix.coarse, 1), 1)),
      "q", ix.books)
    val inMem = Pq.topKQ(indexed,
        prep.filter(col("id").cast("long") < 20), "id", "q",
        ix.coarse, ix.books, k = 5, nProbe = 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .toSet
    assert(fromDisk == inMem)
    // loadMeta returns the trained artifacts byte for byte
    val loaded = PqIndex.loadMeta(s, path)
    assert(loaded.coarse == ix.coarse && loaded.books == ix.books)
  }

  test("recall watchdog: drift degrades recall below the floor, " +
      "maintain retrains + swaps, recall restored; no-op when healthy") {
    val s = spark
    import s.implicits._
    val path = freshPath("watchdog")
    val floor = 0.5
    PqIndex.build(s, path, corpusA, "vec_id", "embedding", kCells = 8)
    val qA = corpusA.filter($"vec_id" < 30)
    val rFresh = PqIndex.recallAt(s, path, corpusA, qA, "vec_id",
      "embedding", k = 10)
    assert(rFresh >= floor, s"fresh index recall $rFresh under $floor")
    // healthy index: maintain measures and touches nothing
    val noop = PqIndex.maintain(s, path, corpusA, qA, "vec_id",
      "embedding", floor, kCells = 8)
    assert(!noop.retrained && noop.recallBefore == rFresh &&
      noop.recallAfter == rFresh)
    // the corpus drifts; ingest re-encodes with the STALE artifacts
    PqIndex.reencode(s, path, corpusB, "vec_id", "embedding")
    val qB = corpusB.filter($"vec_id" < 30)
    val rStale = PqIndex.recallAt(s, path, corpusB, qB, "vec_id",
      "embedding", k = 10)
    assert(rStale < floor,
      s"drift fixture must degrade recall below $floor, got $rStale")
    // the watchdog: retrain both tiers, atomic swap, recall restored
    val res = PqIndex.maintain(s, path, corpusB, qB, "vec_id",
      "embedding", floor, kCells = 8)
    assert(res.retrained)
    assert(res.recallBefore == rStale)
    assert(res.recallAfter >= floor,
      s"retrained recall ${res.recallAfter} still under $floor")
    // and the published index serves the retrained artifacts
    assert(PqIndex.recallAt(s, path, corpusB, qB, "vec_id", "embedding",
      k = 10) == res.recallAfter)
  }

  test("incremental append: appended ids searchable exactly as a full " +
      "build with the same artifacts; replay idempotent; retrain " +
      "retires batch directories") {
    val s = spark
    import s.implicits._
    val path = freshPath("append")
    val base = corpusA.filter($"vec_id" < 150)
    val late = corpusA.filter($"vec_id" >= 150)
    val ix = PqIndex.build(s, path, base, "vec_id", "embedding", kCells = 8)
    PqIndex.append(s, path, late, "vec_id", "embedding", batchId = 0)
    // assignment + encoding are pure functions of the frozen artifacts,
    // so the grown index answers EXACTLY like one encoding the full
    // corpus in a single generation
    val queries = corpusA.filter($"vec_id" < 20)
    def fromDisk() = PqIndex
      .topK(s, path, queries, "vec_id", "embedding", k = 5, nProbe = 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .toSet
    val grown = fromDisk()
    val prep = corpusA.select(col("vec_id").cast("string").as("id"),
      Similarity.quantize(col("embedding")).as("q"))
    val inMem = Pq.topKQ(
        Pq.encodeQ(prep.withColumn("cluster", element_at(
          Similarity.nearestCentroidsQ(col("q"), ix.coarse, 1), 1)),
          "q", ix.books),
        prep.filter(col("id").cast("long") < 20), "id", "q",
        ix.coarse, ix.books, k = 5, nProbe = 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .toSet
    assert(grown == inMem)
    assert(grown.exists(_._3.toLong >= 150),
      "appended ids must appear as neighbors")
    // a replayed batch overwrites exactly itself: no duplicates, same
    // answers
    PqIndex.append(s, path, late, "vec_id", "embedding", batchId = 0)
    assert(s.read.parquet(s"$path/corpus").count() == 200)
    assert(fromDisk() == grown)
    // the watchdog retrain absorbs appends into a fresh generation and
    // the atomic swap retires every batch directory
    val res = PqIndex.maintain(s, path, corpusB,
      corpusB.filter($"vec_id" < 30), "vec_id", "embedding",
      floor = 0.5, kCells = 8)
    assert(res.retrained)
    val fs = org.apache.hadoop.fs.FileSystem
      .get(s.sparkContext.hadoopConfiguration)
    val batches = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$path/corpus/batch=*"))
      .map(_.getPath.getName).toSet
    assert(batches == Set("batch=-1"),
      s"retrain must retire append batches, found $batches")
    assert(s.read.parquet(s"$path/corpus").count() == 200)
  }

  test("topKRefined: exhaustive shortlist == brute force exactly; " +
      "serving shortlist never below raw ADC recall") {
    val s = spark
    import s.implicits._
    val path = freshPath("refined")
    PqIndex.build(s, path, corpusA, "vec_id", "embedding", kCells = 8)
    val queries = corpusA.filter($"vec_id" < 15)
    // shortlist covering the whole corpus + every cell probed: the
    // exact-cosine re-rank IS brute force (same tie-break convention)
    val refinedAll = PqIndex.topKRefined(s, path, corpusA, queries,
        "vec_id", "embedding", k = 5, shortlist = 200, nProbe = 8)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(3)))
      .toSet
    val brute = Similarity
      .bruteForceTopK(corpusA, queries, "vec_id", "embedding", 5)
      .collect()
      .map(r => (r.getLong(0).toString, r.getInt(1), r.getLong(2).toString,
        r.getDouble(3)))
      .toSet
    assert(refinedAll == brute)
    // the serving path (bounded shortlist) can only help recall vs raw
    // ADC ranks — the shortlist is re-ranked by exact cosine
    val rRaw = PqIndex.recallAt(s, path, corpusA, queries, "vec_id",
      "embedding", k = 10)
    val rRef = PqIndex.recallAt(s, path, corpusA, queries, "vec_id",
      "embedding", k = 10, shortlist = 50)
    assert(rRef >= rRaw, s"refined $rRef < raw $rRaw")
  }

  test("compactCorpus folds append batches without re-encoding: " +
      "answers identical, one batch dir remains, no-op when clean") {
    val s = spark
    import s.implicits._
    val path = freshPath("compact")
    PqIndex.build(s, path, corpusA.filter($"vec_id" < 100),
      "vec_id", "embedding", kCells = 8)
    PqIndex.append(s, path, corpusA.filter($"vec_id" >= 100 &&
      $"vec_id" < 150), "vec_id", "embedding", batchId = 0)
    PqIndex.append(s, path, corpusA.filter($"vec_id" >= 150),
      "vec_id", "embedding", batchId = 1)
    val queries = corpusA.filter($"vec_id" < 20)
    def answers() = PqIndex
      .topK(s, path, queries, "vec_id", "embedding", k = 5, nProbe = 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .toSet
    def codes() = s.read.parquet(s"$path/corpus")
      .select("id", "codes", "cluster")
      .collect().map(r => (r.getString(0),
        r.getSeq[Byte](1).toVector, r.getInt(2))).toSet
    val before = answers()
    val codesBefore = codes()
    val meta = PqIndex.loadMeta(s, path)
    assert(PqIndex.compactCorpus(s, path))
    val fs = org.apache.hadoop.fs.FileSystem
      .get(s.sparkContext.hadoopConfiguration)
    val dirs = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$path/corpus/batch=*"))
      .map(_.getPath.getName).toSet
    assert(dirs == Set("batch=-1"), s"found $dirs")
    assert(codes() == codesBefore, "compaction must not touch a code")
    assert(answers() == before)
    val meta2 = PqIndex.loadMeta(s, path)
    assert(meta2.coarse == meta.coarse && meta2.books == meta.books)
    // already compact: a second call is a measured no-op
    assert(!PqIndex.compactCorpus(s, path))
    assert(answers() == before)
  }

  test("streaming PQ ingest: streamed codes == batch append; " +
      "checkpoint loss fails loudly") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = freshPath("stream-ingest")
    val base = corpusA.filter($"vec_id" < 150)
    PqIndex.build(s, path, base, "vec_id", "embedding", kCells = 8)
    val late = corpusA.filter($"vec_id" >= 150)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toSeq))
    val ckpt1 = freshPath("stream-ingest-ckpt")
    val ckpt2 = freshPath("stream-ingest-ckpt2")
    val loads = scala.collection.mutable.ArrayBuffer.empty[graft.core.LoadResult]
    val input = MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.Streams.pqIndexIngestSink(
        input.toDS().toDF("vec_id", "embedding"),
        path, ckpt1, "vec_id", "embedding",
        graft.streaming.Streams.trigger(1),
        onLoad = r => loads.synchronized { loads += r })
      .start()
    try {
      val (a, b) = late.splitAt(late.length / 2)
      input.addData(a.toSeq); q.processAllAvailable()
      input.addData(b.toSeq); q.processAllAvailable()
      assert(q.exception.isEmpty, q.exception.toString)
    } finally q.stop()
    assert(loads.size == 2 && loads.forall(_.success))
    assert(loads.map(_.rowsLoaded).sum == late.length)
    // the streamed index answers exactly like one batch-appended index:
    // encoding is a pure function of the frozen artifacts
    val queries = corpusA.filter($"vec_id" < 20)
    val streamed = PqIndex
      .topK(s, path, queries, "vec_id", "embedding", k = 5, nProbe = 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .toSet
    val path2 = freshPath("stream-ingest-batch")
    PqIndex.build(s, path2, base, "vec_id", "embedding", kCells = 8)
    PqIndex.append(s, path2, corpusA.filter($"vec_id" >= 150),
      "vec_id", "embedding", batchId = 0)
    val batched = PqIndex
      .topK(s, path2, queries, "vec_id", "embedding", k = 5, nProbe = 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .toSet
    assert(streamed == batched)
    // fresh checkpoint = batchIds restart at 0 while batch=1 exists →
    // fail loudly instead of silently replacing batch=0
    val input2 = MemoryStream[(Long, Seq[Float])]
    val q2 = graft.streaming.Streams.pqIndexIngestSink(
        input2.toDS().toDF("vec_id", "embedding"),
        path, ckpt2, "vec_id", "embedding",
        graft.streaming.Streams.trigger(1))
      .start()
    try {
      input2.addData(late.take(3).toSeq)
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(q2.exception.exists(
        _.toString.contains("checkpoint was lost")), q2.exception.toString)
    } finally q2.stop()
  }

  /** Every FileSourceScanExec in the final (post-AQE) executed plan. */
  private def allScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    }.flatten

  test("serving scan is statically pruned to the probed cells: " +
      "partition filter in the plan, files-read metric == probed dirs") {
    val s = spark
    import s.implicits._
    val path = freshPath("pruned")
    val ix = PqIndex.build(s, path, corpusA, "vec_id", "embedding",
      kCells = 8)
    val queries = corpusA.filter($"vec_id" === 0)
    val nProbe = 2
    val df = PqIndex.topK(s, path, queries, "vec_id", "embedding",
      k = 3, nProbe = nProbe)
    df.collect()
    // the probed cell set, re-derived through the same public pieces
    val probed = queries
      .select(explode(Similarity.nearestCentroidsQ(
        Similarity.quantize(col("embedding")), ix.coarse, nProbe)).as("c"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(probed.size == nProbe)
    // static partition filter on the corpus scan (NOT just isnotnull —
    // the exact regression the round-11 plan probe caught)
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") &&
      (planStr.contains("cluster") &&
        (planStr.contains(" IN ") || planStr.contains("INSET"))),
      s"corpus scan must carry a static cluster IN filter, plan:\n$planStr")
    // and the metric: exactly the probed directories' files were read
    val fs = org.apache.hadoop.fs.FileSystem
      .get(s.sparkContext.hadoopConfiguration)
    def partFiles(glob: String): Long = {
      val st = fs.globStatus(new org.apache.hadoop.fs.Path(glob))
      if (st == null) 0L
      else st.count(f => f.getPath.getName.startsWith("part-") &&
        f.getPath.getName.endsWith(".parquet")).toLong
    }
    val expected = probed.toSeq
      .map(c => partFiles(s"$path/corpus/batch=-1/cluster=$c/*")).sum
    val total = partFiles(s"$path/corpus/batch=-1/cluster=*/*")
    assert(expected < total,
      s"fixture must leave unprobed cells ($expected vs $total files)")
    val corpusScans = allScans(df.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("graft-pqindex")))
    assert(corpusScans.nonEmpty, "no corpus file scan found in plan")
    val read = corpusScans.map(_.metrics("numFiles").value).sum
    assert(read == expected,
      s"scan read $read files; probed cells hold $expected of $total")
  }

  test("append migrates a legacy flat corpus layout instead of " +
      "corrupting it with mixed partition depths") {
    val s = spark
    import s.implicits._
    val path = freshPath("legacy")
    PqIndex.build(s, path, corpusA.filter($"vec_id" < 150),
      "vec_id", "embedding", kCells = 8)
    val fs = org.apache.hadoop.fs.FileSystem
      .get(s.sparkContext.hadoopConfiguration)
    def p(x: String) = new org.apache.hadoop.fs.Path(x)
    // rewrite the on-disk shape to the pre-batch layout: cluster=*
    // directly under corpus/ (what older generations wrote)
    val clusters = fs.globStatus(p(s"$path/corpus/batch=-1/cluster=*"))
    assert(clusters.nonEmpty)
    clusters.foreach { st =>
      assert(fs.rename(st.getPath,
        p(s"$path/corpus/" + st.getPath.getName)))
    }
    fs.rename(p(s"$path/corpus/batch=-1/_SUCCESS"), p(s"$path/corpus/_SUCCESS"))
    fs.delete(p(s"$path/corpus/batch=-1"), true)
    // legacy index is still readable on its own
    assert(s.read.parquet(s"$path/corpus").count() == 150)
    // append onto the legacy layout: migrates to batch=-1, then lands
    // batch=0 — the whole corpus stays readable (pre-fix this produced
    // conflicting directory structures and every read failed)
    val n = PqIndex.append(s, path, corpusA.filter($"vec_id" >= 150),
      "vec_id", "embedding", batchId = 0)
    assert(n == 50)
    assert(s.read.parquet(s"$path/corpus").count() == 200)
    val dirs = fs.globStatus(p(s"$path/corpus/batch=*"))
      .map(_.getPath.getName).toSet
    assert(dirs == Set("batch=-1", "batch=0"), s"found $dirs")
    // and answers equal a single-generation build with the same rows
    val queries = corpusA.filter($"vec_id" < 20)
    val got = PqIndex.topK(s, path, queries, "vec_id", "embedding",
        k = 5, nProbe = 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val path2 = freshPath("legacy-ref")
    PqIndex.build(s, path2, corpusA.filter($"vec_id" < 150),
      "vec_id", "embedding", kCells = 8)
    PqIndex.append(s, path2, corpusA.filter($"vec_id" >= 150),
      "vec_id", "embedding", batchId = 0)
    val ref = PqIndex.topK(s, path2, queries, "vec_id", "embedding",
        k = 5, nProbe = 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(got == ref)
    // a corpus that already mixes BOTH layouts is not migratable:
    // fail fast with the rebuild message, write nothing
    val path3 = freshPath("legacy-mixed")
    PqIndex.build(s, path3, corpusA, "vec_id", "embedding", kCells = 8)
    fs.mkdirs(p(s"$path3/corpus/cluster=999"))
    val e = intercept[IllegalArgumentException] {
      PqIndex.append(s, path3, corpusA.limit(1), "vec_id", "embedding", 0)
    }
    assert(e.getMessage.contains("rebuild"))
  }

  test("sink epoch marker closes the one-batch checkpoint-loss window; " +
      "compaction clears it so a deliberate fresh checkpoint works") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = freshPath("epoch")
    PqIndex.build(s, path, corpusA.filter($"vec_id" < 150),
      "vec_id", "embedding", kCells = 8)
    val late = corpusA.filter($"vec_id" >= 150)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toSeq))
    // ingest exactly ONE batch (batchId 0) from checkpoint 1
    val input = MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.Streams.pqIndexIngestSink(
        input.toDS().toDF("vec_id", "embedding"),
        path, freshPath("epoch-ckpt1"), "vec_id", "embedding",
        graft.streaming.Streams.trigger(1))
      .start()
    try {
      input.addData(late.take(25).toSeq); q.processAllAvailable()
      assert(q.exception.isEmpty, q.exception.toString)
    } finally q.stop()
    assert(s.read.parquet(s"$path/corpus").count() == 175)
    // checkpoint lost after exactly one batch: only batch=0 exists, so
    // the batch-directory guard is blind — the epoch marker must trip
    val input2 = MemoryStream[(Long, Seq[Float])]
    val q2 = graft.streaming.Streams.pqIndexIngestSink(
        input2.toDS().toDF("vec_id", "embedding"),
        path, freshPath("epoch-ckpt2"), "vec_id", "embedding",
        graft.streaming.Streams.trigger(1))
      .start()
    try {
      input2.addData(late.slice(25, 30).toSeq)
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(q2.exception.exists(
        _.toString.contains("checkpoint was lost")), q2.exception.toString)
    } finally q2.stop()
    // the original ingest survived untouched
    assert(s.read.parquet(s"$path/corpus").count() == 175)
    // compaction publishes a fresh corpus without the marker: starting
    // over from a NEW checkpoint is then a deliberate, allowed act
    assert(PqIndex.compactCorpus(s, path))
    val input3 = MemoryStream[(Long, Seq[Float])]
    val q3 = graft.streaming.Streams.pqIndexIngestSink(
        input3.toDS().toDF("vec_id", "embedding"),
        path, freshPath("epoch-ckpt3"), "vec_id", "embedding",
        graft.streaming.Streams.trigger(1))
      .start()
    try {
      input3.addData(late.slice(25, 50).toSeq); q3.processAllAvailable()
      assert(q3.exception.isEmpty, q3.exception.toString)
    } finally q3.stop()
    assert(s.read.parquet(s"$path/corpus").count() == 200)
  }

  test("watchdog measures the SERVING path: maintain with shortlist " +
      "evaluates topKRefined recall before and after the retrain") {
    val s = spark
    import s.implicits._
    val path = freshPath("watchdog-refined")
    PqIndex.build(s, path, corpusA, "vec_id", "embedding", kCells = 8)
    val qA = corpusA.filter($"vec_id" < 30)
    val rHealthy = PqIndex.recallAt(s, path, corpusA, qA, "vec_id",
      "embedding", k = 10, shortlist = 20)
    // healthy: maintain(shortlist) measures exactly the refined path
    val noop = PqIndex.maintain(s, path, corpusA, qA, "vec_id",
      "embedding", floor = math.min(rHealthy, 0.5), kCells = 8,
      shortlist = 20)
    assert(!noop.retrained && noop.recallBefore == rHealthy)
    // drift, then maintain against a floor just above the stale
    // refined recall: retrain fires and both measurements ran through
    // the serving (shortlist) path
    PqIndex.reencode(s, path, corpusB, "vec_id", "embedding")
    val qB = corpusB.filter($"vec_id" < 30)
    val rStale = PqIndex.recallAt(s, path, corpusB, qB, "vec_id",
      "embedding", k = 10, shortlist = 20)
    val floor = math.min(0.9, rStale + 0.01)
    val res = PqIndex.maintain(s, path, corpusB, qB, "vec_id",
      "embedding", floor, kCells = 8, shortlist = 20)
    assert(res.retrained && res.recallBefore == rStale)
    assert(res.recallAfter >= floor,
      s"retrained refined recall ${res.recallAfter} under $floor " +
        s"(stale was $rStale)")
    // and the published index serves what the watchdog measured
    assert(PqIndex.recallAt(s, path, corpusB, qB, "vec_id", "embedding",
      k = 10, shortlist = 20) == res.recallAfter)
  }

  test("index swap is crash-safe: a cut between the two publish " +
      "renames heals to the complete previous generation") {
    val s = spark
    import s.implicits._
    val path = freshPath("crash")
    val ix = PqIndex.build(s, path, corpusA, "vec_id", "embedding",
      kCells = 8)
    val fs = org.apache.hadoop.fs.FileSystem
      .get(s.sparkContext.hadoopConfiguration)
    // simulate the publish crash window: live moved aside as the
    // backup, replacement not yet renamed in (and lost with the crash)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + "__bak")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path)))
    // any entry heals: the backup is the complete previous generation
    val healed = PqIndex.loadMeta(s, path)
    assert(healed.coarse == ix.coarse && healed.books == ix.books)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/corpus")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__bak")))
    // and the healed index still serves queries
    val got = PqIndex.topK(s, path, corpusA.filter($"vec_id" < 5),
      "vec_id", "embedding", k = 3)
    assert(got.count() == 15)
  }

  test("topK evaluates the query source exactly ONCE per serve: the " +
      "probe set, probe explode, and ADC tables all derive from the " +
      "pinned (id, q) frame") {
    val s = spark
    import s.implicits._
    val path = freshPath("single-eval")
    PqIndex.build(s, path, corpusA, "vec_id", "embedding", kCells = 8)
    val nQueries = 20
    val acc = s.sparkContext.longAccumulator("query-evals")
    val instrumented = corpusA.filter($"vec_id" < nQueries)
      .as[(Long, Seq[Float])]
      .mapPartitions { it => it.map { r => acc.add(1); r } }
      .toDF("vec_id", "embedding")
    val got = PqIndex
      .topK(s, path, instrumented, "vec_id", "embedding", k = 5, nProbe = 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .toSet
    assert(acc.value == nQueries,
      s"query source evaluated ${acc.value} row-times for $nQueries " +
        "rows — the serve must scan it exactly once (pre-fix: 3×)")
    // and the pinned-frame serve answers exactly like the plain one
    val plain = PqIndex
      .topK(s, path, corpusA.filter($"vec_id" < nQueries), "vec_id",
        "embedding", k = 5, nProbe = 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .toSet
    assert(got == plain)
  }

  test("append of an EMPTY batch is a 0-row no-op: no schema-inference " +
      "crash on the data-less batch dir, corpus and answers unchanged") {
    val s = spark
    import s.implicits._
    val path = freshPath("empty-append")
    PqIndex.build(s, path, corpusA, "vec_id", "embedding", kCells = 8)
    val queries = corpusA.filter($"vec_id" < 10)
    def answers() = PqIndex
      .topK(s, path, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .toSet
    val before = answers()
    // a zero-row micro-batch (AvailableNow catch-up with no new data,
    // or a replayed batch off a non-replayable source) must return 0,
    // not crash reading back a directory that holds only _SUCCESS
    val n = PqIndex.append(s, path, corpusA.filter($"vec_id" < 0),
      "vec_id", "embedding", batchId = 7)
    assert(n == 0L)
    val fs = org.apache.hadoop.fs.FileSystem
      .get(s.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/corpus/batch=7")),
      "the empty batch dir is the idempotent replay target — it must land")
    // replay of the same empty batch: still 0, still no crash
    assert(PqIndex.append(s, path, corpusA.filter($"vec_id" < 0),
      "vec_id", "embedding", batchId = 7) == 0L)
    assert(s.read.parquet(s"$path/corpus").count() == 200)
    assert(answers() == before)
  }

  test("sink epoch guard: the same logical checkpoint respelled " +
      "(file:// scheme + trailing slash) must not trip 'checkpoint " +
      "was lost'") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = freshPath("epoch-spell")
    PqIndex.build(s, path, corpusA.filter($"vec_id" < 150),
      "vec_id", "embedding", kCells = 8)
    val late = corpusA.filter($"vec_id" >= 150)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toSeq))
    val ckpt = freshPath("epoch-spell-ckpt")
    // batch 0 lands from the bare-path spelling of the checkpoint
    val input = MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.Streams.pqIndexIngestSink(
        input.toDS().toDF("vec_id", "embedding"),
        path, ckpt, "vec_id", "embedding",
        graft.streaming.Streams.trigger(1))
      .start()
    try {
      input.addData(late.take(25).toSeq); q.processAllAvailable()
      assert(q.exception.isEmpty, q.exception.toString)
    } finally q.stop()
    assert(s.read.parquet(s"$path/corpus").count() == 175)
    // the SAME checkpoint (same source, so offsets resume), respelled
    // with an explicit scheme and a trailing slash — a healthy restart,
    // not a lost checkpoint; the guard must compare canonical URIs,
    // not raw strings
    val q2 = graft.streaming.Streams.pqIndexIngestSink(
        input.toDS().toDF("vec_id", "embedding"),
        path, s"file://$ckpt/", "vec_id", "embedding",
        graft.streaming.Streams.trigger(1))
      .start()
    try {
      input.addData(late.drop(25).toSeq); q2.processAllAvailable()
      assert(q2.exception.isEmpty,
        s"respelled checkpoint falsely tripped the guard: ${q2.exception}")
    } finally q2.stop()
    assert(s.read.parquet(s"$path/corpus").count() == 200)
  }
}
