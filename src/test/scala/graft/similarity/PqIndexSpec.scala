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
}
