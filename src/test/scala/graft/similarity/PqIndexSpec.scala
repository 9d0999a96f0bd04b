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
