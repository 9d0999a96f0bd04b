package graft.functions

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NativeBloomSpec extends AnyFunSuite with SparkSpec {

  private def keysDf(keys: Seq[Long], parts: Int = 8) = {
    val s = spark
    import s.implicits._
    keys.toDF("k").repartition(parts)
  }

  test("sizing: optimal bits/hashes hit the textbook values") {
    // n=1000, p=0.01 → m = ceil(1000·ln100/ln²2) = 9586 → round to 64
    val m = NativeBloom.optimalBits(1000, 0.01)
    assert(m >= 9586 && m <= 9586 + 64 && m % 64 == 0, m)
    // k = m/n·ln2 ≈ 6.6 → 7
    assert(NativeBloom.optimalHashes(1000, m) == 7)
  }

  test("no false negatives, ever: every inserted key probes true") {
    val rnd = new scala.util.Random(7)
    val keys = Seq.fill(5000)(rnd.nextLong())
    val bits = NativeBloom.optimalBits(5000, 0.01)
    val hashes = NativeBloom.optimalHashes(5000, bits)
    val bloom = keysDf(keys)
      .select(NativeBloom.bloomBuild(col("k"), bits, hashes).as("b"))
      .head().getAs[Array[Byte]](0)
    val misses = keysDf(keys)
      .filter(!NativeBloom.bloomContains(col("k"), bloom))
      .count()
    assert(misses == 0L)
  }

  test("false-positive rate stays near the configured fpp") {
    val rnd = new scala.util.Random(11)
    val inKeys = Seq.fill(5000)(rnd.nextLong())
    val inSet = inKeys.toSet
    val outKeys = Iterator.continually(rnd.nextLong())
      .filterNot(inSet).take(20000).toSeq
    val bits = NativeBloom.optimalBits(5000, 0.01)
    val hashes = NativeBloom.optimalHashes(5000, bits)
    val bloom = keysDf(inKeys)
      .select(NativeBloom.bloomBuild(col("k"), bits, hashes).as("b"))
      .head().getAs[Array[Byte]](0)
    val fp = keysDf(outKeys)
      .filter(NativeBloom.bloomContains(col("k"), bloom))
      .count()
    val rate = fp.toDouble / outKeys.size
    assert(rate < 0.03, s"fp rate $rate should be ~0.01")
    assert(rate > 0.0005, s"fp rate $rate suspiciously low for m/n=10")
  }

  test("distributed build == single-partition build (merge is exact OR)") {
    val keys = (1L to 2000L).map(_ * 7919L)
    def build(parts: Int): Array[Byte] = keysDf(keys, parts)
      .select(NativeBloom.bloomBuild(col("k"), 4096, 5).as("b"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(build(1), build(8)))
  }

  test("null keys are ignored, not inserted") {
    val s = spark
    import s.implicits._
    val df = Seq[Option[Long]](Some(1L), None, Some(2L)).toDF("k")
    val bloom = df.select(NativeBloom.bloomBuild(col("k"), 1024, 3).as("b"))
      .head().getAs[Array[Byte]](0)
    val r = keysDf(Seq(1L, 2L))
      .filter(NativeBloom.bloomContains(col("k"), bloom)).count()
    assert(r == 2L)
  }

  private def corpus(n: Int) = {
    val s = spark
    import s.implicits._
    (1 to n).map(i => (i.toLong, s"doc body number ${i % 60} content"))
      .toDF("doc_id", "text")
  }

  test("bloomDedupNewVsIndex == plain anti join (fast path)") {
    val index = corpus(120)                    // texts cycle every 60
    val fresh = {
      val s = spark
      import s.implicits._
      ((1 to 40).map(i => (1000L + i, s"doc body number ${i % 60} content")) ++
        (1 to 25).map(i => (2000L + i, s"genuinely new text $i")))
        .toDF("doc_id", "text")
    }
    val got = Dedup.bloomDedupNewVsIndex(fresh, index, "doc_id", "text",
        expectedIndexRows = 120)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val want = fresh.join(index.select(col("text")).distinct(),
        Seq("text"), "left_anti")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got == want)
    assert(got == (1 to 25).map(i => 2000L + i).toSet, got)
  }

  test("fallback path (candidate cap exceeded) gives identical results") {
    val index = corpus(120)
    val fresh = corpus(80).withColumn("doc_id", col("doc_id") + 5000L)
    val fast = Dedup.bloomDedupNewVsIndex(fresh, index, "doc_id", "text",
        expectedIndexRows = 120)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val fell = Dedup.bloomDedupNewVsIndex(fresh, index, "doc_id", "text",
        expectedIndexRows = 120, maxCandidates = 3)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(fast == fell)
    assert(fast.isEmpty) // every fresh text cycles into the index vocab
  }

  test("disjoint batch: bloom rejects everything, zero-join exit keeps all") {
    val index = corpus(100)
    val s = spark
    import s.implicits._
    val fresh = (1 to 30).map(i => (9000L + i, s"unique snowflake $i"))
      .toDF("doc_id", "text")
    val got = Dedup.bloomDedupNewVsIndex(fresh, index, "doc_id", "text",
        expectedIndexRows = 100)
      .count()
    assert(got == 30L)
  }
}
