package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("withPayload: binary payload with exact byte-length metadata") {
    val out = Multimodal.withPayload(docs, "text")
    assert(out.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val mismatch = out.filter(
      col("meta.size_bytes") =!= octet_length(col("payload"))).count()
    assert(mismatch == 0)
    assert(out.select("meta.modality").distinct().head().getString(0) == "text")
  }

  test("decode stub is deterministic and in-range") {
    val payload = "hello multimodal world".getBytes("UTF-8")
    val (w1, h1, m1, e1) = DecodeStub.decode(payload)
    val (w2, h2, m2, e2) = DecodeStub.decode(payload)
    assert((w1, h1, m1) == (w2, h2, m2) && e1.sameElements(e2))
    assert(w1 >= 1 && w1 <= 640 && h1 >= 1 && h1 <= 480)
    assert(m1 > 0 && m1 < 256)
    assert(e1.length == DecodeStub.embeddingDim)
    assert(e1.forall(v => v >= 0f && v <= 1f))
  }

  test("extractFeatures: batched mapPartitions matches direct decode") {
    import spark.implicits._
    val media = Multimodal.withPayload(docs.limit(100), "text")
      .select(col("doc_id"), col("payload"),
        col("meta.modality").as("modality"), col("meta.format").as("format"))
      .as[MediaRecord]
    val feats = Multimodal.extractFeatures(media, batchSize = 7)
      .collect().map(f => f.doc_id -> f).toMap
    val direct = media.collect()
    assert(direct.nonEmpty && feats.size == direct.length)
    direct.foreach { r =>
      val (w, h, m, e) = DecodeStub.decode(r.payload)
      val f = feats(r.doc_id)
      assert(f.width == w && f.height == h && f.mean_byte == m)
      assert(f.embedding.sameElements(e))
    }
  }

  test("frame sampling: n frames per doc, stable hashes, no shuffle") {
    val out = Multimodal.sampleFrames(docs, "text", n = 4, frameLen = 32)
    val n = docs.count()
    assert(out.count() == 4 * n)
    // per-doc frame indexes are exactly 0..3
    val bad = out.groupBy("doc_id")
      .agg(countDistinct("frame_idx").as("k"), count(lit(1)).as("c"))
      .filter(col("k") =!= 4 || col("c") =!= 4).count()
    assert(bad == 0)
    // frame 0 hash == md5 of the first 32 chars
    val first = docs.orderBy("doc_id").select("doc_id", "text").head()
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(first.getString(1).take(32).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val got = out.filter(col("doc_id") === first.getLong(0) &&
      col("frame_idx") === 0).head().getString(2)
    assert(got == expected)
    // single-stage: no exchange in the plan
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("size-hint repartition balances payload bytes") {
    val media = Multimodal.withPayload(docs, "text")
    val parts = 8
    val sized = Multimodal.repartitionBySizeHint(
      media.withColumn("sz", col("meta.size_bytes")), parts, "sz")
    val perPart = sized
      .groupBy(spark_partition_id().as("pid"))
      .agg(sum("sz").as("bytes"))
      .collect().map(_.getLong(1))
    assert(perPart.length <= parts)
    // no partition holds more than ~3x the mean payload volume
    val mean = perPart.sum.toDouble / perPart.length
    assert(perPart.forall(_ <= mean * 3),
      s"skewed partitions: ${perPart.mkString(",")} mean=$mean")
  }
}
