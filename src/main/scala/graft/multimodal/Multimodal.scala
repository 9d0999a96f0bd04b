package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline: media as opaque
  * `binary` payloads + typed metadata, with decode/feature-extract as
  * batched per-partition transforms.
  *
  * Design (mirrors the mapInPandas pattern in Scala types): media bytes
  * NEVER deserialize on the driver; partitions stream through a batched
  * iterator transform so a decode library amortizes per-batch setup.
  * The decode itself is a STUB — deterministic fake features derived
  * from the bytes (this container has no image/audio codecs); the
  * Spark-side contract (schema, batch shape, partition balance,
  * spill-free streaming) is real and tested, and a production decoder
  * drops into [[DecodeStub.decode]] unchanged.
  */
object MediaSchema {
  /** Typed metadata carried next to every payload. */
  val metaType: StructType = StructType(Seq(
    StructField("modality", StringType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("size_bytes", LongType, nullable = false)))

  val mediaType: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", metaType, nullable = false)))
}

case class MediaRecord(doc_id: Long, payload: Array[Byte],
    modality: String, format: String)

case class MediaFeatures(doc_id: Long, width: Int, height: Int,
    mean_byte: Double, embedding: Array[Float])

/** STUB decoder — a real deployment replaces this object with codec
  * bindings (JNI/FFI); everything upstream/downstream is unchanged.
  * Deterministic on the payload bytes so tests and reruns agree. */
object DecodeStub {
  val embeddingDim = 8

  /** Fake "decode": dimensions from leading bytes, per-byte mean, an
    * 8-dim embedding from evenly-spaced taps. Pure function of bytes. */
  def decode(payload: Array[Byte]): (Int, Int, Double, Array[Float]) = {
    require(payload.nonEmpty, "empty payload")
    val width = 1 + (payload(0) & 0xFF) % 640
    val height = 1 + (payload(payload.length - 1) & 0xFF) % 480
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += (payload(i) & 0xFF); i += 1 }
    val mean = sum.toDouble / payload.length
    val emb = Array.tabulate(embeddingDim) { k =>
      val idx = (k.toLong * (payload.length - 1) / math.max(1, embeddingDim - 1)).toInt
      ((payload(idx) & 0xFF) / 255.0f)
    }
    (width, height, mean, emb)
  }
}

object Multimodal {

  /** Attach a binary payload + metadata struct to a text corpus (the
    * testdata stand-in for real media files; a production source reads
    * `spark.read.format("binaryFile")`). */
  def withPayload(docs: DataFrame, contentCol: String = "content"): DataFrame =
    docs
      .withColumn("payload", encode(col(contentCol), "UTF-8").cast(BinaryType))
      .withColumn("meta", struct(
        lit("text").as("modality"),
        lit("utf-8").as("format"),
        octet_length(col("payload")).cast(LongType).as("size_bytes")))

  /** Size-aware repartition: balance partitions by cumulative payload
    * bytes, not row count — media rows are wildly non-uniform (a 4 KB
    * thumbnail vs a 40 MB video). Rows are range-bucketed by their
    * running size estimate via hash of id into `parts` buckets weighted
    * by size; at 100 TB this is the difference between a straggler-free
    * decode stage and one 40×-skewed partition. */
  def repartitionBySizeHint(df: DataFrame, parts: Int,
      sizeCol: String): DataFrame =
    df.repartitionByRange(parts,
      col(sizeCol).desc, // big payloads spread first
      pmod(hash(col("doc_id")), lit(parts)))

  /** Batched per-partition feature extraction — the Scala analog of
    * mapInPandas: each partition iterator is consumed in `batchSize`
    * groups, the decoder runs once per record but any per-batch setup
    * (model load, codec context) amortizes across the batch. Streaming
    * iterator in/out — no partition-sized materialization. */
  def extractFeatures(media: Dataset[MediaRecord],
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would init the codec/model here (stubbed)
        batch.iterator.map { r =>
          val (w, h, mean, emb) = DecodeStub.decode(r.payload)
          MediaFeatures(r.doc_id, w, h, mean, emb)
        }
      }
    }
  }

  /** Deterministic "frame sampling": `n` evenly-spaced fixed-width
    * windows per payload — the shape of video frame-grab / audio
    * chunking, expressed as pure column ops (codegen, no UDF). One
    * projection + explode; no shuffle. */
  def sampleFrames(docs: DataFrame, contentCol: String, n: Int,
      frameLen: Int): DataFrame = {
    val len = length(col(contentCol))
    val frames = (0 until n).map { i =>
      val off = greatest(lit(1L),
        floor((len - frameLen) * lit(i) / lit(n - 1.0)).cast(LongType) + 1L)
      struct(lit(i).as("frame_idx"),
        md5(encode(substr(col(contentCol), off, lit(frameLen)), "UTF-8"))
          .as("frame_hash"))
    }
    docs.select(col("doc_id"), explode(array(frames: _*)).as("frame"))
      .select(col("doc_id"), col("frame.frame_idx"), col("frame.frame_hash"))
  }
}
