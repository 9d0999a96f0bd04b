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

  test("real PNG and BMP payloads decode to true dimensions and pixel mean") {
    // 5×3 image: left 8 columns... build a 5x3 gradient whose luminance
    // mean is computable by hand. Pixel (x,y) = gray level g = x*60
    // (r=g=b), so BT.601 luminance == g exactly.
    val w = 5; val h = 3
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = x * 60
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val expectedMean = (0 until w).map(_ * 60).sum.toDouble / w // rows equal
    for (fmt <- Seq("png", "bmp")) {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      val (dw, dh, mean, emb) = DecodeStub.decode(bos.toByteArray)
      assert((dw, dh) == (w, h), s"$fmt dimensions")
      assert(mean == expectedMean, s"$fmt mean: $mean vs $expectedMean")
      assert(emb.length == DecodeStub.embeddingDim)
      // first tap = top-left pixel (gray 0), last tap = bottom-right (240)
      assert(emb.head == 0f && emb.last == 240 / 255.0f)
    }
    // a truncated PNG (bad body) must fall back, not throw
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val truncated = bos.toByteArray.take(20)
    val (fw, fh, _, _) = DecodeStub.decode(truncated)
    assert(fw >= 1 && fw <= 640 && fh >= 1 && fh <= 480)
    // text whose leading bytes sniff as an image format ("BM…" → BMP)
    // makes JDK readers throw RUNTIME exceptions — must fall back too
    val bmText = "BMW is a carmaker, not a bitmap".getBytes("UTF-8")
    val (bw, bh, bm, be) = DecodeStub.decode(bmText)
    assert(bw >= 1 && bw <= 640 && bh >= 1 && bh <= 480)
    assert(bm > 0 && bm < 256 && be.length == DecodeStub.embeddingDim)
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

  /** Synthesize an in-memory WAV: 16-bit signed PCM, interleaved
    * channels, `sample(frame, channel)` in [-1, 1]. */
  private def wavBytes(rate: Float, channels: Int, frames: Int)(
      sample: (Int, Int) => Double): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16,
      channels, channels * 2, rate, false)
    val data = new Array[Byte](frames * channels * 2)
    for (f <- 0 until frames; c <- 0 until channels) {
      val v = math.max(-1.0, math.min(1.0, sample(f, c)))
      val s = math.round(v * 32767).toShort
      val i = (f * channels + c) * 2
      data(i) = (s & 0xFF).toByte
      data(i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real WAV payloads decode to true rate/frames/rms; envelope tracks energy") {
    // 0.5-amplitude sine, 8 kHz mono, exactly 1 s → rms = 0.5/√2
    val n = 8000
    val sine = wavBytes(8000f, 1, n)((f, _) =>
      0.5 * math.sin(2 * math.Pi * 440 * f / 8000.0))
    val (rate, ch, frames, rms, emb) = DecodeStub.decodeAudio(sine)
    assert((rate, ch, frames) == ((8000, 1, n.toLong)))
    assert(math.abs(rms - 0.5 / math.sqrt(2)) < 1e-3, s"rms $rms")
    assert(emb.length == DecodeStub.embeddingDim)
    // constant-energy signal → every segment of the envelope ≈ rms
    emb.foreach(v => assert(math.abs(v - rms) < 5e-3, emb.mkString(",")))

    // amplitude ramp 0 → 1: the energy envelope must increase
    val ramp = wavBytes(16000f, 2, 16000)((f, _) =>
      (f / 16000.0) * math.sin(2 * math.Pi * 440 * f / 16000.0))
    val (rRate, rCh, rFrames, _, rEmb) = DecodeStub.decodeAudio(ramp)
    assert((rRate, rCh, rFrames) == ((16000, 2, 16000L)))
    assert(rEmb.zip(rEmb.tail).forall { case (a, b) => a < b },
      s"envelope not increasing: ${rEmb.mkString(",")}")

    // truncated mid-data: decode is memory-bounded and returns what the
    // bytes actually hold — segments the data never reached stay 0
    val cut = sine.take(sine.length / 2)
    val (_, _, cutFrames, _, cutEmb) = DecodeStub.decodeAudio(cut)
    assert(cutFrames > 0 && cutFrames < n, s"cut frames $cutFrames")
    assert(cutEmb.last == 0f)

    // a crafted fmt chunk declaring 0 Hz (bytes 24–31: sample rate +
    // byte rate) must route to the fallback, not yield rate 0 and
    // duration = Infinity downstream
    val zeroHz = sine.clone()
    for (i <- 24 until 32) zeroHz(i) = 0
    val (zRate, _, _, _, _) = DecodeStub.decodeAudio(zeroHz)
    assert(zRate == 8000 + ((zeroHz(0) & 0xFF) % 8) * 1000, s"rate $zRate")

    // non-audio bytes take the deterministic byte-derived fallback,
    // identical to a by-hand recompute (the SQL the oracle runs)
    val txt = "no codec will claim this sentence".getBytes("UTF-8")
    val (fRate, fCh, fFrames, fRms, fEmb) = DecodeStub.decodeAudio(txt)
    assert(fRate == 8000 + ((txt(0) & 0xFF) % 8) * 1000)
    assert(fCh == 1 + ((txt.last & 0xFF) % 2))
    assert(fFrames == txt.length.toLong)
    val sumSq = txt.map(b => (b & 0xFF).toLong).map(v => v * v).sum
    assert(fRms == math.sqrt(sumSq.toDouble / txt.length) / 255.0)
    assert(fEmb.length == DecodeStub.embeddingDim)
  }

  test("extractAudioFeatures: partition transform matches direct decode") {
    import spark.implicits._
    val media = Multimodal.withPayload(docs.limit(60), "text")
      .select(col("doc_id"), col("payload"),
        col("meta.modality").as("modality"), col("meta.format").as("format"))
      .as[MediaRecord]
    val feats = Multimodal.extractAudioFeatures(media, batchSize = 7)
      .collect().map(f => f.doc_id -> f).toMap
    val direct = media.collect()
    assert(direct.nonEmpty && feats.size == direct.length)
    direct.foreach { r =>
      val (rate, ch, frames, rms, emb) = DecodeStub.decodeAudio(r.payload)
      val f = feats(r.doc_id)
      assert(f.sample_rate == rate && f.channels == ch && f.frames == frames)
      assert(f.rms == rms && f.duration_s == frames.toDouble / rate)
      assert(f.embedding.sameElements(emb))
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
