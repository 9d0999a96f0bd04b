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

  private def pngBytes(w: Int, h: Int)(gray: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = gray(x, y) & 0xFF
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    bos.toByteArray
  }

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("perceptualHash: real rasters — identical, perturbed, and distinct images") {
    // 64×64 horizontal gradient: dHash = all-ones rows (luminance
    // strictly increases left to right within every 9-col grid row)
    val grad = pngBytes(64, 64)((x, _) => x * 4)
    val (a1, d1) = DecodeStub.perceptualHash(grad)
    assert(d1 == -1L, f"gradient dhash should be all ones, got $d1%016x")
    // byte-identical re-encode → identical hashes
    val (a2, d2) = DecodeStub.perceptualHash(
      pngBytes(64, 64)((x, _) => x * 4))
    assert(a1 == a2 && d1 == d2)
    // small local perturbation (one 8×8 block brightened slightly)
    // moves the hash a little, not a lot — the robustness that makes
    // dHash a NEAR-dup signature rather than an exact fingerprint
    val perturbed = pngBytes(64, 64)((x, y) =>
      if (x < 8 && y < 8) x * 4 + 40 else x * 4)
    val (ap, dp) = DecodeStub.perceptualHash(perturbed)
    assert(hamming(d1, dp) <= 3, s"perturbed dhash hamming ${hamming(d1, dp)}")
    assert(hamming(a1, ap) <= 6, s"perturbed ahash hamming ${hamming(a1, ap)}")
    // a vertical gradient is a DIFFERENT image: dhash far away
    val vert = pngBytes(64, 64)((_, y) => y * 4)
    val (_, dv) = DecodeStub.perceptualHash(vert)
    assert(hamming(d1, dv) > 16, s"distinct images too close: ${hamming(d1, dv)}")
    // checkerboard vs gradient: ahash separates too
    val checker = pngBytes(64, 64)((x, y) => if ((x / 8 + y / 8) % 2 == 0) 0 else 255)
    val (ac, _) = DecodeStub.perceptualHash(checker)
    assert(hamming(a1, ac) > 16)
  }

  test("perceptualHash: fallback grids are the documented byte taps") {
    val p = Array.tabulate(257)(i => (i * 7 % 251).toByte)
    val (a, d) = DecodeStub.perceptualHash(p)
    def tap(k: Int, n: Int): Int =
      p((k.toLong * (p.length - 1) / (n - 1)).toInt) & 0xFF
    val g64 = Array.tabulate(64)(tap(_, 64))
    val sum = g64.map(_.toLong).sum
    // recompute through the same packing rules
    val bitsA = Array.tabulate(64)(i => g64(i).toLong * 64 > sum)
    val g72 = Array.tabulate(72)(tap(_, 72))
    val bitsD = Array.tabulate(64)(i => g72(i / 8 * 9 + i % 8) < g72(i / 8 * 9 + i % 8 + 1))
    def pack(bits: Array[Boolean]): Long = {
      var hv = 0L
      for (j <- 0 until 8) {
        var b = 0
        for (c <- 0 until 8) if (bits(j * 8 + c)) b |= 1 << (7 - c)
        hv = (hv << 8) | b
      }
      hv
    }
    assert(a == pack(bitsA) && d == pack(bitsD))
    // deterministic across calls
    assert(DecodeStub.perceptualHash(p) == ((a, d)))
  }

  test("imageNearDuplicates: blocking finds planted copies, not the rest") {
    val s2 = spark
    import s2.implicits._
    val imgs = Seq(
      (1L, pngBytes(64, 64)((x, _) => x * 4)),
      (2L, pngBytes(64, 64)((x, y) => if (x < 8 && y < 8) x * 4 + 40 else x * 4)),
      (3L, pngBytes(64, 64)((_, y) => y * 4)),
      (4L, pngBytes(64, 64)((x, _) => x * 4))) // copy of 1
      .map { case (id, p) => graft.multimodal.MediaRecord(id, p, "image", "png") }
    val media = s2.createDataset(imgs)
    val hashes = Multimodal.perceptualHashes(media).toDF()
    val pairs = Multimodal.imageNearDuplicates(hashes, "doc_id", "dhash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // 1↔4 exact copy (h=0); 1↔2 and 2↔4 perturbed (h ≤ 3); 3 matches nothing
    assert(pairs.map(p => (p._1, p._2)) == Set((1L, 4L), (1L, 2L), (2L, 4L)),
      pairs.toString)
    assert(pairs.forall(_._3 <= 3))
    assert(pairs.find(p => (p._1, p._2) == ((1L, 4L))).get._3 == 0L)
  }

  test("interleaveSegments: ordered segments, adjacent/edge markers, no-marker docs") {
    val s2 = spark
    import s2.implicits._
    val docs = Seq(
      (1L, "intro text <img:10> middle part <img:11> outro"),
      (2L, "<img:20><img:21> after two"),      // adjacent markers, start
      (3L, "plain text only no markers here"),
      (4L, "ends with image <img:30>"),
      (5L, "")).toDF("doc_id", "text")
    val segs = Multimodal.interleaveSegments(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        Option(r.getString(4)).getOrElse("")))
      .sortBy(x => (x._1, x._2))
    assert(segs.filter(_._1 == 1L).map(x => (x._3, x._4, x._5)).toSeq == Seq(
      ("text", -1L, "intro text"), ("image", 10L, ""),
      ("text", -1L, "middle part"), ("image", 11L, ""),
      ("text", -1L, "outro")))
    assert(segs.filter(_._1 == 2L).map(x => (x._3, x._4, x._5)).toSeq == Seq(
      ("image", 20L, ""), ("image", 21L, ""), ("text", -1L, "after two")))
    assert(segs.filter(_._1 == 3L).map(x => (x._3, x._5)).toSeq ==
      Seq(("text", "plain text only no markers here")))
    assert(segs.filter(_._1 == 4L).map(x => (x._3, x._4)).toSeq ==
      Seq(("text", -1L), ("image", 30L)))
    assert(!segs.exists(_._1 == 5L)) // empty doc → no segments
    // seg_idx is contiguous from 0 per doc
    segs.groupBy(_._1).foreach { case (_, ss) =>
      assert(ss.map(_._2).toSeq == ss.indices.toSeq)
    }
  }

  test("interleaveSegments native split/trim ≡ HOF reference (real docs " +
      "+ adversarial whitespace); plan carries no CodegenFallback") {
    val s2 = spark
    import s2.implicits._
    val real = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val adv = Seq(
      (1000001L, "  leading <img:1>   spaced   <img:2>trailing  "),
      (1000002L, " \t tab-only segments \t <img:3> \t "), // tabs are NOT trimmed
      (1000003L, "   "),          // spaces only → trims empty → dropped
      (1000004L, "<img:4>"),
      (1000005L, null)).toDF("doc_id", "text")
    for (docs <- Seq(real, adv)) {
      val native = Multimodal.interleaveSegments(docs, "doc_id", "text")
      val ref = Multimodal.interleaveSegmentsReference(docs, "doc_id", "text")
      assert(native.exceptAll(ref).isEmpty && ref.exceptAll(native).isEmpty)
    }
    val fb = graft.PlanProbe.codegenFallbacks(
      Multimodal.interleaveSegments(real, "doc_id", "text"))
    assert(fb.isEmpty, fb.mkString(", "))
  }

  test("attachMedia: resolved flag marks dangling references, text passes through") {
    val s2 = spark
    import s2.implicits._
    val docs = Seq((1L, "a b <img:10> c <img:99> d")).toDF("doc_id", "text")
    val media = Seq((10L, "h10")).toDF("media_id", "media_md5")
    val out = Multimodal.attachMedia(
        Multimodal.interleaveSegments(docs, "doc_id", "text"),
        media, "media_id")
      .collect()
      .map(r => (r.getAs[String]("kind"),
        if (r.isNullAt(r.fieldIndex("media_id"))) -1L
        else r.getAs[Long]("media_id"),
        r.getAs[Boolean]("resolved")))
      .toSet
    assert(out == Set(
      ("text", -1L, true), ("image", 10L, true), ("image", 99L, false)))
  }

  test("imageNearDuplicates star-cap: mass-identical hashes go O(n), not O(n^2)") {
    val s2 = spark
    import s2.implicits._
    // 200 byte-identical hashes (a blank-thumbnail corpus) + 2 distinct
    val hashes = ((1L to 200L).map(i => (i, 0x0123456789abcdefL)) ++
      Seq((900L, -1L), (901L, 0x0f0f0f0f0f0f0f0fL))).toDF("doc_id", "dhash")
    val capped = Multimodal.imageNearDuplicates(hashes, "doc_id", "dhash",
      maxHamming = 3, maxChunkGroup = 50).collect()
    // star topology: every identical member pairs with the minimum id
    // ONLY — 199 pairs, not 199·200/2
    assert(capped.length == 199, capped.length)
    assert(capped.forall(r => r.getLong(0) == 1L && r.getLong(2) == 0L))
    // under-cap corpora are byte-identical to the exhaustive path
    val smallHashes = ((1L to 20L).map(i => (i, 7L)) ++
      Seq((50L, 15L))).toDF("doc_id", "dhash") // 15 is hamming 1 from 7
    val exhaustive = Multimodal.imageNearDuplicates(smallHashes, "doc_id",
      "dhash", 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cappedSmall = Multimodal.imageNearDuplicates(smallHashes, "doc_id",
      "dhash", 3, maxChunkGroup = 100).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exhaustive == cappedSmall)
    // the near-pair to the representative still surfaces under the cap
    val withNear = Multimodal.imageNearDuplicates(smallHashes, "doc_id",
      "dhash", 3, maxChunkGroup = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(withNear.contains((1L, 50L, 1L)), withNear)
    assert(withNear.count(p => p._2 != 50L) == 19) // star over the clique
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

  test("audioPerceptualHash: volume-invariant on real PCM; contour separates signals") {
    val n = 16000
    def ramp(gain: Double) = wavBytes(16000f, 1, n)((f, _) =>
      gain * (f / n.toDouble) * math.sin(2 * math.Pi * 440 * f / 16000.0))
    val h1 = DecodeStub.audioPerceptualHash(ramp(0.9))
    // a pure gain change scales every window alike: the contour —
    // hence the hash — must be IDENTICAL
    val h2 = DecodeStub.audioPerceptualHash(ramp(0.45))
    assert(h1 == h2, f"gain changed the contour: $h1%016x vs $h2%016x")
    // rising energy → overwhelmingly-set contour (late windows' ramp
    // increment is ~1/64 and partial sine cycles can locally beat it)
    assert(java.lang.Long.bitCount(h1) >= 56,
      f"rising ramp contour too flat: $h1%016x")
    // the reversed ramp is a different signal: far away
    val down = wavBytes(16000f, 1, n)((f, _) =>
      (1.0 - f / n.toDouble) * math.sin(2 * math.Pi * 440 * f / 16000.0))
    val h3 = DecodeStub.audioPerceptualHash(down)
    assert(java.lang.Long.bitCount(h1 ^ h3) > 16)
    // mild additive noise moves the contour a little, not a lot
    val rnd = new scala.util.Random(7)
    val noisy = wavBytes(16000f, 1, n)((f, _) =>
      0.9 * (f / n.toDouble) * math.sin(2 * math.Pi * 440 * f / 16000.0) +
        0.01 * rnd.nextGaussian())
    val h4 = DecodeStub.audioPerceptualHash(noisy)
    assert(java.lang.Long.bitCount(h1 ^ h4) <= 3,
      s"noise moved ${java.lang.Long.bitCount(h1 ^ h4)} bits")
  }

  test("audioPerceptualHash: fallback is the documented byte-energy contour") {
    val p = Array.tabulate(400)(i => ((i * 13) % 251).toByte)
    val h = DecodeStub.audioPerceptualHash(p)
    val segs = 65
    val n = p.length
    val e = Array.tabulate(segs) { k =>
      val from = k * n / segs
      val until = math.max(from + 1, (k + 1) * n / segs)
      (from until until).map(j => { val b = p(j) & 0xFF; b.toLong * b }).sum
    }
    val len = Array.tabulate(segs) { k =>
      math.max(1, (k + 1) * n / segs - k * n / segs).toLong
    }
    val bits = Array.tabulate(64)(i =>
      BigInt(e(i + 1)) * len(i) > BigInt(e(i)) * len(i + 1))
    var exp = 0L
    for (j <- 0 until 8) {
      var b = 0
      for (c <- 0 until 8) if (bits(j * 8 + c)) b |= 1 << (7 - c)
      exp = (exp << 8) | b
    }
    assert(h == exp)
    assert(DecodeStub.audioPerceptualHash(p) == h) // deterministic
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

  // ——— crafted container fixtures for the video metadata probe ———

  private def mp4Box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8 + payload.length)
    b.putInt(8 + payload.length)
    b.put(typ.getBytes("ISO-8859-1"))
    b.put(payload)
    b.array
  }

  private def mp4Fixture: Array[Byte] = {
    val ftyp = mp4Box("ftyp", "isom".getBytes("ISO-8859-1") ++ new Array[Byte](8))
    // mvhd v0: version+flags, creation, modification, timescale=1000,
    // duration=5000 → 5.0 s
    val mvhd = mp4Box("mvhd", java.nio.ByteBuffer.allocate(24)
      .putInt(0).putInt(0).putInt(0).putInt(1000).putInt(5000)
      .putInt(0).array)
    // tkhd v0: 4 vf + 20 ids/duration + 52 layer/matrix + 16.16 w/h
    def tkhd(w: Int, h: Int) = mp4Box("tkhd", java.nio.ByteBuffer.allocate(84)
      .position(76).asInstanceOf[java.nio.ByteBuffer]
      .putInt(w << 16).putInt(h << 16).array)
    val vtrak = mp4Box("trak", tkhd(640, 360))
    val atrak = mp4Box("trak", tkhd(0, 0)) // audio: zero dimensions
    ftyp ++ mp4Box("moov", mvhd ++ vtrak ++ atrak)
  }

  private def ebml(id: Array[Int], payload: Array[Byte]): Array[Byte] = {
    require(payload.length < 127)
    id.map(_.toByte) ++ Array((0x80 | payload.length).toByte) ++ payload
  }

  private def webmFixture: Array[Byte] = {
    val header = ebml(Array(0x1A, 0x45, 0xDF, 0xA3),
      ebml(Array(0x42, 0x82), "webm".getBytes("ISO-8859-1")))
    val info = ebml(Array(0x15, 0x49, 0xA9, 0x66),
      ebml(Array(0x2A, 0xD7, 0xB1), Array(0x0F, 0x42, 0x40).map(_.toByte)) ++ // 10⁶ ns
      ebml(Array(0x44, 0x89), java.nio.ByteBuffer.allocate(4)
        .putFloat(2500.0f).array)) // 2500 units × 10⁶ ns = 2.5 s
    val video = ebml(Array(0xE0),
      ebml(Array(0xB0), Array(0x05, 0x00).map(_.toByte)) ++  // 1280
      ebml(Array(0xBA), Array(0x02, 0xD0).map(_.toByte)))    // 720
    val tracks = ebml(Array(0x16, 0x54, 0xAE, 0x6B), ebml(Array(0xAE), video))
    header ++ ebml(Array(0x18, 0x53, 0x80, 0x67), info ++ tracks)
  }

  test("MP4 probe: brand, 16.16 dimensions, mvhd duration, track count") {
    val (c, w, h, d, t) = DecodeStub.probeVideo(mp4Fixture)
    assert(c == "mp4/isom" && w == 640 && h == 360 && t == 2)
    assert(math.abs(d - 5.0) < 1e-12)
  }

  test("WebM probe: DocType, pixel dims, scaled float duration") {
    val (c, w, h, d, t) = DecodeStub.probeVideo(webmFixture)
    assert(c == "webm" && w == 1280 && h == 720 && t == 1)
    assert(math.abs(d - 2.5) < 1e-12)
  }

  test("video probe: corrupt/truncated/garbage headers all take the fallback") {
    // truncated mp4: moov claims bytes past the payload end
    val truncated = mp4Fixture.take(40)
    val (c1, w1, h1, _, _) = DecodeStub.probeVideo(truncated)
    assert(c1 == "unknown" && w1 >= 16 && h1 >= 16)
    // garbage bytes: deterministic fallback, twice the same
    val junk = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    assert(DecodeStub.probeVideo(junk) == DecodeStub.probeVideo(junk))
    // EBML magic followed by nonsense must not throw
    val badEbml = Array(0x1A, 0x45, 0xDF, 0xA3, 0xFF, 0x00).map(_.toByte)
    DecodeStub.probeVideo(badEbml)
  }

  test("probeVideoMeta: partition transform matches direct probe") {
    import spark.implicits._
    val recs = Seq(
      MediaRecord(1L, mp4Fixture, "video", "mp4"),
      MediaRecord(2L, webmFixture, "video", "webm"),
      MediaRecord(3L, Array.tabulate[Byte](32)(i => (i * 11).toByte), "video", "raw"))
    val out = Multimodal.probeVideoMeta(recs.toDS(), batchSize = 2)
      .collect().map(v => v.doc_id -> v).toMap
    assert(out(1L) == VideoMeta(1L, "mp4/isom", 640, 360, 5.0, 2))
    assert(out(2L) == VideoMeta(2L, "webm", 1280, 720, 2.5, 1))
    val (c, w, h, d, t) = DecodeStub.probeVideo(recs(2).payload)
    assert(out(3L) == VideoMeta(3L, c, w, h, d, t))
  }

  test("videoPerceptualHash: MP4 hashes the mdat media data, not the metadata") {
    val rnd = new scala.util.Random(7)
    val media = Array.fill[Byte](4096)(rnd.nextInt().toByte)
    val a = {
      val ftyp = mp4Box("ftyp", "isom".getBytes("ISO-8859-1") ++ new Array[Byte](8))
      val mvhd = mp4Box("mvhd", java.nio.ByteBuffer.allocate(24)
        .putInt(0).putInt(0).putInt(0).putInt(1000).putInt(5000).putInt(0).array)
      ftyp ++ mp4Box("moov", mvhd) ++ mp4Box("mdat", media)
    }
    // "re-muxed" twin: different brand, moov replaced by a free box of
    // different length — identical media data
    val b = {
      val ftyp = mp4Box("ftyp", "mp42".getBytes("ISO-8859-1") ++ new Array[Byte](8))
      val free = mp4Box("free", Array.fill[Byte](99)(0x55))
      ftyp ++ free ++ mp4Box("mdat", media)
    }
    assert(DecodeStub.videoPerceptualHash(a) == DecodeStub.videoPerceptualHash(b))
    // different media data → different signature
    val other = Array.fill[Byte](4096)(rnd.nextInt().toByte)
    val c = {
      val ftyp = mp4Box("ftyp", "isom".getBytes("ISO-8859-1") ++ new Array[Byte](8))
      ftyp ++ mp4Box("mdat", other)
    }
    assert(DecodeStub.videoPerceptualHash(a) != DecodeStub.videoPerceptualHash(c))
  }

  test("videoPerceptualHash: Matroska hashes from the first Cluster") {
    val rnd = new scala.util.Random(11)
    val media = Array.fill[Byte](100)(rnd.nextInt().toByte)
    val cluster = ebml(Array(0x1F, 0x43, 0xB6, 0x75), media)
    val a = webmFixture ++ cluster
    // different metadata ahead of the cluster (extra EBML void-ish
    // element in the header), identical cluster bytes
    val header2 = ebml(Array(0x1A, 0x45, 0xDF, 0xA3),
      ebml(Array(0x42, 0x82), "matroska".getBytes("ISO-8859-1")))
    val b = header2 ++ cluster
    assert(DecodeStub.videoPerceptualHash(a) == DecodeStub.videoPerceptualHash(b))
    val cluster2 = ebml(Array(0x1F, 0x43, 0xB6, 0x75),
      Array.fill[Byte](100)(rnd.nextInt().toByte))
    assert(DecodeStub.videoPerceptualHash(a) !=
      DecodeStub.videoPerceptualHash(webmFixture ++ cluster2))
  }

  test("videoPerceptualHash fallback: uniform byte shift invariance + fuzz") {
    // mean contour: adding a constant to every byte moves every window
    // mean alike — no comparison flips
    val p = Array.tabulate[Byte](997)(i => (i * 31 % 200).toByte)
    val shifted = p.map(b => (b + 10).toByte)
    assert(DecodeStub.videoPerceptualHash(p) ==
      DecodeStub.videoPerceptualHash(shifted))
    // fuzz: every size from 1 up, deterministic, never throws —
    // including crafted size fields that walk past the payload
    val rnd = new scala.util.Random(13)
    (1 to 300).foreach { n =>
      val q = Array.fill[Byte](n)(rnd.nextInt().toByte)
      assert(DecodeStub.videoPerceptualHash(q) ==
        DecodeStub.videoPerceptualHash(q.clone))
    }
    val evil = "____ftyp".getBytes("ISO-8859-1") ++
      Array.fill[Byte](24)(0x7F.toByte) // ftyp magic, nonsense sizes
    DecodeStub.videoPerceptualHash(evil)
    val badEbml = Array(0x1A, 0x45, 0xDF, 0xA3, 0x1F, 0x43).map(_.toByte)
    DecodeStub.videoPerceptualHash(badEbml)
  }

  test("videoPerceptualHashes: partition transform matches direct hash") {
    import spark.implicits._
    val recs = Seq(
      MediaRecord(1L, mp4Fixture ++ mp4Box("mdat",
        Array.tabulate[Byte](256)(i => (i * 7).toByte)), "video", "mp4"),
      MediaRecord(2L, webmFixture, "video", "webm"),
      MediaRecord(3L, Array.tabulate[Byte](32)(i => (i * 11).toByte), "video", "raw"))
    val out = Multimodal.videoPerceptualHashes(recs.toDS(), batchSize = 2)
      .collect().map(v => v.doc_id -> v.vhash).toMap
    recs.foreach { r =>
      assert(out(r.doc_id) == DecodeStub.videoPerceptualHash(r.payload))
    }
  }

  // ——— compressed-audio metadata fixtures ———

  /** MPEG-1 Layer III, 128 kbps, 44.1 kHz, stereo: ID3v2 (empty) +
    * frame header + 32-byte side info + optional Xing frame count. */
  private def mp3Fixture(xingFrames: Option[Int], pad: Int): Array[Byte] = {
    val id3 = "ID3".getBytes("ISO-8859-1") ++
      Array[Byte](4, 0, 0, 0, 0, 0, 0)
    val hdr = Array(0xFF, 0xFB, 0x90, 0x00).map(_.toByte)
    val side = new Array[Byte](32)
    val xing = xingFrames.map { n =>
      "Xing".getBytes("ISO-8859-1") ++
        java.nio.ByteBuffer.allocate(8).putInt(1).putInt(n).array
    }.getOrElse(Array.emptyByteArray)
    id3 ++ hdr ++ side ++ xing ++ new Array[Byte](pad)
  }

  /** FLAC: fLaC + STREAMINFO (44.1 kHz, 2 ch, 16 bps, 441000 samples
    * = 10.0 s). */
  private def flacFixture(pad: Int): Array[Byte] =
    "fLaC".getBytes("ISO-8859-1") ++
      Array(0x00, 0x00, 0x00, 0x22).map(_.toByte) ++      // type 0, len 34
      new Array[Byte](10) ++                               // blocksizes/framesizes
      Array(0x0A, 0xC4, 0x42, 0xF0).map(_.toByte) ++       // rate/ch/bps
      Array(0x00, 0x06, 0xBA, 0xA8).map(_.toByte) ++       // total samples
      new Array[Byte](16 + pad)                            // md5 + audio

  private def oggPage(headerType: Int, granule: Long,
      payload: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(27 + (if (payload.isEmpty) 0 else 1) +
      payload.length).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("OggS".getBytes("ISO-8859-1")).put(0.toByte)
      .put(headerType.toByte).putLong(granule)
      .putInt(7).putInt(0).putInt(0)
    if (payload.isEmpty) b.put(0.toByte)
    else b.put(1.toByte).put(payload.length.toByte).put(payload)
    b.array
  }

  /** Ogg Vorbis id header page (44.1 kHz stereo) + bare closing page
    * carrying the final granule (441000 samples = 10.0 s). */
  private def oggVorbisFixture: Array[Byte] = {
    val id = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(1.toByte).put("vorbis".getBytes("ISO-8859-1"))
      .putInt(0).put(2.toByte).putInt(44100).array
    oggPage(2, 0L, id) ++ oggPage(4, 441000L, Array.emptyByteArray)
  }

  /** Ogg Opus head page (2 ch, 312-sample pre-skip) + closing page at
    * 48 kHz granule 96312 → (96312 − 312)/48000 = 2.0 s. */
  private def oggOpusFixture: Array[Byte] = {
    val id = java.nio.ByteBuffer.allocate(20)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("OpusHead".getBytes("ISO-8859-1"))
      .put(1.toByte).put(2.toByte).putShort(312.toShort)
      .putInt(48000).put(0.toByte).putShort(0.toShort).put(0.toByte).array
    oggPage(2, 0L, id) ++ oggPage(4, 96312L, Array.emptyByteArray)
  }

  test("MP3 probe: Xing frame count gives exact VBR duration") {
    val p = mp3Fixture(Some(100), pad = 200)
    val (f, rate, ch, d, kbps) = DecodeStub.probeAudio(p)
    assert(f == "mp3" && rate == 44100 && ch == 2 && kbps == 128)
    assert(math.abs(d - 100.0 * 1152 / 44100) < 1e-12)
  }

  test("MP3 probe: no Xing tag falls back to the CBR estimate") {
    val p = mp3Fixture(None, pad = 400)
    val (f, rate, ch, d, kbps) = DecodeStub.probeAudio(p)
    assert(f == "mp3" && rate == 44100 && ch == 2 && kbps == 128)
    // audio bytes = payload minus the 10-byte ID3 tag
    assert(math.abs(d - (p.length - 10) * 8.0 / 128000) < 1e-12)
  }

  test("FLAC probe: STREAMINFO rate/channels/total-samples") {
    val p = flacFixture(pad = 1000)
    val (f, rate, ch, d, kbps) = DecodeStub.probeAudio(p)
    assert(f == "flac" && rate == 44100 && ch == 2)
    assert(math.abs(d - 10.0) < 1e-12)
    assert(kbps == math.round(p.length * 8 / 10.0 / 1000).toInt)
  }

  test("Ogg probes: vorbis and opus id headers + last-page granule") {
    val (fv, rv, cv, dv, _) = DecodeStub.probeAudio(oggVorbisFixture)
    assert(fv == "ogg-vorbis" && rv == 44100 && cv == 2)
    assert(math.abs(dv - 10.0) < 1e-12)
    val (fo, ro, co, dop, _) = DecodeStub.probeAudio(oggOpusFixture)
    assert(fo == "ogg-opus" && ro == 48000 && co == 2)
    assert(math.abs(dop - 2.0) < 1e-12)
  }

  test("audio probe: garbage/truncated payloads take the deterministic fallback") {
    val junk = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    val (f1, r1, c1, d1, k1) = DecodeStub.probeAudio(junk)
    assert(f1 == "unknown" && k1 == 0)
    assert(r1 == 8000 + ((junk(0) & 0xFF) % 8) * 1000)
    assert(c1 == 1 + ((junk(63) & 0xFF) % 2))
    assert(math.abs(d1 - 64.0 / r1) < 1e-12)
    // truncated FLAC magic, bad Ogg page, sync byte with bad layer —
    // none may throw
    DecodeStub.probeAudio("fLaC".getBytes("ISO-8859-1") ++ new Array[Byte](40))
    DecodeStub.probeAudio("OggS".getBytes("ISO-8859-1") ++ new Array[Byte](30))
    DecodeStub.probeAudio(Array(0xFF, 0xE6, 0x90, 0x00).map(_.toByte) ++
      new Array[Byte](16))
  }

  test("probeAudioMeta: partition transform matches direct probe") {
    import spark.implicits._
    val recs = Seq(
      MediaRecord(1L, mp3Fixture(Some(100), 200), "audio", "mp3"),
      MediaRecord(2L, flacFixture(500), "audio", "flac"),
      MediaRecord(3L, oggOpusFixture, "audio", "ogg"),
      MediaRecord(4L, Array.tabulate[Byte](32)(i => (i * 11).toByte), "audio", "raw"))
    val out = Multimodal.probeAudioMeta(recs.toDS(), batchSize = 2)
      .collect().map(v => v.doc_id -> v).toMap
    for (r <- recs) {
      val (f, rate, ch, d, kbps) = DecodeStub.probeAudio(r.payload)
      assert(out(r.doc_id) == AudioMeta(r.doc_id, f, rate, ch, d, kbps))
    }
    assert(out(1L).format == "mp3" && out(2L).format == "flac" &&
      out(3L).format == "ogg-opus" && out(4L).format == "unknown")
  }

  test("probe fuzz: random bytes, truncations, and magic-prefixed garbage never throw") {
    val rnd = new scala.util.Random(1234)
    val magics = Seq(
      "OggS", "fLaC", "ID3", "RIFF", "FORM", ".snd", "ftyp", "OpusHead")
    val fixtures = Seq(mp4Fixture, webmFixture, mp3Fixture(Some(10), 50),
      flacFixture(100), oggVorbisFixture, oggOpusFixture)
    val payloads =
      // pure random
      (1 to 60).map(_ => Array.fill(1 + rnd.nextInt(200))(rnd.nextInt.toByte)) ++
      // random with a real magic spliced at the front
      (1 to 40).map { _ =>
        val m = magics(rnd.nextInt(magics.size)).getBytes("ISO-8859-1")
        m ++ Array.fill(rnd.nextInt(64))(rnd.nextInt.toByte)
      } ++
      // every truncation point of every valid fixture
      fixtures.flatMap(f => (1 until f.length by 7).map(f.take))
    payloads.foreach { p =>
      val a1 = DecodeStub.probeAudio(p)
      val v1 = DecodeStub.probeVideo(p)
      val d1 = DecodeStub.decode(p)
      val au1 = DecodeStub.decodeAudio(p)
      // deterministic: identical on re-evaluation
      assert(DecodeStub.probeAudio(p) == a1)
      assert(DecodeStub.probeVideo(p) == v1)
      assert(DecodeStub.decode(p)._1 == d1._1)
      assert(DecodeStub.decodeAudio(p)._1 == au1._1)
      // sane ranges whatever the bytes
      assert(a1._2 >= 0 && a1._3 >= 0 && !a1._4.isNaN && a1._4 >= 0)
      assert(v1._2 >= 0 && v1._3 >= 0 && v1._4 >= 0)
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

  test("size-hint repartition: outlier placement is EXACT at spec " +
      "scale — one LPT outlier per partition, spread ≤ 1.2×") {
    val s = spark
    import s.implicits._
    // 2000 ~1KB rows + 8 200KB outliers over 8 partitions: target =
    // (2MB + 1.6MB)/8 ≈ 450KB, threshold ≈ 56KB → exactly the 8 big
    // rows qualify; LPT must land ONE per bin and the murmur3-preimage
    // exchange must place each bin exactly (the range-sampler jitter
    // the stress harness measured at 1.4–1.9× would break this)
    val rows = (0L until 2000L).map(i => (i, new Array[Byte](1024))) ++
      (9000L until 9008L).map(i => (i, new Array[Byte](200 * 1024)))
    val df = rows.toDF("doc_id", "payload")
      .withColumn("sz", octet_length(col("payload")).cast("long"))
      .repartition(5)
    val parts = 8
    val sized = Multimodal.repartitionBySizeHint(df, parts, "sz")
    val per = sized.groupBy(spark_partition_id().as("pid"))
      .agg(sum("sz").as("bytes"),
        sum(when(col("sz") >= 200L * 1024, 1L).otherwise(0L)).as("big"))
      .collect()
    assert(per.length == parts, s"expected $parts partitions, got ${per.length}")
    assert(per.forall(_.getLong(2) == 1L),
      s"exactly one outlier per partition, got ${per.map(_.getLong(2)).toSeq}")
    val bytes = per.map(_.getLong(1))
    val mean = bytes.sum.toDouble / parts
    assert(bytes.max <= mean * 1.2,
      s"spread ${bytes.max / mean} over ${bytes.mkString(",")}")
  }

  test("size-hint repartition: id contract enforced on outliers " +
      "(duplicate/null ids rejected); user __bin column survives " +
      "(ADVICE r13)") {
    val s = spark
    import s.implicits._
    // duplicate id among outlier-sized rows → the bin join would
    // multiply rows; must fail loudly instead
    val dup = (Seq((1L, 500000L), (1L, 400000L)) ++
        (0L until 50L).map(i => (100L + i, 10L)))
      .toDF("doc_id", "sz")
    intercept[IllegalArgumentException] {
      Multimodal.repartitionBySizeHint(dup, 4, "sz").count()
    }
    // null id among outliers → never joins its bin; must fail loudly
    val withNull = dup.withColumn("doc_id",
      when(col("doc_id") === 1L && col("sz") === 500000L,
        lit(null).cast("long")).otherwise(col("doc_id")))
      .withColumn("sz", when(col("sz") === 400000L, lit(10L))
        .otherwise(col("sz")))
    intercept[IllegalArgumentException] {
      Multimodal.repartitionBySizeHint(withNull, 4, "sz").count()
    }
    // a user column literally named __bin must pass through untouched
    // (the temp names are collision-avoided, not reserved)
    val clash = (Seq((1L, 500000L)) ++ (0L until 50L).map(i =>
        (100L + i, 10L)))
      .toDF("doc_id", "sz").withColumn("__bin", col("doc_id") * 2)
    val out = Multimodal.repartitionBySizeHint(clash, 4, "sz")
    assert(out.columns.contains("__bin"))
    assert(out.filter(col("__bin") =!= col("doc_id") * 2).count() == 0)
    assert(out.count() == 51)
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
