package graft

import graft.pipeline.Schedules
import graft.validation.Validator
import graft.core.{Severity, ValidationIssue}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants for the driver-side (non-Spark) logic.
  * Plain ScalaCheck generators with fixed seeds (the scalatest bridge
  * artifact is not in the offline cache). */
class PropertySpec extends AnyFunSuite {

  private def forSamples[T](gen: Gen[T], n: Int = 200)(f: T => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(42L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 20) {
      gen.apply(params, seed) match {
        case Some(v) => f(v); produced += 1
        case None =>
      }
      seed = seed.next
      attempts += 1
    }
    assert(produced == n, s"generator too sparse: $produced/$n")
  }

  test("interval parser: value/unit round-trip for all valid forms") {
    val gen = for {
      v <- Gen.choose(1, 10000)
      (u, secs) <- Gen.oneOf(("s", 1L), ("m", 60L), ("h", 3600L), ("d", 86400L))
    } yield (s"$v$u", v * secs)
    forSamples(gen) { case (str, expected) =>
      assert(Schedules.parseInterval(str).getSeconds == expected)
    }
  }

  test("quality score: bounded to [0,1], monotone in violation count") {
    val issueGen = for {
      sev <- Gen.oneOf(Severity.Error, Severity.Warning, Severity.Info)
      n <- Gen.choose(0L, 1000L)
    } yield ValidationIssue("r", "c", sev, n, "")
    val gen = for {
      rows <- Gen.choose(1L, 10000L)
      cols <- Gen.choose(1, 20)
      issues <- Gen.listOfN(5, issueGen)
    } yield (rows, cols, issues)
    forSamples(gen) { case (rows, cols, issues) =>
      val s = Validator.qualityScore(rows, cols, issues)
      assert(s >= 0.0 && s <= 1.0)
      val worse = Validator.qualityScore(rows, cols,
        issues :+ ValidationIssue("x", "c", Severity.Error, rows, ""))
      assert(worse <= s + 1e-9)
    }
  }

  test("cron: nextCron always yields a matching minute strictly after from") {
    val fieldGen = Gen.oneOf("*", "*/5", "0", "1-10", "0,30")
    val gen = for {
      m <- fieldGen
      h <- Gen.oneOf("*", "*/2", "9-17")
      s <- Gen.choose(0L, 4102444800L)
    } yield (s"$m $h * * *",
      java.time.LocalDateTime.ofEpochSecond(s - s % 60, 0,
        java.time.ZoneOffset.UTC))
    forSamples(gen, n = 100) { case (expr, from) =>
      Schedules.nextCron(expr, from).foreach { next =>
        assert(next.isAfter(from))
        assert(Schedules.cronMatches(expr, next))
      }
    }
  }

  test("simhash: deterministic; one appended token moves few bits") {
    import org.apache.spark.unsafe.types.UTF8String
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    val docGen = Gen.listOfN(30, word).map(_.mkString(" "))
    forSamples(docGen, n = 50) { d =>
      val h1 = graft.functions.NativeTextImpl.simhash64(UTF8String.fromString(d))
      val h2 = graft.functions.NativeTextImpl.simhash64(UTF8String.fromString(d))
      assert(h1 == h2)
    }
    val pairGen = for { d <- docGen; w <- word } yield (d, w)
    forSamples(pairGen, n = 50) { case (d, w) =>
      val base = graft.functions.NativeTextImpl.simhash64(UTF8String.fromString(d))
      val tweaked = graft.functions.NativeTextImpl
        .simhash64(UTF8String.fromString(d + " " + w))
      assert(java.lang.Long.bitCount(base ^ tweaked) <= 24)
    }
  }

  test("shingles: count bound and n-token width") {
    import org.apache.spark.unsafe.types.UTF8String
    val word = Gen.oneOf("a", "b", "c", "d", "e", "f")
    val gen = for {
      words <- Gen.listOf(word)
      n <- Gen.choose(1, 5)
    } yield (words, n)
    forSamples(gen) { case (words, n) =>
      val text = words.mkString(" ")
      val arr = graft.functions.NativeTextImpl
        .shingles(UTF8String.fromString(text), n)
      val toks = graft.functions.NativeTextImpl
        .tokenize(UTF8String.fromString(text))
      if (toks.length < n) assert(arr.numElements() == 0)
      else {
        assert(arr.numElements() <= toks.length - n + 1)
        (0 until arr.numElements()).foreach { i =>
          assert(arr.getUTF8String(i).toString.split(" ", -1).length == n)
        }
      }
    }
  }

  test("config deep-merge: override wins, base-only keys survive") {
    import graft.pipeline.ConfigMerge
    val scalarGen = Gen.oneOf[Any](Gen.alphaStr, Gen.choose(0, 99), Gen.oneOf(true, false))
    val mapGen: Gen[Map[String, Any]] = Gen.mapOf(
      Gen.zip(Gen.oneOf("a", "b", "c", "d"), scalarGen))
    val gen = Gen.zip(mapGen, mapGen)
    forSamples(gen) { case (base, over) =>
      val merged = ConfigMerge.deepMerge(base, over)
      over.foreach { case (k, v) => assert(merged(k) == v) }
      (base.keySet -- over.keySet).foreach(k => assert(merged(k) == base(k)))
    }
  }

  test("video hash: mean-contour invariant under uniform byte shift (fallback path)") {
    import graft.multimodal.DecodeStub
    val gen = Gen.zip(
      Gen.choose(1, 2000).flatMap(n =>
        Gen.listOfN(n, Gen.choose(0, 199)).map(_.map(_.toByte).toArray)),
      Gen.choose(1, 55))
    forSamples(gen, n = 60) { case (payload, shift) =>
      // avoid container magic so the whole-payload fallback is taken
      if (payload.length >= 16) payload(4) = 'x'.toByte
      val shifted = payload.map(b => (b + shift).toByte)
      assert(DecodeStub.videoPerceptualHash(payload) ==
        DecodeStub.videoPerceptualHash(shifted),
        s"shift $shift moved the contour (len ${payload.length})")
    }
  }

  test("video hash: MP4 signature depends only on the mdat media data") {
    import graft.multimodal.DecodeStub
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length)
      b.put(typ.getBytes("ISO-8859-1")); b.put(payload); b.array
    }
    val gen = Gen.zip(
      Gen.choose(8, 1500).flatMap(n =>
        Gen.listOfN(n, Gen.choose(-128, 127)).map(_.map(_.toByte).toArray)),
      Gen.choose(0, 200))
    forSamples(gen, n = 60) { case (media, metaLen) =>
      val ftypA = box("ftyp", "isom".getBytes("ISO-8859-1") ++ new Array[Byte](8))
      val ftypB = box("ftyp", "mp42".getBytes("ISO-8859-1") ++ new Array[Byte](8))
      val a = ftypA ++ box("mdat", media)
      // arbitrary-length metadata box ahead of the same media data
      val b = ftypB ++ box("free", Array.fill[Byte](metaLen)(0x5A)) ++
        box("mdat", media)
      assert(DecodeStub.videoPerceptualHash(a) ==
        DecodeStub.videoPerceptualHash(b),
        s"metadata (len $metaLen) leaked into the content signature")
    }
  }

  test("NFC normalization: idempotent, JDK-exact, on combining-mark soup") {
    import org.apache.spark.unsafe.types.UTF8String
    val piece = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("e\u0301", "A\u030A", "\u212B", "o\u0308",
        "n\u0303", "\u00e9", "\u00c5", "cafe\u0301", " "))
    val gen = Gen.listOfN(8, piece).map(_.mkString)
    forSamples(gen) { s =>
      val once = graft.functions.NativeTextImpl
        .nfcNormalize(UTF8String.fromString(s)).toString
      // matches the JDK reference (the DuckDB oracle implements the
      // same UAX #15) and is a fixpoint
      assert(once == java.text.Normalizer.normalize(s,
        java.text.Normalizer.Form.NFC))
      assert(graft.functions.NativeTextImpl
        .nfcNormalize(UTF8String.fromString(once)).toString == once)
    }
  }

  test("LCS: symmetry, bounds, identity, append-monotonicity") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def arr(xs: Seq[String]) =
      new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
    def lcs(a: Seq[String], b: Seq[String]): Long =
      graft.functions.NativeTextImpl.lcsLength(arr(a), arr(b))
    val tok = Gen.oneOf("a", "b", "c", "d")
    val gen = for {
      n <- Gen.choose(0, 10); m <- Gen.choose(0, 10); k <- Gen.choose(0, 4)
      a <- Gen.listOfN(n, tok); b <- Gen.listOfN(m, tok)
      c <- Gen.listOfN(k, tok)
    } yield (a, b, c)
    forSamples(gen) { case (a, b, c) =>
      assert(lcs(a, b) == lcs(b, a))                    // symmetric
      assert(lcs(a, b) <= math.min(a.length, b.length)) // bounded
      assert(lcs(a, a) == a.length)                     // identity
      assert(lcs(a, b ++ c) >= lcs(a, b))               // append-monotone
      assert(lcs(a ++ c, b ++ c) >= lcs(a, b))          // never decreases
    }
  }
}
