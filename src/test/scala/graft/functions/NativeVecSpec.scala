package graft.functions

import graft.SparkSpec
import graft.similarity.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NativeVecSpec extends AnyFunSuite with SparkSpec {

  test("native quantize ≡ Column-reference transform over real " +
      "embeddings and adversarial doubles") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cmp = emb.select(
      Similarity.quantize(col("embedding")).as("native"),
      Similarity.quantizeReference(col("embedding")).as("ref"))
    assert(cmp.filter(col("native") =!= col("ref")).count() == 0)
    // adversarial: NaN, ±Inf, signed zero, null elements, null array,
    // exact-boundary values whose ·10⁴ product sits on an integer —
    // both spellings must floor the SAME IEEE double product
    val adv: Seq[Option[Seq[Option[Double]]]] = Seq(
      Some(Seq(Some(0.12345), Some(-0.12345), Some(1.00005), Some(-0.0),
        Some(0.0), Some(Double.NaN), Some(Double.PositiveInfinity),
        Some(Double.NegativeInfinity), None, Some(1e300), Some(-1e300),
        Some(4.9e-324), Some(0.0001), Some(-0.0001))),
      Some(Seq.empty[Option[Double]]),
      None)
    val advDf = adv.toDF("v")
    val advCmp = advDf.select(
      Similarity.quantize(col("v")).as("native"),
      Similarity.quantizeReference(col("v")).as("ref"))
    val bad = advCmp.filter(
      (col("native").isNull =!= col("ref").isNull) ||
        (col("native").isNotNull && (col("native") =!= col("ref"))))
    assert(bad.count() == 0, bad.collect().mkString("\n"))
    // float path: the float→double widening happens BEFORE the
    // multiply in both spellings
    val f = Seq(Seq(0.1f, -0.1f, 1.5f, Float.NaN)).toDF("v")
    val fCmp = f.select(
      Similarity.quantize(col("v")).as("native"),
      Similarity.quantizeReference(col("v")).as("ref"))
    assert(fCmp.filter(col("native") =!= col("ref")).count() == 0)
    // and it is NOT CodegenFallback, unlike the HOF it replaces
    val cf = classOf[org.apache.spark.sql.catalyst.expressions
      .codegen.CodegenFallback]
    assert(!cf.isAssignableFrom(classOf[QuantizeExpr]))
    assert(cf.isAssignableFrom(
      classOf[org.apache.spark.sql.catalyst.expressions.ArrayTransform]))
  }

  test("native dotQ ≡ Column-reference dotQ over real embeddings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.select(Similarity.quantize(col("embedding")).as("q"))
    val cmp = q.select(
      Similarity.dotQ(col("q"), col("q")).as("native"),
      Similarity.dotQReference(col("q"), col("q")).as("ref"))
    assert(cmp.filter(col("native") =!= col("ref")).count() == 0)
  }

  test("dotQ known values and null propagation") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
    assert(df.select(graft.functions.NativeVec.dotQ(col("a"), col("b")))
      .head().getLong(0) == 32L)
    val n = Seq((Option.empty[Seq[Long]], Option(Seq(1L)))).toDF("a", "b")
      .select(NativeVec.dotQ(col("a"), col("b"))).head()
    assert(n.isNullAt(0))
  }

  test("native nearestCentroidsQ ≡ Column reference: real embeddings, " +
      "random centroids, ties, every nProbe") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(Similarity.quantize(col("embedding")).as("q"))
      .localCheckpoint()
    val rng = new scala.util.Random(5)
    val dim = emb.select(size(col("q"))).head().getInt(0)
    val cents = Seq.tabulate(9)(i =>
      Seq.tabulate(dim)(d => (rng.nextInt(2000001) - 1000000).toLong))
    for (nProbe <- Seq(1, 3, 9)) {
      val cmp = emb.select(
        Similarity.nearestCentroidsQ(col("q"), cents, nProbe).as("native"),
        Similarity.nearestCentroidsQReference(col("q"), cents, nProbe)
          .as("ref"))
      assert(cmp.filter(col("native") =!= col("ref")).count() == 0,
        s"nProbe=$nProbe parity")
    }
    // exact ties: duplicated centroids must rank lower-index-first in
    // BOTH formulations
    val tied = Seq(Seq(10L, 0L), Seq(0L, 10L), Seq(10L, 0L), Seq(0L, 10L))
    val v = Seq(Tuple1(Seq(10L, 0L))).toDF("q")
    val got = v.select(
        Similarity.nearestCentroidsQ(col("q"), tied, 4).as("native"),
        Similarity.nearestCentroidsQReference(col("q"), tied, 4).as("ref"))
      .head()
    assert(got.getSeq[Int](0) == Seq(0, 2, 1, 3))
    assert(got.getSeq[Int](0) == got.getSeq[Int](1))
    // a 128-centroid codebook stays inside ONE compiled call (the
    // Column spelling trips janino's method limit there and falls back
    // to interpreted eval — the reason the native expression exists)
    val big = Seq.tabulate(128)(i =>
      Seq.tabulate(dim)(d => (rng.nextInt(2000001) - 1000000).toLong))
    val bigCmp = emb.limit(200).select(
      Similarity.nearestCentroidsQ(col("q"), big, 4).as("native"),
      Similarity.nearestCentroidsQReference(col("q"), big, 4).as("ref"))
    assert(bigCmp.filter(col("native") =!= col("ref")).count() == 0)
  }

  test("native nearestCentroids (FLOAT twin) ≡ Column reference: real " +
      "float embeddings, ties, NaN/±Inf vectors, every nProbe, k=128") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("embedding")).localCheckpoint()
    val rng = new scala.util.Random(11)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val cents = Seq.tabulate(9)(_ =>
      Seq.tabulate(dim)(_ => rng.nextGaussian()))
    for (nProbe <- Seq(1, 3, 9)) {
      val cmp = emb.select(
        Similarity.nearestCentroids(col("embedding"), cents, nProbe)
          .as("native"),
        Similarity.nearestCentroidsReference(col("embedding"), cents,
          nProbe).as("ref"))
      assert(cmp.filter(col("native") =!= col("ref")).count() == 0,
        s"nProbe=$nProbe float parity")
    }
    // adversarial DOUBLE vectors: NaN / ±Inf elements produce NaN/±Inf
    // distances — ordering must match array_sort's total order (NaN
    // last) in both spellings; duplicate centroids tie lower-index-first
    val tied = Seq(Seq(10.0, 0.0), Seq(0.0, 10.0), Seq(10.0, 0.0))
    val adv = Seq(
      Seq(10.0, 0.0),
      Seq(Double.NaN, 1.0),
      Seq(Double.PositiveInfinity, -1.0),
      Seq(Double.NegativeInfinity, 0.5),
      Seq(-0.0, 0.0)).map(Tuple1(_)).toDF("v")
    for (nProbe <- Seq(1, 2, 3)) {
      val cmp = adv.select(
        Similarity.nearestCentroids(col("v"), tied, nProbe).as("native"),
        Similarity.nearestCentroidsReference(col("v"), tied, nProbe)
          .as("ref"))
      assert(cmp.filter(col("native") =!= col("ref")).count() == 0,
        s"adversarial nProbe=$nProbe")
    }
    // 128 centroids: one compiled call where the Column spelling falls
    // out of codegen
    val big = Seq.tabulate(128)(_ =>
      Seq.tabulate(dim)(_ => rng.nextGaussian() * 100))
    val bigCmp = emb.limit(200).select(
      Similarity.nearestCentroids(col("embedding"), big, 4).as("native"),
      Similarity.nearestCentroidsReference(col("embedding"), big, 4)
        .as("ref"))
    assert(bigCmp.filter(col("native") =!= col("ref")).count() == 0)
  }

  test("native hyperplaneBucket ≡ Column reference on real embeddings; " +
      "NaN dot sets the bit (Spark's NaN > 0 is TRUE)") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("embedding")).localCheckpoint()
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val planes = graft.similarity.Similarity.hyperplanes(8, dim)
    val cmp = emb.select(
      Similarity.hyperplaneBucket(col("embedding"), planes).as("native"),
      Similarity.hyperplaneBucketReference(col("embedding"), planes)
        .as("ref"))
    assert(cmp.filter(col("native") =!= col("ref")).count() == 0)
    // NaN element → NaN dot → Spark's `dot > 0.0` is TRUE (NaN ranks
    // above every double) — the Java-semantics trap the native expr
    // must NOT fall into
    val nanV = Seq(Tuple1(Seq(Double.NaN, 1.0))).toDF("v")
    val p2 = Seq(Seq(1.0, 0.0), Seq(0.0, -1.0))
    val got = nanV.select(
      Similarity.hyperplaneBucket(col("v"), p2).as("native"),
      Similarity.hyperplaneBucketReference(col("v"), p2).as("ref")).head()
    assert(got.getLong(0) == got.getLong(1))
    assert(got.getLong(0) == 3L, "both NaN dots must set their bits")
  }

  test("nearestCentroids / hyperplaneBucket degenerate inputs ≡ Column " +
      "reference: null elements and length mismatches (ADVICE r13)") {
    // a null element (or any length mismatch) nulls the reference's
    // aggregate(zip_with) fold: every distance is null, the null-dist
    // structs tie, array_sort falls through to the index field —
    // centroids chosen so prefix-dot ranking would DIFFER from index
    // order, catching a shorter-prefix shortcut
    val cents = Seq(Seq(-1.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0))
    val vals: Seq[Option[Seq[Option[Double]]]] = Seq(
      Some(Seq(None, Some(2.0))),             // null element
      Some(Seq(Some(2.0))),                   // shorter than dim
      Some(Seq(Some(2.0), Some(0.0), Some(1.0))), // longer than dim
      Some(Seq(Some(2.0), Some(0.5))),        // conforming control
      Some(Seq.empty),                        // empty
      None)                                   // null array
    import spark.implicits._
    val df = vals.toDF("v")
    for (nProbe <- Seq(1, 2, 3)) {
      val cmp = df.select(
        Similarity.nearestCentroids(col("v"), cents, nProbe).as("native"),
        Similarity.nearestCentroidsReference(col("v"), cents, nProbe)
          .as("ref"))
      val bad = cmp.filter(
        (col("native").isNull =!= col("ref").isNull) ||
          (col("native").isNotNull && (col("native") =!= col("ref"))))
      assert(bad.count() == 0,
        s"nProbe=$nProbe: " + bad.collect().mkString("\n"))
    }
    // the degenerate result IS indices 0..nProbe−1 (what the all-null
    // tie sorts to), not garbage from reading null slots as 0
    assert(df.limit(1).select(
      Similarity.nearestCentroids(col("v"), cents, 2)).head()
      .getSeq[Int](0) == Seq(0, 1))
    // hyperplane: null dot → when(null > 0) → otherwise(0) → bucket 0
    val planes = Seq(Seq(1.0, 1.0), Seq(-1.0, 2.0))
    val hcmp = df.select(
      Similarity.hyperplaneBucket(col("v"), planes).as("native"),
      Similarity.hyperplaneBucketReference(col("v"), planes).as("ref"))
    val hbad = hcmp.filter(
      (col("native").isNull =!= col("ref").isNull) ||
        (col("native").isNotNull && (col("native") =!= col("ref"))))
    assert(hbad.count() == 0, hbad.collect().mkString("\n"))
    assert(df.limit(1).select(
      Similarity.hyperplaneBucket(col("v"), planes)).head().getLong(0) == 0L)
    // the Q (integer) twin: a NULL input array also ties to the index
    // order in the reference (null dotQ → null distance field)
    val qdf = Seq(Option.empty[Seq[Long]], Some(Seq(7L, -3L))).toDF("q")
    val qcents = Seq(Seq(-1L, 0L), Seq(1L, 0L), Seq(0L, 1L))
    val qcmp = qdf.select(
      Similarity.nearestCentroidsQ(col("q"), qcents, 2).as("native"),
      Similarity.nearestCentroidsQReference(col("q"), qcents, 2).as("ref"))
    val qbad = qcmp.filter(
      (col("native").isNull =!= col("ref").isNull) ||
        (col("native").isNotNull && (col("native") =!= col("ref"))))
    assert(qbad.count() == 0, qbad.collect().mkString("\n"))
  }

  test("native abttCorrect ≡ Column reference: real corpus end to end, " +
      "null/mismatch fixtures, overflow raises; plan is fallback-free") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val native = Similarity.removeTopComponent(emb, "vec_id", "embedding")
    val ref = Similarity.removeTopComponentReference(emb, "vec_id", "embedding")
    assert(native.schema("corrected").dataType ==
      ref.schema("corrected").dataType)
    assert(native.exceptAll(ref).isEmpty && ref.exceptAll(native).isEmpty)
    assert(graft.PlanProbe.codegenFallbacks(native).isEmpty,
      graft.PlanProbe.codegenFallbacks(native).mkString(", "))

    // expression-level fixtures against the literal zip_with spelling
    val v = Seq(3L, -2L, 5L)
    val vv = v.map(x => x * x).sum
    val vArr = array(v.map(lit): _*)
    def refCols(q: org.apache.spark.sql.Column) = {
      val qv = aggregate(zip_with(q, vArr, (a, b) => a * b),
        lit(0L), (acc, x) => acc + x)
      zip_with(q, vArr, (qi, vi) => qi * lit(vv) - qv * vi)
    }
    val fixtures: Seq[Option[Seq[Option[Long]]]] = Seq(
      Some(Seq(Some(10L), Some(20L), Some(-7L))), // conforming
      Some(Seq(Some(10L), None, Some(-7L))),      // null element
      Some(Seq(Some(10L), Some(20L))),            // shorter than dim
      Some(Seq(Some(1L), Some(2L), Some(3L), Some(4L))), // longer
      Some(Seq.empty),
      None)
    val fdf = fixtures.toDF("q")
    val cmp = fdf.select(
      graft.functions.NativeVec.abttCorrect(col("q"), v, vv).as("native"),
      refCols(col("q")).as("ref"))
    val bad = cmp.filter(
      (col("native").isNull =!= col("ref").isNull) ||
        (col("native").isNotNull && !(col("native") <=> col("ref"))))
    assert(bad.count() == 0, bad.collect().mkString("\n"))
    // overflow raises (Math.*Exact ≙ the reference's ANSI arithmetic)
    val big = Seq(Tuple1(Seq(3000000000000000000L, 0L, 0L))).toDF("q")
    intercept[Throwable] {
      big.select(graft.functions.NativeVec.abttCorrect(col("q"), v, vv))
        .collect()
    }
  }

  test("native decDotQ ≡ Column reference: real corpus (quantized × " +
      "label sums), adversarial fixtures, overflow raises in both") {
    import spark.implicits._
    // real shape: corpus quantized vectors against their label-sum
    // vectors — the per-row scan of centroidCosine
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cc = Similarity.centroidCosine(emb, "vec_id", "embedding", "label")
    assert(graft.PlanProbe.codegenFallbacks(cc)
      .filterNot(Set("CollectList", "ArrayTransform", "ArraySort",
        "LambdaFunction", "NamedLambdaVariable")).isEmpty,
      graft.PlanProbe.codegenFallbacks(cc).mkString(", "))
    val q = emb.select(Similarity.quantize(col("embedding")).as("q"))
      .limit(500)
    val cmp = q.select(
      graft.functions.NativeVec.decDotQ(col("q"), col("q")).as("native"),
      Similarity.decDotReference(col("q"), col("q")).as("ref"))
    assert(cmp.filter(!(col("native") <=> col("ref"))).count() == 0)
    // fixtures: big magnitudes (near the long·long product bound),
    // negatives, null element, length mismatch, empty, null array
    val fx: Seq[(Option[Seq[Option[Long]]], Option[Seq[Option[Long]]])] = Seq(
      (Some(Seq(Some(3000000000L), Some(-9223372036854L))),
        Some(Seq(Some(3000000000L), Some(9223372036854L)))),
      (Some(Seq(Some(Long.MaxValue), Some(Long.MinValue))),
        Some(Seq(Some(Long.MaxValue), Some(Long.MaxValue)))),
      (Some(Seq(Some(1L), None)), Some(Seq(Some(1L), Some(2L)))),
      (Some(Seq(Some(1L))), Some(Seq(Some(1L), Some(2L)))),
      (Some(Seq.empty), Some(Seq.empty)),
      (None, Some(Seq(Some(1L)))))
    val fdf = fx.toDF("a", "b")
    val fcmp = fdf.select(
      graft.functions.NativeVec.decDotQ(col("a"), col("b")).as("native"),
      Similarity.decDotReference(col("a"), col("b")).as("ref"))
    val bad = fcmp.filter(!(col("native") <=> col("ref")))
    assert(bad.count() == 0, bad.collect().mkString("\n"))
    // a sum that crosses 10^38 raises in BOTH spellings (ANSI decimal)
    val over = Seq((Seq.fill(3)(Long.MaxValue), Seq.fill(3)(Long.MaxValue)))
      .toDF("a", "b")
    intercept[Throwable] {
      over.select(graft.functions.NativeVec.decDotQ(col("a"), col("b")))
        .collect()
    }
    intercept[Throwable] {
      over.select(Similarity.decDotReference(col("a"), col("b"))).collect()
    }
  }

  test("decDotQ stays CODEGEN with non-nullable children (the " +
      "sim_semdedup __csq projection): decDot can return null even for " +
      "non-null inputs, so nullable must be overridden true — pre-fix, " +
      "janino failed on an undeclared isNull and the stage silently " +
      "interpreted") {
    // the exact plan shape from the bench failure: collect_list output
    // (non-nullable) re-packed, then decDotQ(sv, sv)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val csq = emb
        .select(col("label"),
          posexplode(Similarity.quantize(col("embedding")))
            .as(Seq("pos", "q")))
        .groupBy(col("label"), col("pos"))
        .agg(org.apache.spark.sql.functions.sum(col("q")).as("s"))
        .groupBy(col("label"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("s")))),
          x => x("s")).as("sv"))
        .select(graft.functions.NativeVec.decDotQ(col("sv"), col("sv"))
          .as("csq"))
      csq.collect() // fallback=false: a janino failure THROWS here
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("native ngramWindows copies null tokens through like the " +
      "reference's element_at (ADVICE r13)") {
    import spark.implicits._
    val toks: Seq[Seq[Option[Long]]] =
      Seq(Seq(Some(1L), None, Some(3L), Some(4L)))
    val df = toks.toDF("t")
    val got = df.select(
      graft.functions.NativeVec.ngramWindows(col("t"), 2)).head()
      .getSeq[Seq[Any]](0)
    assert(got == Seq(Seq(1L, null), Seq(null, 3L), Seq(3L, 4L)))
    // null-free input keeps its null-free inner schema
    val clean = Seq(Seq(1L, 2L)).toDF("t")
      .select(graft.functions.NativeVec.ngramWindows(col("t"), 2))
    val at = clean.schema.head.dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
    assert(!at.elementType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)
  }

  test("native int8 codec ≡ Column reference: real corpus, adversarial " +
      "fixtures, NaN raises in both; plans are fallback-free") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val native = Similarity.compressInt8(emb, "embedding")
    val ref = Similarity.compressInt8Reference(emb, "embedding")
    assert(native.schema("embedding_scale").dataType ==
      ref.schema("embedding_scale").dataType) // double, as the analyzer widens
    assert(native.exceptAll(ref).isEmpty && ref.exceptAll(native).isEmpty)
    assert(graft.PlanProbe.codegenFallbacks(native).isEmpty,
      graft.PlanProbe.codegenFallbacks(native).mkString(", "))
    val back = Similarity.decompressInt8(native, "embedding")
    val backRef = Similarity.decompressInt8Reference(ref, "embedding")
    assert(back.exceptAll(backRef).isEmpty && backRef.exceptAll(back).isEmpty)
    assert(graft.PlanProbe.codegenFallbacks(back).isEmpty)

    // adversarial: null elements (skipped by the scale fold, null
    // codes), all-zero (scale 0 → zero codes, even in null slots),
    // empty array, null array
    val adv: Seq[(Long, Option[Seq[Option[Float]]])] = Seq(
      (1L, Some(Seq(Some(0.5f), None, Some(-1.5f)))),
      (2L, Some(Seq(Some(0.0f), Some(-0.0f)))),
      (3L, Some(Seq(Some(0.0f), None))),
      (4L, Some(Seq.empty)),
      (5L, None))
    val advDf = adv.toDF("vec_id", "embedding")
    val an = Similarity.compressInt8(advDf, "embedding")
    val ar = Similarity.compressInt8Reference(advDf, "embedding")
    val j = an.as("n").join(ar.as("r"), "vec_id")
    val abad = j.filter(
      !(col("n.embedding_i8") <=> col("r.embedding_i8")) ||
        !(col("n.embedding_scale") <=> col("r.embedding_scale")))
    assert(abad.count() == 0, abad.collect().mkString("\n"))
    val dn = Similarity.decompressInt8(an, "embedding")
    val dr = Similarity.decompressInt8Reference(ar, "embedding")
    val dbad = dn.as("n").join(dr.as("r"), "vec_id")
      .filter(!(col("n.embedding") <=> col("r.embedding")))
    assert(dbad.count() == 0, dbad.collect().mkString("\n"))

    // exact half-way boundaries (scale engineered to 1.0, so the
    // quotients are EXACTLY ±0.5, ±1.5, ±2.5): HALF_UP must round away
    // from zero in both spellings — the class the compiled
    // floor+correction round must not misround
    val half = Seq((1L, Seq(127.0f, 0.5f, -0.5f, 1.5f, 2.5f, -2.5f, -127.0f)))
      .toDF("vec_id", "embedding")
    val hn = Similarity.compressInt8(half, "embedding")
      .select(col("embedding_i8")).head().getSeq[Byte](0)
    val hr = Similarity.compressInt8Reference(half, "embedding")
      .select(col("embedding_i8")).head().getSeq[Byte](0)
    assert(hn == hr, s"native $hn vs reference $hr")
    assert(hn == Seq[Byte](127, 1, -1, 2, 3, -3, -127))

    // a NaN element pins the scale to NaN and BOTH spellings raise on
    // the NaN→byte cast (ANSI in the reference, the compiled check here)
    val nan = Seq((1L, Seq(Float.NaN, 1.0f))).toDF("vec_id", "embedding")
    intercept[Throwable] {
      Similarity.compressInt8(nan, "embedding").collect()
    }
    intercept[Throwable] {
      Similarity.compressInt8Reference(nan, "embedding").collect()
    }
  }
}
