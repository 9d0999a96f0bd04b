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
}
