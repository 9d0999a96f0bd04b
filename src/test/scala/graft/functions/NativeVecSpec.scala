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
}
