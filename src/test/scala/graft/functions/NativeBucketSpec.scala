package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NativeBucketSpec extends AnyFunSuite with SparkSpec {

  test("native bucketOf ≡ HOF reference on adversarial cuts/values: " +
      "duplicates, NaN, ±Inf, nulls, empty arrays") {
    import spark.implicits._
    val cuts: Seq[Option[Seq[Double]]] = Seq(
      Some(Seq(0.0, 1.0, 2.0, 3.0)),
      Some(Seq(1.0, 1.0, 2.0)), // duplicate cuts: heavy-value grids
      Some(Seq(-1.0, -1.0, -1.0, -1.0)), // all-identical
      Some(Seq(Double.NegativeInfinity, 0.0, Double.PositiveInfinity)),
      Some(Seq(-0.0, 0.0)), // signed-zero adjacency
      Some(Seq(1.0, 2.0, Double.NaN)), // NaN cut: sort_array puts it last
      Some(Seq.empty[Double]),
      None)
    val vals: Seq[Option[Double]] = Seq(
      Some(-10.0), Some(-1.0), Some(-0.5), Some(-0.0), Some(0.0),
      Some(0.5), Some(1.0), Some(1.5), Some(2.0), Some(2.5), Some(3.0),
      Some(99.0), Some(Double.NaN), Some(Double.PositiveInfinity),
      Some(Double.NegativeInfinity), None)
    val rows = for (c <- cuts; v <- vals) yield (v, c)
    val df = rows.toDF("v", "bounds")
    val cmp = df.select(
      NativeBucket.bucketOf(col("v"), col("bounds")).as("native"),
      NativeBucket.bucketOfReference(col("v"), col("bounds")).as("ref"))
    val bad = cmp.filter(
      (col("native").isNull =!= col("ref").isNull) ||
        (col("native").isNotNull && (col("native") =!= col("ref"))))
    assert(bad.count() == 0, bad.collect().mkString("\n"))
    // and the HOF's documented null semantics hold for the native path
    val nullArray = df.filter(col("bounds").isNull)
      .select(NativeBucket.bucketOf(col("v"), col("bounds"))).collect()
    assert(nullArray.forall(_.isNullAt(0)))
    val nullValue = df.filter(col("v").isNull && col("bounds").isNotNull)
      .select(NativeBucket.bucketOf(col("v"), col("bounds"))).collect()
    assert(nullValue.forall(r => !r.isNullAt(0) && r.getLong(0) == 0L))
  }

  test("native bucketOf ≡ HOF reference on random sorted grids at " +
      "equi-depth widths (b up to 4096)") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = Seq(8, 64, 4095).flatMap { b =>
      val g = Seq.fill(b)(rng.nextGaussian() * 100).sorted
      Seq.fill(500)((rng.nextGaussian() * 120, g))
    }
    val df = rows.toDF("v", "bounds").repartition(4)
    val cmp = df.select(
      NativeBucket.bucketOf(col("v"), col("bounds")).as("native"),
      NativeBucket.bucketOfReference(col("v"), col("bounds")).as("ref"))
    assert(cmp.filter(col("native") =!= col("ref")).count() == 0)
  }

  test("BucketOfKeyedExpr is NOT CodegenFallback (the point of it)") {
    assert(!classOf[org.apache.spark.sql.catalyst.expressions
        .codegen.CodegenFallback]
      .isAssignableFrom(classOf[BucketOfKeyedExpr]))
    // the HOF it replaces IS — the interpreter tax this expression
    // removes from the per-key drift path
    assert(classOf[org.apache.spark.sql.catalyst.expressions
        .codegen.CodegenFallback]
      .isAssignableFrom(
        classOf[org.apache.spark.sql.catalyst.expressions.ArrayAggregate]))
  }
}
