package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite with SparkSpec {

  test("spread16/mortonZ: known interleavings") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("a", "b")
      .select(Layout.mortonZ(col("a"), col("b")).as("z"))
    val z = df.collect().map(_.getLong(0))
    assert(z(0) == 0L)
    assert(z(1) == 1L) // a occupies even bits
    assert(z(2) == 2L) // b occupies odd bits
    // a=3 (011), b=5 (101) → z = b2 a2 b1 a1 b0 a0 = 1 0 0 1 1 1 = 39
    assert(z(3) == 39L)
    assert(z(4) == 0xFFFFFFFFL) // all 32 low bits set
  }

  test("mortonZ matches a reference interleave on 500 random bucket pairs") {
    import spark.implicits._
    def refMorton(a: Long, b: Long): Long = {
      var z = 0L
      for (bit <- 0 until 16)
        z |= (((a >> bit) & 1L) << (2 * bit)) | (((b >> bit) & 1L) << (2 * bit + 1))
      z
    }
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Layout.mortonZ(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == refMorton(a, b), s"($a, $b)")
    }
  }

  test("z-order layout prunes on BOTH dimensions; single-sort only on one") {
    import spark.implicits._
    val n = 20000
    // two independent uniform dimensions
    val df = (0 until n).map { i =>
      (((i * 2654435761L) % 10007).toDouble, ((i * 40503L) % 9973).toDouble)
    }.toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString

    Layout.zorderWrite(df, s"$dir/z", "a", "b", 16)
    df.repartitionByRange(16, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(s"$dir/asorted")

    def avgSpan(path: String, c: String, full: Double): Double = {
      val spans = Layout.fileSpans(spark, path, c)
      spans.map { case (lo, hi) => (hi - lo) / full }.sum / spans.length
    }
    // a-sorted layout: tight on a, useless on b (files span ~the full range)
    assert(avgSpan(s"$dir/asorted", "a", 10007.0) < 0.2)
    assert(avgSpan(s"$dir/asorted", "b", 9973.0) > 0.8)
    // z-order: BOTH dimensions substantially narrowed per file
    val za = avgSpan(s"$dir/z", "a", 10007.0)
    val zb = avgSpan(s"$dir/z", "b", 9973.0)
    assert(za < 0.6, s"z-order a-span $za")
    assert(zb < 0.6, s"z-order b-span $zb")

    // layout changes bytes, never data
    assert(spark.read.parquet(s"$dir/z").count() == n)
    assert(spark.read.parquet(s"$dir/z").exceptAll(df).isEmpty)
  }

  test("mortonZN matches a reference interleave for N=3 (bit-loop path)") {
    import spark.implicits._
    def refMorton3(a: Long, b: Long, c: Long, nBits: Int): Long = {
      var z = 0L
      for (bit <- 0 until nBits)
        z |= (((a >> bit) & 1L) << (3 * bit)) |
          (((b >> bit) & 1L) << (3 * bit + 1)) |
          (((c >> bit) & 1L) << (3 * bit + 2))
      z
    }
    val rnd = new scala.util.Random(11)
    val triples = Seq.fill(300)((rnd.nextInt(65536).toLong,
      rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = triples.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        Layout.mortonZN(Seq(col("a"), col("b"), col("c")), 16).as("z"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    triples.foreach { case (a, b, c) =>
      assert(got((a, b, c)) == refMorton3(a, b, c, 16), s"($a, $b, $c)")
    }
    // and the N=2 general path degrades to the cascade exactly
    val pairs2 = triples.map(t => (t._1, t._2))
    val viaN = pairs2.toDF("a", "b")
      .select(Layout.mortonZN(Seq(col("a"), col("b")), 16).as("z"))
      .collect().map(_.getLong(0)).toSeq
    val viaCascade = pairs2.toDF("a", "b")
      .select(Layout.mortonZ(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaN == viaCascade)
  }

  test("3-column z-order prunes on ALL THREE dimensions; single-sort on one") {
    import spark.implicits._
    val n = 20000
    // three independent pseudo-uniform dimensions
    val df = (0 until n).map { i =>
      (((i * 2654435761L) % 10007).toDouble,
        ((i * 40503L) % 9973).toDouble,
        ((i * 69069L + 5) % 9901).toDouble)
    }.toDF("a", "b", "c")
    val dir = java.nio.file.Files.createTempDirectory("zorder3").toString

    Layout.zorderWrite(df, s"$dir/z3", Seq("a", "b", "c"), 27)
    df.repartitionByRange(27, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(s"$dir/asorted")

    def avgSpan(path: String, c: String, full: Double): Double = {
      val spans = Layout.fileSpans(spark, path, c)
      spans.map { case (lo, hi) => (hi - lo) / full }.sum / spans.length
    }
    // a-sorted: useless on b and c
    assert(avgSpan(s"$dir/asorted", "b", 9973.0) > 0.8)
    assert(avgSpan(s"$dir/asorted", "c", 9901.0) > 0.8)
    // 3-dim z-order: every dimension substantially narrowed per file
    val za = avgSpan(s"$dir/z3", "a", 10007.0)
    val zb = avgSpan(s"$dir/z3", "b", 9973.0)
    val zc = avgSpan(s"$dir/z3", "c", 9901.0)
    assert(za < 0.7, s"z3 a-span $za")
    assert(zb < 0.7, s"z3 b-span $zb")
    assert(zc < 0.7, s"z3 c-span $zc")
    // layout changes bytes, never data
    assert(spark.read.parquet(s"$dir/z3").exceptAll(df).isEmpty)
  }

  test("zorderWrite survives empty input, all-NULL columns, NaN rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("zorder-edge").toString

    Layout.zorderWrite(Seq.empty[(Double, Double)].toDF("a", "b"),
      s"$dir/empty", "a", "b", 4)
    assert(spark.read.parquet(s"$dir/empty").isEmpty)

    val allNull = Seq((Some(1.0), Option.empty[Double]),
      (Some(2.0), Option.empty[Double])).toDF("a", "b")
    Layout.zorderWrite(allNull, s"$dir/nulls", "a", "b", 4)
    assert(spark.read.parquet(s"$dir/nulls").count() == 2)
    // fileSpans skips the span-less all-NULL column instead of throwing
    assert(Layout.fileSpans(spark, s"$dir/nulls", "b").isEmpty)

    // one NaN row must not poison the bounds or abort the write
    val withNan = Seq((1.0, 5.0), (2.0, Double.NaN), (3.0, 7.0)).toDF("a", "b")
    Layout.zorderWrite(withNan, s"$dir/nan", "a", "b", 2)
    assert(spark.read.parquet(s"$dir/nan").count() == 3)
  }
}
