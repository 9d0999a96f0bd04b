package graft.similarity

import graft.SparkSpec
import graft.functions.NativeAgg
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite with SparkSpec {

  import scala.jdk.CollectionConverters._

  private def vecDf(rows: Seq[Seq[Float]]) =
    spark.createDataFrame(
      rows.zipWithIndex.map { case (v, i) => Row(i.toLong, v) }.asJava,
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))

  test("gram aggregate: n, sums, and upper triangle match brute force") {
    val vs = Seq(Seq(1.0f, 2.0f, -1.0f), Seq(0.5f, 0.0f, 3.0f),
      Seq(-2.0f, 1.5f, 0.25f))
    val q = vs.map(_.map(x => math.floor(x.toDouble * 10000).toLong))
    val gm = vecDf(vs)
      .select(NativeAgg.gramMatrix(Similarity.quantize(col("embedding"))))
      .head().getStruct(0)
    assert(gm.getLong(0) === 3L)
    val s = gm.getSeq[Long](1)
    assert(s === (0 until 3).map(i => q.map(_(i)).sum))
    val g = gm.getSeq[Long](2)
    val expected = for (i <- 0 until 3; j <- i until 3)
      yield q.map(v => v(i) * v(j)).sum
    assert(g === expected)
  }

  test("gram aggregate is partition-order-free (map-side combine)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val one = emb.coalesce(1)
      .select(NativeAgg.gramMatrix(Similarity.quantize(col("embedding"))))
      .head().getStruct(0)
    val many = emb.repartition(7)
      .select(NativeAgg.gramMatrix(Similarity.quantize(col("embedding"))))
      .head().getStruct(0)
    assert(one.getLong(0) === many.getLong(0))
    assert(one.getSeq[Long](1) === many.getSeq[Long](1))
    assert(one.getSeq[Long](2) === many.getSeq[Long](2))
  }

  test("pc1 finds a planted dominant axis") {
    // spread along axis 2 dominates; small noise on axes 0/1 via
    // deterministic offsets
    val rows = (0 until 40).map { i =>
      Seq((i % 3) * 0.01f - 0.01f, (i % 5) * 0.005f,
        (i - 20) * 0.5f, 0.0f)
    }
    val pc = Similarity.powerIterationPc1(vecDf(rows), "embedding")
      .collect().sortBy(_.getInt(0))
    val comps = pc.map(r => math.abs(r.getLong(1)))
    assert(comps.indexOf(comps.max) === 2, "dominant axis must win")
    assert(comps.max === 1000000L, "normalization pins max |component| at 1e6")
    val ppm = pc.head.getLong(2)
    assert(ppm > 990000L, s"planted axis explains ~all variance, got $ppm")
  }

  test("pc1 on real embeddings: normalized, explained above uniform floor") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val pc = Similarity.powerIterationPc1(emb, "embedding").collect()
    assert(pc.length === 64)
    assert(pc.map(r => math.abs(r.getLong(1))).max === 1000000L)
    val ppm = pc.head.getLong(2)
    // PC1 explains at least the average per-dimension share (1/64);
    // random-ish embeddings keep it well under 100%
    assert(ppm >= (1000000L / 64) && ppm <= 1000000L, s"ppm = $ppm")
    // all rows carry the same explained_ppm (a per-corpus scalar)
    assert(pc.map(_.getLong(2)).distinct.length === 1)
  }

  test("all-but-the-top: corrected vectors exactly orthogonal to PC1") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val pc = Similarity.powerIterationPc1(emb, "embedding")
      .collect().sortBy(_.getInt(0)).map(_.getLong(1))
    val corrected = Similarity.removeTopComponent(emb, "vec_id", "embedding")
    // v · corrected == 0 EXACTLY for every vector (integer algebra:
    // v·(q(v^Tv) − (q^Tv)v) = (q^Tv)(v^Tv) − (q^Tv)(v^Tv))
    val dots = corrected
      .withColumn("__vi", element_at(array(pc.map(lit): _*),
        col("pos") + 1))
      .groupBy("vec_id")
      .agg(sum(col("corrected").cast("decimal(38,0)") * col("__vi"))
        .as("dot"))
      .filter(col("dot") =!= 0)
    assert(dots.isEmpty, "rejection must be exactly orthogonal to PC1")
    assert(corrected.count() === emb.count() * 64)
  }

  test("all-but-the-top correction stage is map-only (no shuffle)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = Similarity.removeTopComponent(emb, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"correction must not shuffle, plan:\n$plan")
  }

  test("dim mismatch fails loudly") {
    val bad = vecDf(Seq(Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f)))
    val ex = intercept[Exception] {
      bad.select(
        NativeAgg.gramMatrix(Similarity.quantize(col("embedding"))))
        .head()
    }
    assert(ex.getMessage.contains("inconsistent vector dims") ||
      Option(ex.getCause).exists(_.getMessage.contains("inconsistent")))
  }
}
