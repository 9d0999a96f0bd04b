package graft.validation

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DriftSpec extends AnyFunSuite with SparkSpec {

  private def mk(rows: Seq[(String, Double, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("g", "v", "win")
  }

  private def ksOf(rows: Seq[(String, Double, String)]): Double =
    Drift.ksStatistic(mk(rows), "g", "v", "win")
      .select("ks").head().getDouble(0)

  test("grid-KS error bound: gridKS <= exactKS <= gridKS + max min bucket mass") {
    // adversarial fixture: ALL drift hides INSIDE buckets — ref is one
    // value per integer 0..99, obs piles its 10 per-bucket rows on each
    // bucket's left edge. Bucket counts (width 10) are IDENTICAL, so the
    // grid statistic is 0 while the exact statistic is 0.09 — right
    // under the documented bound max_b min(obsMass_b, refMass_b) = 0.1.
    val s = spark
    import s.implicits._
    val refRows = (0 until 100).map(v => ("m", v.toDouble, "ref"))
    val curRows = (0 until 10).flatMap(b =>
      Seq.fill(10)(("m", (10 * b).toDouble, "cur")))
    val exact = Drift.ksStatistic(mk(refRows ++ curRows), "g", "v", "win")
      .select("ks").head().getDouble(0)
    assert(exact == 0.09, s"exact KS: $exact")

    // the streaming grid over the same data: accumulated (key, bucket,
    // n_rows) state vs integer reference counts
    val dir = java.nio.file.Files.createTempDirectory("graft-ksb").toString
    try {
      (0 until 10).map(b => ("m", b.toLong, 10L)).toDF("k", "b", "n_rows")
        .write.mode("overwrite").parquet(s"$dir/state")
      val refC = (0 until 10).map(b => ("m", b.toLong, 10L)).toDF("k", "b", "c")
      val grid = graft.streaming.Streams
        .ksAgainst(spark, s"$dir/state", refC, "k", "b", "c")
        .select("ks").head().getDouble(0)
      assert(grid == 0.0, s"grid KS: $grid")
      val maxMinBucketMass = 0.1 // every bucket holds 10/100 on both sides
      assert(grid <= exact && exact <= grid + maxMinBucketMass,
        s"bound violated: grid=$grid exact=$exact")
    } finally graft.core.AtomicSwap.deleteRecursively(new java.io.File(dir))
  }

  test("grid-KS rejects string bucket columns (lexical order != numeric)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-kss").toString
    try {
      Seq(("m", "b2", 10L), ("m", "b10", 10L)).toDF("k", "b", "n_rows")
        .write.mode("overwrite").parquet(s"$dir/state")
      val refC = Seq(("m", "b2", 10L), ("m", "b10", 10L)).toDF("k", "b", "c")
      val e = intercept[IllegalArgumentException] {
        graft.streaming.Streams.ksAgainst(spark, s"$dir/state", refC,
          "k", "b", "c")
      }
      assert(e.getMessage.contains("numeric"))
    } finally graft.core.AtomicSwap.deleteRecursively(new java.io.File(dir))
  }

  test("identical samples have KS 0; disjoint samples have KS 1") {
    val base = (1 to 50).map(i => ("a", i.toDouble, "ref"))
    assert(ksOf(base ++ base.map(r => (r._1, r._2, "cur"))) == 0.0)
    val shifted = (1 to 50).map(i => ("a", 1000.0 + i, "cur"))
    assert(ksOf(base ++ shifted) == 1.0)
  }

  test("a planted shift scores strictly higher than a same-distribution split") {
    // deterministic pseudo-uniform values; cur = ref + 30% shift
    def u(i: Int): Double = ((i * 2654435761L) % 1000).toDouble
    val ref = (0 until 400).map(i => ("a", u(i), "ref"))
    val same = (400 until 800).map(i => ("a", u(i), "cur"))
    val shifted = (400 until 800).map(i => ("a", u(i) + 300.0, "cur"))
    val ksSame = ksOf(ref ++ same)
    val ksShift = ksOf(ref ++ shifted)
    assert(ksShift > ksSame + 0.2,
      s"shifted KS $ksShift must clearly exceed same-dist KS $ksSame")
  }

  test("hand-computed: exact CDF gap with ties across both samples") {
    // ref: 1,1,2,3  cur: 2,3,3,4 — F gaps at x=1: |2/4-0|=.5 (max),
    // x=2: |3/4-1/4|=.5, x=3: |1-3/4|=.25, x=4: 0
    val rows = Seq(("a", 1.0, "ref"), ("a", 1.0, "ref"), ("a", 2.0, "ref"),
      ("a", 3.0, "ref"), ("a", 2.0, "cur"), ("a", 3.0, "cur"),
      ("a", 3.0, "cur"), ("a", 4.0, "cur"))
    val r = Drift.ksStatistic(mk(rows), "g", "v", "win").head()
    assert(r.getAs[Long]("n_ref") == 4L && r.getAs[Long]("n_cur") == 4L)
    assert(r.getAs[Long]("ks_num") == 8L) // |2*4 - 0*4| = 8
    assert(r.getAs[Double]("ks") == 0.5)
  }

  test("groups are independent; nulls ignored; windows stay partitioned") {
    val s = spark
    import s.implicits._
    val rows = Seq(("a", Some(1.0), "ref"), ("a", Some(9.0), "cur"),
      ("b", Some(5.0), "ref"), ("b", Some(5.0), "cur"),
      ("b", Option.empty[Double], "cur"))
    val df = rows.toDF("g", "v", "win")
    val out = Drift.ksStatistic(df, "g", "v", "win")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("ks")).toMap
    assert(out("a") == 1.0 && out("b") == 0.0)
    // no unpartitioned window in the plan (fleet-wide audit contract)
    val plan = Drift.ksStatistic(df, "g", "v", "win")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window [") ||
      !plan.contains("partitionBy=[]"), plan)
  }
}
