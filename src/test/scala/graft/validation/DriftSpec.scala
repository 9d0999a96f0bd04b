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
