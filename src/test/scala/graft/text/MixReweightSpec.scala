package graft.text

import graft.SparkSpec
import graft.queries.TextQueries
import org.scalatest.funsuite.AnyFunSuite

class MixReweightSpec extends AnyFunSuite with SparkSpec {

  test("MW rounds: normalized weights, budget conserved, quality-tilted") {
    val rows = TextQueries.mixQualityReweight(spark, sf).collect()
    assert(rows.length >= 2, "need at least two sources to mix")
    val scale = 1000000L
    // renormalization truncates, so sums land in (scale - |S|, scale]
    for (c <- Seq("w1", "w2", "w3")) {
      val tot = rows.map(_.getAs[Long](c)).sum
      assert(tot <= scale && tot > scale - rows.length,
        s"$c total $tot out of truncation band")
    }
    val budget = rows.map(_.getAs[Long]("budget_tokens")).sum
    assert(budget <= 100000L && budget > 100000L - rows.length)
    // multiplicative weights monotonically favor the max-gain source
    val best = rows.maxBy(_.getAs[Long]("gain_fp"))
    val others = rows.filter(_.getAs[String]("source") !=
      best.getAs[String]("source"))
    assert(others.forall(o => best.getAs[Long]("w3") >= o.getAs[Long]("w3")),
      "highest-gain source must end with the largest weight")
    assert(best.getAs[Long]("w3") >= best.getAs[Long]("w1"),
      "the max-gain source's share must not shrink across rounds")
  }
}
