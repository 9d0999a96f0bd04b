package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The broadcast-hint guardrail: hints on sides past the size cap are
  * stripped (AQE then picks the join), hints within the cap survive. */
class SafeBroadcastRuleSpec extends AnyFunSuite with SparkSpec {

  private def joinHints(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.collect { case j: Join => j.hint }

  test("oversized broadcast hint is stripped; small one survives") {
    graft.functions.GraftExtensions.install(spark)
    val facts = spark.range(10000).selectExpr("id AS k", "id * 2 AS v")
    val dim = spark.range(100).selectExpr("id AS k", "id * 3 AS w")
    val prev = spark.conf.getOption("spark.graft.broadcast.maxBytes")
    try {
      // cap of 1 byte: EVERY relation is "too big" — the hint must go
      spark.conf.set("spark.graft.broadcast.maxBytes", "1")
      val stripped = joinHints(facts.join(broadcast(dim), "k"))
      assert(stripped.nonEmpty &&
        stripped.forall(h => !h.rightHint.exists(_.strategy.contains(BROADCAST))),
        stripped)

      // default cap: a 100-row dim is far below it — the hint survives
      spark.conf.unset("spark.graft.broadcast.maxBytes")
      val kept = joinHints(facts.join(broadcast(dim), "k"))
      assert(kept.exists(_.rightHint.exists(_.strategy.contains(BROADCAST))),
        kept)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.broadcast.maxBytes", v)
        case None => spark.conf.unset("spark.graft.broadcast.maxBytes")
      }
    }
  }
}
