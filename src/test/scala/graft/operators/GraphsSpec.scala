package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphsSpec extends AnyFunSuite with SparkSpec {

  private def run(edges: Seq[(String, String, Long)], iters: Int,
      parts: Int = 1): Map[String, Long] = {
    val s = spark
    import s.implicits._
    Graphs.pageRankFixedPoint(
        edges.toDF("src", "dst", "w").repartition(parts),
        "src", "dst", "w", iters = iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("one iteration matches the hand-computed integer recurrence") {
    // A->B, B->A, C->A; n=3, r0 = 10^12/3, base = (10^12*3/20)/3
    val got = run(Seq(("A", "B", 1L), ("B", "A", 1L), ("C", "A", 1L)),
      iters = 1)
    // in(A) = r(B)+r(C) = 666666666666 -> 5e10 + (17*in)/20
    assert(got == Map(
      "A" -> 616666666666L,
      "B" -> 333333333333L, // 5e10 + (17*333333333333)/20 (floored)
      "C" -> 50000000000L)) // teleport only
  }

  test("dangling node keeps its rank mass out of circulation") {
    // A->B only: B has no out-edges and must contribute nothing back
    val got = run(Seq(("A", "B", 1L)), iters = 1)
    assert(got == Map("A" -> 75000000000L, "B" -> 500000000000L))
  }

  test("bit-identical under any edge partitioning; mass conserved") {
    val rnd = new scala.util.Random(5)
    val edges = (1 to 200).map { _ =>
      (s"n${rnd.nextInt(12)}", s"n${rnd.nextInt(12)}", 1L + rnd.nextInt(4))
    }.filter(e => e._1 != e._2)
    val a = run(edges, iters = 3, parts = 1)
    val b = run(edges, iters = 3, parts = 7)
    assert(a == b)
    // total mass stays within integer-truncation dust of the scale
    val mass = a.values.sum
    assert(mass > 999999000000L && mass <= 1000000000000L, mass.toString)
  }

  test("weighted hub dominates: heavier in-links -> strictly higher rank") {
    val got = run(Seq(
      ("a", "hub", 10L), ("b", "hub", 10L), ("c", "hub", 10L),
      ("hub", "a", 1L), ("a", "b", 1L), ("b", "c", 1L)), iters = 3)
    assert(got("hub") > got("a") && got("a") > got("c"))
  }

  test("L1 convergence stop: converged-early ranks == the fixed-count run") {
    val s = spark
    import s.implicits._
    // a 2-cycle reaches its integer fixed point in a handful of rounds
    val edges = Seq(("A", "B", 1L), ("B", "A", 1L)).toDF("src", "dst", "w")
    def ranksAt(iters: Int, tol: Long): Map[String, Long] =
      Graphs.pageRankFixedPoint(edges, "src", "dst", "w", iters = iters,
          tolFp = tol, checkEvery = 2)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // with tol = 0 (disabled) the cap is exact-count; a generous cap
    // with a zero-delta tolerance must stop early at the SAME ranks
    val fixed = ranksAt(50, tol = 0L)
    // count Spark jobs instead of wall time (a GC pause would make a
    // duration comparison flake): the early stop must run FAR fewer
    // jobs than the 50-iteration cap (each iteration is >= 1 job)
    def jobsDuring(f: => Unit): Int = {
      val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      f
      spark.sparkContext.statusTracker.getJobIdsForGroup(null).length - before
    }
    var early: Map[String, Long] = Map.empty
    val earlyJobs = jobsDuring { early = ranksAt(50, tol = 1L) }
    assert(early == fixed)
    assert(earlyJobs < 40,
      s"early stop ran $earlyJobs jobs — the 50-iteration cap was not cut")
  }
}
