package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** C6/E5: the runner really runs N queries — two MemoryStreams progress
  * concurrently, failures are isolated per source, and the detection
  * cycle honours the concurrency bound. */
class MultiSourceRunnerSpec extends AnyFunSuite with SparkSpec {

  test("two sources run concurrently and both report progress") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val inA = MemoryStream[Long]
    val inB = MemoryStream[Long]
    inA.addData(1L, 2L, 3L)
    inB.addData(10L, 20L)

    val runner = new MultiSourceRunner(spark, maxConcurrent = 4)
    runner.register("src_a", () => inA.toDF().writeStream
      .format("memory").queryName("msr_a")
      .trigger(Trigger.ProcessingTime(50)).start())
    runner.register("src_b", () => inB.toDF().writeStream
      .format("memory").queryName("msr_b")
      .trigger(Trigger.ProcessingTime(50)).start())

    val live = runner.startAll()
    try {
      assert(live.size == 2)
      live.values.foreach(_.processAllAvailable())
      // both ACTIVE at the same time — genuine concurrency, not sequential
      assert(live.values.forall(_.isActive))
      val st = runner.status()
      assert(st("src_a").healthy && st("src_a").state == "running")
      assert(st("src_b").healthy && st("src_b").state == "running")
      assert(st("src_a").inputRows == 3 && st("src_b").inputRows == 2)
      assert(runner.healthCheck())
      assert(spark.table("msr_a").count() == 3)
      assert(spark.table("msr_b").count() == 2)
    } finally runner.stopAll()
    assert(runner.status().values.forall(_.state == "registered"))
  }

  test("detectAll: drain-then-stop cycle, bounded by maxConcurrent") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ins = (0 until 3).map { i =>
      val m = MemoryStream[Long]
      m.addData((1L to (i + 1).toLong): _*)
      m
    }
    val runner = new MultiSourceRunner(spark, maxConcurrent = 1)
    ins.zipWithIndex.foreach { case (m, i) =>
      runner.register(s"s$i", () => m.toDF().writeStream
        .format("memory").queryName(s"msr_cycle_$i")
        .trigger(Trigger.AvailableNow()).start())
    }
    val st = runner.detectAll(timeoutMs = 60000L)
    assert(st.size == 3)
    assert(st.values.forall(s => s.healthy && s.state == "terminated"))
    assert((0 until 3).forall(i => st(s"s$i").inputRows == i + 1))
    // the pool bound held: never more than 1 query in flight
    assert(runner.maxObservedConcurrency == 1)
  }

  test("a failing source is isolated; siblings still complete") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ok = MemoryStream[Long]
    ok.addData(7L)
    val runner = new MultiSourceRunner(spark, maxConcurrent = 2)
    runner.register("boom", () => throw new RuntimeException("connect refused"))
    runner.register("fine", () => ok.toDF().writeStream
      .format("memory").queryName("msr_fine")
      .trigger(Trigger.AvailableNow()).start())

    val st = runner.detectAll(timeoutMs = 60000L)
    assert(!st("boom").healthy && st("boom").state == "failed")
    assert(st("boom").error.exists(_.contains("connect refused")))
    assert(st("fine").healthy && st("fine").inputRows == 1)
  }
}
