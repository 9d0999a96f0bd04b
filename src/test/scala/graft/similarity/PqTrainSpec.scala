package graft.similarity

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class PqTrainSpec extends AnyFunSuite with SparkSpec {

  test("in-engine trainers reproduce the committed fixture byte for byte") {
    // the committed PqFixture constants were produced by THESE trainers
    // (tools/gen_pq_fixture.py is the independent python reference of
    // the same integer-Lloyd recipe) — training in-engine on the same
    // corpus must reproduce every artifact exactly
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val books = Pq.trainCodebooksQ(emb, "vec_id", "embedding",
      m = PqFixture.m, ksub = PqFixture.ksub)
    assert(books.map(_.map(_.toSeq).toSeq).toSeq == PqFixture.codebooksL)
    val coarse = Pq.trainCoarseQ(emb, "vec_id", "embedding", k = 10)
    assert(coarse.map(_.toSeq).toSeq == PqFixture.coarseIvfL)
    val byLabel = Pq.labelCentroidsQ(emb, "label", "embedding")
    assert(byLabel.map(_.toSeq).toSeq == PqFixture.coarseL)
  }

  test("trainer is layout-independent: repartitioned input, same artifacts") {
    // exact integer aggregation + deterministic init = no dependence on
    // row order or partitioning (the 1000-executor property)
    val emb = spark.read
      .parquet("/root/testdata/sf0.01/embeddings.parquet")
      .repartition(13)
    val books = Pq.trainCodebooksQ(emb, "vec_id", "embedding",
      m = PqFixture.m, ksub = PqFixture.ksub, iters = 5)
    val books2 = Pq.trainCodebooksQ(
      spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .repartition(3).sortWithinPartitions("label"),
      "vec_id", "embedding", m = PqFixture.m, ksub = PqFixture.ksub,
      iters = 5)
    assert(books == books2)
  }

  test("fused training runs ONE aggregate per iteration: job count " +
      "≤ iters + m + setup") {
    val s = spark
    val emb = s.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    s.sparkContext.addSparkListener(listener)
    try {
      val iters = 5
      def count(m: Int): Int = {
        jobs.set(0)
        val books = Pq.trainCodebooksQ(emb, "vec_id", "embedding",
          m = m, ksub = PqFixture.ksub, iters = iters)
        org.apache.spark.sql.GraftShims.drainListenerBus(s)
        assert(books.size == m)
        jobs.get
      }
      val j4 = count(4)
      val j2 = count(2)
      // AQE runs each per-iteration aggregate as ≤ 2 jobs (shuffle
      // stage + result); setup = vecDim head + checkpoint + m inits.
      // The serial-per-subspace shape this replaced cost m × iters
      // aggregates — ~40 jobs at m=4 here
      val bound = 2 * iters + 4 + 4
      assert(j4 <= bound, s"fused trainer ran $j4 jobs, expected ≤ $bound")
      // fusion's defining property: iteration cost independent of m —
      // doubling the subspace count adds only the m extra init jobs
      assert(j4 - j2 <= 2 + 1,
        s"job count scales with m (m=4: $j4, m=2: $j2) — training is " +
          "not fused into one aggregate per iteration")
    } finally s.sparkContext.removeSparkListener(listener)
  }

  test("integer-exact convergence stop: early-stopped == full cap, " +
      "byte for byte, with fewer iterations run") {
    val s = spark
    val emb = s.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    // k=4 over a 200-row deterministic sample converges fast; a huge
    // cap must cost only the converged iteration count (fixed point:
    // same centroids → same assignment → same integer means)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    val a = Pq.trainCoarseQ(emb, "vec_id", "embedding", k = 4, iters = 60,
      maxTrainRows = Some(200L))
    s.sparkContext.addSparkListener(listener)
    try {
      val b = Pq.trainCoarseQ(emb, "vec_id", "embedding", k = 4, iters = 200,
        maxTrainRows = Some(200L))
      org.apache.spark.sql.GraftShims.drainListenerBus(s)
      assert(a == b, "fixed point must make any cap ≥ convergence identical")
      assert(jobs.get < 60,
        s"cap=200 ran ${jobs.get} jobs — convergence stop did not fire")
    } finally s.sparkContext.removeSparkListener(listener)
  }

  test("maxTrainRows bounds the Lloyd passes deterministically") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val a = Pq.trainCoarseQ(emb, "vec_id", "embedding", k = 4, iters = 3,
      maxTrainRows = Some(200L))
    val b = Pq.trainCoarseQ(emb.repartition(7), "vec_id", "embedding",
      k = 4, iters = 3, maxTrainRows = Some(200L))
    assert(a == b)
    assert(a.length == 4 && a.forall(_.length == 64))
  }
}
