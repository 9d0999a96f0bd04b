import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PqIndex lifecycle at 1M vectors (local[32]): build (sample-bounded
  * training + full encode), incremental append, query, compaction,
  * healthy-watchdog probe — wall + shuffle per phase (SCALE.md entry).
  *
  * Ground truth is PLANTED: ids pair up as near-identical twins
  * (id ^ 1 shares the base vector plus a tiny per-dim epsilon), so a
  * query's true nearest neighbor is its twin and recall@1 is
  * well-posed at any corpus size. Vectors are DIFFUSE (per-id ±100
  * spread over a ±20 cluster component), the geometry real embedding
  * spaces have. (Two first cuts measured recall ≈ 0.00–0.04 on the
  * inverse geometry — a dominant ±100 SHARED component with ±10
  * noise: there, thousands of same-cluster vectors collapse onto one
  * 8-byte code, in-code ADC order degenerates to the id tie-break,
  * and no shortlist width rescues it. That is IVFADC's documented
  * failure geometry — code diversity, not corpus size, is what recall
  * buys — not an index bug.)
  *
  * Exactness cross-checks: grown == append-idempotent answers;
  * compaction answer-identical; healthy watchdog is a no-op. */
object StressPqIndex {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val inputBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          inputBytes.addAndGet(m.inputMetrics.bytesRead)
        }
      }
    })
    def timed[A](tag: String)(f: => A): A = {
      org.apache.spark.sql.GraftShims.drainListenerBus(spark)
      shuffleBytes.set(0)
      inputBytes.set(0)
      val t0 = System.nanoTime()
      val r = f
      org.apache.spark.sql.GraftShims.drainListenerBus(spark)
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
        f"${shuffleBytes.get / 1048576.0}%.1f MB shuffle, " +
        f"${inputBytes.get / 1048576.0}%.1f MB read")
      r
    }
    val dim = 32
    // twin-planted deterministic embeddings: ids 2j and 2j+1 share
    // base vector j (64 latent clusters + per-base noise); the odd
    // twin adds a tiny epsilon, so true-NN(id) == id ^ 1
    def mk(a: Long, b: Long) = spark.range(a, b).select(
        col("id").cast("string").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), d =>
          (sin(floor(col("id") / 2) % 64 * (d + lit(1.0))) * 20.0 +
            sin(floor(col("id") / 2) * (d + lit(17.0))) * 100.0 +
            (col("id") % 2) * 0.05 + (d + lit(1.0)) * 0.001)
            .cast("float")).as("embedding"))
      .localCheckpoint()
    val base = mk(0L, 1000000L)
    val path = "/tmp/graft-stress-pqindex"
    org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(path), true)

    timed("build 1M (train<=100k, full encode)") {
      graft.similarity.PqIndex.build(spark, path, base, "vec_id",
        "embedding", kCells = 64, m = 8, ksub = 128, iters = 10,
        maxTrainRows = Some(100000L))
    }
    val late = mk(1000000L, 1100000L)
    timed("append 100k (encode only the increment)") {
      graft.similarity.PqIndex.append(spark, path, late, "vec_id",
        "embedding", batchId = 0)
    }
    val full = base.unionByName(late)
    val queries = base.filter(col("vec_id").cast("long") % 20000L === 0L)
    val grown = timed("topKRefined 50 queries over 1.1M (shortlist=100)") {
      graft.similarity.PqIndex.topKRefined(spark, path, full, queries,
          "vec_id", "embedding", k = 1, shortlist = 100)
        .collect().map(r => (r.getString(0), r.getString(2))).toSet
    }
    // planted ground truth: the twin is the true nearest neighbor
    val twinHits = grown.count { case (q, n) => n.toLong == (q.toLong ^ 1L) }
    println(f"  twin recall@1 = ${twinHits.toDouble / grown.size}%.3f")
    // PRUNING OBSERVABILITY (round 12): with kCells=64 and 50 queries
    // × nProbe=4 the probed-cell union can cover most of the index, so
    // the static cluster IN filter has little to prune. A 2-query
    // batch probes ≤ 8 of 64 cells — the serving shape (point lookups
    // against a big index) where probed-cells-only reads are the whole
    // point. Compare "MB read" between this and the 50-query phase.
    val fewQ = base.filter(col("vec_id").cast("long") % 500000L === 0L)
    timed("topKRefined 2 queries (pruned: <=8/64 cells)") {
      val r = graft.similarity.PqIndex.topKRefined(spark, path, full, fewQ,
          "vec_id", "embedding", k = 1, shortlist = 100)
        .collect()
      require(r.nonEmpty)
    }
    // raw ADC reads ONLY the codes corpus — the cleanest view of the
    // static partition filter. Queries ride a LOCAL frame (the serving
    // shape: a query batch arrives from outside, it is not a filter
    // over the checkpointed corpus — deriving it by filter re-reads
    // the whole 1M-row base three times per call and buries the codes
    // scan in the read metric).
    val localQ = { rows: Array[org.apache.spark.sql.Row] =>
      import spark.implicits._
      rows.map(r => (r.getString(0), r.getSeq[Float](1).toSeq)).toSeq
        .toDF("vec_id", "embedding")
    }
    val q50 = localQ(queries.collect())
    val q2 = localQ(fewQ.collect())
    timed("topK raw ADC, 50 local queries (probes most cells)") {
      require(graft.similarity.PqIndex.topK(spark, path, q50,
        "vec_id", "embedding", k = 1).collect().nonEmpty)
    }
    timed("topK raw ADC, 2 local queries (pruned codes scan)") {
      require(graft.similarity.PqIndex.topK(spark, path, q2,
        "vec_id", "embedding", k = 1).collect().nonEmpty)
    }
    timed("compactCorpus (codes only, no re-encode)") {
      require(graft.similarity.PqIndex.compactCorpus(spark, path))
    }
    val compacted = graft.similarity.PqIndex
      .topKRefined(spark, path, full, queries, "vec_id", "embedding",
        k = 1, shortlist = 100)
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    require(compacted == grown, "compaction changed answers")
    timed("watchdog probe (healthy: one recall eval, 50-query sample)") {
      val res = graft.similarity.PqIndex.maintain(spark, path, full,
        queries, "vec_id", "embedding", floor = 0.7, k = 1,
        kCells = 64, m = 8, ksub = 128, iters = 10,
        maxTrainRows = Some(100000L), shortlist = 100)
      println(f"  recall@1 = ${res.recallBefore}%.3f retrained=${res.retrained}")
      require(!res.retrained, "healthy index must not retrain")
    }
    spark.stop()
  }
}
