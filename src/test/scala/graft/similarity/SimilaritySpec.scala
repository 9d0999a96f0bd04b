package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite with SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("brute-force top-k: k rows per query, cosine in [-1,1], no self-match") {
    val q = emb.filter(col("vec_id") < 5)
    val res = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 3).collect()
    assert(res.length == 5 * 3)
    assert(res.forall(r => math.abs(r.getAs[Double]("cosine")) <= 1.0 + 1e-9))
    assert(res.forall(r => r.getAs[Long]("neighbor_id") != r.getAs[Long]("query_id")))
    // ranks are 1..k per query and cosine non-increasing within a query
    val byQ = res.groupBy(_.getAs[Long]("query_id"))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
      val cos = sorted.map(_.getAs[Double]("cosine")).toSeq
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("bucketed top-k returns only same-bucket neighbors") {
    val q = emb.filter(col("vec_id") < 5)
    val res = Similarity.bucketedTopK(emb, q, "vec_id", "embedding", "label", 3)
    val labels = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    res.collect().foreach { r =>
      assert(labels(r.getAs[Long]("query_id")) == labels(r.getAs[Long]("neighbor_id")))
    }
  }

  test("bucketed result cosine never exceeds brute-force at same rank") {
    val q = emb.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("cosine")).toMap
    val bucketed = Similarity.bucketedTopK(emb, q, "vec_id", "embedding", "label", 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("cosine")).toMap
    bucketed.foreach { case (qid, c) => assert(c <= brute(qid) + 1e-12) }
  }

  test("kmeans IVF: deterministic clusters, bucketed search recall@1 is sane") {
    val clustered = Similarity.kmeansClusters(emb, "vec_id", "embedding",
      k = 8, seed = 42L)
    // determinism: second run assigns identical clusters
    val again = Similarity.kmeansClusters(emb, "vec_id", "embedding",
      k = 8, seed = 42L)
    assert(clustered.select("vec_id", "cluster")
      .exceptAll(again.select("vec_id", "cluster")).isEmpty)
    val sizes = clustered.groupBy("cluster").count().collect()
    assert(sizes.length >= 2, "degenerate clustering")

    val q = clustered.filter(col("vec_id") < 20)
    val ivf = Similarity.bucketedTopK(clustered, q, "vec_id", "embedding",
        "cluster", 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    val brute = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    // IVF recall@1 vs brute force: same-cluster neighbors dominate in
    // clustered data; require a sane floor, not perfection (single-probe)
    val hits = ivf.count { case (qid, n) => brute.get(qid).contains(n) }
    assert(ivf.nonEmpty && hits.toDouble / brute.size >= 0.5,
      s"recall@1 = $hits/${brute.size}")
  }

  test("hyperplane LSH: deterministic buckets, multiprobe recall is sane") {
    val planes = Similarity.hyperplanes(nPlanes = 4, dim = 64)
    assert(planes.size == 4 && planes.forall(_.size == 64))
    assert(planes == Similarity.hyperplanes(nPlanes = 4, dim = 64))

    val bucketed = emb.select(col("vec_id"),
      Similarity.hyperplaneBucket(col("embedding"), planes).as("b"))
    val range = bucketed.agg(min("b"), max("b")).head()
    assert(range.getLong(0) >= 0L && range.getLong(1) < 16L)
    assert(bucketed.select("b").distinct().count() >= 4,
      "degenerate bucketing")

    val q = emb.filter(col("vec_id") < 20)
    val lsh = Similarity.hyperplaneTopK(emb, q, "vec_id", "embedding",
        k = 1, nPlanes = 4, dim = 64)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    val hits = lsh.count { case (qid, n) => brute.get(qid).contains(n) }
    // hamming-1 multiprobe on 4 planes: sane recall floor, not perfection
    assert(lsh.nonEmpty && hits.toDouble / brute.size >= 0.4,
      s"recall@1 = $hits/${brute.size}")
    // determinism of the full operator
    val again = Similarity.hyperplaneTopK(emb, q, "vec_id", "embedding",
        k = 1, nPlanes = 4, dim = 64)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    assert(lsh == again)
  }

  test("IVF multiprobe: recall grows with nProbe; full probe == brute force") {
    val (clustered, centroids) = Similarity.kmeansIndex(
      emb, "vec_id", "embedding", k = 8, seed = 42L)
    assert(centroids.size == 8)
    val q = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    def recall(nProbe: Int): Double = {
      val res = Similarity.kmeansTopKMultiProbe(clustered, q, "vec_id",
          "embedding", centroids, k = 1, nProbe = nProbe)
        .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
      res.count { case (qid, n) => brute.get(qid).contains(n) }.toDouble / brute.size
    }
    val r1 = recall(1); val r2 = recall(2)
    assert(r2 >= r1, s"nProbe=2 recall $r2 < nProbe=1 recall $r1")
    // probing EVERY cell covers the whole corpus — must equal brute force
    assert(recall(8) == 1.0)
  }

  test("ivfTopKQ default: predicate dedup holds, spill+multiprobe lifts recall") {
    val q = emb.filter(col("vec_id") < 10)
    def run(nProbe: Int, nAssign: Int) =
      Similarity.ivfTopKQ(emb, q, "vec_id", "embedding",
          PqFixture.coarseIvfL, k = 10, nProbe = nProbe, nAssign = nAssign)
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    val deflt = run(4, 2)
    // replication can match a pair once per shared cell — the join
    // predicate must dedup (first-shared-cell rule), no pair twice
    assert(deflt.distinct.length == deflt.length)
    val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 10)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    def recall(pairs: Array[(Long, Long)]): Double =
      pairs.count(brute.contains).toDouble / brute.size
    // the default (spill ×2, probe 4) must dominate single-probe
    // single-assign — the configuration the recall floor retired
    assert(recall(deflt) >= recall(run(1, 1)))
  }

  test("spill index (nAssign=2): predicate dedup, recall dominates, save/load") {
    val (spill, cents) = Similarity.kmeansIndex(
      emb, "vec_id", "embedding", k = 8, seed = 42L, nAssign = 2)
    assert(spill.columns.contains("cells"))
    // index is replicated x2 exactly
    assert(spill.count() == 2 * emb.count())
    val q = emb.filter(col("vec_id") < 20)
    val res = Similarity.kmeansTopKMultiProbe(spill, q, "vec_id",
        "embedding", cents, k = 5, nProbe = 3)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    // replication never leaks duplicate pairs
    assert(res.distinct.length == res.length)
    // recall vs brute must dominate the single-assign index at same nProbe
    val (single, cents1) = Similarity.kmeansIndex(
      emb, "vec_id", "embedding", k = 8, seed = 42L)
    val res1 = Similarity.kmeansTopKMultiProbe(single, q, "vec_id",
        "embedding", cents1, k = 5, nProbe = 3)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(res.count(brute.contains) >= res1.count(brute.contains))
    // the cells column persists through save/load; answers identical
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-spill").toString
    Similarity.saveIndex(spill, cents, dir)
    val (loaded, loadedCents) = Similarity.loadIndex(spark, dir)
    assert(loaded.columns.contains("cells"))
    val res2 = Similarity.kmeansTopKMultiProbe(loaded, q, "vec_id",
        "embedding", loadedCents, k = 5, nProbe = 3)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    assert(res2.sorted.toSeq == res.sorted.toSeq)
    graft.core.AtomicSwap.deleteRecursively(new java.io.File(dir))
  }

  test("ivfTopKQ plan: broadcast equi join on the cell, dedup stays in predicate") {
    val q = emb.filter(col("vec_id") < 5)
    val plan = Similarity.ivfTopKQ(emb, q, "vec_id", "embedding",
        PqFixture.coarseIvfL, k = 5)
      .queryExecution.executedPlan.toString
    // the spill-dedup rule must ride the hash join as a post-probe
    // filter, never degrade the join to a nested loop
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("IVF index save/load round-trip: loaded index answers identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val (clustered, centroids) = Similarity.kmeansIndex(
      emb, "vec_id", "embedding", k = 4, seed = 42L)
    Similarity.saveIndex(clustered, centroids, dir)
    val (loaded, loadedCents) = Similarity.loadIndex(spark, dir)
    assert(loadedCents == centroids)
    // cluster partitioning materialized as directories (probe pruning);
    // the initial build owns batch=-1 so streaming ingest can append
    // sibling batch=<id> directories at the same depth
    val parts = new java.io.File(s"$dir/corpus/batch=-1").listFiles()
      .map(_.getName).filter(_.startsWith("cluster=")).toSet
    assert(parts.nonEmpty)
    val q = emb.filter(col("vec_id") < 10)
    val fresh = Similarity.kmeansTopKMultiProbe(clustered, q, "vec_id",
        "embedding", centroids, k = 2, nProbe = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"))).toSet
    val viaLoaded = Similarity.kmeansTopKMultiProbe(loaded, q, "vec_id",
        "embedding", loadedCents, k = 2, nProbe = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"))).toSet
    assert(viaLoaded == fresh)
  }

  test("kmeans with bounded training sample still assigns every row") {
    val total = emb.count()
    val sampled = Similarity.kmeansClusters(emb, "vec_id", "embedding",
      k = 4, seed = 42L, maxTrainRows = Some(total / 4))
    // assignment covers the FULL corpus even though fit saw a sample
    assert(sampled.count() == total)
    assert(sampled.filter(col("cluster").isNull).count() == 0)
    assert(sampled.select("cluster").distinct().count() >= 2)
    // deterministic: the hash-sample (and so the centroids) are stable
    val again = Similarity.kmeansClusters(emb, "vec_id", "embedding",
      k = 4, seed = 42L, maxTrainRows = Some(total / 4))
    assert(sampled.select("vec_id", "cluster")
      .exceptAll(again.select("vec_id", "cluster")).isEmpty)
  }

  test("semDeDup: one survivor per duplicate group, least-central wins, loners pass") {
    import org.apache.spark.sql.expressions.Window
    val out = Similarity.semDeDup(emb, "vec_id", "embedding", "label", eps = 0.40)
    val pairs = Similarity.blockedNearDupPairs(emb, "vec_id", "embedding",
      "label", 0.40)
    val comp = graft.dedup.Dedup.connectedComponents(pairs, "vec_id")
    val scored = Similarity.centroidCosine(emb, "vec_id", "embedding", "label")
    // cardinality: every non-member survives, every component keeps one
    val total = emb.count()
    val members = comp.count()
    val nClusters = comp.select("cluster_id").distinct().count()
    assert(members > 0, "fixture must contain semantic duplicates")
    assert(out.count() == total - members + nClusters)
    // the survivor of each component is the arg-min centroid cosine
    // (ties to lowest id) — the window spelling is the independent twin
    val expected = scored.join(comp, "vec_id")
      .withColumn("rn", row_number().over(Window.partitionBy("cluster_id")
        .orderBy(col("centroid_cos"), col("vec_id"))))
      .filter(col("rn") === 1).select("vec_id")
    val inClusters = out.join(comp, "vec_id").select("vec_id")
    assert(inClusters.exceptAll(expected).isEmpty &&
      expected.exceptAll(inClusters).isEmpty)
    // centroid cosine is a valid cosine
    assert(out.filter(abs(col("centroid_cos")) > 1.0 + 1e-9).count() == 0)
    // a single-member label's vector IS the centroid direction → cos 1
    val solo = emb.limit(1).withColumn("label", lit(999999))
    val soloCos = Similarity.centroidCosine(solo, "vec_id", "embedding", "label")
      .select("centroid_cos").head().getDouble(0)
    assert(math.abs(soloCos - 1.0) < 1e-12, s"solo cos = $soloCos")
  }

  test("int8 compression: 4x narrower codes, bounded error, high search recall") {
    val compressed = Similarity.compressInt8(emb, "embedding")
    // schema: byte codes + one float scale replace the float array
    val f = compressed.schema("embedding_i8").dataType
    assert(f == org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.ByteType, containsNull = false) ||
      f.simpleString.startsWith("array<tinyint>"), f.simpleString)

    val restored = Similarity.decompressInt8(compressed, "embedding")
    // per-component reconstruction error ≤ scale/2 (round-to-nearest)
    val joined = emb.select(col("vec_id"), col("embedding").as("orig"))
      .join(restored.select(col("vec_id"), col("embedding").as("back")), "vec_id")
      .join(Similarity.compressInt8(emb, "embedding")
        .select(col("vec_id"), col("embedding_scale")), "vec_id")
    val maxErrOverHalfScale = joined.select(
      max(aggregate(zip_with(col("orig"), col("back"),
          (a, b) => abs(a - b)), lit(0.0f), (acc, x) => greatest(acc, x))
        / (col("embedding_scale") / 2.0f)).as("m"))
      .collect().head.getAs[Number]("m").doubleValue
    assert(maxErrOverHalfScale <= 1.0001, s"err/halfScale = $maxErrOverHalfScale")

    // search on decompressed vectors: recall@5 vs raw ≥ 0.9
    val queries = emb.filter(col("vec_id") < 10)
    val braw = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val bcmp = Similarity.bruteForceTopK(restored,
        Similarity.decompressInt8(
          Similarity.compressInt8(queries, "embedding"), "embedding"),
        "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = braw.intersect(bcmp).size.toDouble / braw.size
    assert(recall >= 0.9, s"recall@5 after int8 = $recall")
  }

  test("contrastive pairs: positive in band, negative the hardest below") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // unit-ish 2d vectors at controlled angles to anchor (1, 0):
    //   id 1 ~ cos 0.995 (positive band), id 2 ~ cos 0.7 (also in band),
    //   id 3 ~ cos 0.3 (hard negative), id 4 ~ cos -0.9 (easy negative)
    def v(x: Double, y: Double) = Seq(x.toFloat, y.toFloat)
    val rows = Seq(
      Row(0L, v(1.0, 0.0)), Row(1L, v(0.995, 0.0998)),
      Row(2L, v(0.7, 0.714)), Row(3L, v(0.3, 0.954)),
      Row(4L, v(-0.9, 0.436)))
    val df = spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)))))
    val p = Similarity.contrastivePairs(df, df.filter(col("vec_id") === 0),
      "vec_id", "embedding", tau = 0.5).collect()
    assert(p.length === 1)
    val r = p.head
    assert(r.getAs[Long]("pos_id") === 1L, "best in-band positive")
    assert(r.getAs[Long]("neg_id") === 3L, "HARDEST below-band negative")
    assert(r.getAs[Double]("pos_cos") >= 0.5 &&
      r.getAs[Double]("neg_cos") < 0.5)
    // an anchor with no in-band positive yields no pair
    val none = Similarity.contrastivePairs(df,
      df.filter(col("vec_id") === 4), "vec_id", "embedding", tau = 0.99)
    assert(none.isEmpty)
  }

  test("cluster-balanced sample: quota per cell, least-prototypical first") {
    val sampled = Similarity.clusterBalancedSample(emb, "vec_id",
      "embedding", "label", quota = 3).collect()
    val byLabel = sampled.groupBy(_.getAs[Int]("label"))
    val cellSizes = emb.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    byLabel.foreach { case (lbl, rows) =>
      assert(rows.length === math.min(3L, cellSizes(lbl)).toInt,
        s"label $lbl must contribute min(quota, cell size)")
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      val cos = sorted.map(_.getAs[Double]("centroid_cos")).toSeq
      assert(cos.zip(cos.tail).forall { case (a, b) => a <= b },
        "rank 1 = least prototypical (lowest centroid cosine)")
    }
    // rank-1 rows are the true per-cell minima of the full scoring
    val scored = Similarity.centroidCosine(emb, "vec_id", "embedding",
      "label").collect()
    val minCos = scored.groupBy(_.getAs[Int]("label"))
      .map { case (l, rs) => l -> rs.map(_.getAs[Double]("centroid_cos")).min }
    byLabel.foreach { case (lbl, rows) =>
      val r1 = rows.find(_.getAs[Int]("rank") == 1).get
      assert(r1.getAs[Double]("centroid_cos") === minCos(lbl))
    }
  }
}
