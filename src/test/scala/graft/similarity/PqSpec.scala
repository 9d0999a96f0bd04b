package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PqSpec extends AnyFunSuite with SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  // 16 subspaces of 4 dims, 32 centroids each: 16 bytes/vector (16×
  // smaller than 256 bytes of floats) — the setting that hits ≥0.9
  // refined recall on this synthetic corpus (measured; see git log)
  private val M = 16
  private val KSUB = 32

  private lazy val codebooks =
    Pq.train(emb, "vec_id", "embedding", M, KSUB, maxTrainRows = Some(400L))
  private lazy val (clustered, coarse) =
    Similarity.kmeansIndex(emb, "vec_id", "embedding", k = 10)
  private lazy val indexed = Pq.encode(clustered, "embedding", codebooks)

  test("codebooks: m books of ksub centroids of d/m dims; deterministic") {
    assert(codebooks.size == M)
    assert(codebooks.forall(cb => cb.size == KSUB && cb.forall(_.size == 64 / M)))
    val again =
      Pq.train(emb, "vec_id", "embedding", M, KSUB, maxTrainRows = Some(400L))
    assert(again == codebooks, "PQ training is not deterministic")
  }

  private def recallOf(df: org.apache.spark.sql.DataFrame,
      brute: Map[Long, Set[Long]]): Double = {
    val got = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    brute.map { case (qid, b) =>
      (b intersect got.getOrElse(qid, Set.empty)).size
    }.sum.toDouble / brute.map(_._2.size).sum
  }

  private lazy val q20 = emb.filter(col("vec_id") < 20)
  private lazy val brute10 =
    Similarity.bruteForceTopK(emb, q20, "vec_id", "embedding", 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("codes: length m, byte range [0, ksub); 16x smaller than floats") {
    val codes = indexed.select(col("embedding_pq")).collect()
      .map(_.getSeq[Byte](0))
    assert(codes.forall(c => c.length == M && c.forall(b => b >= 0 && b < KSUB)))
    // m bytes per vector vs 4·d for floats
    assert(4 * 64 / M == 16)
  }

  test("IVFADC recall@10; refined re-rank lifts it; probes are monotone") {
    val adcFull = recallOf(Pq.topK(indexed, q20, "vec_id", "embedding",
      coarse, codebooks, k = 10, nProbe = 10), brute10)
    val adcOne = recallOf(Pq.topK(indexed, q20, "vec_id", "embedding",
      coarse, codebooks, k = 10, nProbe = 1), brute10)
    val refined = recallOf(Pq.topKRefined(indexed, q20, "vec_id", "embedding",
      coarse, codebooks, k = 10, nProbe = 10, shortlist = 80), brute10)
    assert(adcFull >= 0.3, s"full-probe ADC recall@10 = $adcFull < 0.3")
    assert(adcFull >= adcOne, s"full-probe $adcFull < single-probe $adcOne")
    assert(refined >= 0.9, s"refined recall@10 = $refined < 0.9")
    assert(refined >= adcFull, s"re-rank lowered recall: $refined < $adcFull")
  }

  test("full shortlist + full probe degrades to EXACT brute force") {
    // with every cell probed and the shortlist covering the corpus,
    // the ADC stage prunes nothing and exact re-rank must reproduce
    // bruteForceTopK bit-for-bit (same quantized-dot cosine, same ties)
    val q = emb.filter(col("vec_id") < 5)
    val viaPq = Pq.topKRefined(indexed, q, "vec_id", "embedding", coarse,
        codebooks, k = 5, nProbe = 10, shortlist = 1000)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val viaBrute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(viaPq == viaBrute)
  }

  test("integer fast path (encodeQ/topKQ) == generic path on the fixture") {
    // both spellings are exact integer arithmetic over the committed
    // fixture, so their outputs must be IDENTICAL — the compiled-dotQ
    // path is a pure performance rewrite
    val prep = emb.select(col("vec_id"),
      Similarity.quantize(col("embedding")).as("q"))
    val clustered = prep.withColumn("cluster", element_at(
      Similarity.nearestCentroidsQ(col("q"), PqFixture.coarseL, 1), 1))
    val viaQ = Pq.topKQ(Pq.encodeQ(clustered, "q", PqFixture.codebooksL),
        prep.filter(col("vec_id") < 5), "vec_id", "q",
        PqFixture.coarseL, PqFixture.codebooksL, k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val clusteredD = prep.withColumn("cluster", element_at(
      Similarity.nearestCentroids(col("q"), PqFixture.coarse, 1), 1))
    val viaD = Pq.topK(Pq.encode(clusteredD, "q", PqFixture.codebooks),
        prep.filter(col("vec_id") < 5), "vec_id", "q",
        PqFixture.coarse, PqFixture.codebooks, k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(viaQ == viaD && viaQ.nonEmpty)
  }

  test("committed PqFixture: integer-valued, oracle-contract shapes") {
    // the sim_pq_adc oracle hard-codes 10 coarse cells, m=4 subspaces
    // of 16 dims, ksub=8 — a regenerated fixture that drifts from
    // those shapes would silently break the SQL twin
    assert(PqFixture.coarseL.size == 10 &&
      PqFixture.coarseL.forall(_.size == 64))
    assert(PqFixture.codebooksL.size == PqFixture.m &&
      PqFixture.m == 4 && PqFixture.ksub == 8)
    assert(PqFixture.codebooksL.forall(b =>
      b.size == PqFixture.ksub && b.forall(_.size == 16)))
    // doubles must round-trip the longs exactly (integer ADC contract)
    assert(PqFixture.coarse.flatten.forall(d => d == d.toLong.toDouble))
  }

  test("search plan: broadcast equi join on the coarse cell, no BNLJ") {
    val q = emb.filter(col("vec_id") < 5)
    val plan = Pq.topK(indexed, q, "vec_id", "embedding", coarse, codebooks,
      k = 3, nProbe = 2).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("native adcTableQ == Column reference bit for bit, incl. a " +
      "128-centroid codebook past the codegen limit") {
    val q = emb.select(Similarity.quantize(col("embedding")).as("q"))
      .localCheckpoint()
    val qBooks = PqFixture.codebooksL
    val cmp = q.select(
      Pq.adcTableQ(col("q"), qBooks).as("native"),
      Pq.adcTableQReference(col("q"), qBooks).as("ref"))
    assert(cmp.filter(col("native") =!= col("ref")).count() == 0)
    // big codebooks: m=8 x ksub=128 over dim 64 (sub=8) — the regime
    // where the Column spelling falls out of whole-stage codegen
    val rng = new scala.util.Random(11)
    val big = Seq.tabulate(8)(j => Seq.tabulate(128)(i =>
      Seq.tabulate(8)(d => (rng.nextInt(2000001) - 1000000).toLong)))
    val cmp2 = q.limit(100).select(
      Pq.adcTableQ(col("q"), big).as("native"),
      Pq.adcTableQReference(col("q"), big).as("ref"))
    assert(cmp2.filter(col("native") =!= col("ref")).count() == 0)
  }
}
