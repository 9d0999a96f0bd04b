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
