package graft.dedup

import graft.SparkSpec
import graft.similarity.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape pins for the candidate-generation paths: the property that
  * makes them survive 100 TB is that every "pair" join is an EQUI-join
  * on a blocking key (band hash / chunk / bucket) — a refactor that
  * degrades one to a cartesian/nested-loop product must fail here, not
  * on the cluster. */
class DedupPlanSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def assertNoProduct(plan: String): Unit = {
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  /** Executes `df` and returns the FINAL adaptive plan — exchange reuse
    * is stitched by AQE at runtime, so the static explain can't show it.
    * collect() (not write) drives THIS QueryExecution; a write plans a
    * fresh one and the inspected plan would stay isFinalPlan=false. */
  private def executedPlanOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("minhash-LSH candidates: banded equi-join, no cross product") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
    val cands = Dedup.lshCandidatePairs(sigs, "doc_id", bands = 16)
    assertNoProduct(planOf(cands))
    // the self-join's two sides must share ONE exchange (signatures and
    // banding computed once) — the shuffle_hash hint exists for this;
    // a broadcast pick would re-scan and re-minhash the corpus
    val fin = executedPlanOf(cands)
    assert(fin.contains("ReusedExchange") || fin.contains("ReusedQueryStage"), fin)
  }

  test("incremental candidates: equi-joins only, self side reuses its exchange") {
    val newDocs = docs.filter(col("doc_id") % 2 === 1)
    val indexSigs = Dedup.minhashSignatures(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
    val newSigs = Dedup.minhashSignatures(newDocs, "doc_id", "text")
    val cands = Dedup.incrementalCandidatePairs(newSigs, indexSigs,
      "doc_id", bands = 16)
    assertNoProduct(planOf(cands))
    val fin = executedPlanOf(cands)
    assert(fin.contains("ReusedExchange") || fin.contains("ReusedQueryStage"), fin)
  }

  test("simhash pairs (both hash spaces): chunk equi-join, no cross product") {
    assertNoProduct(planOf(
      Dedup.simhashNearDuplicates(docs, "doc_id", "text")))
    assertNoProduct(planOf(
      Dedup.simhashMd5NearDuplicates(docs, "doc_id", "text")))
  }

  test("verifyJaccard narrows the corpus with a semi-join before shingling") {
    val pairs = spark.range(2).selectExpr(
      "id * 2 + 1 AS id_a", "id * 2 + 2 AS id_b")
    val plan = planOf(Dedup.verifyJaccard(docs, pairs, "doc_id", "text",
      shingleSize = 5, threshold = 0.8))
    assert(plan.contains("LeftSemi"), plan)
    assertNoProduct(plan)
  }

  test("hyperplane LSH top-k: bucket equi-join, no cross product") {
    val q = emb.filter(col("vec_id") < 5)
    val plan = planOf(Similarity.hyperplaneTopK(emb, q, "vec_id",
      "embedding", k = 1, nPlanes = 4, dim = 64))
    assertNoProduct(plan)
    // the heap operator, not Sort+Window, produces the top-k
    assert(plan.contains("TopKPerKey"), plan)
  }
}
