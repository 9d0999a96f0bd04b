package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DsirSpec extends AnyFunSuite with SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  // target corpus speaks "alpha beta"; off-target speaks "gamma delta"
  private val target = docsDf(Seq(
    1L -> "alpha beta alpha beta alpha beta",
    2L -> "alpha beta gamma alpha beta"))
  private val corpus = docsDf(Seq(
    10L -> "alpha beta alpha beta",          // target-like
    11L -> "gamma delta gamma delta",        // off-target
    12L -> "alpha beta gamma delta"))        // mixed

  test("log importance weights rank target-like docs above off-target") {
    val w = Dsir.importanceWeights(corpus, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(10L) > w(12L) && w(12L) > w(11L), w)
  }

  test("quantized weights agree with the log-domain ranking") {
    val q = Dsir.quantizedWeights(corpus, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(q(10L) > q(12L) && q(12L) > q(11L), q)
  }

  test("quantized weights are exact fixed-point sums (hand computation)") {
    // 6 distinct bigrams across both corpora; with 4096 buckets none
    // collide (asserted), so per-bucket counts = per-bigram counts
    val feats = Dsir.docFeatures(corpus.unionByName(target),
      "doc_id", "text", 4096)
    val distinctBuckets = feats.select("bucket").distinct().count()
    assert(distinctBuckets == 6,
      s"expected 6 distinct bigram buckets, got $distinctBuckets")

    // target bigram counts: {alpha beta: 5, beta alpha: 2,
    // beta gamma: 1, gamma alpha: 1}; raw = corpus: {alpha beta: 3,
    // beta alpha: 1, gamma delta: 3, delta gamma: 1, beta gamma: 1}
    // doc 11 "gamma delta gamma delta" → grams: gd, dg, gd
    //   W(gd) = 1e6·(0+1) div (3+1) = 250000 (×2)
    //   W(dg) = 1e6·(0+1) div (1+1) = 500000
    val q = Dsir.quantizedWeights(corpus, target, "doc_id", "text")
      .filter(col("doc_id") === 11L).head()
    assert(q.getLong(1) == 3L)              // n_bigrams
    assert(q.getLong(2) == 250000L * 2 + 500000L, q)
  }

  test("bucket counts total the corpus bigram count; short docs drop out") {
    val one = docsDf(Seq(20L -> "solo", 21L -> "", 22L -> "two tokens"))
    val counts = Dsir.bucketCounts(one, "doc_id", "text", 64)
    assert(counts.agg(coalesce(sum("n"), lit(0L))).head().getLong(0) == 1L)
    val w = Dsir.quantizedWeights(one, one, "doc_id", "text", 64)
    assert(w.select("doc_id").collect().map(_.getLong(0)).toSet == Set(22L))
  }

  test("selectTop returns n docs, score-desc, id tiebreak, deterministically") {
    val w = Dsir.quantizedWeights(corpus, target, "doc_id", "text")
    val top2 = Dsir.selectTop(w, 2).select("doc_id")
      .collect().map(_.getLong(0)).toList
    assert(top2 == List(10L, 12L), top2)
  }

  test("native docFeatures ≡ HOF reference (bigram md5 buckets per " +
      "occurrence, short docs drop, boundary-empty tokens included); " +
      "the feature projection carries no CodegenFallback") {
    val s = spark
    import s.implicits._
    val real = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val edge = Seq(
      (900001L, ""), (900002L, "one"), (900003L, " leading space pair"),
      (900004L, "trailing pair "), (900005L, "a  b"),
      (900006L, "多 字节 字")).toDF("doc_id", "text")
    val docs = real.unionByName(edge)
    def counts(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("doc_id", "bucket").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val native = Dsir.docFeatures(docs, "doc_id", "text", 4096)
    val ref = counts(Dsir.docFeaturesReference(docs, "doc_id", "text", 4096))
    assert(counts(native) == ref)
    native.collect()
    val found = graft.PlanProbe.codegenFallbacks(native)
    assert(found.isEmpty, s"interpreted expressions: $found")
  }

  test("distribution dictionaries stay bucket-bounded (broadcast side)") {
    val counts = Dsir.bucketCounts(corpus, "doc_id", "text", buckets = 8)
    assert(counts.count() <= 8)
    // and the per-doc pass plans broadcast joins, not shuffles of the
    // dictionaries
    val plan = Dsir.quantizedWeights(corpus, target, "doc_id", "text", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
