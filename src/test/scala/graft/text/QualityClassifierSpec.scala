package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityClassifierSpec extends AnyFunSuite with SparkSpec {
  import QualityClassifier._

  private def toDF(rows: Seq[(Long, String, Int)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "label")
  }

  // linearly separable by vocabulary: "good" docs share bigrams over one
  // word set, "bad" docs over a disjoint one
  private lazy val toy = toDF(
    (0L until 30L).map { i =>
      val good = Seq.fill(6)(s"alpha beta gamma delta").mkString(" ")
      (i, s"$good tail${i % 7}", 1)
    } ++ (30L until 60L).map { i =>
      val bad = Seq.fill(6)(s"spam junk noise clutter").mkString(" ")
      (i, s"$bad tail${i % 7}", 0)
    })

  test("training separates a separable corpus; score() agrees on sign") {
    val m = train(toy, "doc_id", "text", "label", buckets = 256, iters = 60)
    val scored = score(toy, "doc_id", "text", m)
      .join(toy.select(col("doc_id"), col("label")), Seq("doc_id"))
      .select(col("doc_id"), col("clf_pass"), col("label"), col("clf_prob"))
      .collect()
    assert(scored.length == 60)
    val correct = scored.count(r => r.getInt(1) == r.getInt(2))
    assert(correct == 60, s"only $correct/60 correct after training")
    // probabilities land on the right side of 0.5 with real margin
    assert(scored.forall { r =>
      val p = r.getDouble(3)
      if (r.getInt(2) == 1) p > 0.6 else p < 0.4
    })
  }

  test("one GD iteration matches the hand-computed gradient step") {
    val tiny = toDF(Seq((0L, "a b a b", 1), (1L, "c d c d", 0)))
    val buckets = 32
    // replicate the feature map through the same Spark expressions the
    // trainer uses, then do the math in plain Scala
    val feats = Dsir.docBucketCounts(
        tiny.select(col("doc_id"), col("text")), "doc_id", "text", buckets)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2).toDouble))
    val byDoc = feats.groupBy(_._1)
    val lr = 2.0
    // w = 0, bias = 0 → sigmoid(0) = 0.5 → residual r_d = 0.5 − y_d
    val resid = Map(0L -> (0.5 - 1.0), 1L -> (0.5 - 0.0))
    val nDocs = 2.0
    val expected = Array.fill(buckets)(0.0)
    for ((d, rows) <- byDoc) {
      val n = rows.map(_._3).sum
      for ((_, b, c) <- rows)
        expected(b) -= lr * (resid(d) * c / n) / nDocs
    }
    val biasLr = 1.0
    val expectedBias = -biasLr * resid.values.sum / nDocs
    val m = train(tiny, "doc_id", "text", "label", buckets = buckets,
      iters = 1, lr = lr, l2 = 0.0, biasLr = biasLr)
    for (b <- 0 until buckets)
      assert(math.abs(m.weights(b) - expected(b)) < 1e-12,
        s"bucket $b: ${m.weights(b)} vs ${expected(b)}")
    assert(math.abs(m.bias - expectedBias) < 1e-12)
  }

  test("quantized scoring: integer margin matches hand computation") {
    val docs = toDF(Seq((7L, "a b a b c", 0)))
    val buckets = 32
    val feats = Dsir.docBucketCounts(
        docs.select(col("doc_id"), col("text")), "doc_id", "text", buckets)
      .collect().map(r => r.getLong(1).toInt -> r.getLong(2)).toMap
    // give every observed bucket a distinct weight, plus one unused
    val wq = feats.keys.toSeq.sorted.zipWithIndex
      .map { case (b, i) => (b, (i + 1) * 1000L) } :+ (31, 77L)
    val biasQ = -500L
    val out = scoreQuantized(docs, "doc_id", "text", wq, biasQ, buckets)
      .collect()
    assert(out.length == 1)
    val n = feats.values.sum
    val sc = feats.map { case (b, c) =>
      c * wq.find(_._1 == b).map(_._2).getOrElse(0L) }.sum
    assert(out(0).getLong(1) == n)
    assert(out(0).getLong(2) == sc)
    assert(out(0).getLong(3) == sc + biasQ * n)
    assert(out(0).getInt(4) == (if (sc + biasQ * n >= 0) 1 else 0))
  }

  test("quantize keeps topK by |w| and drops zeros; decision is preserved") {
    val m = train(toy, "doc_id", "text", "label", buckets = 256, iters = 60)
    val (wq, biasQ) = quantize(m, topK = 64)
    assert(wq.size <= 64 && wq.forall(_._2 != 0L))
    assert(wq.map(_._1) == wq.map(_._1).sorted, "fixture order: by bucket")
    val q = scoreQuantized(toy, "doc_id", "text", wq, biasQ, 256)
      .join(toy.select(col("doc_id"), col("label")), Seq("doc_id"))
      .collect()
    assert(q.length == 60)
    assert(q.count(r => r.getAs[Int]("clf_pass") == r.getAs[Int]("label"))
      == 60, "quantization must preserve the separable decision")
  }

  test("scoreQuantized plans a broadcast join, no shuffle of the weight side") {
    val plan = scoreQuantized(toy, "doc_id", "text",
        Seq((1, 5L), (2, -3L)), 0L, 256)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan.take(2000))
  }

  test("thresholdForKeepRate: quantile gate keeps ≈ the requested fraction") {
    val s = spark
    import s.implicits._
    // a scored frame with known margins 1..200 (the calibrator only
    // consumes clf_margin, whatever produced it)
    val frame = (1L to 200L).map(i => (i, i)).toDF("doc_id", "clf_margin")
    val thr = thresholdForKeepRate(frame, 0.30)
    val kept = frame.filter(col("clf_margin") >= thr).count()
    assert(kept >= 50 && kept <= 70, s"kept $kept of 200 at rate 0.30 (thr=$thr)")
    val thrAll = thresholdForKeepRate(frame, 1.0)
    assert(frame.filter(col("clf_margin") >= thrAll).count() == 200)
  }

  test("docs with fewer than two tokens are absent from scoring output") {
    val docs = toDF(Seq((1L, "solo", 0), (2L, "two tokens", 1)))
    val out = scoreQuantized(docs, "doc_id", "text", Seq((0, 1L)), 0L, 32)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(out == Set(2L))
  }
}
