package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Model-based document quality filtering: a logistic-regression
  * classifier over hashed bigram features, the DCLM / fastText-style
  * quality gate (Li et al. 2024, "DataComp-LM", arXiv:2406.11794 §4.4;
  * Joulin et al. 2016, "Bag of Tricks for Efficient Text
  * Classification", arXiv:1607.01759). Rule-based gates (Gopher, C4)
  * encode fixed thresholds; the trained gate learns which n-gram
  * distributions correlate with a quality label and generalizes beyond
  * the rules — DCLM found it the single highest-leverage curation step.
  * The reference pipeline has no model-based filtering (its transforms
  * are fixed SQL models — `src/transformation/dbt_runner.py`); this
  * extends the training-data curation surface alongside [[Dsir]].
  *
  * Two-phase by design, matching how the gate runs at 100 TB:
  *
  *  - '''train''' runs OFFLINE on a labeled sample (thousands to
  *    millions of docs — labels come from a reference corpus, human
  *    ratings, or distilling a rule gate). Each iteration is two
  *    aggregations over a cached feature frame; the model itself is
  *    ≤ `buckets` weights — driver/broadcast-sized by construction,
  *    like the DSIR dictionaries.
  *  - '''score''' runs AT CORPUS SCALE: one shingle pass per document,
  *    one broadcast join against the (sparse) weight table, one
  *    (doc, score) aggregation — the exact plan shape of
  *    [[Dsir.quantizedWeights]], nothing all-pairs, nothing driver-
  *    sized. Integer fixed-point weights make the scoring pass
  *    DuckDB-replayable (the tx_clf_score / tx_clf_eval oracle rows).
  *
  * Feature map: bag of hashed bigrams (the repo-wide md5 60-bit bucket
  * scheme, [[Dsir.featureBucket]]), length-normalized — x_b = c_b / n
  * with n the doc's bigram count, so long documents don't dominate the
  * margin. Documents with < 2 tokens have no features and are absent
  * from scoring output (the [[Dsir]] convention).
  */
object QualityClassifier {

  /** A trained hashed-bigram logistic model: dense per-bucket weights
    * plus intercept. margin(doc) = bias + Σ_b w_b · c_b / n. */
  final case class LogRegModel(buckets: Int, weights: Array[Double],
      bias: Double) {
    require(weights.length == buckets)
  }

  /** Train by full-batch gradient descent on a labeled frame
    * (`labelCol` ∈ {0, 1}). Per iteration: one pass computes per-doc
    * margins (groupBy doc over the cached feature frame joined to the
    * broadcast weight table), one pass accumulates per-bucket gradients
    * (join residuals back on the SAME doc_id partitioning, groupBy
    * bucket → ≤ `buckets` rows to the driver). L2-regularized,
    * constant step — full-batch GD on a convex loss needs no tuning
    * schedule to converge to the shipping-quality optimum here.
    *
    * The labeled frame is scanned ONCE (feature extraction is cached);
    * iterations touch only (doc, bucket, c, n, y) rows. Float gradient
    * sums are shuffle-order-dependent in the last ulp, so training is
    * test-verified (QualityClassifierSpec) rather than oracle-checked;
    * the SHIPPED scoring path runs on quantized committed weights and
    * is oracle-exact. */
  def train(labeled: DataFrame, idCol: String, textCol: String,
      labelCol: String, buckets: Int = 4096, iters: Int = 80,
      lr: Double = 2.0, l2: Double = 1e-4,
      biasLr: Double = 1.0): LogRegModel = {
    val spark = labeled.sparkSession
    import spark.implicits._
    val perDoc = Dsir.docBucketCounts(
      labeled.select(col(idCol).as("doc_id"), col(textCol)),
      "doc_id", textCol, buckets)
    val docMeta = labeled.select(col(idCol).as("doc_id"),
      col(labelCol).cast(DoubleType).as("__y"))
    val feats = perDoc
      .join(perDoc.groupBy(col("doc_id")).agg(sum(col("__c")).as("__n")),
        Seq("doc_id"))
      .join(docMeta, Seq("doc_id"))
      .select(col("doc_id"), col("bucket"), col("__c").cast(DoubleType),
        col("__n").cast(DoubleType), col("__y"))
      .toDF("doc_id", "bucket", "c", "n", "y")
      .persist()
    val nDocs = feats.select(col("doc_id")).distinct().count().toDouble
    require(nDocs > 0, "no trainable documents (all < 2 tokens?)")

    val weights = Array.fill(buckets)(0.0)
    var bias = 0.0
    for (_ <- 0 until iters) {
      val wDF = weights.zipWithIndex
        .map { case (w, b) => (b.toLong, w) }.toSeq.toDF("bucket", "w")
      val resid = feats.join(broadcast(wDF), Seq("bucket"))
        .groupBy(col("doc_id"))
        .agg((lit(bias) + sum(col("c") * col("w")) / first(col("n")))
            .as("m"),
          first(col("y")).as("y"))
        .select(col("doc_id"),
          (lit(1.0) / (lit(1.0) + exp(-col("m"))) - col("y")).as("r"))
      // one shuffle on doc_id (feats is already hash-partitioned by the
      // groupBy above — AQE reuses it), then bucket-grained gradients
      val resids = resid.persist()
      val g = feats.join(resids, Seq("doc_id"))
        .groupBy(col("bucket"))
        .agg(sum(col("r") * col("c") / col("n")).as("g"))
        .collect().map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
      val gBias = resids.agg(sum(col("r"))).head().getDouble(0)
      resids.unpersist()
      var b = 0
      while (b < buckets) {
        weights(b) -= lr * (g.getOrElse(b, 0.0) / nDocs + l2 * weights(b))
        b += 1
      }
      // the intercept's implicit feature has scale 1 while bucket
      // features have scale ~1/buckets — one step size cannot serve
      // both (a weight-sized lr sends the bias into sigmoid
      // saturation), so the intercept gets its own
      bias -= biasLr * gBias / nDocs
    }
    feats.unpersist()
    LogRegModel(buckets, weights, bias)
  }

  /** Float scoring (library surface): per-doc margin + probability
    * under a trained model. One shingle pass, broadcast weight join,
    * one (doc, score) aggregation. */
  def score(docs: DataFrame, idCol: String, textCol: String,
      model: LogRegModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wDF = model.weights.zipWithIndex
      .collect { case (w, b) if w != 0.0 => (b.toLong, w) }
      .toSeq.toDF("bucket", "w")
    Dsir.docBucketCounts(docs.select(col(idCol).as("doc_id"), col(textCol)),
        "doc_id", textCol, model.buckets)
      .join(broadcast(wDF), Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("__c")).as("n_bigrams"),
        (lit(model.bias) +
          sum(col("__c") * coalesce(col("w"), lit(0.0))) /
            sum(col("__c")).cast(DoubleType)).as("clf_margin"))
      .withColumn("clf_prob",
        lit(1.0) / (lit(1.0) + exp(-col("clf_margin"))))
      .withColumn("clf_pass", (col("clf_margin") >= 0).cast("int"))
  }

  /** Quantize a trained model for the oracle-exact scoring path: keep
    * the `topK` largest-|w| buckets at fixed point `scale` (default
    * 10⁶ — the repo-wide fixed-point convention), drop the rest. The
    * decision rule margin ≥ 0 becomes the integer comparison
    * Σ c_b·W_b + B·n ≥ 0 with W_b = round(w_b·scale),
    * B = round(bias·scale) — bit-identical across engines. */
  def quantize(model: LogRegModel, topK: Int = 256,
      scale: Long = 1000000L): (Seq[(Int, Long)], Long) = {
    val sparse = model.weights.zipWithIndex
      .map { case (w, b) => (b, math.round(w * scale)) }
      .filter(_._2 != 0L)
      .sortBy { case (b, wq) => (-math.abs(wq), b) }
      .take(topK)
      .sortBy(_._1)
    (sparse.toSeq, math.round(model.bias * scale))
  }

  /** Margin threshold that keeps ≈`keepRate` of scored documents —
    * how a curation run actually sets the gate ("keep the top 30% by
    * classifier margin", the DCLM selection rule) rather than trusting
    * margin ≥ 0. Accepts any frame with a numeric `clf_margin` column
    * ([[scoreQuantized]]'s long margins or [[score]]'s double margins);
    * the result is floored to a long so `clf_margin >= threshold` keeps
    * at LEAST the requested rate. One sketch aggregate
    * (`percentile_approx` — mergeable, bounded state at any corpus
    * size); apply with `clf_margin >= threshold`. */
  def thresholdForKeepRate(scored: DataFrame, keepRate: Double): Long = {
    require(keepRate > 0 && keepRate <= 1, s"keepRate in (0,1], got $keepRate")
    val row = scored.agg(percentile_approx(col("clf_margin"),
        lit(1.0 - keepRate), lit(10000)).as("thr"))
      .head()
    // numeric read by interface, not getLong: the quantized frame's
    // margin is long, score()'s is double — both are valid inputs
    if (row.isNullAt(0)) Long.MinValue
    else math.floor(row.get(0).asInstanceOf[Number].doubleValue()).toLong
  }

  /** Integer-exact scoring over committed quantized weights (the
    * oracle-gated corpus-scale pass): per doc,
    * `clf_score` = Σ_b c_b·W_b (int64), `clf_margin` = clf_score +
    * biasQ·n_bigrams, `clf_pass` = clf_margin ≥ 0. One shingle pass,
    * one broadcast join against the ≤topK-row weight table, one
    * (doc, score) shuffle — [[Dsir.quantizedWeights]]'s plan shape.
    *
    * Overflow bound: |clf_score| ≤ n·max|W| and |biasQ·n| ≤ 10⁶·scale·n;
    * a 10⁵-token document with |w| ≤ 10³ stays below 10¹⁴ — int64-safe
    * with 5 decades of headroom. */
  def scoreQuantized(docs: DataFrame, idCol: String, textCol: String,
      weightsQ: Seq[(Int, Long)], biasQ: Long,
      buckets: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wDF = weightsQ.map { case (b, w) => (b.toLong, w) }
      .toDF("bucket", "wq")
    Dsir.docBucketCounts(docs.select(col(idCol).as("doc_id"), col(textCol)),
        "doc_id", textCol, buckets)
      .join(broadcast(wDF), Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("__c")).as("n_bigrams"),
        sum(col("__c") * coalesce(col("wq"), lit(0L))).as("clf_score"))
      .withColumn("clf_margin",
        col("clf_score") + lit(biasQ) * col("n_bigrams"))
      .withColumn("clf_pass", (col("clf_margin") >= 0).cast("int"))
  }
}
