package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** CCNet-style language-model quality scoring (Wenzek et al. 2020,
  * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  * Data", arXiv:1911.00359): score every document by how probable its
  * token stream is under a reference language model, then split the
  * corpus into head / middle / tail quality bands. CCNet uses a KenLM
  * 5-gram model trained on Wikipedia; this engine's stand-in is a
  * hashed-bucket BIGRAM model with add-one smoothing trained on a
  * designated reference corpus — the same signal (garbled, rare, or
  * boilerplate-heavy text scores low) with sufficient statistics that
  * are broadcastable by construction.
  *
  * Model: tokens hash into `buckets` ids (md5-twin scheme, DuckDB can
  * replay it); p(v|u) = (c2(u,v)+1)/(c1(u)+B) where c2 counts bigram
  * buckets in the training corpus and c1(u) = Σ_v c2(u,v) counts
  * prefix occurrences — so Σ_v p(v|u) = 1 exactly.
  *
  * Two renderings, one plumbing (the [[Dsir]] pattern):
  *  - [[crossEntropy]] — the real thing: per-document mean −ln p and
  *    perplexity. Double `ln` is engine-specific in the last ulp →
  *    library surface, ScalaTest-verified.
  *  - [[quantizedScores]] — integer-exact fixed point for the oracle
  *    gate: per-token W = (10^6·(c2+1)) div (c1+B), summed per
  *    document; `mean_prob_q` is one bigint/bigint IEEE division.
  *    Monotone in each token's probability, so the band split it
  *    feeds ranks the same documents the real model would up to
  *    quantization (1e-6 absolute, documented).
  *
  * Scale design: c2 ≤ B² rows and c1 ≤ B rows whatever the corpus size
  * — both broadcast (B=1024 → ≤ 8 MB). The corpus pass shingles once,
  * map-joins the dictionaries, and shuffles only (doc, score) rows.
  * The band split uses [[graft.operators.Keys.globalRankWithCount]]
  * (bucketed distributed rank, forced) + the closed-form NTILE fill —
  * zero unpartitioned WindowExec, the fleet-pinned invariant.
  */
object LmScore {

  /** Hashed token id — THE md5-twin bucket scheme, one definition
    * ([[Dsir.featureBucket]]) so the oracle-pinned hash can't diverge
    * between the DSIR and LM surfaces. */
  def tokenBucket(tok: Column, buckets: Int): Column =
    Dsir.featureBucket(tok, buckets)

  /** One row per bigram occurrence: `(doc_id, bu, bv)` hashed token
    * pair, built DIRECTLY from adjacent token-array entries (the
    * DuckDB twin's toks[i]/toks[i+1] shape) — a join-the-gram-then-
    * split-it-again spelling would pay a string concat plus regex
    * splits per bigram on the corpus-sized hot path. Short docs yield
    * nothing. Map-only. */
  def bigramBuckets(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    docs.select(col(idCol).as("doc_id"), toks.as("__t"))
      .where(size(col("__t")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("__t")) - 2),
          i => struct(
            tokenBucket(element_at(col("__t"), i + 1), buckets).as("bu"),
            tokenBucket(element_at(col("__t"), i + 2), buckets).as("bv"))))
          .as("__p"))
      .select(col("doc_id"), col("__p.bu").as("bu"), col("__p.bv").as("bv"))
  }

  /** Training pass: bigram bucket counts (≤ B² rows) and the prefix
    * marginals derived from them (≤ B rows) — the model's entire
    * sufficient statistic, broadcastable at any corpus size. */
  def train(corpus: DataFrame, idCol: String, textCol: String,
      buckets: Int): (DataFrame, DataFrame) = {
    val c2 = bigramBuckets(corpus, idCol, textCol, buckets)
      .groupBy(col("bu"), col("bv")).agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(col("bu")).agg(sum(col("c2")).as("c1"))
    (c2, c1)
  }

  private def joinedModel(corpus: DataFrame, train: DataFrame,
      idCol: String, textCol: String, buckets: Int): DataFrame = {
    val (c2, c1) = this.train(train, idCol, textCol, buckets)
    bigramBuckets(corpus, idCol, textCol, buckets)
      .join(broadcast(c2), Seq("bu", "bv"), "left")
      .join(broadcast(c1), Seq("bu"), "left")
      .withColumn("__c2", coalesce(col("c2"), lit(0L)))
      .withColumn("__c1", coalesce(col("c1"), lit(0L)))
  }

  /** Integer-exact per-document scores: `(doc_id, n_bigrams, lm_score,
    * mean_prob_q)` with lm_score = Σ (10^6·(c2+1)) div (c1+B). Higher
    * = more reference-like. Documents under 2 tokens are absent. */
  def quantizedScores(corpus: DataFrame, train: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1024): DataFrame =
    joinedModel(corpus, train, idCol, textCol, buckets)
      .withColumn("__w",
        expr(s"(1000000L * (__c2 + 1L)) div (__c1 + ${buckets}L)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__w")).as("lm_score"))
      .withColumn("mean_prob_q",
        col("lm_score").cast(DoubleType) / col("n_bigrams"))

  /** The real estimator: per-document cross-entropy −(1/T)·Σ ln p and
    * perplexity exp(·) under the smoothed bigram model. Lower
    * cross-entropy = more reference-like. */
  def crossEntropy(corpus: DataFrame, train: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1024): DataFrame =
    joinedModel(corpus, train, idCol, textCol, buckets)
      .withColumn("__logp",
        log((col("__c2") + 1).cast(DoubleType) /
            (col("__c1") + buckets).cast(DoubleType)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (-avg(col("__logp"))).as("cross_entropy"))
      .withColumn("perplexity", exp(col("cross_entropy")))

  /** CCNet's head/middle/tail split over quantized scores: exact
    * SQL-standard NTILE(3) ordered by (mean_prob_q DESC, doc id),
    * computed from the distributed rank + closed-form tile fill — the
    * w_ntile_spend machinery, no unpartitioned window at any size. */
  def withQualityBands(scores: DataFrame): DataFrame = {
    import graft.operators.Keys
    // materialize the per-document scores ONCE: the distributed rank
    // needs three passes over its input (percentile-bounds probe,
    // per-bucket counts, final rank), and re-deriving this frame each
    // time would re-run the corpus scan + model joins 3× — the scores
    // frame is per-document aggregates, orders of magnitude smaller
    // than the corpus it came from (measured: 6.4 s → 2.5 s at sf0.1)
    val keyed = scores.localCheckpoint()
      .withColumn("__neg", -col("mean_prob_q"))
    val (ranked, n) = Keys.globalRankWithCount(keyed, "__neg", "__rn",
      smallBytes = 0L, tieBreakers = Seq(col("doc_id")))
    ranked
      .withColumn("__tile", Keys.ntileExpr(n, 3, "__rn"))
      .withColumn("quality_band",
        when(col("__tile") === 1, "head")
          .when(col("__tile") === 2, "middle").otherwise("tail"))
      .drop("__neg", "__rn", "__tile")
  }
}
