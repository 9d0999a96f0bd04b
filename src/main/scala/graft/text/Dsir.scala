package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** DSIR-style data selection: hashed n-gram importance weights
  * (Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling", arXiv:2302.03169). Rank raw-corpus documents by how
  * target-like their hashed bigram distribution is — the cheap,
  * training-free selection step a 100 TB pretraining pipeline runs
  * between cleaning and mixing. The reference pipeline has no
  * data-selection stage (its unit of work is one extraction batch —
  * `src/ingestion/extractors.py:100-117`); this is part of the
  * training-data extension surface.
  *
  * Method: each document is a bag of bigrams hashed into `buckets`
  * features; the target corpus and the raw corpus each induce a
  * Laplace-smoothed bucket distribution; a document's importance weight
  * is the likelihood ratio of its features under target vs raw. Two
  * renderings share one plumbing:
  *
  *  - [[importanceWeights]] — the paper's estimator: log w(x) =
  *    Σ_b c_b(x)·(log p̂_t(b) − log p̂_r(b)). Double-precision `ln` is
  *    engine-specific in the last ulp, so this is the LIBRARY surface,
  *    verified by ScalaTest, not an oracle row.
  *  - [[quantizedWeights]] — an integer-exact fixed-point twin for the
  *    correctness gate: per-bucket weight W(b) = (S·(n_t(b)+1)) div
  *    (n_r(b)+1) with S = 10^6, summed per document. The global
  *    normalizer (N_r+B)/(N_t+B) multiplies every document's weight
  *    equally and is dropped — selection only consumes the ranking.
  *    Integer division and bigint sums are bit-identical across
  *    engines, so DuckDB can replay the whole computation.
  *
  * Scale design: the two distribution aggregates reduce to ≤ `buckets`
  * rows (partial aggregation map-side; B is a constant, not data-sized)
  * and broadcast; the per-document pass explodes bigrams ONCE, joins
  * the broadcast counts map-side, and aggregates by document — one
  * shuffle over (doc, score) rows. Nothing all-pairs, nothing
  * driver-sized except the B-row dictionaries.
  *
  * Overflow bound (documented, not latent): W(b) ≤ S·(N_t+1), and a
  * document's score ≤ n_bigrams(doc)·max W. With S=10^6 a corpus of
  * 10^12 target bigrams and 10^5-token documents stays within int64
  * iff max W ≲ 9·10^13 — i.e. the most target-skewed bucket ratio is
  * below ~10^8, true for any smoothed natural-language distribution.
  * For adversarial corpora lower S or raise `buckets`.
  */
object Dsir {

  /** Hashed feature id of one n-gram: the md5-twin bucket scheme every
    * oracle-checked hash in this repo uses (DuckDB replays it exactly;
    * xxhash64 would be engine-internal). 60 bits → pmod buckets. */
  def featureBucket(gram: Column, buckets: Int): Column =
    pmod(conv(substring(md5(gram), 1, 15), 16, 10).cast(LongType),
      lit(buckets.toLong))

  /** One row per (document, bigram occurrence): `(doc_id, bucket)`.
    * Map-only: explode of the native shingle expression + the bucket
    * projection. Documents shorter than 2 tokens contribute no rows
    * (and are absent from every downstream weight frame). */
  def docFeatures(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokenShinglesAll(col(textCol), 2)).as("gram"))
      .select(col("doc_id"), featureBucket(col("gram"), buckets).as("bucket"))

  /** Bucket occurrence counts over a corpus: ≤ `buckets` rows, however
    * large the corpus — the broadcastable sufficient statistic. */
  def bucketCounts(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    docFeatures(docs, idCol, textCol, buckets)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))

  /** Per-document log importance weight under target vs raw hashed
    * bigram distributions (Laplace-smoothed, the paper's estimator).
    * Output: (doc_id, n_bigrams, dsir_logweight). Higher = more
    * target-like. Double `ln`/sum — see the class doc for why this is
    * test-verified rather than oracle-checked. */
  def importanceWeights(corpus: DataFrame, target: DataFrame,
      idCol: String, textCol: String, buckets: Int = 4096): DataFrame = {
    val tgt = bucketCounts(target, idCol, textCol, buckets)
      .withColumnRenamed("n", "__nt")
    val raw = bucketCounts(corpus, idCol, textCol, buckets)
      .withColumnRenamed("n", "__nr")
    // corpus-total bigram counts: one tiny agg over the ≤B-row
    // dictionaries (already computed), not another corpus scan
    val nT = tgt.agg(coalesce(sum(col("__nt")), lit(0L))).head().getLong(0)
    val nR = raw.agg(coalesce(sum(col("__nr")), lit(0L))).head().getLong(0)
    val logRatio =
      log((coalesce(col("__nt"), lit(0L)) + 1).cast(DoubleType) /
          (nT + buckets).toDouble) -
      log((coalesce(col("__nr"), lit(0L)) + 1).cast(DoubleType) /
          (nR + buckets).toDouble)
    docFeatures(corpus, idCol, textCol, buckets)
      .join(broadcast(tgt), Seq("bucket"), "left")
      .join(broadcast(raw), Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(logRatio).as("dsir_logweight"))
  }

  /** Integer-exact fixed-point twin (see class doc): per-document
    * `dsir_score` = Σ over bigram occurrences of
    * (1e6·(n_t(bucket)+1)) div (n_r(bucket)+1), plus the bigram count
    * and the mean score (one bigint/bigint IEEE division — the same
    * single-division exactness contract as the TF-IDF score). */
  def quantizedWeights(corpus: DataFrame, target: DataFrame,
      idCol: String, textCol: String, buckets: Int = 4096): DataFrame = {
    val tgt = bucketCounts(target, idCol, textCol, buckets)
      .withColumnRenamed("n", "__nt")
    val raw = bucketCounts(corpus, idCol, textCol, buckets)
      .withColumnRenamed("n", "__nr")
    docFeatures(corpus, idCol, textCol, buckets)
      .join(broadcast(tgt), Seq("bucket"), "left")
      .join(broadcast(raw), Seq("bucket"), "left")
      .withColumn("__w",
        expr("(1000000L * (coalesce(__nt, 0L) + 1L)) div (coalesce(__nr, 0L) + 1L)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("__w")).as("dsir_score"))
      .withColumn("mean_score",
        col("dsir_score").cast(DoubleType) / col("n_bigrams"))
  }

  /** Select the `n` most target-like documents by quantized score
    * (deterministic: doc id breaks ties). Global top-n is a
    * TakeOrdered — per-partition heap + driver merge of n·P rows, no
    * global sort. */
  def selectTop(weights: DataFrame, n: Int): DataFrame =
    weights.orderBy(col("dsir_score").desc, col("doc_id")).limit(n)
}
