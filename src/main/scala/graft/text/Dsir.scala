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
    * xxhash64 would be engine-internal) — delegated to the one central
    * spelling, [[graft.operators.Sampling.hash60]], so the 60-bit
    * scheme cannot drift between operators. */
  def featureBucket(gram: Column, buckets: Int): Column =
    pmod(graft.operators.Sampling.hash60(gram), lit(buckets.toLong))

  /** One row per (document, bigram occurrence): `(doc_id, bucket)`.
    * Map-only. The token array is MATERIALIZED once per row before the
    * shingle transform — `tokenShinglesAll`'s one-expression spelling
    * re-evaluates `split(text)` inside every lambda element (Catalyst
    * does not subexpression-eliminate across lambda bodies), turning a
    * T-token document into O(T²) tokenizer work; measured 4.5 s → sub-
    * second on the sf0.1 corpus. The hashed gram string is identical
    * (`concat_ws(" ", tok_i, tok_i+1)` == the 2-shingle), so oracle
    * parity is untouched. Documents shorter than 2 tokens contribute
    * no rows (and are absent from every downstream weight frame). */
  def docFeatures(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    // one compiled tokenize+hash pass per document
    // ([[graft.functions.NativeText.ngramBucketArray]]): the transform
    // spelling (kept in [[docFeaturesReference]] as the parity pin) ran
    // the whole md5 chain in an interpreted lambda per bigram
    // occurrence — the DSIR feature pass is corpus-linear, so that was
    // the tax class the other native buckets already retired
    docs.select(col(idCol).as("doc_id"),
        graft.functions.NativeText
          .ngramBucketArray(col(textCol), 2, buckets).as("__bs"))
      .select(col("doc_id"), explode(col("__bs")).as("bucket"))

  /** The HOF reference spelling of [[docFeatures]] (parity tests only
    * — interpreted). */
  private[graft] def docFeaturesReference(docs: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame = {
    val t = col("__toks")
    docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("__toks"))
      .where(size(t) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(t) - 2),
          i => featureBucket(
            concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2)),
            buckets))).as("bucket"))
  }

  /** Bucket occurrence counts over a corpus: ≤ `buckets` rows, however
    * large the corpus — the broadcastable sufficient statistic. */
  def bucketCounts(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    docFeatures(docs, idCol, textCol, buckets)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))

  /** Per-document bucket multiset `(doc_id, bucket, __c)` — the ONE
    * corpus shingle pass every weight variant consumes. Both the raw
    * dictionary (a further groupBy(bucket) of this) and the scoring
    * join hang off the same (doc_id, bucket) exchange, so Catalyst's
    * ReuseExchange materializes the scan + md5 + shuffle ONCE and the
    * dictionary branch reads the shuffle files — scanning the corpus
    * separately per branch would triple the dominant cost (text I/O +
    * hashing) at 100 TB. */
  def docBucketCounts(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    docFeatures(docs, idCol, textCol, buckets)
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("__c"))

  private def weighted(corpus: DataFrame, target: DataFrame,
      idCol: String, textCol: String, buckets: Int): DataFrame = {
    val perDoc = docBucketCounts(corpus, idCol, textCol, buckets)
    val tgt = bucketCounts(target, idCol, textCol, buckets)
      .withColumnRenamed("n", "__nt")
    val raw = perDoc.groupBy(col("bucket"))
      .agg(sum(col("__c")).as("__nr")) // derived — reuses perDoc's exchange
    perDoc
      .join(broadcast(tgt), Seq("bucket"), "left")
      .join(broadcast(raw), Seq("bucket"), "left")
  }

  /** Integer-exact fixed-point twin (see class doc): per-document
    * `dsir_score` = Σ over bigram occurrences of
    * (1e6·(n_t(bucket)+1)) div (n_r(bucket)+1), plus the bigram count
    * and the mean score (one bigint/bigint IEEE division — the same
    * single-division exactness contract as the TF-IDF score).
    * Occurrences of one bucket share a weight, so the sum is
    * Σ_buckets c·W — computed over the pre-aggregated per-doc counts,
    * one corpus scan total. */
  def quantizedWeights(corpus: DataFrame, target: DataFrame,
      idCol: String, textCol: String, buckets: Int = 4096): DataFrame =
    weighted(corpus, target, idCol, textCol, buckets)
      .withColumn("__w",
        expr("(1000000L * (coalesce(__nt, 0L) + 1L)) div (coalesce(__nr, 0L) + 1L)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("__c")).as("n_bigrams"),
        sum(col("__c") * col("__w")).as("dsir_score"))
      .withColumn("mean_score",
        col("dsir_score").cast(DoubleType) / col("n_bigrams"))

  /** Per-document log importance weight under target vs raw hashed
    * bigram distributions (Laplace-smoothed, the paper's estimator).
    * Output: (doc_id, n_bigrams, dsir_logweight). Higher = more
    * target-like. Double `ln`/sum — see the class doc for why this is
    * test-verified rather than oracle-checked.
    *
    * The smoothing denominators need the corpus-total bigram counts as
    * SCALARS, so the two ≤B-row dictionaries are collected once and
    * re-parallelized (breaking lineage — re-deriving the totals inside
    * the plan trips Spark's self-join dedup into AMBIGUOUS_REFERENCE,
    * and a separate .agg action would re-run the scan): one target
    * scan + two corpus scans total. The oracle-gated
    * [[quantizedWeights]] needs no totals and keeps the single-scan
    * exchange-reuse shape. */
  def importanceWeights(corpus: DataFrame, target: DataFrame,
      idCol: String, textCol: String, buckets: Int = 4096): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val tgtRows = bucketCounts(target, idCol, textCol, buckets)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val rawRows = bucketCounts(corpus, idCol, textCol, buckets)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val nT = tgtRows.map(_._2).sum
    val nR = rawRows.map(_._2).sum
    val logRatio =
      log((coalesce(col("__nt"), lit(0L)) + 1).cast(DoubleType) /
          (nT + buckets).toDouble) -
      log((coalesce(col("__nr"), lit(0L)) + 1).cast(DoubleType) /
          (nR + buckets).toDouble)
    docBucketCounts(corpus, idCol, textCol, buckets)
      .join(broadcast(tgtRows.toDF("bucket", "__nt")), Seq("bucket"), "left")
      .join(broadcast(rawRows.toDF("bucket", "__nr")), Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("__c")).as("n_bigrams"),
        sum(col("__c") * logRatio).as("dsir_logweight"))
  }

  /** Select the `n` most target-like documents by quantized score
    * (deterministic: doc id breaks ties). Global top-n is a
    * TakeOrdered — per-partition heap + driver merge of n·P rows, no
    * global sort. */
  def selectTop(weights: DataFrame, n: Int): DataFrame =
    weights.orderBy(col("dsir_score").desc, col("doc_id")).limit(n)
}
