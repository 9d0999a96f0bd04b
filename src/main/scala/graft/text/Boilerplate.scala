package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate detection: token n-gram spans that recur
  * across many documents (navigation chrome, license headers, templated
  * fragments) and the per-document contamination ratio — the
  * C4/RefinedWeb-style cleaning step between exact dedup (d1) and
  * near-dup removal (d2). The reference pipeline has no corpus-level
  * text analysis (its unit of validation is one batch —
  * `src/ingestion/validators.py:118-152`); this is part of the
  * training-data extension surface.
  *
  * Scale design:
  *  - spans come from the native [[TextFunctions.tokenShingles]]
  *    expression (map-only, codegen) with `array_distinct` applied
  *    per-document BEFORE the explode — so a span repeated inside one
  *    doc costs one exploded row, and the span count IS the document
  *    frequency (no countDistinct/Expand rewrite);
  *  - one shuffle on the span for the frequency aggregate; the ratio
  *    join re-uses the same span partitioning (both sides of the join
  *    hash-partition on `span`, and the aggregate side is tiny after
  *    the `minDocs` filter);
  *  - per-document totals ride along in the same aggregate — the
  *    corpus is scanned once.
  */
object Boilerplate {

  /** One row per (document, distinct span). The building block both
    * public operators share. */
  def docSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(TextFunctions.tokenShingles(col(textCol), n)))
        .as("span"))

  /** N-gram decontamination: for each corpus document, the number of
    * its distinct n-gram spans that occur anywhere in `evalSet` — the
    * partial-overlap form of train/eval leakage detection (a
    * whole-document fingerprint misses one copied paragraph; shared
    * n-grams don't). Eval sets are small by nature: their distinct
    * span set broadcasts, the corpus shingles ONCE and streams through
    * a left-semi join — corpus rows never shuffle. Documents with zero
    * overlap are absent from the output (the common use is "flag and
    * drop"; anti-join the ids against the corpus to apply). */
  def ngramContamination(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int = 5): DataFrame = {
    val evalSpans = docSpans(evalSet, idCol, textCol, n)
      .select(col("span")).distinct()
    docSpans(corpus, idCol, textCol, n)
      .join(broadcast(evalSpans), Seq("span"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlapping_ngrams"))
  }

  /** Spans appearing in at least `minDocs` distinct documents, with
    * their document frequency. Plain `count` is exact document
    * frequency because [[docSpans]] already de-duplicated spans within
    * each document. */
  def frequentSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDocs: Long = 3L): DataFrame =
    docSpans(docs, idCol, textCol, n)
      .groupBy(col("span"))
      .agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDocs)

  /** Per-document boilerplate ratio: the fraction of a document's
    * distinct spans that are corpus-frequent. Documents shorter than
    * the shingle size have no spans and are absent from the output
    * (nothing to measure). The ratio is bigint/bigint → one IEEE
    * division, engine-exact.
    *
    * Span frequency is a COUNT-over-window on the span partitioning,
    * not a groupBy + self-join: the aggregate-then-join spelling plans
    * two full scans of the corpus (partial aggregation below the
    * frequency shuffle makes the exchanges non-reusable), and at 100 TB
    * re-scanning + re-shingling every document dwarfs the window's
    * in-partition sort of the exploded spans. This shape shingles
    * once: Generate → Exchange(span) → Window → Exchange(doc_id). */
  def boilerplateRatio(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDocs: Long = 3L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wSpan = Window.partitionBy(col("span"))
    docSpans(docs, idCol, textCol, n)
      .withColumn("doc_freq", count(lit(1)).over(wSpan))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        count(when(col("doc_freq") >= minDocs, lit(1))).as("n_frequent"))
      .withColumn("boilerplate_ratio",
        col("n_frequent").cast("double") / col("n_spans"))
  }
}
