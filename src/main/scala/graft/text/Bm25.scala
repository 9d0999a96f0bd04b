package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** BM25 ranked retrieval over a document corpus (Robertson & Walker
  * 1994; the Okapi BM25 of Robertson et al., TREC-3) — the lexical
  * retrieval baseline a training-data pipeline needs next to the ANN
  * surface ([[graft.similarity.Similarity]]): query-term top-k for
  * eval-set mining, targeted corpus audits, and hybrid (lexical +
  * embedding) retrieval.
  *
  * score(d) = Σ_t IDF(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
  * with the standard k1 = 1.2, b = 0.75 — both RATIONAL (6/5, 3/4),
  * which makes the tf saturation term an integer ratio:
  *
  *   tf_part = 22·tf·avgdl / (10·tf·avgdl + 3·avgdl + 9·dl)
  *
  * Two renderings, one plumbing (the [[LmScore]] pattern):
  *  - [[scoreTopK]] — the real thing: IDF = ln(1 + (N−df+½)/(df+½)).
  *    Double `ln` is engine-specific in the last ulp → library
  *    surface, ScalaTest-verified.
  *  - [[quantizedTopK]] — integer-exact for the oracle gate: the IDF
  *    odds ratio (N−df+½)/(df+½) = (2N−2df+1)/(2df+1) kept UN-logged
  *    in fixed point (scale 10³), tf_part in fixed point (scale 10⁶,
  *    avgdl floored to an integer), W = (idf₃·tf_q) div 10³. Each
  *    term's weight is monotone in the true per-term BM25 weight
  *    (ln is monotone); the un-logged sum over-weights rare terms
  *    relative to true BM25 — documented, and Bm25Spec pins top-k
  *    agreement between the two renderings on the fixture.
  *
  * Scale: the corpus is tokenized once; the ONLY rows that reach a
  * shuffle are (doc, query-term) occurrences — the `isin` filter on
  * the broadcast term list runs map-side before the tf aggregate, so
  * corpus-size shuffle volume is proportional to query-term hits, not
  * tokens. df/IDF is a ≤|terms|-row aggregate. Top-k is a global
  * TakeOrdered (no full sort). Fixed-point overflow bound (documented,
  * guarded): idf₃·tf_q ≤ 2.2·10⁹·N/df — Long-safe to N ≈ 2·10⁹ docs
  * per scoring shard even at df = 1; beyond that, shard the corpus or
  * use [[scoreTopK]] (doubles have no such bound).
  */
object Bm25 {

  /** Lowercased whitespace tokens — the oracle-replayable tokenizer. */
  private def toks(text: Column): Column = TextFunctions.tokens(lower(text))

  /** Per-(doc, query-term) tf rows with doc length attached: the one
    * corpus explode, term-filtered BEFORE the aggregate shuffle. */
  private def termTf(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame =
    docs.select(col(idCol).as("doc_id"), toks(col(textCol)).as("__t"))
      .select(col("doc_id"), size(col("__t")).as("dl"),
        explode(col("__t")).as("tok"))
      .where(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))

  /** Corpus scalars (N docs, L total tokens) — one aggregate row. */
  private def corpusScalars(docs: DataFrame, idCol: String,
      textCol: String): (Long, Long) = {
    val r = docs.select(size(toks(col(textCol))).as("dl"))
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("l"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** Integer-exact BM25 top-k: `(doc_id, n_terms, bm25_q)` for the k
    * highest-scoring documents (score desc, doc_id ties), scale-10⁶
    * fixed point, SQL-replayable bit-for-bit. Documents matching no
    * query term are absent. */
  def quantizedTopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    val (n, l) = corpusScalars(docs, idCol, textCol)
    val avgq = math.max(1L, if (n > 0) l / n else 1L)
    val tf = termTf(docs, idCol, textCol, terms)
    val dfq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .withColumn("idf3",
        expr(s"(1000L * (2L * ${n}L - 2L * df + 1L)) div (2L * df + 1L)"))
    tf.join(broadcast(dfq), Seq("tok"))
      .withColumn("__tfq", expr(
        s"(1000000L * 22L * tf * ${avgq}L) div " +
        s"(10L * tf * ${avgq}L + 3L * ${avgq}L + 9L * dl)"))
      .withColumn("__w", expr("(idf3 * __tfq) div 1000L"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("__w")).as("bm25_q"))
      .orderBy(col("bm25_q").desc, col("doc_id"))
      .limit(k)
  }

  /** The real estimator: double BM25 with the standard log-odds IDF,
    * same top-k contract — `(doc_id, n_terms, bm25)`. */
  def scoreTopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    val (n, l) = corpusScalars(docs, idCol, textCol)
    val avg = if (n > 0) l.toDouble / n else 1.0
    val tf = termTf(docs, idCol, textCol, terms)
    val dfq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .withColumn("idf",
        log(lit(1.0) + (lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5)))
    tf.join(broadcast(dfq), Seq("tok"))
      .withColumn("__w",
        col("idf") * (col("tf").cast(DoubleType) * 2.2) /
          (col("tf") + lit(0.3) + lit(0.9) * col("dl") / avg))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("__w")).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }
}
