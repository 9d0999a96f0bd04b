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
    * pair — order-2 windows sliced from the per-document
    * [[bucketArray]] (each token md5-hashed ONCE, by the compiled
    * native expression; the previous direct spelling hashed every
    * interior token twice — once per adjacent window — through an
    * interpreted lambda). Same (doc_id, toks[i], toks[i+1]) shape the
    * DuckDB twin replays. Short docs yield nothing. Map-only. */
  def bigramBuckets(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    ngramWindowsOf(bucketArray(docs, idCol, textCol, buckets), 2)
      .withColumnRenamed("g1", "bu").withColumnRenamed("g2", "bv")

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

  /** Per-document hashed-token-id ARRAY: `(doc_id, bs)` — the one
    * md5-bucketing pass every n-gram order derives its windows from
    * (integer slicing of the array instead of re-hashing the text per
    * order). Native expression ([[graft.functions.BucketArrayExpr]]):
    * the `transform` spelling is an ArrayTransform HOF
    * (CodegenFallback), so the md5 chain ran INTERPRETED per token on
    * this corpus-linear path. Map-only. */
  def bucketArray(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      graft.functions.NativeText.bucketArray(col(textCol), buckets).as("bs"))

  /** Pure-Column reference formulation of [[bucketArray]]'s hashing
    * (parity tests — interpreted). */
  private[graft] def bucketArrayReference(docs: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      transform(TextFunctions.tokens(col(textCol)),
        t => tokenBucket(t, buckets)).as("bs"))

  /** One row per k-token window of the text: `(doc_id, g1..gk)` hashed
    * token ids, the order-k generalization of [[bigramBuckets]] —
    * windows sliced from a `(doc_id, bs)` [[bucketArray]] frame so
    * multi-order consumers hash each token ONCE. Documents shorter
    * than k yield nothing. Map-only. */
  def ngramWindowsOf(arr: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    // one compiled slice pass ([[graft.functions.NgramWindowsExpr]]):
    // the transform(sequence(...)) spelling (kept in
    // [[ngramWindowsOfReference]] as the parity pin) built each
    // window's struct through an interpreted lambda — every n-gram
    // order re-walked every document in the interpreter on the
    // LM-scoring corpus path
    arr.where(size(col("bs")) >= k)
      .select(col("doc_id"),
        explode(graft.functions.NativeVec.ngramWindows(col("bs"), k))
          .as("__w"))
      .select(col("doc_id") +: (1 to k).map(j =>
        col("__w").getItem(j - 1).as(s"g$j")): _*)
  }

  /** The HOF reference spelling of [[ngramWindowsOf]] (parity tests
    * only — interpreted). */
  private[graft] def ngramWindowsOfReference(arr: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    arr.where(size(col("bs")) >= k)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("bs")) - k),
          i => struct((1 to k).map(j =>
            element_at(col("bs"), i + j).as(s"g$j")): _*)))
          .as("__w"))
      .select(col("doc_id") +: (1 to k).map(j => col(s"__w.g$j").as(s"g$j")): _*)
  }

  /** [[ngramWindowsOf]] over raw text (hashes inline — single-order
    * callers). */
  def ngramWindows(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int, k: Int): DataFrame =
    ngramWindowsOf(bucketArray(docs, idCol, textCol, buckets), k)

  /** Order-5 training pass: raw occurrence counts of every 1..5-gram
    * in the reference corpus — the sufficient statistic of stupid
    * backoff (Brants et al. 2007, "Large Language Models in Machine
    * Translation", EMNLP §4: raw counts, no discounting). Returns
    * count frames keyed g1..gk with a `c` column, order 1 first. The
    * reference is tokenized+hashed ONCE (a localCheckpointed
    * [[bucketArray]], ~8 bytes/token); each order then slices integer
    * windows from it instead of re-running the per-token md5 chain
    * five times (bench-scale wall time is join-dominated so this is
    * not measurable at sf0.1, but at a real reference-corpus scale the
    * hashing pass is the linear-cost term).
    *
    * Size: order-k counts are bounded by the reference corpus's token
    * count, not by B^k — CCNet-style scoring trains on a curated
    * reference (Wikipedia), which is sample-sized relative to the
    * corpus being scored, so the tables broadcast; if a caller trains
    * on something crawl-sized, SafeBroadcastRule strips the hint and
    * the joins degrade to shuffle joins instead of OOMing the driver. */
  def train5(corpus: DataFrame, idCol: String, textCol: String,
      buckets: Int): Seq[DataFrame] = {
    val arr = bucketArray(corpus, idCol, textCol, buckets).localCheckpoint()
    (1 to 5).map { k =>
      ngramWindowsOf(arr, k)
        .groupBy((1 to k).map(j => col(s"g$j")): _*)
        .agg(count(lit(1)).as("c"))
    }
  }

  /** Integer-exact 5-gram stupid-backoff scores: `(doc_id, n_ngrams,
    * lm_score, mean_prob_q)` over every full-context position (docs
    * under 5 tokens are absent, like [[quantizedScores]]' under-2s).
    *
    * Per position with window (b1..b5), current token b5:
    * take the LONGEST order whose n-gram was seen in training and
    * charge S = 0.4^backoffs · count(gram)/count(context), rendered in
    * fixed point with EXACT integer multipliers (10^6·0.4^d is integer
    * for d ≤ 4: 1000000, 400000, 160000, 64000, 25600):
    *
    *   W = (1000000·c5(b1..b5)) div c4(b1..b4)        if c5 > 0
    *     | (400000·c4(b2..b5))  div c3(b2..b4)        elif c4 > 0
    *     | (160000·c3(b3..b5))  div c2(b3,b4)         elif c3 > 0
    *     | (64000·c2(b4,b5))    div c1(b4)            elif c2 > 0
    *     | (25600·(c1(b5)+1))   div (T1+B)            otherwise
    *
    * A seen gram's context count is never zero (the context window
    * exists wherever the gram window does), so every division is
    * well-defined; the unigram floor is add-one smoothed over the
    * bucket space so unseen tokens score nonzero. `lm_score` = Σ W —
    * higher = more reference-like; stupid backoff is a score, not a
    * normalized probability (the published trade for O(1) scoring at
    * web scale). Integer div end-to-end: a SQL oracle replays it
    * bit-for-bit.
    *
    * Why order 5 matters (the case bigrams miss): text stitched from
    * individually-plausible bigrams ("the cat sat on the park") scores
    * exactly like genuine text under [[quantizedScores]] but backs off
    * at order 5 and pays 0.4^d per unseen context — LmScoreSpec plants
    * exactly that. Scale: one corpus explode, nine BROADCAST joins
    * (model tables are reference-corpus-sized), one (doc) aggregate. */
  def quantizedScores5(corpus: DataFrame, train: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1024): DataFrame = {
    // materialize each count frame ONCE: orders 1..4 are consumed twice
    // (context + numerator roles) and order 1 a third time for T1 —
    // without this the differing per-role projections defeat
    // exchange-reuse canonicalization and the reference corpus would be
    // re-tokenized and re-aggregated per join (the withQualityBands
    // localCheckpoint rationale)
    val counts = train5(train, idCol, textCol, buckets).map(_.localCheckpoint())
    val t1 = counts.head.agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
    // one count frame per (order, role): renamed to the window
    // positions it matches, so every join is a plain usingColumns
    // broadcast hash join
    def renamed(k: Int, firstPos: Int, as: String): DataFrame =
      counts(k - 1).toDF(
        ((0 until k).map(j => s"b${firstPos + j}") :+ as): _*)
    val scored = ngramWindows(corpus, idCol, textCol, buckets, 5)
      .toDF("doc_id", "b1", "b2", "b3", "b4", "b5")
      .join(broadcast(renamed(5, 1, "c5")), Seq("b1", "b2", "b3", "b4", "b5"), "left")
      .join(broadcast(renamed(4, 1, "ctx4")), Seq("b1", "b2", "b3", "b4"), "left")
      .join(broadcast(renamed(4, 2, "num4")), Seq("b2", "b3", "b4", "b5"), "left")
      .join(broadcast(renamed(3, 2, "ctx3")), Seq("b2", "b3", "b4"), "left")
      .join(broadcast(renamed(3, 3, "num3")), Seq("b3", "b4", "b5"), "left")
      .join(broadcast(renamed(2, 3, "ctx2")), Seq("b3", "b4"), "left")
      .join(broadcast(renamed(2, 4, "num2")), Seq("b4", "b5"), "left")
      .join(broadcast(renamed(1, 4, "ctx1")), Seq("b4"), "left")
      .join(broadcast(renamed(1, 5, "num1")), Seq("b5"), "left")
      .withColumn("__w",
        when(coalesce(col("c5"), lit(0L)) > 0,
          expr("(1000000L * c5) div ctx4"))
        .when(coalesce(col("num4"), lit(0L)) > 0,
          expr("(400000L * num4) div ctx3"))
        .when(coalesce(col("num3"), lit(0L)) > 0,
          expr("(160000L * num3) div ctx2"))
        .when(coalesce(col("num2"), lit(0L)) > 0,
          expr("(64000L * num2) div ctx1"))
        .otherwise(
          expr(s"(25600L * (coalesce(num1, 0L) + 1L)) div (${t1}L + ${buckets}L)")))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"), sum(col("__w")).as("lm_score"))
      .withColumn("mean_prob_q",
        col("lm_score").cast(DoubleType) / col("n_ngrams"))
  }

  /** Interpolated Kneser-Ney, order 5 — the model CCNet actually
    * filters with (Wenzek et al. 2020 use a KenLM 5-gram KN model;
    * Kneser & Ney 1995, "Improved backing-off for m-gram language
    * modeling"; Chen & Goodman 1999 §2.7 interpolated form). The
    * stupid-backoff twin ([[quantizedScores5]]) charges raw
    * count ratios; KN instead (a) DISCOUNTS every seen count by D and
    * hands the freed mass to the lower order, and (b) scores lower
    * orders by CONTINUATION counts — how many distinct contexts a
    * token follows — not raw frequency. That is the "Francisco"
    * effect: a token frequent only inside one collocation has a high
    * raw count but continuation count 1, and KN correctly scores it
    * low in novel contexts (LmScoreSpec plants exactly that).
    *
    * Estimator, rendered in fixed point (scale Q = 10^6, discount
    * D = 3/4 so 4·c − 3 and 3·typ stay integer):
    *
    *   P_0           = Q div B                            (uniform)
    *   P_k(w | ctx)  = ( [num_k > 0]·(4·num_k − 3)·Q
    *                     + 3·typ_k(ctx)·P_{k−1} ) div (4·den_k(ctx))
    *                   when den_k(ctx) > 0, else P_{k−1}  (pure backoff)
    *
    * where at the TOP order (k=5) num/den are raw window counts
    * c5/c4(ctx) and typ = N1+(ctx·) (distinct continuation types of
    * the 4-gram context); at every LOWER order k the numerator is the
    * continuation count N1+(·, w-window) (distinct predecessors of the
    * k-gram, i.e. row counts of the order-(k+1) frame grouped by its
    * suffix), the denominator is N1+(·, ctx, ·) (order-(k+1) rows
    * grouped by the mid positions) and typ is the distinct-successor
    * count of ctx from the order-k frame. At k=1 the denominator is
    * the distinct-bigram-type total and typ is the distinct
    * continuation-unigram total. Every quantity is an integer count
    * over count-frame ROWS, so the whole chain — including the one
    * integer division per level — replays bit-for-bit in SQL.
    *
    * Doc-stream edge (documented, both engines identical): windows
    * never cross document boundaries, so a k-gram seen only at a
    * document head has a raw count but no predecessor; its
    * continuation count is 0 and the lower-order numerator term
    * vanishes — the interpolation mass still flows through typ/den.
    *
    * Scale: identical shape to [[quantizedScores5]] — the model is
    * reference-corpus-bounded (count frames ≤ training window count,
    * derived frames strictly smaller), all nine scoring joins are
    * broadcast, the corpus is exploded once and aggregated per doc.
    * Returns `(doc_id, n_ngrams, lm_score, mean_prob_q)` with
    * lm_score = Σ P_5 fixed-point, docs under 5 tokens absent. */
  def quantizedScoresKN(corpus: DataFrame, train: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1024): DataFrame = {
    val counts = train5(train, idCol, textCol, buckets).map(_.localCheckpoint())
    val Seq(c1f, c2f, c3f, c4f, c5f) = counts
    // derived continuation/type frames — COUNT over count-frame rows
    def rows(df: DataFrame, keep: Seq[String], as: String): DataFrame =
      df.groupBy(keep.map(col): _*).agg(count(lit(1)).as(as))
    // per-key frames renamed onto the scoring window positions b1..b5;
    // frames sharing a key are pre-merged so the hot path pays ONE
    // broadcast hash join per distinct key, nine in total (the
    // quantizedScores5 budget)
    def onto(df: DataFrame, from: Seq[String], to: Seq[String]): DataFrame =
      df.toDF((to ++ df.columns.drop(from.length)): _*)
    val g = (1 to 5).map(j => s"g$j")
    val b = (1 to 5).map(j => s"b$j")
    // (b1..b5): raw 5-gram count
    val j5 = onto(c5f, g.take(5), b.take(5)).withColumnRenamed("c", "c5")
    // (b1..b4): raw 4-gram context count + distinct-successor types
    val j4ctx = onto(c4f, g.take(4), b.take(4)).withColumnRenamed("c", "ctx5")
      .join(onto(rows(c5f, g.take(4), "typ5"), g.take(4), b.take(4)),
        b.take(4), "left")
    // (b2..b5): continuation count of the 4-gram window
    val j4cc = onto(rows(c5f, g.slice(1, 5), "cc4"), g.slice(1, 5), b.slice(1, 5))
    // (b2..b4): level-4 mid denominator + level-4 typ (successors of trigram ctx)
    val j4mid = onto(rows(c5f, g.slice(1, 4), "mid4"), g.slice(1, 4), b.slice(1, 4))
      .join(onto(rows(c4f, g.take(3), "typ4"), g.take(3), b.slice(1, 4)),
        b.slice(1, 4), "full")
    // (b3..b5): continuation count of the trigram window
    val j3cc = onto(rows(c4f, g.slice(1, 4), "cc3"), g.slice(1, 4), b.slice(2, 5))
    // (b3,b4): level-3 mid denominator + typ
    val j3mid = onto(rows(c4f, g.slice(1, 3), "mid3"), g.slice(1, 3), b.slice(2, 4))
      .join(onto(rows(c3f, g.take(2), "typ3"), g.take(2), b.slice(2, 4)),
        b.slice(2, 4), "full")
    // (b4,b5): continuation count of the bigram window
    val j2cc = onto(rows(c3f, g.slice(1, 3), "cc2"), g.slice(1, 3), b.slice(3, 5))
    // (b4): level-2 mid denominator + typ
    val j2mid = onto(rows(c3f, g.slice(1, 2), "mid2"), g.slice(1, 2), b.slice(3, 4))
      .join(onto(rows(c2f, g.take(1), "typ2"), g.take(1), b.slice(3, 4)),
        b.slice(3, 4), "full")
    // (b5): continuation count of the unigram
    val j1cc = onto(rows(c2f, g.slice(1, 2), "cc1"), g.slice(1, 2), b.slice(4, 5))
    // scalars: distinct bigram types (level-1 denominator) and distinct
    // continuation-unigram types (level-1 typ) — count-frame row counts,
    // driver-side by construction
    val ccTot = c2f.count()
    val uTot = c2f.select(col("g2")).distinct().count()
    val p0 = 1000000L / buckets
    // fixed-point chain via successive columns (each level one integer
    // division; expr-rendered so `div` is the integral operator)
    val scored = ngramWindows(corpus, idCol, textCol, buckets, 5)
      .toDF(("doc_id" +: b): _*)
      .join(broadcast(j5), b.take(5).toSeq, "left")
      .join(broadcast(j4ctx), b.take(4).toSeq, "left")
      .join(broadcast(j4cc), b.slice(1, 5).toSeq, "left")
      .join(broadcast(j4mid), b.slice(1, 4).toSeq, "left")
      .join(broadcast(j3cc), b.slice(2, 5).toSeq, "left")
      .join(broadcast(j3mid), b.slice(2, 4).toSeq, "left")
      .join(broadcast(j2cc), b.slice(3, 5).toSeq, "left")
      .join(broadcast(j2mid), b.slice(3, 4).toSeq, "left")
      .join(broadcast(j1cc), b.slice(4, 5).toSeq, "left")
      .withColumn("__p1",
        if (ccTot > 0)
          expr(s"""(
            (case when coalesce(cc1, 0L) > 0
                  then (4L * cc1 - 3L) * 1000000L else 0L end)
            + 3L * ${uTot}L * ${p0}L) div (4L * ${ccTot}L)""")
        else lit(p0))
      .withColumn("__p2", expr(s"""
        case when coalesce(mid2, 0L) > 0 then (
          (case when coalesce(cc2, 0L) > 0
                then (4L * cc2 - 3L) * 1000000L else 0L end)
          + 3L * coalesce(typ2, 0L) * __p1) div (4L * mid2)
        else __p1 end"""))
      .withColumn("__p3", expr(s"""
        case when coalesce(mid3, 0L) > 0 then (
          (case when coalesce(cc3, 0L) > 0
                then (4L * cc3 - 3L) * 1000000L else 0L end)
          + 3L * coalesce(typ3, 0L) * __p2) div (4L * mid3)
        else __p2 end"""))
      .withColumn("__p4", expr(s"""
        case when coalesce(mid4, 0L) > 0 then (
          (case when coalesce(cc4, 0L) > 0
                then (4L * cc4 - 3L) * 1000000L else 0L end)
          + 3L * coalesce(typ4, 0L) * __p3) div (4L * mid4)
        else __p3 end"""))
      .withColumn("__w", expr(s"""
        case when coalesce(ctx5, 0L) > 0 then (
          (case when coalesce(c5, 0L) > 0
                then (4L * c5 - 3L) * 1000000L else 0L end)
          + 3L * coalesce(typ5, 0L) * __p4) div (4L * ctx5)
        else __p4 end"""))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"), sum(col("__w")).as("lm_score"))
      .withColumn("mean_prob_q",
        col("lm_score").cast(DoubleType) / col("n_ngrams"))
  }

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
