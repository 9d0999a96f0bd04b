package graft.queries

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-deduplication operators over the `documents` table: exact,
  * MinHash+LSH (probabilistic candidates, exact verification), blocked
  * exact n-gram Jaccard, and SimHash (rows-only — its hash space is
  * engine-internal).
  *
  * The MinHash-LSH oracle is the FULL all-pairs exact Jaccard: with
  * 16 bands × 4 rows, recall at the planted near-dup similarity (≈0.98)
  * is 1−1e-13, so LSH output must equal the exhaustive answer — any
  * banding bug shows up as a hash mismatch. */
object DedupQueries extends QueryPack {

  /** Exact-dedup summary: total vs distinct-content vs survivors. */
  def d1ExactDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
    val kept = Dedup.exactByContent(docs, "doc_id", "text")
    docs.agg(count(lit(1)).as("total_docs"),
        countDistinct(col("text")).as("distinct_texts"))
      .crossJoin(kept.agg(count(lit(1)).as("surviving_docs")))
  }

  /** MinHash+LSH near-duplicate pairs, exact-verified at j ≥ 0.8. */
  def d2MinhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDuplicates(table(s, dir, "documents"), "doc_id", "text",
        shingleSize = 5, threshold = 0.8)
      .orderBy(col("id_a"), col("id_b"))

  /** Blocked exact-Jaccard near-dup pairs (3-token prefix blocks). */
  def d4BlockedJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.blockedJaccardPairs(table(s, dir, "documents"), "doc_id", "text",
        shingleSize = 5, blockTokens = 3, threshold = 0.8)
      .orderBy(col("id_a"), col("id_b"))

  /** SimHash near-dup pairs (hamming ≤ 3), oracle-checked via the
    * md5-based 60-bit variant — md5 is engine-portable, so DuckDB can
    * recompute signatures AND pairs from scratch (all-pairs, so any
    * blocking bug shows up as a mismatch). The xxhash64 production path
    * keeps its brute-force-parity pin in DedupSpec. */
  def d3Simhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashMd5NearDuplicates(table(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("id_a"), col("id_b"))

  /** End-to-end corpus dedup: LSH pairs → greedy removal (id_b drops,
    * lowest id per cluster survives) → surviving doc ids. */
  def d5DedupApply(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
    val pairs = Dedup.minhashNearDuplicates(docs, "doc_id", "text",
      shingleSize = 5, threshold = 0.8)
    Dedup.removeNearDuplicates(docs, pairs, "doc_id")
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  /** Duplicate-cluster assignment: connected components over the LSH
    * near-dup pairs — (doc_id, cluster_id = component min) for every doc
    * that appears in some verified pair. */
  def d6DedupClusters(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
    val pairs = Dedup.minhashNearDuplicates(docs, "doc_id", "text",
      shingleSize = 5, threshold = 0.8)
    Dedup.connectedComponents(pairs, "doc_id")
      .orderBy(col("doc_id"))
  }

  /** Duplicate-family size histogram — the corpus-health report a
    * dedup pass owes its operator: per component size, how many
    * families and how many documents sit in them, plus the docs a
    * dedup would remove (size − 1 per family). Singletons (docs in no
    * pair) are excluded by construction — the histogram describes the
    * DUPLICATED portion; total corpus size is the trivial complement.
    * One extra two-level aggregate on top of the component frame. */
  def d12ClusterHistogram(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
    val pairs = Dedup.minhashNearDuplicates(docs, "doc_id", "text",
      shingleSize = 5, threshold = 0.8)
    Dedup.connectedComponents(pairs, "doc_id")
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("sz")).as("n_docs"),
        sum(col("sz") - 1).as("n_removable"))
      .orderBy(col("cluster_size"))
  }

  /** Embedding-cosine near-dup dedup of DOCUMENTS (the semantic-dedup
    * mode the text-similarity family can't see: paraphrases share
    * embeddings, not shingles): documents join their embeddings
    * (doc_id == vec_id, the driver fixture contract), pairs at
    * engine-exact cosine ≥ 0.40 within label cells
    * ([[graft.similarity.Similarity.blockedNearDupPairs]] — never
    * all-pairs), transitive min-id survivor via the shared closure.
    * Survivors reported with their source. */
  def d13EmbedDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
    val emb = table(s, dir, "embeddings")
    val pairs = graft.similarity.Similarity.blockedNearDupPairs(
      emb, "vec_id", "embedding", "label", threshold = 0.40)
    val kept = Dedup.removeNearDuplicatesTransitive(
      docs.join(emb.select(col("vec_id").as("doc_id")), Seq("doc_id")),
      pairs, "doc_id")
    kept.select(col("doc_id"), col("source")).orderBy(col("doc_id"))
  }

  /** Transitive corpus dedup: one survivor (minimum id) per duplicate
    * COMPONENT — a duplicate of a duplicate is a duplicate. */
  def d7DedupTransitive(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
    val pairs = Dedup.minhashNearDuplicates(docs, "doc_id", "text",
      shingleSize = 5, threshold = 0.8)
    Dedup.removeNearDuplicatesTransitive(docs, pairs, "doc_id")
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  /** Incremental dedup ([[Dedup.incrementalNearDuplicates]]): the
    * even-id half of the corpus plays the pre-built signature index, the
    * odd-id half is the arriving batch. Verified pairs must involve at
    * least one new doc — old-old pairs were resolved at index-build
    * time, so the oracle filters the exhaustive pair set the same way. */
  def d8IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
    val oldDocs = docs.filter(col("doc_id") % 2 === 0)
    val newDocs = docs.filter(col("doc_id") % 2 === 1)
    val indexSigs = Dedup.minhashSignatures(oldDocs, "doc_id", "text")
    Dedup.incrementalNearDuplicates(newDocs, indexSigs, docs,
        "doc_id", "text", shingleSize = 5, threshold = 0.8)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Bloom-prefiltered cross-snapshot exact dedup
    * ([[Dedup.bloomDedupNewVsIndex]]): even half = historical index,
    * odd half = arriving batch with planted duplicates (every
    * id ≡ 5 mod 10 batch doc carries the text of index doc id−1, an
    * oracle-replayable synthesis since the corpus itself has no exact
    * cross-half dups). Result = batch rows surviving the dedup —
    * EXACT anti-join semantics, which is what the oracle pins; the
    * bloom is the route, not the answer. */
  def d11BloomIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
    val index = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("text"))
    val even = index.select(col("doc_id").as("__eid"), col("text").as("__etext"))
    val batch = docs.filter(col("doc_id") % 2 === 1)
      .join(even, col("doc_id") - 1 === col("__eid"), "left")
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 5, col("__etext"))
          .otherwise(col("text")).as("text"))
    Dedup.bloomDedupNewVsIndex(batch, index, "doc_id", "text",
        expectedIndexRows = index.count())
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic 20% corpus sample by doc-id hash — identical subset
    * on any engine/partitioning ([[graft.operators.Sampling]]). */
  def sampleDocs(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.deterministicSample(
        table(s, dir, "documents"), "doc_id", 0.20)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))

  /** Data-constrained mixing allocation
    * ([[graft.operators.Sampling.dataConstrainedAllocation]]): a
    * 160k-token budget split across the 20 sources, ≤2 epochs each,
    * one proportional redistribution round. Token counts are
    * tokenizer-exact (BPE) — the budget is in trainer tokens. */
  def mixEpochBudget(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextFunctions
    // uniform mixture weights; budget past some sources' 2-epoch cap,
    // so the capped sources' surplus redistributes to the others
    // (sf0.01 BPE totals: 3.6k-4.9k/source → caps 7.2k-9.8k; an 8k
    // uniform share caps three sources)
    val perSource = table(s, dir, "documents")
      .groupBy(col("source"))
      .agg(sum(TextFunctions.bpeTokenCount(col("text")).cast("long"))
        .as("tokens"), lit(1L).as("weight"))
    graft.operators.Sampling.dataConstrainedAllocation(
        perSource, budget = 160000L, maxEpochs = 2)
      .orderBy(col("source"))
  }

  /** Deterministic shard + in-shard shuffle — the training-data write
    * layout ([[graft.operators.Sampling.shardAndShuffle]]): 8 shards,
    * pseudorandom within-shard order via an independent salted hash. */
  def sampleShards(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.shardAndShuffle(
        table(s, dir, "documents"), "doc_id", nShards = 8)
      .select(col("doc_id"), col("shard"), col("shard_pos"))
      .orderBy(col("shard"), col("shard_pos"))

  /** Training-mixture downsample: per-source keep rates over the
    * document corpus, reproducible row-for-row. */
  def mixSources(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.stratifiedMix(
        table(s, dir, "documents"), "source", "doc_id",
        Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("kept"))
      .orderBy(col("source"))

  /** Exact per-source quota ([[graft.operators.Sampling.stratifiedQuota]]):
    * 30 documents per source, hash-selected — the oracle is the literal
    * ranked-window spelling of the same rule. */
  def sampleStratified(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.stratifiedQuota(
        table(s, dir, "documents"), "source", "doc_id", 30)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))

  /** Exact per-source WEIGHTED quota
    * ([[graft.operators.Sampling.weightedQuota]]): 25 documents per
    * source with inclusion odds tilted by a length-derived quality
    * weight (min(n_chars div 300, 8) lottery tickets — the smallest
    * ticket hash wins), all integer md5 arithmetic the oracle replays
    * ticket for ticket. The quota-filling contract for curation:
    * "exactly n per source, prefer substantial documents, reproducible
    * on any engine". */
  def sampleWeightedQuota(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.weightedQuota(
        table(s, dir, "documents"), "source", "doc_id",
        expr("n_chars DIV 300"), n = 25)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Exact global sample ([[graft.operators.Sampling.exactSample]]):
    * the hash-lowest 100 documents corpus-wide. */
  def sampleExactN(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.exactSample(
        table(s, dir, "documents"), "doc_id", 100)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))

  /** Train/valid/test assignment ([[graft.operators.Sampling.assignSplits]]):
    * 80/10/10 by key hash; report per-split document and char volume. */
  def sampleSplits(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.assignSplits(
        table(s, dir, "documents"), "doc_id",
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("n_chars"))
      .orderBy(col("split"))

  /** LEAKAGE-FREE splits ([[graft.operators.Sampling
    * .assignSplitsByGroup]]): near-duplicate clusters (the d6 closure)
    * are split as UNITS — no cluster may straddle the train/test
    * fence. `leaky_clusters` counts clusters spanning >1 split; the
    * oracle pins it to the literal 0, so a regression in the grouping
    * (not just in the counts) turns the row red. */
  def sampleSplitsLeakFree(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
    val pairs = Dedup.minhashNearDuplicates(docs, "doc_id", "text",
      shingleSize = 5, threshold = 0.8)
    val comp = Dedup.connectedComponents(pairs, "doc_id").localCheckpoint()
    val assigned = graft.operators.Sampling.assignSplitsByGroup(
        docs, "doc_id", comp,
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      .localCheckpoint()
    // "cluster spans ≥2 splits" ⟺ min(split) != max(split) — a plain
    // partial aggregate instead of countDistinct's two-phase distinct
    // aggregation (round 15, the v_fd_discovery rewrite; clusters grow
    // with the corpus, so the Expand tax here is corpus-proportional)
    val leaky = assigned.join(comp, Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(min(col("split")).as("__lo"), max(col("split")).as("__hi"))
      .filter(col("__lo") =!= col("__hi")).count()
    assigned.join(comp, Seq("doc_id"), "left")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cluster_id").isNotNull, 1L).otherwise(0L))
          .as("n_clustered_docs"))
      .withColumn("leaky_clusters", lit(leaky))
      .orderBy(col("split"))
  }

  /** Token-budget mixture ([[graft.operators.Sampling.tokenBudgetMix]]):
    * every source downsampled to ≈500 tokens; report kept docs/tokens
    * per source. Rates derive from the data (budget / per-source total),
    * so the oracle recomputes the same rates in SQL. */
  def mixTokenBudget(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextFunctions
    val docs = table(s, dir, "documents")
    val w = TextFunctions.bpeTokenCount(col("text"))
    graft.operators.Sampling.tokenBudgetMix(docs, "source", "doc_id", w, 500L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("kept_docs"),
        sum(w.cast("long")).as("kept_tokens"))
      .orderBy(col("source"))
  }

  /** Temperature-flattened mixture
    * ([[graft.operators.Sampling.temperatureMix]], α = 0.5): kept
    * counts per source ∝ √cᵢ — rare sources upweighted relative to
    * dominant ones, rates derived from the data. The oracle recomputes
    * the rates independently (exact divide + IEEE sqrt). */
  def mixTemperature(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.temperatureMix(
        table(s, dir, "documents"), "source", "doc_id", alpha = 0.5)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("kept"))
      .orderBy(col("source"))

  /** Quality-weighted importance sampling: keep probability = the doc's
    * size-based quality weight (min(1, n_chars/400)) — longer docs kept
    * more often, decided by the same engine-reproducible key hash as
    * every sampler. Pure filter, no shuffle until the report agg. */
  def sampleWeighted(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
    graft.operators.Sampling.weightedSample(docs, "doc_id",
        least(lit(1.0), col("n_chars") / lit(400.0)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("kept_docs"),
        sum(col("n_chars")).as("kept_chars"))
      .orderBy(col("source"))
  }

  /** Sequence packing: per-source contiguous batches of ≈2048 tokens in
    * doc_id order (deterministic layout — any engine derives the same
    * batches). Reported per batch; the per-doc assignment is the
    * operator output. Tokens are TOKENIZER-EXACT
    * ([[graft.text.TextFunctions.bpeTokenCount]]): a 2048-token batch
    * means 2048 tokens to the trainer consuming the same artifact. */
  def packSequences(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextFunctions
    val docs = table(s, dir, "documents")
    graft.operators.Sampling.packSequences(docs, "source", "doc_id",
        TextFunctions.bpeTokenCount(col("text")), 2048L)
      .groupBy(col("source"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("batch_tokens"))
      .orderBy(col("source"), col("batch_id"))
  }

  /** Curriculum ordering of the packed batches (curriculum learning,
    * Bengio et al. 2009: present easier/cleaner data first): each
    * packed batch gets a fixed-point quality score — the integer mean
    * LM bigram probability of its documents (Σ lm_score ÷ Σ n_bigrams,
    * the tx_lm_score signal) — and a 3-phase curriculum assignment
    * (warmup = cleanest third, main, anneal) via the EXACT closed-form
    * NTILE over the distributed rank
    * ([[graft.operators.Keys.globalRankWithCount]] +
    * [[graft.operators.Keys.ntileExpr]] — no unpartitioned WindowExec
    * at any scale). Batch rows are corpus/2048-many, so the rank is
    * over the POST-PACKING cardinality, never raw docs. */
  def packCurriculum(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Keys
    import graft.text.{LmScore, TextFunctions}
    val docs = table(s, dir, "documents")
    val packed = graft.operators.Sampling.packSequences(docs, "source",
      "doc_id", TextFunctions.bpeTokenCount(col("text")), 2048L)
    val lm = LmScore.quantizedScores(docs,
        docs.filter(col("lang") === "en"), "doc_id", "text", 1024)
      .select(col("doc_id"), col("lm_score"), col("n_bigrams"))
    val perBatch = packed.join(lm, Seq("doc_id"), "left")
      .groupBy(col("source"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("batch_tokens"),
        coalesce(sum(col("lm_score")), lit(0L)).as("__sq"),
        coalesce(sum(col("n_bigrams")), lit(0L)).as("__nb"))
      .withColumn("quality_fp",
        when(col("__nb") > 0, expr("__sq div __nb")).otherwise(lit(0L)))
      .drop("__sq", "__nb")
      .withColumn("__negq", -col("quality_fp"))
    val (ranked, n) = Keys.globalRankWithCount(perBatch, "__negq",
      "__rank", tieBreakers = Seq(col("source"), col("batch_id")))
    ranked
      .withColumn("phase_id", Keys.ntileExpr(n, 3, "__rank"))
      .withColumn("phase",
        when(col("phase_id") === 1, "warmup")
          .when(col("phase_id") === 2, "main").otherwise(lit("anneal")))
      .select(col("source"), col("batch_id"), col("n_docs"),
        col("batch_tokens"), col("quality_fp"), col("phase_id"),
        col("phase"))
      .orderBy(col("source"), col("batch_id"))
  }

  /** Length-bucketed batch layout
    * ([[graft.operators.Sampling.lengthBucketedBatches]]): 4 exact
    * length quantiles, fixed 50-doc batches within each, and the
    * PADDING-waste accounting (`max·count − sum`) a padded trainer
    * pays — the number this layout exists to minimize (similar-length
    * grouping makes max ≈ mean inside every batch). Lengths are
    * TOKENIZER-EXACT ([[graft.text.TextFunctions.bpeTokenCount]], the
    * packSequences convention — padding in trainer tokens, not an
    * approximation in a different unit). Bucket membership and
    * in-bucket position both come from ONE distributed rank with
    * closed-form NTILE arithmetic — no global sort, no second window;
    * the oracle replays the BPE merge loop, NTILE, and the in-bucket
    * ROW_NUMBER. */
  def packLengthBuckets(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.lengthBucketedBatches(
        table(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", graft.text.TextFunctions.bpeTokenCount(col("text")),
        nBuckets = 4, batchSize = 50)
      .groupBy(col("bucket"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("batch_tokens"),
        max(col("n_tokens")).as("max_tokens"))
      .withColumn("padding",
        col("max_tokens") * col("n_docs") - col("batch_tokens"))
      .orderBy(col("bucket"), col("batch_id"))

  /** Materialized packing ([[graft.operators.Sampling
    * .materializePacked]]): the trainer-facing layout — per
    * (source, batch), the md5 of the RS-joined document concatenation
    * and the comma-joined per-document token offsets (BPE-exact), on
    * the same 2048-token batches as [[packSequences]]. The oracle
    * reassembles the byte stream and the offset arithmetic
    * independently. */
  def packMaterialize(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextFunctions
    graft.operators.Sampling.materializePacked(
        table(s, dir, "documents"), "source", "doc_id", "text",
        TextFunctions.bpeTokenCount(col("text")), 2048L)
      .orderBy(col("source"), col("batch_id"))
  }

  /** Quality-aware dedup: per duplicate component keep the LONGEST doc
    * (n_chars; lowest id on ties) — "keep the best copy" instead of
    * d7's lowest-id rule. Survivor selection = bounded-heap top-1 per
    * cluster, never a per-cluster sort. */
  def d9BestSurvivor(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
    val pairs = Dedup.minhashNearDuplicates(docs, "doc_id", "text",
      shingleSize = 5, threshold = 0.8)
    Dedup.removeNearDuplicatesBest(docs, pairs, "doc_id", "n_chars")
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-global line dedup ([[Dedup.dedupLinesGlobal]]): the doc is
    * segmented deterministically (a break after every "table" token —
    * the fixture is single-line), every repeated line keeps only its
    * first corpus-wide occurrence, and the rewritten text is
    * md5-pinned per doc. */
  def d10LineDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .withColumn("text", segmentLines(col("text")))
      .select(col("doc_id"), col("text"))
    Dedup.dedupLinesGlobal(docs, "doc_id", "text")
      .select(col("doc_id"), md5(col("text")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, QueryFn] = Map(
    "d10_line_dedup" -> (d10LineDedup _),
    "d9_best_survivor" -> (d9BestSurvivor _),
    "sample_weighted" -> (sampleWeighted _),
    "pack_sequences" -> (packSequences _),
    // oracle lives in TextQueries (it reuses the private lm CTE pack)
    "pack_curriculum" -> (packCurriculum _),
    "pack_length_buckets" -> (packLengthBuckets _),
    "pack_materialize" -> (packMaterialize _),
    "sample_docs" -> (sampleDocs _),
    "sample_shards" -> (sampleShards _),
    "mix_epoch_budget" -> (mixEpochBudget _),
    "sample_stratified" -> (sampleStratified _),
    "sample_weighted_quota" -> (sampleWeightedQuota _),
    "sample_exact_n" -> (sampleExactN _),
    "sample_splits" -> (sampleSplits _),
    "sample_splits_leakfree" -> (sampleSplitsLeakFree _),
    "mix_sources" -> (mixSources _),
    "mix_temperature" -> (mixTemperature _),
    "mix_token_budget" -> (mixTokenBudget _),
    "d1_exact_dedup" -> (d1ExactDedup _),
    "d2_minhash_lsh" -> (d2MinhashLsh _),
    "d3_simhash" -> (d3Simhash _),
    "d4_blocked_jaccard" -> (d4BlockedJaccard _),
    "d5_dedup_apply" -> (d5DedupApply _),
    "d6_dedup_clusters" -> (d6DedupClusters _),
    "d12_cluster_histogram" -> (d12ClusterHistogram _),
    "d13_embed_dedup" -> (d13EmbedDedup _),
    "d7_dedup_transitive" -> (d7DedupTransitive _),
    "d8_incremental_dedup" -> (d8IncrementalDedup _),
    "d11_bloom_incremental" -> (d11BloomIncremental _))

  // tokenize with the same \s+ regex as the engine (TextFunctions.tokens)
  // so multi-space / tab / newline fixtures can't diverge oracle vs engine
  private def shingleSetsSql = """
    SELECT doc_id,
           list_distinct([array_to_string(toks[i:i+4], ' ')
                          FOR i IN range(1, len(toks) - 3)]) AS sh
    FROM (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents)
    WHERE len(toks) >= 5"""

  // md5-SimHash oracle: 60 per-bit ±1 vote sums, then bit assembly —
  // generated, not hand-written, so Spark and DuckDB share the construction
  private val simhashVoteCols = (0 until 60).map(b =>
    s"CAST(SUM(CASE WHEN (hv >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v$b")
    .mkString(", ")
  private val simhashAssemble = (0 until 60).map(b =>
    s"CASE WHEN v$b > 0 THEN (CAST(1 AS BIGINT) << $b) ELSE CAST(0 AS BIGINT) END")
    .mkString(" + ")

  val oracles: Map[String, String] = Map(
    "d10_line_dedup" -> s"""
      WITH d AS (
        SELECT doc_id, $segmentLinesSql AS t2
        FROM documents),
      ld AS (SELECT doc_id, string_split(t2, chr(10)) AS lines FROM d),
      l AS (
        SELECT doc_id,
               unnest([{'idx': i - 1, 'line': lines[i]}
                       FOR i IN range(1, len(lines) + 1)],
                      recursive := true)
        FROM ld),
      kept AS (
        SELECT doc_id, idx, line FROM l
        QUALIFY ROW_NUMBER() OVER (PARTITION BY line
          ORDER BY doc_id, idx) = 1),
      rebuilt AS (
        SELECT doc_id,
               array_to_string(list(line ORDER BY idx), chr(10)) AS clean
        FROM kept GROUP BY doc_id)
      SELECT d.doc_id, md5(COALESCE(r.clean, '')) AS clean_md5
      FROM d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
      ORDER BY d.doc_id""",
    "sample_weighted" -> s"""
      SELECT source, COUNT(*) AS kept_docs,
             CAST(SUM(n_chars) AS BIGINT) AS kept_chars
      FROM documents
      WHERE $bucketSql <
        CAST(FLOOR(LEAST(1.0, n_chars / 400.0) * 1000000) AS BIGINT)
      GROUP BY source ORDER BY source""",
    "pack_sequences" -> s"""
      ${BpeOracleSql.prelude},
      toks AS (
        SELECT d.source, d.doc_id,
               CAST(b.n_tokens AS BIGINT) AS n_tokens
        FROM documents d JOIN bpe_docs b ON d.doc_id = b.doc_id),
      cum AS (
        SELECT source, doc_id, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        FROM toks)
      SELECT source, CAST((c - n_tokens) // 2048 AS BIGINT) AS batch_id,
             COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens
      FROM cum
      GROUP BY source, CAST((c - n_tokens) // 2048 AS BIGINT)
      ORDER BY source, batch_id""",
    "pack_length_buckets" -> s"""
      ${BpeOracleSql.prelude},
      w AS (
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
        FROM bpe_docs),
      b AS (
        SELECT doc_id, n_tokens,
               NTILE(4) OVER (ORDER BY n_tokens, doc_id) AS bucket
        FROM w),
      p AS (
        SELECT doc_id, n_tokens, bucket,
               ROW_NUMBER() OVER (PARTITION BY bucket
                 ORDER BY n_tokens, doc_id) AS pos
        FROM b)
      SELECT CAST(bucket AS INT) AS bucket,
             CAST((pos - 1) // 50 AS BIGINT) AS batch_id,
             COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens,
             CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
             CAST(MAX(n_tokens) * COUNT(*) - SUM(n_tokens) AS BIGINT)
               AS padding
      FROM p GROUP BY bucket, CAST((pos - 1) // 50 AS BIGINT)
      ORDER BY bucket, batch_id""",
    "sample_docs" -> s"""
      SELECT doc_id, source FROM documents
      WHERE $bucketSql < 200000
      ORDER BY doc_id""",
    "pack_materialize" -> s"""
      ${BpeOracleSql.prelude},
      toks AS (
        SELECT d.source, d.doc_id, d.text,
               CAST(b.n_tokens AS BIGINT) AS n_tokens
        FROM documents d JOIN bpe_docs b ON d.doc_id = b.doc_id),
      cum AS (
        SELECT source, doc_id, text, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        FROM toks),
      bat AS (
        SELECT source, doc_id, text, n_tokens,
               CAST((c - n_tokens) // 2048 AS BIGINT) AS batch_id
        FROM cum),
      off AS (
        SELECT source, batch_id, doc_id, text, n_tokens,
               CAST(SUM(n_tokens) OVER (PARTITION BY source, batch_id
                 ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n_tokens AS BIGINT) AS o
        FROM bat)
      SELECT source, batch_id,
             COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens,
             md5(string_agg(text, chr(30) ORDER BY doc_id)) AS packed_md5,
             string_agg(CAST(o AS VARCHAR), ',' ORDER BY doc_id) AS offsets
      FROM off
      GROUP BY source, batch_id
      ORDER BY source, batch_id""",
    "mix_epoch_budget" -> s"""
      ${BpeOracleSql.prelude},
      t AS (
        SELECT d.source,
               CAST(SUM(b.n_tokens) AS BIGINT) AS tokens,
               CAST(1 AS BIGINT) AS weight
        FROM documents d JOIN bpe_docs b ON d.doc_id = b.doc_id
        GROUP BY d.source),
      wt AS (SELECT CAST(SUM(weight) AS BIGINT) AS wtot FROM t),
      a1 AS (
        SELECT source, tokens, weight,
               LEAST((160000 * weight) // (SELECT wtot FROM wt),
                     tokens * 2) AS alloc1
        FROM t),
      lo AS (SELECT 160000 - CAST(SUM(alloc1) AS BIGINT) AS leftover FROM a1),
      un AS (SELECT CAST(COALESCE(SUM(CASE WHEN alloc1 < tokens * 2
               THEN weight END), 0) AS BIGINT) AS uw FROM a1),
      f AS (
        SELECT source, tokens,
               alloc1 + CASE WHEN alloc1 < tokens * 2
                   AND (SELECT uw FROM un) > 0
                   AND (SELECT leftover FROM lo) > 0
                 THEN LEAST(tokens * 2 - alloc1,
                   ((SELECT leftover FROM lo) * weight)
                     // (SELECT uw FROM un))
                 ELSE 0 END AS allocated
        FROM a1)
      SELECT source, tokens, CAST(allocated AS BIGINT) AS allocated,
             CAST(allocated AS DOUBLE) / tokens AS epochs
      FROM f ORDER BY source""",
    "sample_shards" -> s"""
      WITH b AS (
        SELECT doc_id,
               CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                 1, 15)) AS BIGINT) % 8 AS INT) AS shard,
               CAST(concat('0x', substr(md5('shuffle:' ||
                 CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS ob
        FROM documents)
      SELECT doc_id, shard,
             CAST(ROW_NUMBER() OVER (PARTITION BY shard
               ORDER BY ob, doc_id) AS BIGINT) AS shard_pos
      FROM b ORDER BY shard, shard_pos""",
    "sample_stratified" -> s"""
      SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                 ORDER BY $bucketSql, doc_id) AS rn
        FROM documents)
      WHERE rn <= 30
      ORDER BY doc_id""",
    "sample_weighted_quota" -> {
      val tickets = (0 until 8).map(r =>
        "CASE WHEN " + r + " < w THEN CAST(concat('0x', " +
          s"substr(md5(CAST(doc_id AS VARCHAR) || '#$r'), 1, 15)) " +
          "AS BIGINT) ELSE 9223372036854775807 END").mkString(",\n               ")
      s"""
      SELECT doc_id, source, n_chars FROM (
        SELECT doc_id, source, n_chars,
               row_number() OVER (PARTITION BY source
                 ORDER BY prio, doc_id) AS rn
        FROM (
          SELECT doc_id, source, n_chars,
                 LEAST($tickets) AS prio
          FROM (SELECT doc_id, source, n_chars,
                       LEAST(GREATEST(n_chars // 300, 0), 8) AS w
                FROM documents)))
      WHERE rn <= 25
      ORDER BY doc_id"""
    },
    "sample_exact_n" -> s"""
      SELECT doc_id, source FROM (
        SELECT doc_id, source FROM documents
        ORDER BY $bucketSql, doc_id LIMIT 100)
      ORDER BY doc_id""",
    "sample_splits" -> s"""
      SELECT CASE WHEN $bucketSql < 800000 THEN 'train'
                  WHEN $bucketSql < 900000 THEN 'valid'
                  WHEN $bucketSql < 1000000 THEN 'test' END AS split,
             COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM documents
      GROUP BY 1 ORDER BY split""",
    // leak-free splits: the d6 closure (recursive CTE) feeds the split
    // hash through the CLUSTER representative; leaky_clusters is the
    // LITERAL 0 — the engine computes the real count, so any grouping
    // regression (a cluster straddling the fence) fails the row
    "sample_splits_leakfree" -> s"""
      WITH RECURSIVE sets AS ($shingleSetsSql),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sets a JOIN sets b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
              CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.8),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      reach(src, dst) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      comp AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
               FROM reach GROUP BY src),
      asg AS (
        SELECT d.doc_id,
               COALESCE(c.cluster_id, d.doc_id) AS grp,
               (c.doc_id IS NOT NULL) AS clustered
        FROM documents d LEFT JOIN comp c USING (doc_id))
      SELECT CASE WHEN ${bucketSqlOf("grp")} < 800000 THEN 'train'
                  WHEN ${bucketSqlOf("grp")} < 900000 THEN 'valid'
                  WHEN ${bucketSqlOf("grp")} < 1000000 THEN 'test' END AS split,
             COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN clustered THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clustered_docs,
             CAST(0 AS BIGINT) AS leaky_clusters
      FROM asg GROUP BY 1 ORDER BY split""",
    "mix_sources" -> s"""
      SELECT source, COUNT(*) AS kept FROM documents
      WHERE $bucketSql <
        CASE source WHEN 'src0' THEN 1000000 WHEN 'src1' THEN 500000
                    WHEN 'src2' THEN 250000 WHEN 'src3' THEN 100000
                    ELSE -1 END
      GROUP BY source ORDER BY source""",
    "mix_temperature" -> s"""
      WITH cnt AS (
        SELECT source, COUNT(*) AS c FROM documents GROUP BY source),
      rates AS (
        SELECT source,
               sqrt(CAST((SELECT MIN(c) FROM cnt) AS DOUBLE) /
                    CAST(c AS DOUBLE)) AS rate
        FROM cnt)
      SELECT d.source, COUNT(*) AS kept
      FROM documents d JOIN rates r ON d.source = r.source
      WHERE $bucketSql < CAST(FLOOR(r.rate * 1000000) AS BIGINT)
      GROUP BY d.source ORDER BY d.source""",
    "mix_token_budget" -> s"""
      ${BpeOracleSql.prelude},
      dt AS (
        SELECT d.source, d.doc_id, b.n_tokens
        FROM documents d JOIN bpe_docs b ON d.doc_id = b.doc_id),
      tot AS (
        SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS total
        FROM dt GROUP BY source),
      rates AS (
        SELECT source,
               LEAST(1.0, CAST(500 AS DOUBLE) / CAST(GREATEST(total, 1) AS DOUBLE)) AS rate
        FROM tot)
      SELECT dt.source, COUNT(*) AS kept_docs,
             CAST(SUM(dt.n_tokens) AS BIGINT) AS kept_tokens
      FROM dt JOIN rates r ON dt.source = r.source
      WHERE $bucketSql < FLOOR(r.rate * 1000000)
      GROUP BY dt.source ORDER BY dt.source""",
    "d1_exact_dedup" -> """
      SELECT (SELECT COUNT(*) FROM documents) AS total_docs,
             (SELECT COUNT(DISTINCT text) FROM documents) AS distinct_texts,
             (SELECT COUNT(DISTINCT text) FROM documents) AS surviving_docs""",
    "d2_minhash_lsh" -> s"""
      WITH sets AS ($shingleSetsSql)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
             CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
      FROM sets a JOIN sets b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
            CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.8
      ORDER BY id_a, id_b""",
    "d3_simhash" -> s"""
      WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS t FROM documents),
      h AS (
        SELECT doc_id, CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS hv
        FROM toks),
      votes AS (SELECT doc_id, $simhashVoteCols FROM h GROUP BY doc_id),
      sim AS (SELECT doc_id, $simhashAssemble AS s FROM votes)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
      FROM sim a JOIN sim b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.s, b.s)) <= 3
      ORDER BY id_a, id_b""",
    "d4_blocked_jaccard" -> s"""
      WITH sets AS (
        SELECT doc_id,
               array_to_string(toks[1:3], ' ') AS blk,
               list_distinct([array_to_string(toks[i:i+4], ' ')
                              FOR i IN range(1, len(toks) - 3)]) AS sh
        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents)
        WHERE len(toks) >= 5)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
             CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
      FROM sets a JOIN sets b
        ON a.blk = b.blk AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
            CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.8
      ORDER BY id_a, id_b""",
    "d5_dedup_apply" -> s"""
      WITH sets AS ($shingleSetsSql),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sets a JOIN sets b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
              CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.8)
      SELECT doc_id FROM documents
      WHERE doc_id NOT IN (SELECT id_b FROM pairs)
      ORDER BY doc_id""",
    // connected components in SQL: transitive closure by recursive CTE
    // (exhaustive reachability — fine at oracle scale), component id =
    // min reachable node; the engine runs large-star/small-star instead
    "d6_dedup_clusters" -> s"""
      WITH RECURSIVE sets AS ($shingleSetsSql),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sets a JOIN sets b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
              CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.8),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      reach(src, dst) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
      SELECT src AS doc_id, MIN(dst) AS cluster_id
      FROM reach GROUP BY src ORDER BY doc_id""",
    // d12: two-level aggregate over the d6 component closure
    "d12_cluster_histogram" -> s"""
      WITH RECURSIVE sets AS ($shingleSetsSql),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sets a JOIN sets b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
              CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.8),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      reach(src, dst) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      comp AS (
        SELECT src AS doc_id, MIN(dst) AS cluster_id
        FROM reach GROUP BY src),
      szs AS (
        SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS sz
        FROM comp GROUP BY cluster_id)
      SELECT sz AS cluster_size,
             CAST(COUNT(*) AS BIGINT) AS n_clusters,
             CAST(SUM(sz) AS BIGINT) AS n_docs,
             CAST(SUM(sz - 1) AS BIGINT) AS n_removable
      FROM szs GROUP BY sz ORDER BY cluster_size""",
    "d9_best_survivor" -> s"""
      WITH RECURSIVE sets AS ($shingleSetsSql),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sets a JOIN sets b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
              CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.8),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      reach(src, dst) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      comp AS (
        SELECT src AS doc_id, MIN(dst) AS cluster_id
        FROM reach GROUP BY src),
      winners AS (
        SELECT d.doc_id
        FROM documents d JOIN comp c ON d.doc_id = c.doc_id
        QUALIFY ROW_NUMBER() OVER (
          PARTITION BY c.cluster_id
          ORDER BY d.n_chars DESC, d.doc_id) = 1)
      SELECT doc_id, n_chars FROM documents
      WHERE doc_id IN (SELECT doc_id FROM winners)
         OR doc_id NOT IN (SELECT doc_id FROM comp)
      ORDER BY doc_id""",
    "d7_dedup_transitive" -> s"""
      WITH RECURSIVE sets AS ($shingleSetsSql),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sets a JOIN sets b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
              CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.8),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      reach(src, dst) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      comp AS (
        SELECT src AS doc_id, MIN(dst) AS cluster_id
        FROM reach GROUP BY src)
      SELECT doc_id FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> cluster_id)
      ORDER BY doc_id""",
    // d13 twin: quantized cosine within label cells + recursive closure
    // (the d7 shape over embedding pairs instead of shingle pairs)
    "d13_embed_dedup" -> """
      WITH RECURSIVE prep AS (
        SELECT vec_id, label,
               list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT))
                 AS q
        FROM embeddings),
      nrm AS (
        SELECT vec_id, label, q,
               (SELECT SUM(a * b)
                FROM (SELECT unnest(p.q) AS a, unnest(p.q) AS b)) AS nsq
        FROM prep p),
      pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM nrm a JOIN nrm b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE CAST((SELECT SUM(x * y)
                    FROM (SELECT unnest(a.q) AS x, unnest(b.q) AS y))
                   AS DOUBLE)
              / sqrt(CAST(a.nsq AS DOUBLE) * CAST(b.nsq AS DOUBLE))
              >= 0.40),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      reach(src, dst) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      comp AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
               FROM reach GROUP BY src)
      SELECT d.doc_id, d.source
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      WHERE d.doc_id NOT IN
            (SELECT doc_id FROM comp WHERE doc_id <> cluster_id)
      ORDER BY d.doc_id""",
    // incremental = exhaustive pairs restricted to those touching the
    // "new" (odd-id) half; even-even pairs belong to the index build
    "d8_incremental_dedup" -> s"""
      WITH sets AS ($shingleSetsSql)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
             CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
      FROM sets a JOIN sets b ON a.doc_id < b.doc_id
      WHERE (a.doc_id % 2 = 1 OR b.doc_id % 2 = 1)
        AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
            CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.8
      ORDER BY id_a, id_b""",
    // the bloom route must produce EXACT anti-join semantics: batch
    // rows (with the same planted-duplicate synthesis) whose text has
    // no match in the even-id index
    "d11_bloom_incremental" -> """
      WITH ev AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
      bt AS (
        SELECT b.doc_id,
               CASE WHEN b.doc_id % 10 = 5 THEN e.text ELSE b.text END AS text
        FROM documents b LEFT JOIN ev e ON b.doc_id - 1 = e.doc_id
        WHERE b.doc_id % 2 = 1)
      SELECT bt.doc_id FROM bt
      WHERE NOT EXISTS (SELECT 1 FROM ev WHERE ev.text = bt.text)
      ORDER BY bt.doc_id""")
}
