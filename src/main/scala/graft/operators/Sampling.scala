package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Deterministic sampling and dataset mixing for training-data curation.
  *
  * `df.sample()` is seed-dependent on partitioning and row order — two
  * runs over a repartitioned table select different rows, which is
  * poison for reproducible training sets. These operators derive the
  * keep/drop decision from a HASH OF THE ROW KEY alone: any engine, any
  * partitioning, any run selects the identical subset (and the hash is
  * md5, so an external system — or the DuckDB oracle — reproduces it).
  *
  * All pure projections/filters: no shuffle, no state.
  */
object Sampling {

  val Buckets = 1000000L

  /** A working-column name absent from `taken` — internal columns must
    * never collide with (and silently drop) a user column of the same
    * name when the operator cleans up after itself. */
  private def freshName(base: String, taken: Set[String]): String = {
    var name = base
    var i = 0
    while (taken(name)) { i += 1; name = s"${base}_$i" }
    name
  }

  /** Full 60-bit md5 value (first 15 hex digits, < 2^63) — for
    * operators that need more resolution than [[hashBucket]]'s 10^6
    * buckets (e.g. shard counts near or above 10^6, or fine-grained
    * orderings). */
  def hash60(key: Column): Column =
    conv(substring(md5(key.cast(StringType)), 1, 15), 16, 10)
      .cast(LongType)

  /** Uniform bucket in [0, Buckets) from the md5 of the key. */
  def hashBucket(key: Column): Column = hash60(key) % Buckets

  /** Keep a deterministic `fraction` of rows by key hash. */
  def deterministicSample(df: DataFrame, keyCol: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    df.filter(hashBucket(col(keyCol)) < (fraction * Buckets).toLong)
  }

  /** Join-consistent "universe" sampling (the BlinkDB/VerdictDB
    * technique; Agarwal et al. 2013, "BlinkDB", EuroSys — there
    * stratified over QCS; here the key-universe form): apply the SAME
    * key-hash predicate to every table sharing a join key, so
    * join-of-samples == sample-of-join restricted to the kept key
    * universe, EXACTLY — no orphans, no bias. Independent per-table
    * row sampling destroys this: two independent p-samples retain only
    * p² of join pairs, and fact-side rows survive without their match.
    * At 100 TB this is how you dry-run a multi-table pipeline on 1% of
    * the keys with all joins intact: one map-side filter per table,
    * fused into the scan's codegen stage (the md5 predicate is not a
    * footer-prunable literal, so files still read — the savings are
    * everything downstream), zero shuffle, and the kept subset is
    * engine/partitioning/run independent like every sampler here. */
  def universeSample(tables: Seq[(DataFrame, String)],
      fraction: Double): Seq[DataFrame] =
    tables.map { case (df, key) => deterministicSample(df, key, fraction) }

  /** Mix sources at per-source rates (unlisted sources drop): the
    * standard training-mixture downsample, reproducible row-for-row. */
  def stratifiedMix(df: DataFrame, sourceCol: String, keyCol: String,
      rates: Map[String, Double]): DataFrame = {
    val threshold = rates.foldLeft(lit(-1L)) { case (acc, (src, rate)) =>
      when(col(sourceCol) === src, lit((rate * Buckets).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < threshold)
  }

  /** Importance sampling: keep each row with probability `weight` (a
    * per-row Column in [0, 1] — e.g. a quality score), decided by the
    * same key hash as every other sampler here, so the selection is
    * partition- and run-independent and externally reproducible. The
    * standard quality-weighted corpus downsample ("keep good documents
    * more often") as a pure filter — no shuffle, no state. */
  def weightedSample(df: DataFrame, keyCol: String,
      weight: Column): DataFrame =
    df.filter(hashBucket(col(keyCol)) <
      (least(greatest(weight, lit(0.0)), lit(1.0)) * Buckets).cast(LongType))

  /** Exact per-stratum quota: exactly min(`n`, |stratum|) rows per
    * stratum, selected deterministically by the md5 key hash (raw key
    * as tiebreak) — "10k documents per source" where the rate-based
    * [[stratifiedMix]] is only approximate, still engine-independent
    * and run-independent. Ranking goes through the bounded-heap top-k
    * physical operator: one shuffle on the stratum, k rows of state
    * per stratum, no per-stratum sort. */
  def stratifiedQuota(df: DataFrame, strataCol: String, keyCol: String,
      n: Int): DataFrame = {
    require(n > 0)
    val taken = df.columns.toSet
    val bucket = freshName("__bucket", taken)
    val rank = freshName("__rank", taken)
    graft.plans.TopK.perKey(
        df.withColumn(bucket, hashBucket(col(keyCol))),
        Seq(strataCol),
        Seq(graft.plans.TopK.asc(bucket), graft.plans.TopK.asc(keyCol)),
        n, rankName = rank)
      .drop(bucket, rank)
  }

  /** Exact per-stratum WEIGHTED quota — "exactly n documents per
    * source, preferring higher-quality ones": exactly min(`n`,
    * |stratum|) rows per stratum, inclusion odds tilted by an INTEGER
    * weight in [0, `wMax`] via the lottery-ticket scheme — each row's
    * priority is the SMALLEST of its w deterministic ticket hashes
    * (`hash60(key#r)`, r < w), so P(priority ≤ t) = 1 − (1 − t)^w rises
    * strictly with every extra ticket while the whole selection stays
    * integer md5 arithmetic an external engine replays bit-for-bit.
    * (The textbook Efraimidis–Spirakis priority u^(1/w) needs ln/pow,
    * which is NOT cross-engine-exact — libm differs by 1 ulp and a
    * flipped near-tie changes top-k MEMBERSHIP, not just order; the
    * ticket scheme trades exact proportionality for exact
    * replayability, the house discipline.) Weight 0 = no tickets:
    * those rows carry the maximum priority and fill the quota last,
    * tie-broken by key. Ranking goes through the bounded-heap top-k
    * operator — one shuffle on the stratum, n rows of state per
    * stratum, never a per-stratum sort; wMax md5 evaluations per row,
    * map-side, codegen'd (no HOF — keep wMax config-small). */
  def weightedQuota(df: DataFrame, strataCol: String, keyCol: String,
      weight: Column, n: Int, wMax: Int = 8): DataFrame = {
    require(n > 0 && wMax >= 1 && wMax <= 64, s"n=$n wMax=$wMax")
    val taken = df.columns.toSet
    val prio = freshName("__prio", taken)
    val rank = freshName("__rank", taken)
    val w = least(greatest(weight.cast(LongType), lit(0L)), lit(wMax))
    val tickets = (0 until wMax).map(r =>
      when(lit(r) < w,
        hash60(concat(col(keyCol).cast(StringType), lit("#"), lit(r))))
        .otherwise(lit(Long.MaxValue)))
    val prioCol =
      if (tickets.size == 1) tickets.head else least(tickets: _*)
    graft.plans.TopK.perKey(
        df.withColumn(prio, prioCol),
        Seq(strataCol),
        Seq(graft.plans.TopK.asc(prio), graft.plans.TopK.asc(keyCol)),
        n, rankName = rank)
      .drop(prio, rank)
  }

  /** Exact global sample of min(`n`, |df|) rows by the md5 key hash.
    * Plans as TakeOrderedAndProject: each partition keeps its local
    * top-n then the driver merges n-sized heads — no global sort, no
    * full shuffle, driver memory bounded by n (keep n driver-sized;
    * for corpus-scale quotas use [[stratifiedQuota]] and shard). */
  def exactSample(df: DataFrame, keyCol: String, n: Int): DataFrame = {
    require(n > 0)
    val bucket = freshName("__bucket", df.columns.toSet)
    df.withColumn(bucket, hashBucket(col(keyCol)))
      .orderBy(col(bucket), col(keyCol))
      .limit(n)
      .drop(bucket)
  }

  /** Deterministic train/validation/test assignment: each row gets the
    * split whose cumulative hash-bucket range contains its key bucket
    * (fractions in declaration order; rows past the declared total —
    * fractions summing < 1 — get NULL, i.e. held out). Pure projection,
    * no shuffle; the same key always lands in the same split on any
    * engine, any run — membership leakage between splits is impossible
    * by construction. */
  def assignSplits(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)], splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0))
    require(splits.map(_._2).sum <= 1.0 + 1e-9, "split fractions exceed 1")
    // round, don't truncate: cumulative FP sums land a hair under the
    // exact bound (0.8 + 0.1 + 0.1 = 0.99999…), and truncation would
    // silently hold out the top bucket of a fully-allocated split
    val bounds = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }
      .map(c => math.round(c * Buckets))
    val b = hashBucket(col(keyCol))
    val expr = splits.zipWithIndex.foldRight(lit(null).cast(StringType)) {
      case (((name, _), i), acc) =>
        when(b < lit(bounds(i + 1)), lit(name)).otherwise(acc)
    }
    // foldRight nests: when(b < hi_0, s0).otherwise(when(b < hi_1, s1)…)
    // — the FIRST matching cumulative bound wins, so each split owns
    // the half-open bucket range [lo_i, hi_i)
    df.withColumn(splitCol, expr)
  }

  /** LEAKAGE-FREE split assignment: every member of the same group —
    * in practice a near-duplicate cluster from
    * [[graft.dedup.Dedup.connectedComponents]] — lands in the SAME
    * split, because the split hash keys on the group representative,
    * not the row id. Row-keyed splitting puts near-copies of one
    * document on both sides of the train/test fence (the classic
    * eval-contamination leak dedup exists to prevent); group-keyed
    * splitting makes that impossible by construction.
    *
    * `groups` is (idCol, cluster_id); rows absent from it are their
    * own group (singletons). Cost: ONE equi-join of the corpus with
    * the cluster table (clustered docs only — small when duplication
    * is sparse; broadcastable below the threshold) + the same pure
    * projection as [[assignSplits]]. */
  def assignSplitsByGroup(df: DataFrame, idCol: String, groups: DataFrame,
      splits: Seq[(String, Double)], splitCol: String = "split"): DataFrame = {
    val grp = freshName("__grp", df.columns.toSet)
    val keyed = df
      .join(groups.select(col(idCol), col("cluster_id").as(grp)),
        Seq(idCol), "left")
      .withColumn(grp, coalesce(col(grp), col(idCol)))
    assignSplits(keyed, grp, splits, splitCol).drop(grp)
  }

  /** Data-constrained mixing allocation (Muennighoff et al. 2023,
    * "Scaling Data-Constrained Language Models", arXiv:2305.16264 —
    * repeating data beyond ~4 epochs stops helping): split a token
    * `budget` across sources proportionally to their token counts,
    * capping every source at `maxEpochs` repetitions, with EXACTLY ONE
    * proportional redistribution of the capped sources' leftover to
    * the uncapped ones (the documented contract — integer floor
    * arithmetic end-to-end, so an ANSI oracle replays it bit-for-bit;
    * iterating to the true water-filling fixpoint would be
    * SQL-inexpressible).
    *
    * Input: one row per source `(source, tokens, weight)` — corpus
    * METADATA, S rows for S sources; `weight` is the desired mixture
    * proportion (integer, e.g. 1 for uniform — INDEPENDENT of tokens;
    * a tokens-proportional weight degenerates to all-or-none capping,
    * since every source then caps at the same budget/total ratio).
    * The computation is driver-side over those S rows (the same
    * bounded-driver pattern as watermarks and centroid lists); the
    * expensive part — deriving per-source token counts — is the
    * caller's one aggregate scan, and APPLYING the allocation is a
    * [[stratifiedMix]]/epoch-concat over rates = allocated/tokens.
    * Output: (source, tokens, allocated, epochs). */
  def dataConstrainedAllocation(perSource: DataFrame, budget: Long,
      maxEpochs: Int): DataFrame = {
    require(budget >= 0 && maxEpochs >= 1)
    val spark = perSource.sparkSession
    import spark.implicits._
    // resolve by NAME with explicit widening casts — positional access
    // would misbind a reordered frame, and an Int-typed tokens/weight
    // column would ClassCastException at getLong
    val src = perSource
      .select(col("source").cast("string").as("source"),
        col("tokens").cast("long").as("tokens"),
        col("weight").cast("long").as("weight"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("tokens"),
        r.getAs[Long]("weight")))
    // nonnegative inputs are part of the contract: BigInt '/' truncates
    // toward zero while the oracle's '//' floors — they agree only for
    // nonnegative operands
    require(src.forall(x => x._2 >= 0 && x._3 >= 0),
      "tokens and weight must be nonnegative")
    // BigInt for the proportional terms: budget·w at trillion-token
    // budgets with large weights overflows Long silently (a negative
    // allocation fed into sampler rates); every final value is ≤
    // budget, so the narrowing back to Long is safe
    val wTotal = src.map(x => BigInt(x._3)).sum
    val a1 = src.map { case (s, t, w) =>
      val prop =
        if (wTotal > 0) (BigInt(budget) * w / wTotal).toLong else 0L
      (s, t, w, math.min(prop, t * maxEpochs))
    }
    val leftover = budget - a1.map(_._4).sum
    val uncappedWeight = a1.collect {
      case (_, t, w, a) if a < t * maxEpochs => BigInt(w)
    }.sum
    a1.map { case (s, t, w, a) =>
      val cap = t * maxEpochs
      val extra =
        if (a < cap && uncappedWeight > 0 && leftover > 0)
          math.min(cap - a, (BigInt(leftover) * w / uncappedWeight).toLong)
        else 0L
      val alloc = a + extra
      (s, t, alloc, if (t > 0) alloc.toDouble / t else 0.0)
    }.toSeq.toDF("source", "tokens", "allocated", "epochs")
  }

  /** Deterministic global shuffle + sharding — the training-data WRITE
    * layout (shards that downstream loaders stream independently, rows
    * within a shard in pseudorandom order so a sequential reader sees
    * an unbiased mixture): `shard` = key-hash mod `nShards`,
    * `shard_pos` = the row's rank within its shard ordered by a SECOND
    * independent hash (salted md5 — ordering by the assignment hash
    * would sort each shard by its own residue class, not shuffle it),
    * key as the final tiebreak. Both hashes use the FULL 60-bit value
    * ([[hash60]]) — quantizing through [[hashBucket]]'s 10^6 buckets
    * would skew shard sizes up to 2× (or empty shards entirely) once
    * nShards approaches the bucket count, and would degrade in-shard
    * order into id-sorted runs within huge shards. Reproducible on any
    * engine/cluster layout PROVIDED `keyCol` is unique (it is the
    * document id); rows sharing a key would tie on every sort column
    * and rank by arrival order.
    *
    * Scale: one shuffle on `shard`; the rank window is PARTITIONED by
    * shard and shards are hash-balanced by construction (~N/nShards
    * rows each) — pick nShards so a shard fits a task (the usual
    * 100 TB layout is 10⁴–10⁶ shards), never 1. */
  def shardAndShuffle(df: DataFrame, keyCol: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1)
    import org.apache.spark.sql.expressions.Window
    val order = hash60(concat(lit("shuffle:"), col(keyCol).cast(StringType)))
    val w = Window.partitionBy(col("shard")).orderBy(order, col(keyCol))
    df.withColumn("shard", (hash60(col(keyCol)) % nShards).cast("int"))
      .withColumn("shard_pos", row_number().over(w).cast("long"))
  }

  /** Greedy contiguous sequence packing: within each `groupCol` stream,
    * rows ordered by `keyCol` accumulate `weightCol` (token counts) and
    * `batch_id = floor(start_offset / budget)` — every batch holds
    * consecutive documents totalling ≈`budget` tokens (an over-long doc
    * spills its batch rather than splitting). Deterministic layout:
    * the (group, key) order fully defines every batch on any engine.
    *
    * Scale: ONE shuffle on the group; the cumulative window is
    * inherently sequential PER STREAM (that is what contiguous packing
    * means), so parallelism = number of streams — shard the group key
    * (source × day/shard) upstream when single streams are huge. */
  def packSequences(df: DataFrame, groupCol: String, keyCol: String,
      weightCol: Column, budget: Long): DataFrame = {
    require(budget > 0)
    import org.apache.spark.sql.expressions.Window
    val taken = df.columns.toSet
    val wc = freshName("__w", taken)
    val cum = freshName("__cum", taken)
    val w = Window.partitionBy(col(groupCol)).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(wc, weightCol.cast(LongType))
      .withColumn(cum, sum(col(wc)).over(w))
      .withColumn("batch_id",
        expr(s"(`$cum` - `$wc`) div ${budget}L")) // integer div — no FP floor
      .drop(cum)
      .withColumnRenamed(wc, "n_tokens")
  }

  /** Materialized packing — what a trainer actually loads: on top of
    * [[packSequences]]' batch assignment, each (group, batch) row
    * carries the md5 of its documents' concatenation (in key order,
    * U+001E-record-separator-joined — the pin that any engine reassembles the
    * identical byte stream) and the comma-joined per-document TOKEN
    * OFFSETS into the packed sequence (where each document's tokens
    * start — the boundaries an attention mask or document-causal mask
    * needs).
    *
    * Contract: a NULL `textCol` is treated as the empty string (it
    * still occupies its `weightCol` tokens in `n_docs`/`batch_tokens`/
    * `offsets` — coalescing keeps the md5 aligned with those counts,
    * where `concat_ws`'s silent null-skip would desynchronize them);
    * texts must not contain U+001E, the record separator of the md5
    * framing — a text containing it is indistinguishable from two
    * shorter documents (the same reserved-byte rule as the SFT
    * response-dedup key).
    *
    * Scale: [[packSequences]]' one group shuffle plus one
    * (group, batch) window for the batch-local running offset and the
    * final per-batch aggregate — a batch is ≈`budget` tokens by
    * construction, so collect_list state is bounded by the budget,
    * never by the corpus. */
  def materializePacked(df: DataFrame, groupCol: String, keyCol: String,
      textCol: String, weightCol: Column, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val packed = packSequences(df, groupCol, keyCol, weightCol, budget)
    val wB = Window.partitionBy(col(groupCol), col("batch_id"))
      .orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    packed
      .withColumn("__off", sum(col("n_tokens")).over(wB) - col("n_tokens"))
      .groupBy(col(groupCol), col("batch_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("batch_tokens"),
        // compiled re-packs (round 15, the d10/tx_dup_span* swap): a
        // batch is budget-bounded but batches grow with corpus tokens,
        // so the interpreted sort+lambda still ran per document of the
        // corpus. The offset pre-casts to string INSIDE the struct -
        // keyCol is unique within a (group, batch), so the value never
        // breaks a tie and the sorted order is unchanged (SamplingSpec
        // pins equality to the interpreted spelling)
        md5(graft.functions.NativeText.sortedStructConcat(
          collect_list(struct(col(keyCol),
            coalesce(col(textCol), lit("")).as("__t"))), "\u001e"))
          .as("packed_md5"),
        graft.functions.NativeText.sortedStructConcat(
          collect_list(struct(col(keyCol),
            col("__off").cast(StringType).as("__o"))), ",").as("offsets"))
  }

  /** Length-bucketed batch layout — the PADDED-batch twin of
    * [[packSequences]]: where packing CONCATENATES documents to a token
    * budget, a padded trainer pays `max_len · batch_size` per batch,
    * so batches should group SIMILAR-length sequences. Rows are split
    * into `nBuckets` exact length quantiles (SQL-standard NTILE over
    * `weightCol` with the doc key as tiebreak, computed through the
    * distributed rank — no global sort, no unpartitioned window), and
    * each bucket fills fixed-`batchSize` batches in rank order. The
    * in-bucket position comes CLOSED-FORM from the global rank and the
    * NTILE boundary arithmetic — no second window pass at any scale.
    * Output: the input plus `n_tokens`, `bucket` (1-based),
    * `batch_id` (0-based within bucket). Aggregate
    * `max(n_tokens)·count − sum(n_tokens)` per (bucket, batch) for the
    * padding-waste accounting — the number this layout exists to
    * minimize. */
  def lengthBucketedBatches(df: DataFrame, keyCol: String,
      weightCol: Column, nBuckets: Int, batchSize: Int): DataFrame = {
    require(nBuckets > 0 && batchSize > 0)
    // output columns must not silently replace caller data — the
    // freshName rule, enforced loudly for the FIXED output names
    Seq("n_tokens", "bucket", "batch_id").foreach { c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column — rename it; the operator's " +
          "output would silently replace it")
    }
    val rn = freshName("__rn", df.columns.toSet)
    // materialize the weights once: the distributed rank makes three
    // passes over its input (the withQualityBands rationale)
    val keyed = df.withColumn("n_tokens", weightCol.cast(LongType))
      .localCheckpoint()
    val (ranked, n) = Keys.globalRankWithCount(keyed, "n_tokens", rn,
      smallBytes = 0L, tieBreakers = Seq(col(keyCol)))
    // in-bucket position = rank − 1 − ntile start (the inverse kept in
    // lock-step with the assignment, Keys.ntileStartExpr) — no second
    // window pass at any scale
    val start = freshName("__start", df.columns.toSet + rn)
    ranked
      .withColumn("bucket", Keys.ntileExpr(n, nBuckets, rn))
      .withColumn(start, Keys.ntileStartExpr(n, nBuckets, "bucket"))
      .withColumn("batch_id",
        expr(s"(`$rn` - 1 - `$start`) div ${batchSize}L"))
      .drop(rn, start)
  }

  /** Downsample every source to ≈`budget` units of `weightCol` (token
    * counts, bytes, …): per-source rate = min(1, budget / total), then
    * the deterministic hash mix. The totals aggregate is one tiny
    * per-source job (S rows to the driver — sources are a config-sized
    * set, never data-sized); the data pass stays a pure filter. Rates
    * derive from data, so two runs over the same corpus pick the same
    * rows — the reproducible "give me ~1B tokens per source" knob. */
  def tokenBudgetMix(df: DataFrame, sourceCol: String, keyCol: String,
      weightCol: Column, budget: Long): DataFrame = {
    require(budget > 0)
    val totals = df.groupBy(col(sourceCol))
      .agg(sum(weightCol.cast(LongType)).as("__total"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val rates = totals.map { case (src, total) =>
      src -> math.min(1.0, budget.toDouble / math.max(1L, total))
    }.toMap
    stratifiedMix(df, sourceCol, keyCol, rates)
  }

  /** Temperature-flattened source mixing (the multinomial-sampling
    * rebalance of XLM-R, arXiv:1911.02116 §3.1, and mT5): resample so
    * source mass follows pᵢ^α instead of pᵢ — α < 1 upweights rare
    * sources against dominant crawls. Keep rates are normalized so the
    * RAREST source survives whole: rateᵢ = (c_min / cᵢ)^(1−α), giving
    * expected kept counts ∝ cᵢ^α. The default α = 0.5 evaluates as
    * `sqrt(c_min / cᵢ)` — one exact long→double divide and an
    * IEEE-correctly-rounded sqrt, bit-identical in any engine (which is
    * what lets an independent SQL oracle recompute the rates); other α
    * go through `pow`, whose last-ulp rounding is libm-specific —
    * reproducible within the JVM, not pinned cross-engine.
    *
    * Scale: counts are one tiny per-source aggregate (S rows to the
    * driver — sources are a config-sized set); the data pass is the
    * same pure hash filter as every sampler here. */
  def temperatureMix(df: DataFrame, sourceCol: String, keyCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    if (counts.isEmpty) df // empty input: nothing to rebalance
    else {
      val cMin = counts.map(_._2).min
      val rates = counts.map { case (src, c) =>
        val ratio = cMin.toDouble / c
        src -> (if (alpha == 0.5) math.sqrt(ratio)
                else math.pow(ratio, 1 - alpha))
      }.toMap
      stratifiedMix(df, sourceCol, keyCol, rates)
    }
  }
}
