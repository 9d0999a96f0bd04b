package graft.similarity

import graft.core.AtomicSwap
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED IVFADC index + RECALL WATCHDOG — the maintenance loop the
  * in-engine trainers ([[Pq.trainCoarseQ]]/[[Pq.trainCodebooksQ]])
  * enable: train → encode → serve from disk → WATCH recall on a
  * held-out query sample → retrain + atomically re-index when drift
  * pushes recall below the floor. Before this, re-indexing was an
  * operator decision; [[maintain]] makes it a measured one.
  *
  * On-disk layout under `path/`:
  *  - `meta/` — one tiny parquet of (kind, idx, sub, vals array<long>):
  *    `coarse` rows are the full-dimension integer cells (sub = −1),
  *    `codebook` rows the per-subspace PQ centroids. Integer artifacts
  *    (the [[PqFixture]] discipline) keep every ADC distance exact and
  *    the index byte-reproducible on any cluster layout.
  *  - `corpus/batch=<id>/` — (id, codes array<tinyint>) PARTITIONED BY
  *    cluster inside each batch directory: a query probing nProbe
  *    cells reads only those cluster directories, and the m-byte codes
  *    are the only per-row payload (the float vectors stay in the
  *    source table — the point of PQ). A generation build writes
  *    `batch=-1`; [[append]] lands each increment under its own
  *    `batch=<id>` (the repo-wide idempotent batch=id layout), so
  *    ingest cost is ∝ new rows and a replayed batch overwrites
  *    exactly itself.
  *
  * Swap discipline: a replacement index (meta AND corpus — the
  * artifacts and the encoding they produced must never be mixed across
  * generations) is FULLY written beside the live directory, then
  * published through [[graft.core.AtomicSwap]]: rename-aside + rename-in
  * + retire, with [[AtomicSwap.heal]] at every read entry — a crash at
  * any interruption point leaves one complete index readable.
  *
  * Scale shape: training is sample-bounded (`maxTrainRows`), encode is
  * ONE map-side pass over the corpus (assignment + PQ codes ride the
  * same projection), recall evaluation is brute force over the QUERY
  * SAMPLE only (a few hundred queries — the corpus is scanned once,
  * never shuffled), and the retrain trigger reads nothing but that
  * number. */
object PqIndex {

  /** The driver-small index artifacts: k×dim coarse cells + m×ksub×dsub
    * PQ codebooks, all integer. */
  final case class Index(coarse: Seq[Seq[Long]], books: Seq[Seq[Seq[Long]]])

  /** What [[maintain]] did and measured. `recallAfter == recallBefore`
    * when the floor held and nothing was retrained. */
  final case class MaintainResult(recallBefore: Double, retrained: Boolean,
      recallAfter: Double, floor: Double)

  /** Train both quantizer tiers on (a bounded sample of) the corpus —
    * deterministic integer Lloyd, byte-reproducible. */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
      kCells: Int = 10, m: Int = 4, ksub: Int = 8, iters: Int = 25,
      maxTrainRows: Option[Long] = None): Index =
    Index(
      Pq.trainCoarseQ(corpus, idCol, vecCol, kCells, iters, maxTrainRows),
      Pq.trainCodebooksQ(corpus, idCol, vecCol, m, ksub, iters, maxTrainRows))

  /** Encode + write a COMPLETE index generation into `dir` (not the
    * live path — callers publish via the atomic swap). */
  private def writeTo(spark: SparkSession, dir: String, corpus: DataFrame,
      idCol: String, vecCol: String, ix: Index): Unit = {
    import spark.implicits._
    val prep = corpus.select(col(idCol).cast("string").as("id"),
      Similarity.quantize(col(vecCol)).as("q"))
    val encoded = Pq.encodeQ(
        prep.withColumn("cluster", element_at(
          Similarity.nearestCentroidsQ(col("q"), ix.coarse, 1), 1)),
        "q", ix.books)
      .select(col("id"), col("q_pq").as("codes"), col("cluster"))
    encoded.write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$dir/corpus/batch=-1")
    val metaRows =
      ix.coarse.zipWithIndex.map { case (c, i) => ("coarse", i, -1, c) } ++
        ix.books.zipWithIndex.flatMap { case (book, j) =>
          book.zipWithIndex.map { case (c, i) => ("codebook", i, j, c) }
        }
    metaRows.toDF("kind", "idx", "sub", "vals")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  private def fsOf(spark: SparkSession, path: String) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Heal a cut-mid-swap index, if any — called at every entry. */
  private def heal(spark: SparkSession, path: String): Unit = {
    val (fs, p) = fsOf(spark, path)
    AtomicSwap.heal(fs, p, new Path(path + "__bak"))
  }

  /** Publish the generation under `path__new` over the live `path`. */
  private def publish(spark: SparkSession, path: String): Unit = {
    val (fs, p) = fsOf(spark, path)
    AtomicSwap.publish(fs, p, new Path(path + "__new"),
      new Path(path + "__bak"))
  }

  /** Train on the corpus and publish a fresh index at `path`
    * (crash-safe: the generation is complete before the swap). */
  def build(spark: SparkSession, path: String, corpus: DataFrame,
      idCol: String, vecCol: String, kCells: Int = 10, m: Int = 4,
      ksub: Int = 8, iters: Int = 25,
      maxTrainRows: Option[Long] = None): Index = {
    heal(spark, path)
    val ix = train(corpus, idCol, vecCol, kCells, m, ksub, iters,
      maxTrainRows)
    writeTo(spark, path + "__new", corpus, idCol, vecCol, ix)
    publish(spark, path)
    ix
  }

  /** Publish a fresh index at `path` from CALLER-PROVIDED artifacts —
    * the bring-your-own-quantizers build ([[build]] trains its own):
    * artifacts trained on an earlier corpus generation, on a different
    * cluster, or pinned fixtures (the [[PqFixture]] oracle discipline)
    * encode the given corpus through the same writeTo + atomic-swap
    * path, so disk serving is byte-comparable to any in-memory ranking
    * using the same integers. */
  def buildFrom(spark: SparkSession, path: String, corpus: DataFrame,
      idCol: String, vecCol: String, ix: Index): Unit = {
    heal(spark, path)
    writeTo(spark, path + "__new", corpus, idCol, vecCol, ix)
    publish(spark, path)
  }

  /** Re-encode a changed corpus with the CURRENT artifacts (the
    * ingest-time path: rows moved, quantizers reused) — the scenario
    * that makes a recall watchdog necessary, because nothing here
    * checks that the stale artifacts still fit the data. */
  def reencode(spark: SparkSession, path: String, corpus: DataFrame,
      idCol: String, vecCol: String): Unit = {
    heal(spark, path)
    val ix = loadMeta(spark, path)
    writeTo(spark, path + "__new", corpus, idCol, vecCol, ix)
    publish(spark, path)
  }

  /** Migrate a LEGACY flat corpus layout (`cluster=*` directly under
    * `corpus/` — the pre-batch [[writeTo]] shape) into `batch=-1/`.
    * Without this, [[append]] landing `batch=<id>` beside flat
    * `cluster=*` directories gives the corpus two partition depths and
    * every subsequent read fails with conflicting-directory-structures
    * — an apparently successful append would corrupt a previously
    * readable index. Pure driver-side renames (one per cluster
    * directory). A corpus that somehow mixes BOTH layouts already is
    * not migratable (the flat clusters cannot merge into an existing
    * `batch=-1`) and fails fast with a rebuild message. */
  private def ensureBatchLayout(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Unit = {
    val legacy = fs.globStatus(new Path(path, "corpus/cluster=*"))
    if (legacy != null && legacy.nonEmpty) {
      val gen = new Path(path, "corpus/batch=-1")
      require(!fs.exists(gen),
        s"index at $path mixes a legacy flat corpus layout (cluster=* " +
          "directly under corpus/) with batch=* directories — not " +
          "migratable in place; rebuild the index (PqIndex.build)")
      fs.mkdirs(gen)
      legacy.foreach { st =>
        require(fs.rename(st.getPath, new Path(gen, st.getPath.getName)),
          s"legacy-layout migration failed renaming ${st.getPath}")
      }
      val succ = new Path(path, "corpus/_SUCCESS")
      if (fs.exists(succ)) fs.rename(succ, new Path(gen, "_SUCCESS"))
    }
  }

  /** INCREMENTAL ingest: encode ONLY `rows` with the CURRENT artifacts
    * and land them under `corpus/batch=<batchId>` — per-call cost ∝
    * new rows (one map-side assign+encode projection, one write),
    * never a corpus re-encode ([[reencode]] is the full-rewrite path;
    * this is what a 100 TB corpus actually runs per ingest window).
    * A replayed batchId overwrites exactly its own directory, so
    * crash-replay is idempotent. Append-only contract: ids must be
    * NEW — an updated id would coexist with its old encoding until the
    * next retrain absorbs everything into a fresh `batch=-1`
    * generation (the [[graft.streaming.Streams.ivfIngestSink]]
    * frozen-centroid discipline). Stale-artifact drift is [[maintain]]'s
    * job: run it on a cadence; a retrain re-encodes the caller's FULL
    * corpus and the atomic swap retires every batch directory.
    *
    * Reader safety: the batch is written to an underscore-prefixed
    * scratch directory (invisible to `corpus` readers) and renamed in,
    * so a concurrent reader never lists a half-written batch. Writers
    * are single per index (the streaming-sink contract); the rename
    * only protects READERS. A legacy flat-layout corpus is migrated to
    * `batch=-1` first (see [[ensureBatchLayout]]). Returns the row
    * count actually written (footer-metadata read-back of the landed
    * batch — no second pass over `rows`, which may be a non-replayable
    * micro-batch source). */
  def append(spark: SparkSession, path: String, rows: DataFrame,
      idCol: String, vecCol: String, batchId: Long): Long = {
    val ix = loadMeta(spark, path)
    val (fs, _) = fsOf(spark, path)
    ensureBatchLayout(fs, path)
    val prep = rows.select(col(idCol).cast("string").as("id"),
      Similarity.quantize(col(vecCol)).as("q"))
    val tmp = new Path(s"$path/corpus/_batch_tmp_$batchId")
    Pq.encodeQ(
        prep.withColumn("cluster", element_at(
          Similarity.nearestCentroidsQ(col("q"), ix.coarse, 1), 1)),
        "q", ix.books)
      .select(col("id"), col("q_pq").as("codes"), col("cluster"))
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(tmp.toString)
    val dst = new Path(s"$path/corpus/batch=$batchId")
    if (fs.exists(dst)) fs.delete(dst, true)
    require(fs.rename(tmp, dst), s"append: rename $tmp -> $dst failed")
    // a zero-row batch (an AvailableNow run with no new data, or a
    // replayed batch off a non-replayable source — exactly the cases
    // the read-back exists for) lands only _SUCCESS: no parquet
    // footers under cluster=*, and schema inference on the data-less
    // directory THROWS — turning a harmless no-op into a stream crash
    // after the rename already published the empty batch. Probe for
    // data files first; 0 rows needs no read. The probe accepts ANY
    // non-hidden file under cluster=* (ADVICE r13): a committer or
    // write config producing data files that don't match Spark's
    // default part-* prefix would otherwise mis-read a landed batch
    // as empty and report rowsLoaded=0 while data exists.
    val dataFiles = fs.globStatus(new Path(dst, "*/*"),
      (p: Path) => !p.getName.startsWith("_") && !p.getName.startsWith("."))
    if (dataFiles == null || dataFiles.isEmpty) 0L
    else spark.read.parquet(dst.toString).count()
  }

  /** Fold accumulated [[append]] batches into a single `batch=-1`
    * generation WITHOUT retraining or re-encoding — the stored codes
    * are already the live artifacts' output, so compaction is one scan
    * of the m-byte codes re-partitioned by cluster (the float vectors
    * are never touched) plus a copy of the tiny `meta/`, published
    * through the same atomic swap. This is directory HYGIENE, not a
    * quality operation: a long-lived index whose ingest produced
    * thousands of `batch=N` directories pays their listing cost on
    * every query ([[graft.streaming.Streams.erComponentsCompact]]'s
    * motivation, minus the closure math). Returns false (touching
    * nothing) when no append batches exist. Answers are identical
    * before and after — same rows, same codes, same clusters. */
  def compactCorpus(spark: SparkSession, path: String): Boolean = {
    heal(spark, path)
    val (fs, _) = fsOf(spark, path)
    ensureBatchLayout(fs, path)
    val batches = fs.globStatus(new Path(path, "corpus/batch=*"))
    if (batches == null || !batches.exists(_.getPath.getName != "batch=-1"))
      false
    else {
      val codes = spark.read.parquet(s"$path/corpus")
        .select(col("id"), col("codes"), col("cluster"))
      codes.write.mode("overwrite").partitionBy("cluster")
        .parquet(path + "__new/corpus/batch=-1")
      spark.read.parquet(s"$path/meta")
        .coalesce(1).write.mode("overwrite").parquet(path + "__new/meta")
      publish(spark, path)
      true
    }
  }

  /** Load the integer artifacts (tiny). */
  def loadMeta(spark: SparkSession, path: String): Index = {
    heal(spark, path)
    val rows = spark.read.parquet(s"$path/meta").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        r.getSeq[Long](3).toVector))
    val coarse = rows.filter(_._1 == "coarse").sortBy(_._2).map(_._4).toSeq
    val books = rows.filter(_._1 == "codebook").groupBy(_._3).toSeq
      .sortBy(_._1).map(_._2.sortBy(_._2).map(_._4).toSeq)
    require(coarse.nonEmpty && books.nonEmpty &&
      books.forall(_.size == books.head.size),
      s"index at $path is torn: ${coarse.size} cells, " +
        s"ragged codebooks ${books.map(_.size)}")
    Index(coarse, books)
  }

  /** The union of coarse cells the query batch probes — driver-tiny by
    * construction (≤ kCells distinct ints, whatever the batch size).
    * One extra small job over the query frame (small by the serving
    * contract); the payoff is a STATIC partition filter on the corpus
    * scan, which dynamic partition pruning cannot deliver here (the
    * broadcast probe side carries no selective predicate, so Spark's
    * PartitionPruning rule declines and an unhinted read scans every
    * cluster directory — plan-probed, and what [[topK]] shipped
    * before this filter existed). */
  private def probedCells(prepared: DataFrame, ix: Index,
      nProbe: Int): Seq[Int] =
    prepared.select(explode(Similarity.nearestCentroidsQ(
        col("q"), ix.coarse, nProbe)).as("__cell"))
      .distinct().collect().map(_.getInt(0)).sorted.toSeq

  /** ADC top-k straight off the persisted index: only the probed
    * cluster directories and the m-byte codes are read — the probed
    * cell set (≤ kCells ints) is computed up front and pushed as a
    * static `cluster IN (...)` partition filter, so the scan lists and
    * reads nProbe-cells' worth of the codes corpus, not all of it
    * (asserted by PqIndexSpec on the executed plan's scan metrics).
    * Output matches [[Pq.topKQ]]: (query_id, rank, neighbor_id,
    * adc_dist). */
  def topK(spark: SparkSession, path: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int = 4): DataFrame = {
    val ix = loadMeta(spark, path)
    // ONE evaluation of the query source per serve: quantize once,
    // pin the tiny (id, q) frame (queries are serving-contract small —
    // localCheckpoint materializes it eagerly), and derive the
    // probed-cell set, the probe explode, and the per-query ADC
    // tables all from the pinned frame. The previous spelling
    // re-evaluated quantize+assignment over the query SOURCE for each
    // of the three derivations — and when callers pass a query frame
    // derived by filtering the corpus, each derivation re-read the
    // corpus (the SCALE.md caveat this retires). Single-scan behavior
    // is pinned by PqIndexSpec with an accumulator-instrumented
    // source.
    val q = queries.select(col(idCol).cast("string").as("id"),
      Similarity.quantize(col(vecCol)).as("q")).localCheckpoint()
    val cells = probedCells(q, ix, nProbe)
    val indexed = spark.read.parquet(s"$path/corpus")
      .where(col("cluster").isin(cells: _*))
      .withColumnRenamed("codes", "q_pq")
    Pq.topKQ(indexed, q, "id", "q", ix.coarse, ix.books, k, nProbe)
  }

  /** ADC shortlist off the persisted codes + EXACT cosine re-rank
    * against the caller's float corpus — the recall-robust query path
    * (the disk twin of [[Similarity.ivfTopKQ]] / [[Pq.topKRefined]]).
    * Raw [[topK]] ranks have m-byte-code resolution: inside a tight
    * cell whose members differ by less than the quantization error
    * they are effectively unordered, so recall-sensitive serving
    * re-ranks a shortlist (default 4k). The shortlist id set is
    * broadcast-small (queries × shortlist) and the float fetch is one
    * broadcast join against the corpus — the vectors' home table, read
    * once; at deployment scale it is the hot-tier point lookup while
    * only the m-byte codes live in the index. */
  def topKRefined(spark: SparkSession, path: String, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      shortlist: Int = 0, nProbe: Int = 4): DataFrame = {
    import graft.plans.TopK
    import Similarity.{cosineFromParts, dotQ, normSqQ, quantize}
    val r = if (shortlist > 0) shortlist else 4 * k
    val cands = topK(spark, path, queries, idCol, vecCol, r, nProbe)
      .select(col("query_id"), col("neighbor_id"))
    val c = corpus
      .select(col(idCol).cast("string").as("neighbor_id"), col(vecCol))
      .join(broadcast(cands), Seq("neighbor_id"))
      .withColumn("__q", quantize(col(vecCol)))
      .withColumn("__nsq", normSqQ(col("__q")))
      .drop(vecCol)
    val q = queries.select(col(idCol).cast("string").as("query_id"),
        quantize(col(vecCol)).as("__qq"))
      .withColumn("__qnsq", normSqQ(col("__qq")))
    val exact = c.join(broadcast(q), Seq("query_id"))
      .withColumn("cosine",
        cosineFromParts(dotQ(col("__q"), col("__qq")),
          col("__nsq"), col("__qnsq")))
    TopK.perKey(exact, Seq("query_id"),
        Seq(TopK.desc("cosine"), TopK.asc("neighbor_id")), k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Mean recall@k of the live index against brute-force cosine over a
    * held-out query sample — the watchdog's ONE number. Brute force
    * touches queries × corpus candidate rows (the sample is small by
    * contract); the index side reads only probed cells. `shortlist`
    * > 0 measures the [[topKRefined]] serving path instead of raw ADC
    * ranks — measure whichever path actually serves. */
  def recallAt(spark: SparkSession, path: String, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int = 4, shortlist: Int = 0): Double = {
    val brute = Similarity
      .bruteForceTopK(corpus, queries, idCol, vecCol, k)
      .select(col("query_id").cast("string").as("query_id"),
        col("neighbor_id").cast("string").as("neighbor_id"))
      .localCheckpoint()
    val approx = (if (shortlist > 0)
        topKRefined(spark, path, corpus, queries, idCol, vecCol, k,
          shortlist, nProbe)
      else topK(spark, path, queries, idCol, vecCol, k, nProbe))
      .select(col("query_id"), col("neighbor_id"))
    val hits = approx.join(brute, Seq("query_id", "neighbor_id"),
      "left_semi").count()
    val total = brute.count()
    val r = if (total == 0L) 1.0 else hits.toDouble / total
    org.apache.spark.sql.GraftShims.unpersistCheckpoint(brute)
    r
  }

  /** The WATCHDOG: measure recall on the held-out sample; below the
    * floor, retrain BOTH quantizer tiers on the current corpus,
    * re-encode, swap atomically, and re-measure. Schedule this beside
    * the ingest (e.g. after every [[reencode]] / compaction window);
    * when the floor holds it costs one recall evaluation and touches
    * nothing. */
  def maintain(spark: SparkSession, path: String, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, floor: Double,
      k: Int = 10, nProbe: Int = 4, kCells: Int = 10, m: Int = 4,
      ksub: Int = 8, iters: Int = 25,
      maxTrainRows: Option[Long] = None, shortlist: Int = 0): MaintainResult = {
    require(floor > 0.0 && floor <= 1.0, s"floor must be in (0, 1]: $floor")
    heal(spark, path)
    val before = recallAt(spark, path, corpus, queries, idCol, vecCol, k,
      nProbe, shortlist)
    if (before >= floor) MaintainResult(before, retrained = false, before,
      floor)
    else {
      val ix = train(corpus, idCol, vecCol, kCells, m, ksub, iters,
        maxTrainRows)
      writeTo(spark, path + "__new", corpus, idCol, vecCol, ix)
      publish(spark, path)
      val after = recallAt(spark, path, corpus, queries, idCol, vecCol, k,
        nProbe, shortlist)
      MaintainResult(before, retrained = true, after, floor)
    }
  }
}
