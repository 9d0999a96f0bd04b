package graft.queries

import graft.similarity.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN / near-duplicate search over `embeddings` (array<float>, 64-dim).
  *
  * Engine-exact cosine (see [[graft.similarity.Similarity]]): components
  * quantized to integers (floor(x·10⁴)), exact integer dot/norms, one
  * final double ratio — so even the cosine COLUMN hash-matches DuckDB,
  * not just the neighbor ranking. */
object SimilarityQueries extends QueryPack {

  private val nQueries = 10
  private val k = 5

  /** Brute-force top-k cosine neighbors for the first 10 vectors —
    * the recall baseline every ANN variant is judged against. */
  def simTopkBrute(s: SparkSession, dir: String): DataFrame = {
    val emb = table(s, dir, "embeddings")
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < nQueries),
        "vec_id", "embedding", k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-style bucketed top-k: candidates restricted to the query's
    * cluster (`label` = coarse quantizer cell). O(n/buckets) per query. */
  def simTopkBucketed(s: SparkSession, dir: String): DataFrame = {
    val emb = table(s, dir, "embeddings")
    Similarity.bucketedTopK(emb, emb.filter(col("vec_id") < nQueries),
        "vec_id", "embedding", "label", k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Radius search ([[Similarity.rangeSearch]]): every corpus vector
    * within cosine ≥ 0.35 of each of the 10 query vectors — the
    * thresholded-retrieval mode top-k can't express; output is
    * match-sized, not queries×k. */
  def simRangeSearch(s: SparkSession, dir: String): DataFrame = {
    val emb = table(s, dir, "embeddings")
    Similarity.rangeSearch(emb, emb.filter(col("vec_id") < nQueries),
        "vec_id", "embedding", threshold = 0.35)
      .orderBy(col("query_id"), col("neighbor_id"))
  }

  /** Recall@k of the PRODUCTION-DEFAULT ANN path
    * ([[Similarity.ivfTopKQ]]: IVF multiprobe nProbe=4 over the
    * committed coarse centroids + full-precision re-rank) against
    * ground-truth brute force — the measurement that makes an ANN
    * index honest: the speed/recall trade is a NUMBER per query, not
    * a hope. recall@10 = |ivf ∩ brute| / 10 via a semi-join on
    * (query, neighbor). At 100 TB the brute side runs on a SAMPLE of
    * queries (this query-batch pattern), never the full workload —
    * recall estimation needs a few hundred queries, and the
    * corpus-side cost is the same one scan the production brute path
    * pays.
    *
    * History: single-probe LABEL bucketing measured here at recall
    * ≈ 0.08 ≈ 1/|labels| — the expected value when cells are
    * arbitrary and neighbors scatter uniformly. That measurement is
    * why multiprobe + re-rank is now the default, and this row PINS
    * the default's floor: `floor_ok` asserts mean recall@10 ≥ 0.8 at
    * nProbe = 4 — if the engine's index path ever regresses below
    * the floor, this row goes red (the oracle recomputes the same
    * search independently in DuckDB). */
  def simRecallEval(s: SparkSession, dir: String): DataFrame = {
    import graft.similarity.PqFixture
    val kEval = 10
    val emb = table(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < nQueries)
    val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", kEval)
      .select(col("query_id"), col("neighbor_id"))
    val ivf = Similarity.ivfTopKQ(emb, q, "vec_id", "embedding",
        PqFixture.coarseIvfL, kEval, nProbe = 4, nAssign = 2)
      .select(col("query_id"), col("neighbor_id"))
    val hits = ivf.join(brute, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    val perQuery = brute.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        lit(kEval.toLong).as("k"),
        (coalesce(col("hits"), lit(0L)).cast("double") / kEval).as("recall"))
      // the summary row re-aggregates this frame — checkpoint or the
      // union re-runs the whole brute-force + IVF pipeline twice
      .localCheckpoint()
    // the FLOOR row: mean recall@10 over the query sample must hold
    // ≥ 0.8 — asserted as a value in the oracle-compared result
    val floor = perQuery.agg(
        lit(-1L).as("query_id"),
        sum(col("hits")).as("hits"),
        sum(col("k")).as("k"),
        (sum(col("hits")).cast("double") / sum(col("k"))).as("recall"))
      .withColumn("floor_ok", col("recall") >= 0.8)
    perQuery.withColumn("floor_ok", lit(true))
      .unionByName(floor)
      .orderBy(col("query_id"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ 0.40 within label blocks. */
  def simNearDupPairs(s: SparkSession, dir: String): DataFrame =
    Similarity.blockedNearDupPairs(table(s, dir, "embeddings"),
        "vec_id", "embedding", "label", threshold = 0.40)
      .orderBy(col("id_a"), col("id_b"))

  /** End-to-end embedding dedup: near-dup pairs → greedy removal (every
    * `id_b` drops, lowest id per cluster survives — the same broadcast
    * anti-join application as the text corpus,
    * [[graft.dedup.Dedup.removeNearDuplicates]]). */
  def simDedupApply(s: SparkSession, dir: String): DataFrame = {
    val emb = table(s, dir, "embeddings")
    val pairs = Similarity.blockedNearDupPairs(emb,
      "vec_id", "embedding", "label", threshold = 0.40)
    graft.dedup.Dedup.removeNearDuplicates(emb, pairs, "vec_id")
      .select(col("vec_id"), col("label"))
      .orderBy(col("vec_id"))
  }

  /** Per-label centroid of the embedding space (long form: one row per
    * (label, component)): exact integer component sums over quantized
    * vectors — order-free, so the result hash-compares — with the mean
    * as one final IEEE division. */
  def simCentroids(s: SparkSession, dir: String): DataFrame =
    Similarity.labelCentroids(table(s, dir, "embeddings"), "embedding", "label")
      .orderBy(col("label"), col("pos"))

  /** SemDeDup-style semantic dedup ([[Similarity.semDeDup]]): within
    * each label cell, cosine-≥0.40 groups keep only the member least
    * similar to the cell centroid (diversity-maximizing survivor). The
    * centroid_cos column itself is part of the oracle compare — the
    * integer-sum construction makes even that double engine-exact. */
  def simSemDedup(s: SparkSession, dir: String): DataFrame =
    Similarity.semDeDup(table(s, dir, "embeddings"),
        "vec_id", "embedding", "label", eps = 0.40)
      .orderBy(col("vec_id"))

  /** Contrastive pair mining ([[Similarity.contrastivePairs]]): per
    * anchor, the best in-band positive (cos ≥ 0.35) and the hardest
    * below-band negative. */
  def simContrastivePairs(s: SparkSession, dir: String): DataFrame = {
    val emb = table(s, dir, "embeddings")
    Similarity.contrastivePairs(emb, emb.filter(col("vec_id") < 50),
        "vec_id", "embedding", tau = 0.35)
      .orderBy(col("anchor_id"))
  }

  /** Cluster-balanced diversity sample
    * ([[Similarity.clusterBalancedSample]]): the 3 least-prototypical
    * members of every label cell. */
  def simClusterSample(s: SparkSession, dir: String): DataFrame =
    Similarity.clusterBalancedSample(table(s, dir, "embeddings"),
        "vec_id", "embedding", "label", quota = 3)
      .orderBy(col("label"), col("rank"))

  /** First principal component of the embedding corpus by exact
    * fixed-point power iteration ([[Similarity.powerIterationPc1]]);
    * the oracle replays all 8 iterates as unrolled CTEs. */
  def simPcaPc1(s: SparkSession, dir: String): DataFrame =
    Similarity.powerIterationPc1(table(s, dir, "embeddings"), "embedding")
      .orderBy(col("pos"))

  /** All-but-the-top anisotropy correction
    * ([[Similarity.removeTopComponent]]): every embedding with the
    * corpus PC1 projected out, exact long-form integers. */
  def simAbtt(s: SparkSession, dir: String): DataFrame =
    Similarity.removeTopComponent(table(s, dir, "embeddings"),
        "vec_id", "embedding")
      .orderBy(col("vec_id"), col("pos"))

  /** IVFADC top-k ([[graft.similarity.Pq.topK]]) over the COMMITTED
    * integer fixture ([[graft.similarity.PqFixture]]): coarse cells and
    * PQ codes assigned by exact integer nearest-centroid, ADC distance
    * = m integer table lookups — the whole pipeline (encode, probe,
    * lookup, rank) is oracle-pinned, including the adc_dist column
    * (exact-integer-valued doubles). KMeans-trained float codebooks
    * remain the production path, verified by PqSpec recall bounds. */
  /** The PERSISTED-index serving path end-to-end under the oracle
    * gate: the fixture artifacts ([[graft.similarity.PqFixture]])
    * encode the corpus into an on-disk IVFADC index
    * ([[graft.similarity.PqIndex.buildFrom]]), and the ranks come off
    * the DISK index through the statically-pruned cluster scan
    * ([[graft.similarity.PqIndex.topK]]) — the same integer ADC
    * distances as [[simPqAdc]], independently recomputed by DuckDB.
    * Ids ride as strings on the disk path, so the oracle casts and
    * tie-breaks on the string image. The index lives in a per-call
    * temp dir, materialized rows survive its deletion (the
    * tx_pretrain_stream temp-state discipline — this query runs
    * repeatedly under bench + the gate). */
  def simPqIndexDisk(s: SparkSession, dir: String): DataFrame = {
    import graft.similarity.{PqFixture, PqIndex}
    val work = java.nio.file.Files
      .createTempDirectory("graft_pqindex_disk").toString
    val rows =
      try {
        val emb = table(s, dir, "embeddings")
        PqIndex.buildFrom(s, s"$work/index", emb, "vec_id", "embedding",
          PqIndex.Index(PqFixture.coarseL, PqFixture.codebooksL))
        PqIndex.topK(s, s"$work/index", emb.filter(col("vec_id") < nQueries),
            "vec_id", "embedding", k, nProbe = 2)
          .collect()
          .map(r => (r.getString(0), r.getInt(1), r.getString(2),
            r.getDouble(3)))
          .toSeq
      } finally graft.core.AtomicSwap
        .deleteRecursively(new java.io.File(work))
    import s.implicits._
    rows.toDF("query_id", "rank", "neighbor_id", "adc_dist")
      .orderBy(col("query_id"), col("rank"))
  }

  def simPqAdc(s: SparkSession, dir: String): DataFrame = {
    import graft.similarity.{Pq, PqFixture}
    val prep = table(s, dir, "embeddings")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
    val indexed = Pq.encodeQ(
      prep.withColumn("cluster", element_at(
        Similarity.nearestCentroidsQ(col("q"), PqFixture.coarseL, 1), 1)),
      "q", PqFixture.codebooksL)
    Pq.topKQ(indexed, prep.filter(col("vec_id") < nQueries), "vec_id", "q",
        PqFixture.coarseL, PqFixture.codebooksL, k, nProbe = 2)
      .orderBy(col("query_id"), col("rank"))
  }

  val queries: Map[String, QueryFn] = Map(
    "sim_pq_adc" -> (simPqAdc _),
    "sim_pqindex_disk" -> (simPqIndexDisk _),
    "sim_centroids" -> (simCentroids _),
    "sim_topk_brute" -> (simTopkBrute _),
    "sim_topk_bucketed" -> (simTopkBucketed _),
    "sim_range_search" -> (simRangeSearch _),
    "sim_recall_eval" -> (simRecallEval _),
    "sim_neardup_pairs" -> (simNearDupPairs _),
    "sim_dedup_apply" -> (simDedupApply _),
    "sim_semdedup" -> (simSemDedup _),
    "sim_contrastive_pairs" -> (simContrastivePairs _),
    "sim_cluster_sample" -> (simClusterSample _),
    "sim_pca_pc1" -> (simPcaPc1 _),
    "sim_abtt" -> (simAbtt _),
    "sim_int8_codes" -> (simInt8Codes _))

  /** Int8 storage compression ([[Similarity.compressInt8]]) under the
    * oracle gate — long form (vec_id, pos, code, scale): per-vector
    * symmetric quantization, scale = max|x|/127 (float max is
    * order-free exact, the divide widens to double in both engines),
    * codes = HALF_UP(x/scale) (DuckDB ROUND is half-away-from-zero =
    * the same convention). Previously a test-only API; every
    * arithmetic step is engine-replayable so it earns an oracle row. */
  def simInt8Codes(s: SparkSession, dir: String): DataFrame =
    Similarity.compressInt8(
        table(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        "embedding")
      .select(col("vec_id"), col("embedding_scale").as("scale"),
        posexplode(col("embedding_i8")).as(Seq("pos", "code")))
      .select(col("vec_id"), col("pos"), col("code").cast("int").as("code"),
        col("scale"))
      .orderBy(col("vec_id"), col("pos"))

  /** Integer-quantized corpus CTE shared by the oracles: q = floor(x·10⁴)
    * components, nsq = exact squared norm. */
  private val prepSql = """
    SELECT vec_id, label,
           list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS q
    FROM embeddings"""

  private val normSql = """
    SELECT vec_id, label, q,
           (SELECT SUM(a * b) FROM (SELECT unnest(p.q) AS a, unnest(p.q) AS b)) AS nsq
    FROM prep p"""

  private def cosSql(qa: String, qb: String, na: String, nb: String) =
    s"""CAST((SELECT SUM(a * b) FROM (SELECT unnest($qa) AS a, unnest($qb) AS b)) AS DOUBLE)
        / sqrt(CAST($na AS DOUBLE) * CAST($nb AS DOUBLE))"""

  // the committed PQ fixture rendered as DuckDB VALUES rows — built
  // from the SAME PqFixture constants the Spark query uses, so the two
  // sides cannot drift
  private val coarseValuesSql = graft.similarity.PqFixture.coarseL.zipWithIndex
    .map { case (v, i) => s"($i, ${v.mkString("[", ",", "]")})" }
    .mkString(", ")
  private val coarseIvfValuesSql =
    graft.similarity.PqFixture.coarseIvfL.zipWithIndex
      .map { case (v, i) => s"($i, ${v.mkString("[", ",", "]")})" }
      .mkString(", ")
  private val cbValuesSql = graft.similarity.PqFixture.codebooksL.zipWithIndex
    .flatMap { case (book, j) =>
      book.zipWithIndex.map { case (v, c) =>
        s"($j, $c, ${v.mkString("[", ",", "]")})" } }
    .mkString(", ")

  /** Unrolled fixed-point power iteration: w_t = M·v_{t-1},
    * v_t = (w_t·10⁶)//max|w_t| — DuckDB `//` truncates toward zero,
    * matching Scala BigInt division, so every iterate is bit-exact. */
  private def pcaIterCtes(iters: Int): String =
    (1 to iters).map { t =>
      // MATERIALIZED: DuckDB inlines plain CTEs per reference, which
      // re-derives the whole prior chain at every step (exponential)
      s"""w$t AS MATERIALIZED (
        SELECT m.i, SUM(m.mij * v${t - 1}.v) AS w
        FROM m JOIN v${t - 1} ON m.j = v${t - 1}.i GROUP BY m.i),
      v$t AS MATERIALIZED (
        SELECT i, (w * 1000000) // (SELECT MAX(ABS(w)) FROM w$t) AS v
        FROM w$t)"""
    }.mkString(",\n      ")

  private val pcaIters = 8

  /** Shared CTE pack: quantized components → Gram → centered scatter →
    * 8 fixed-point power iterates (v$pcaIters is PC1). */
  private val pcaCtePack = s"""prep AS ($prepSql),
      comp AS MATERIALIZED (
        SELECT vec_id,
               unnest([{'i': i - 1, 'qi': q[i]}
                       FOR i IN range(1, len(q) + 1)],
                      recursive := true)
        FROM prep),
      g AS MATERIALIZED (
        SELECT a.i AS i, b.i AS j, SUM(a.qi * b.qi) AS gij
        FROM comp a JOIN comp b USING (vec_id) GROUP BY 1, 2),
      sums AS MATERIALIZED (
        SELECT i, CAST(SUM(qi) AS BIGINT) AS si FROM comp GROUP BY i),
      nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM prep),
      m AS MATERIALIZED (
        SELECT g.i, g.j,
               (SELECT n FROM nn) * g.gij
                 - CAST(sa.si AS HUGEINT) * sb.si AS mij
        FROM g JOIN sums sa ON g.i = sa.i JOIN sums sb ON g.j = sb.i),
      v0 AS (SELECT i, CAST(1000000 AS HUGEINT) AS v FROM sums),
      ${pcaIterCtes(pcaIters)}"""

  private val pcaSql = s"""
      WITH $pcaCtePack,
      ray AS (
        SELECT (SELECT SUM(m.mij * va.v * vb.v)
                FROM m JOIN v$pcaIters va ON m.i = va.i
                       JOIN v$pcaIters vb ON m.j = vb.i) AS num,
               (SELECT SUM(v * v) FROM v$pcaIters) AS den,
               (SELECT SUM(mij) FROM m WHERE i = j) AS trace)
      SELECT CAST(v.i AS INT) AS pos, CAST(v.v AS BIGINT) AS v_fp,
             CAST((SELECT num * 1000000 // (den * trace) FROM ray)
                  AS BIGINT) AS explained_ppm
      FROM v$pcaIters v ORDER BY pos"""

  /** All-but-the-top: corrected_i = q_i·(vᵀv) − (qᵀv)·v_i over the
    * shared PCA pack. */
  private val abttSql = s"""
      WITH $pcaCtePack,
      vv AS (SELECT SUM(v * v) AS vv FROM v$pcaIters),
      qv AS MATERIALIZED (
        SELECT c.vec_id, SUM(c.qi * v.v) AS qv
        FROM comp c JOIN v$pcaIters v ON c.i = v.i GROUP BY c.vec_id)
      SELECT c.vec_id, CAST(c.i AS INT) AS pos,
             CAST(c.qi * (SELECT vv FROM vv) - q.qv * v.v AS BIGINT)
               AS corrected
      FROM comp c
      JOIN v$pcaIters v ON c.i = v.i
      JOIN qv q ON c.vec_id = q.vec_id
      ORDER BY c.vec_id, pos"""

  val oracles: Map[String, String] = Map(
    "sim_pca_pc1" -> pcaSql,
    "sim_abtt" -> abttSql,
    "sim_int8_codes" -> """
      WITH s AS (
        SELECT vec_id, embedding,
               CAST(list_max(list_transform(embedding, x -> abs(x)))
                 AS DOUBLE) / 127.0 AS scale
        FROM embeddings),
      c AS (
        SELECT vec_id, scale,
               unnest([{'pos': i - 1, 'x': embedding[i]}
                       FOR i IN range(1, len(embedding) + 1)],
                      recursive := true)
        FROM s)
      SELECT vec_id, CAST(pos AS INT) AS pos,
             CASE WHEN scale = 0 THEN 0
                  ELSE CAST(ROUND(CAST(x AS DOUBLE) / scale) AS INT) END
               AS code,
             scale
      FROM c ORDER BY vec_id, pos""",
    "sim_pq_adc" -> s"""
      WITH prep AS ($prepSql),
      cents AS (SELECT * FROM (VALUES $coarseValuesSql) AS t(cid, cv)),
      cb AS (SELECT * FROM (VALUES $cbValuesSql) AS t(j, c, v)),
      cdist AS (
        SELECT p.vec_id, c.cid,
               (SELECT SUM((a - b) * (a - b))
                FROM (SELECT unnest(p.q) AS a, unnest(c.cv) AS b)) AS d
        FROM prep p CROSS JOIN cents c),
      cell AS (
        SELECT vec_id, cid AS cluster FROM cdist
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY d, cid) = 1),
      subd AS (
        SELECT p.vec_id, b.j, b.c,
               (SELECT SUM((a - bb) * (a - bb))
                FROM (SELECT unnest(p.q[b.j * 16 + 1 : b.j * 16 + 16]) AS a,
                             unnest(b.v) AS bb)) AS d
        FROM prep p CROSS JOIN cb b),
      codes AS (
        SELECT vec_id, j, c FROM subd
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, j
                                   ORDER BY d, c) = 1),
      probes AS (
        SELECT vec_id AS query_id, cid AS cluster FROM cdist
        WHERE vec_id < $nQueries
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY d, cid) <= 2),
      adc AS (
        SELECT pr.query_id, ce.vec_id AS neighbor_id,
               CAST(SUM(sd.d) AS BIGINT) AS di
        FROM probes pr
        JOIN cell ce ON ce.cluster = pr.cluster
                    AND ce.vec_id <> pr.query_id
        JOIN codes co ON co.vec_id = ce.vec_id
        JOIN subd sd ON sd.vec_id = pr.query_id
                    AND sd.j = co.j AND sd.c = co.c
        GROUP BY pr.query_id, ce.vec_id)
      SELECT query_id, rank, neighbor_id, CAST(di AS DOUBLE) AS adc_dist
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY di, neighbor_id) AS rank
            FROM adc)
      WHERE rank <= $k ORDER BY query_id, rank""",
    "sim_pqindex_disk" -> s"""
      WITH prep AS ($prepSql),
      cents AS (SELECT * FROM (VALUES $coarseValuesSql) AS t(cid, cv)),
      cb AS (SELECT * FROM (VALUES $cbValuesSql) AS t(j, c, v)),
      cdist AS (
        SELECT p.vec_id, c.cid,
               (SELECT SUM((a - b) * (a - b))
                FROM (SELECT unnest(p.q) AS a, unnest(c.cv) AS b)) AS d
        FROM prep p CROSS JOIN cents c),
      cell AS (
        SELECT vec_id, cid AS cluster FROM cdist
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY d, cid) = 1),
      subd AS (
        SELECT p.vec_id, b.j, b.c,
               (SELECT SUM((a - bb) * (a - bb))
                FROM (SELECT unnest(p.q[b.j * 16 + 1 : b.j * 16 + 16]) AS a,
                             unnest(b.v) AS bb)) AS d
        FROM prep p CROSS JOIN cb b),
      codes AS (
        SELECT vec_id, j, c FROM subd
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, j
                                   ORDER BY d, c) = 1),
      probes AS (
        SELECT vec_id AS query_id, cid AS cluster FROM cdist
        WHERE vec_id < $nQueries
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY d, cid) <= 2),
      adc AS (
        SELECT CAST(pr.query_id AS VARCHAR) AS query_id,
               CAST(ce.vec_id AS VARCHAR) AS neighbor_id,
               CAST(SUM(sd.d) AS BIGINT) AS di
        FROM probes pr
        JOIN cell ce ON ce.cluster = pr.cluster
                    AND ce.vec_id <> pr.query_id
        JOIN codes co ON co.vec_id = ce.vec_id
        JOIN subd sd ON sd.vec_id = pr.query_id
                    AND sd.j = co.j AND sd.c = co.c
        GROUP BY pr.query_id, ce.vec_id)
      SELECT query_id, rank, neighbor_id, CAST(di AS DOUBLE) AS adc_dist
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY di, neighbor_id) AS rank
            FROM adc)
      WHERE rank <= $k ORDER BY query_id, rank""",
    "sim_centroids" -> """
      WITH q AS (
        SELECT label,
               unnest([{'pos': i - 1,
                        'q': CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 10000)
                                  AS BIGINT)}
                       FOR i IN range(1, len(embedding) + 1)],
                      recursive := true)
        FROM embeddings)
      SELECT label, CAST(pos AS INT) AS pos, COUNT(*) AS n_vecs,
             CAST(SUM(q) AS BIGINT) AS sum_q,
             CAST(SUM(q) AS DOUBLE) / COUNT(*) AS mean_q
      FROM q GROUP BY label, pos
      ORDER BY label, pos""",
    "sim_topk_brute" -> s"""
      WITH prep AS ($prepSql), nrm AS ($normSql),
      scored AS (
        SELECT qv.vec_id AS query_id, cv.vec_id AS neighbor_id,
               ${cosSql("qv.q", "cv.q", "qv.nsq", "cv.nsq")} AS cosine
        FROM nrm qv JOIN nrm cv ON cv.vec_id <> qv.vec_id
        WHERE qv.vec_id < $nQueries)
      SELECT query_id, rank, neighbor_id, cosine FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, CAST(neighbor_id AS VARCHAR)) AS rank
        FROM scored)
      WHERE rank <= $k ORDER BY query_id, rank""",
    "sim_range_search" -> s"""
      WITH prep AS ($prepSql), nrm AS ($normSql),
      scored AS (
        SELECT qv.vec_id AS query_id, cv.vec_id AS neighbor_id,
               ${cosSql("qv.q", "cv.q", "qv.nsq", "cv.nsq")} AS cosine
        FROM nrm qv JOIN nrm cv ON cv.vec_id <> qv.vec_id
        WHERE qv.vec_id < $nQueries)
      SELECT query_id, neighbor_id, cosine FROM scored
      WHERE cosine >= 0.35
      ORDER BY query_id, neighbor_id""",
    "sim_topk_bucketed" -> s"""
      WITH prep AS ($prepSql), nrm AS ($normSql),
      scored AS (
        SELECT qv.vec_id AS query_id, cv.vec_id AS neighbor_id,
               ${cosSql("qv.q", "cv.q", "qv.nsq", "cv.nsq")} AS cosine
        FROM nrm qv JOIN nrm cv
          ON cv.vec_id <> qv.vec_id AND cv.label = qv.label
        WHERE qv.vec_id < $nQueries)
      SELECT query_id, rank, neighbor_id, cosine FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored)
      WHERE rank <= $k ORDER BY query_id, rank""",
    // simRecallEval twin: both ranked paths replayed, intersection
    // counted per query, missing-hit queries kept at recall 0
    // replay of the PRODUCTION-DEFAULT path: trained coarse cells
    // (committed VALUES), spill assignment (2 nearest cells per corpus
    // row), multiprobe (4 nearest cells per query), exact-cosine
    // re-rank — recall vs brute force, with the ≥0.8 floor asserted as
    // a LITERAL on the summary row (engine computes the predicate; a
    // regressed index flips it red)
    "sim_recall_eval" -> s"""
      WITH prep AS ($prepSql), nrm AS ($normSql),
      cents AS (SELECT * FROM (VALUES $coarseIvfValuesSql) AS t(cid, cv)),
      cdist AS (
        SELECT p.vec_id, c.cid,
               (SELECT SUM((a - b) * (a - b))
                FROM (SELECT unnest(p.q) AS a, unnest(c.cv) AS b)) AS d
        FROM prep p CROSS JOIN cents c),
      cassign AS (
        SELECT vec_id, cid FROM cdist
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY d, cid) <= 2),
      probes AS (
        SELECT vec_id AS query_id, cid FROM cdist
        WHERE vec_id < $nQueries
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY d, cid) <= 4),
      cand AS (
        SELECT DISTINCT pr.query_id, a.vec_id AS neighbor_id
        FROM probes pr JOIN cassign a
          ON a.cid = pr.cid AND a.vec_id <> pr.query_id),
      iscored AS (
        SELECT c.query_id, c.neighbor_id,
               ${cosSql("qv.q", "cv.q", "qv.nsq", "cv.nsq")} AS cosine
        FROM cand c
        JOIN nrm qv ON qv.vec_id = c.query_id
        JOIN nrm cv ON cv.vec_id = c.neighbor_id),
      ivf AS (
        SELECT query_id, neighbor_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS rank
          FROM iscored)
        WHERE rank <= 10),
      bscored AS (
        SELECT qv.vec_id AS query_id, cv.vec_id AS neighbor_id,
               ${cosSql("qv.q", "cv.q", "qv.nsq", "cv.nsq")} AS cosine
        FROM nrm qv JOIN nrm cv ON cv.vec_id <> qv.vec_id
        WHERE qv.vec_id < $nQueries),
      brute AS (
        SELECT query_id, neighbor_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, CAST(neighbor_id AS VARCHAR)) AS rank
          FROM bscored)
        WHERE rank <= 10),
      hits AS (
        SELECT v.query_id, CAST(COUNT(*) AS BIGINT) AS hits
        FROM ivf v JOIN brute b
          ON b.query_id = v.query_id AND b.neighbor_id = v.neighbor_id
        GROUP BY v.query_id),
      perq AS (
        SELECT q.query_id, COALESCE(h.hits, 0) AS hits,
               CAST(10 AS BIGINT) AS k,
               CAST(COALESCE(h.hits, 0) AS DOUBLE) / 10 AS recall,
               TRUE AS floor_ok
        FROM (SELECT DISTINCT query_id FROM brute) q
        LEFT JOIN hits h ON h.query_id = q.query_id)
      SELECT * FROM perq
      UNION ALL
      SELECT -1, CAST(SUM(hits) AS BIGINT), CAST(SUM(k) AS BIGINT),
             CAST(SUM(hits) AS DOUBLE) / SUM(k), TRUE
      FROM perq""",
    "sim_neardup_pairs" -> s"""
      WITH prep AS ($prepSql), nrm AS ($normSql)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ${cosSql("a.q", "b.q", "a.nsq", "b.nsq")} AS cosine
      FROM nrm a JOIN nrm b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE ${cosSql("a.q", "b.q", "a.nsq", "b.nsq")} >= 0.40
      ORDER BY id_a, id_b""",
    "sim_dedup_apply" -> s"""
      WITH prep AS ($prepSql), nrm AS ($normSql),
      pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM nrm a JOIN nrm b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE ${cosSql("a.q", "b.q", "a.nsq", "b.nsq")} >= 0.40)
      SELECT vec_id, label FROM embeddings
      WHERE vec_id NOT IN (SELECT id_b FROM pairs)
      ORDER BY vec_id""",
    // centroid direction == integer component-sum direction (cosine is
    // scale-invariant), so centroid_cos stays integer until one final
    // divide — mirrors Similarity.centroidCosine exactly
    "sim_contrastive_pairs" -> s"""
      WITH prep AS ($prepSql), nrm AS ($normSql),
      scored AS (
        SELECT a.vec_id AS anchor_id, b.vec_id AS neighbor_id,
               ${cosSql("a.q", "b.q", "a.nsq", "b.nsq")} AS cosine
        FROM nrm a JOIN nrm b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < 50),
      pos AS (
        SELECT anchor_id, neighbor_id AS pos_id, cosine AS pos_cos
        FROM scored WHERE cosine >= 0.35
        QUALIFY ROW_NUMBER() OVER (PARTITION BY anchor_id
          ORDER BY cosine DESC, neighbor_id) = 1),
      neg AS (
        SELECT anchor_id, neighbor_id AS neg_id, cosine AS neg_cos
        FROM scored WHERE cosine < 0.35
        QUALIFY ROW_NUMBER() OVER (PARTITION BY anchor_id
          ORDER BY cosine DESC, neighbor_id) = 1)
      SELECT p.anchor_id, p.pos_id, p.pos_cos, n.neg_id, n.neg_cos
      FROM pos p JOIN neg n USING (anchor_id)
      ORDER BY anchor_id""",
    "sim_cluster_sample" -> s"""
      WITH prep AS ($prepSql), nrm AS ($normSql),
      lblpos AS (
        SELECT label,
               unnest([{'pos': i - 1, 'qc': q[i]}
                       FOR i IN range(1, len(q) + 1)],
                      recursive := true)
        FROM prep),
      lbl AS (
        SELECT label, pos, CAST(SUM(qc) AS BIGINT) AS s
        FROM lblpos GROUP BY label, pos),
      lblarr AS (
        SELECT label, list(s ORDER BY pos) AS sv,
               SUM(CAST(s AS HUGEINT) * s) AS csq
        FROM lbl GROUP BY label),
      scored AS (
        SELECT n.vec_id, n.label,
               ${cosSql("n.q", "l.sv", "n.nsq", "l.csq")} AS centroid_cos
        FROM nrm n JOIN lblarr l ON n.label = l.label)
      SELECT label, rank, vec_id, centroid_cos
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY label
              ORDER BY centroid_cos, vec_id) AS rank
            FROM scored)
      WHERE rank <= 3 ORDER BY label, rank""",
    "sim_semdedup" -> s"""
      WITH RECURSIVE prep AS ($prepSql), nrm AS ($normSql),
      lblpos AS (
        SELECT label,
               unnest([{'pos': i - 1, 'qc': q[i]}
                       FOR i IN range(1, len(q) + 1)],
                      recursive := true)
        FROM prep),
      lbl AS (
        SELECT label, pos, CAST(SUM(qc) AS BIGINT) AS s
        FROM lblpos GROUP BY label, pos),
      lblarr AS (
        -- HUGEINT products: the engine runs this sum in DECIMAL(38,0)
        -- because BIGINT s*s overflows once labels reach ~10^5 vectors
        SELECT label, list(s ORDER BY pos) AS sv,
               SUM(CAST(s AS HUGEINT) * s) AS csq
        FROM lbl GROUP BY label),
      scored AS (
        SELECT n.vec_id, n.label,
               ${cosSql("n.q", "l.sv", "n.nsq", "l.csq")} AS centroid_cos
        FROM nrm n JOIN lblarr l ON n.label = l.label),
      pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM nrm a JOIN nrm b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE ${cosSql("a.q", "b.q", "a.nsq", "b.nsq")} >= 0.40),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      reach(src, dst) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      comp AS (
        SELECT src AS vec_id, MIN(dst) AS cluster_id
        FROM reach GROUP BY src),
      winners AS (
        SELECT s.vec_id
        FROM scored s JOIN comp c ON s.vec_id = c.vec_id
        QUALIFY ROW_NUMBER() OVER (PARTITION BY c.cluster_id
          ORDER BY s.centroid_cos, s.vec_id) = 1)
      SELECT vec_id, label, centroid_cos FROM scored
      WHERE vec_id NOT IN (SELECT vec_id FROM comp)
         OR vec_id IN (SELECT vec_id FROM winners)
      ORDER BY vec_id""")
}
