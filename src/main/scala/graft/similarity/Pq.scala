package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType, DoubleType}

/** Product quantization for nearest-neighbor search (Jégou, Douze,
  * Schmid 2011, "Product Quantization for Nearest Neighbor Search",
  * IEEE TPAMI 33(1)) — the storage tier below [[Similarity.compressInt8]]:
  * a d-dim float vector (4d bytes) becomes `m` sub-codes of
  * log2(ksub) bits (m bytes here), a 32× reduction at d=64, m=8 —
  * the difference between an embedding index that fits executor
  * memory at 100 TB corpus scale and one that doesn't.
  *
  * Encode: split each vector into m contiguous subvectors of d/m
  * dims; per subspace, a KMeans codebook of `ksub` centroids (fit on
  * a bounded deterministic sample, like [[Similarity.kmeansIndex]]);
  * a vector's code is its per-subspace nearest-centroid ids.
  *
  * Search (ADC — asymmetric distance computation): the QUERY stays
  * exact; per query one m×ksub table of partial squared L2 distances
  * to every subspace centroid is computed ON THE BROADCAST-SMALL
  * QUERY SIDE; a corpus row's approximate distance is then m table
  * LOOKUPS summed — no per-row float vector math at all. Candidates
  * come from the IVF coarse quantizer (equi join on the cell id,
  * nProbe fan-out on the query side only), i.e. the paper's IVFADC
  * layout over [[Similarity.kmeansIndex]] cells. For unit-norm
  * embeddings squared L2 is 2−2·cosine, so ADC ranking is cosine
  * ranking.
  *
  * This is approximate twice over (coarse cells + PQ distances) and
  * KMeans codebooks are not SQL-expressible — verified by PqSpec
  * recall bounds against [[Similarity.bruteForceTopK]], the
  * [[Similarity.compressInt8]] pattern, not an oracle row.
  */
object Pq {

  /** `m` codebooks, each `ksub` centroids of d/m dims, fit
    * independently per subspace on a deterministic bounded sample.
    * Driver-side size: m·ksub·(d/m) = ksub·d doubles — tiny. */
  def train(df: DataFrame, idCol: String, vecCol: String, m: Int,
      ksub: Int = 16, seed: Long = 42L,
      maxTrainRows: Option[Long] = None): Seq[Seq[Seq[Double]]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val dim = vecDim(df, vecCol)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    val base = maxTrainRows match {
      case Some(n) =>
        val total = df.count()
        if (total <= n) df
        else graft.operators.Sampling.deterministicSample(
          df, idCol, n.toDouble / total)
      case None => df
    }
    // one cached pass feeds all m fits; each fit sees only its slice
    val slices = base.select((0 until m).map(j =>
      array_to_vector(slice(col(vecCol), j * sub + 1, sub)
        .cast(ArrayType(DoubleType))).as(s"__s$j")): _*)
      .localCheckpoint()
    (0 until m).map { j =>
      new KMeans().setK(ksub).setSeed(seed + j).setMaxIter(20)
        .setFeaturesCol(s"__s$j").setPredictionCol("__c")
        .fit(slices)
        .clusterCenters.map(_.toArray.toSeq).toSeq
    }
  }

  /** Deterministic hash-sample (bounded) used by the integer trainers:
    * same subset on any cluster layout. */
  private def bounded(df: DataFrame, idCol: String,
      maxTrainRows: Option[Long]): DataFrame = maxTrainRows match {
    case Some(n) =>
      val total = df.count()
      if (total <= n) df
      else graft.operators.Sampling.deterministicSample(
        df, idCol, n.toDouble / total)
    case None => df
  }

  /** IN-ENGINE integer Lloyd k-means over one quantized vector frame
    * `(\_\_id string, \_\_v array<long>)` — the distributed producer of
    * every [[PqFixture]] artifact (`tools/gen_pq_fixture.py` is the
    * independent parity reference, pinned by PqTrainSpec, the same
    * relationship `tools/train_bpe.py` has to the BPE trainer).
    *
    * Exactness is the whole design: init picks the k rows with the
    * smallest `md5("<id>:<tag>")` digests (engine-portable — no RNG
    * implementation to reproduce); assignment is argmin of exact
    * integer distance with ties to the LOWER centroid index (the
    * [[Similarity.nearestCentroidsQ]] contract); the update keeps
    * centroids int64 via the round-half-up integer mean
    * `floorDiv(2·sum + n, 2·n)` — so no float summation order exists
    * anywhere and any two runs (or engines) agree bit for bit. Empty
    * clusters keep their previous centroid.
    *
    * Scale shape: per iteration ONE aggregate over the training frame
    * — assignment rides map-side as a compiled projection, the shuffle
    * carries (cluster, dim) partial sums (k·dim rows per partition),
    * and the driver holds k·dim longs. Iterations scan the training
    * frame, so at corpus scale bound it with `maxTrainRows` upstream
    * (standard IVF practice: centroids need a representative sample,
    * not the corpus) and let only the encode/assignment pass touch
    * every row. */
  private def lloydQ(q: DataFrame, k: Int, tag: String,
      iters: Int): Seq[Seq[Long]] = {
    val init = q
      .orderBy(md5(concat(col("__id"), lit(s":$tag"))))
      .limit(k).collect().map(_.getSeq[Long](1).toVector)
    lloydFusedQ(q.withColumnRenamed("__v", "__q"), Seq(init.toSeq),
      init.head.size, iters).head
  }

  /** FUSED integer Lloyd over ALL `inits.size` subspaces of one
    * quantized frame `(\_\_id, \_\_q array<long>)` AT ONCE: every row
    * already carries all m subvectors, so each iteration is ONE
    * aggregate — per subspace the assignment rides map-side exactly as
    * the serial loop's did (same [[Similarity.nearestCentroidsQ]]
    * expression over the same slice), and the shuffle carries
    * (subspace, cluster, dim) partial sums: m·k·dsub = k·dim rows per
    * partition, driver state k·dim longs per subspace. m × iters jobs
    * become ≤ iters — at corpus-scale training frames the job count IS
    * the cost, and this is the production re-index path.
    *
    * CONVERGENCE STOP (exact-integer, the [[graft.operators.Graphs]]
    * PageRank discipline): when an iteration moves NO centroid
    * component in ANY subspace — integer equality, no epsilon — the
    * codebooks are a fixed point (same centroids ⇒ same deterministic
    * assignment ⇒ same integer means), so every remaining iteration
    * would reproduce them bit for bit; stopping is byte-identical to
    * running the full `iters` cap, just cheaper. Pinned by PqTrainSpec
    * (early-stop == fixed-count; job-count ceiling; fixture parity). */
  private def lloydFusedQ(q: DataFrame, inits: Seq[Seq[Seq[Long]]],
      sub: Int, iters: Int): Seq[Seq[Seq[Long]]] = {
    val m = inits.size
    var books = inits
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      it += 1
      // the per-subspace assignment is HOISTED into a projection so it
      // evaluates ONCE per row: embedded in the per-dim lambda below it
      // would re-run the k-centroid argmin for EVERY array element —
      // Catalyst does not common-subexpression-eliminate across lambda
      // bodies, and the argmin's array_sort is interpreter-only, so
      // that spelling costs dim × (k·dim + k log k) interpreted ops
      // per row instead of one
      val assigned = q.select(Seq(col("__q")) ++ (0 until m).map { j =>
        val s = if (m == 1) col("__q") else slice(col("__q"), j * sub + 1, sub)
        element_at(Similarity.nearestCentroidsQ(s, books(j), 1), 1)
          .as(s"__c$j")
      }: _*)
      // one flattened (subspace, cluster, dim, x) stream per row
      val flat = flatten(array((0 until m).map { j =>
        val s = if (m == 1) col("__q") else slice(col("__q"), j * sub + 1, sub)
        transform(s, (x, d) => struct(lit(j).as("sp"), col(s"__c$j").as("c"),
          d.as("d"), x.as("x")))
      }: _*))
      val sums = assigned.select(explode(flat).as("e"))
        .groupBy(col("e.sp").as("sp"), col("e.c").as("c"), col("e.d").as("d"))
        .agg(sum(col("e.x")).as("s"), count(lit(1)).as("n"))
        .collect()
      val bySp = sums.groupBy(_.getInt(0))
      val newBooks = books.zipWithIndex.map { case (book, j) =>
        val byCluster = bySp.getOrElse(j, Array.empty[org.apache.spark.sql.Row])
          .groupBy(_.getInt(1))
        book.zipWithIndex.map { case (old, cIdx) =>
          byCluster.get(cIdx) match {
            case Some(rows) =>
              val arr = old.toArray
              rows.foreach { r =>
                arr(r.getInt(2)) =
                  Math.floorDiv(2L * r.getLong(3) + r.getLong(4),
                    2L * r.getLong(4))
              }
              arr.toVector
            case None => old // empty cluster keeps its centroid
          }
        }
      }
      if (newBooks == books) converged = true
      books = newBooks
    }
    books
  }

  /** Train the `m` integer PQ codebooks in-engine — ONE fused
    * [[lloydFusedQ]] aggregate per iteration updates ALL m books at
    * once over a single quantized, checkpointed pass of the training
    * rows (≤ iters + m + setup jobs total, early-stopped at the integer
    * fixed point). Replaces the offline fixture generator as the
    * production re-index path: retrain when the embedding distribution
    * drifts, feed the result straight to [[encodeQ]]/[[topKQ]]. */
  def trainCodebooksQ(df: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int = 8, iters: Int = 25,
      maxTrainRows: Option[Long] = None): Seq[Seq[Seq[Long]]] = {
    val dim = vecDim(df, vecCol)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    val q = bounded(df, idCol, maxTrainRows)
      .select(col(idCol).cast("string").as("__id"),
        Similarity.quantize(col(vecCol)).as("__q"))
      .localCheckpoint()
    try {
      // per-subspace md5 init (one small TakeOrdered job each — setup,
      // not per-iteration work), then ONE fused Lloyd for all m books
      val inits = (0 until m).map { j =>
        q.select(col("__id"), slice(col("__q"), j * sub + 1, sub).as("__v"))
          .orderBy(md5(concat(col("__id"), lit(s":pq$j"))))
          .limit(ksub).collect().map(_.getSeq[Long](1).toVector).toSeq
      }
      lloydFusedQ(q, inits, sub, iters)
    } finally org.apache.spark.sql.GraftShims.unpersistCheckpoint(q)
  }

  /** Train the full-dimension integer IVF coarse quantizer in-engine
    * (k cells for [[Similarity.ivfTopKQ]] / [[topKQ]]). Same recipe,
    * tag `"coarse"`. */
  def trainCoarseQ(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 25, maxTrainRows: Option[Long] = None): Seq[Seq[Long]] = {
    val q = bounded(df, idCol, maxTrainRows)
      .select(col(idCol).cast("string").as("__id"),
        Similarity.quantize(col(vecCol)).as("__v"))
      .localCheckpoint()
    try lloydQ(q, k, "coarse", iters)
    finally org.apache.spark.sql.GraftShims.unpersistCheckpoint(q)
  }

  /** Per-label integer centroids (rounded means, label-sorted) — the
    * supervised coarse quantizer ([[PqFixture.coarseL]]) when a label
    * column already partitions the space. One groupBy over (label,
    * dim) partial sums. */
  def labelCentroidsQ(df: DataFrame, labelCol: String,
      vecCol: String): Seq[Seq[Long]] = {
    val rows = df
      .select(col(labelCol).cast("long").as("__l"),
        posexplode(Similarity.quantize(col(vecCol))).as(Seq("d", "x")))
      .groupBy(col("__l"), col("d"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .collect()
    rows.groupBy(_.getLong(0)).toSeq.sortBy(_._1).map { case (_, rs) =>
      val arr = new Array[Long](rs.length)
      rs.foreach { r =>
        arr(r.getInt(1)) =
          Math.floorDiv(2L * r.getLong(2) + r.getLong(3), 2L * r.getLong(3))
      }
      arr.toVector
    }
  }

  /** Nearest-centroid code of one subvector — reuses the IVF probe
    * expression (sorted struct array, deterministic ties by id). */
  private def code(sub: Column, codebook: Seq[Seq[Double]]): Column =
    element_at(Similarity.nearestCentroids(sub, codebook, 1), 1)

  /** Add `vecCol_pq`: array<tinyint> of length m. Map-only; the
    * codebooks ride into the plan as literals. Keep or drop the float
    * column per storage tier policy (the point of PQ is dropping it). */
  def encode(df: DataFrame, vecCol: String,
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    require(codebooks.head.size <= 128, "code must fit a signed byte")
    val sub = codebooks.head.head.size
    df.withColumn(vecCol + "_pq",
      array(codebooks.zipWithIndex.map { case (cb, j) =>
        code(slice(col(vecCol), j * sub + 1, sub), cb).cast(ByteType)
      }: _*))
  }

  /** The per-query ADC lookup table, flattened row-major to one
    * array<double> of m·ksub partial squared distances:
    * `table[j·ksub + c] = ‖q_j − centroid_{j,c}‖²`. Built on the
    * query side only. */
  private def adcTable(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val sub = codebooks.head.head.size
    flatten(array(codebooks.zipWithIndex.map { case (cb, j) =>
      val s = slice(vec, j * sub + 1, sub)
      array(cb.map { cent =>
        aggregate(
          zip_with(s, array(cent.map(lit): _*),
            (x, y) => (x.cast(DoubleType) - y) * (x.cast(DoubleType) - y)),
          lit(0.0d), (acc, v) => acc + v)
      }: _*)
    }: _*))
  }

  /** Integer-exact twin of [[encode]] for QUANTIZED (array<long>)
    * vectors over integer codebooks — per-subspace assignment through
    * the native compiled dot product ([[Similarity.nearestCentroidsQ]])
    * instead of interpreted HOF folds; at corpus scale encode runs once
    * per row so the interpreter tax is O(rows·m·ksub·dsub). Same output
    * contract as [[encode]]. */
  def encodeQ(df: DataFrame, vecCol: String,
      codebooks: Seq[Seq[Seq[Long]]]): DataFrame = {
    require(codebooks.head.size <= 128, "code must fit a signed byte")
    val sub = codebooks.head.head.size
    df.withColumn(vecCol + "_pq",
      array(codebooks.zipWithIndex.map { case (cb, j) =>
        element_at(Similarity.nearestCentroidsQ(
          slice(col(vecCol), j * sub + 1, sub), cb, 1), 1).cast(ByteType)
      }: _*))
  }

  /** Integer ADC lookup table (query side, broadcast-small):
    * `table[j·ksub + c] = ‖q_j − centroid_{j,c}‖²` as exact-integer-
    * valued doubles via ‖q_j‖² − 2⟨q_j,c⟩ + ‖c‖² — native dot products,
    * no per-dim lambda. */
  private[similarity] def adcTableQ(vec: Column,
      codebooks: Seq[Seq[Seq[Long]]]): Column =
    // native compiled loop ([[graft.functions.AdcTableQExpr]]): the
    // Column spelling below is the parity reference — at m×ksub ≈ 1000
    // entries its generated method exceeds janino's limit and the
    // query-side projection falls back to interpreted eval
    graft.functions.NativeVec.adcTableQ(vec, codebooks)

  /** Pure-Column reference formulation of [[adcTableQ]] (kept for
    * parity tests; identical integer arithmetic, identical cast). */
  private[similarity] def adcTableQReference(vec: Column,
      codebooks: Seq[Seq[Seq[Long]]]): Column = {
    import graft.functions.NativeVec.dotQ
    val sub = codebooks.head.head.size
    flatten(array(codebooks.zipWithIndex.map { case (cb, j) =>
      val s = slice(vec, j * sub + 1, sub)
      val nq = dotQ(s, s)
      array(cb.map { cent =>
        (nq - lit(2L) * dotQ(s, array(cent.map(lit): _*)) +
          lit(cent.map(x => x * x).sum)).cast(DoubleType)
      }: _*)
    }: _*))
  }

  /** IVFADC top-k over QUANTIZED vectors and integer coarse/PQ
    * codebooks (the [[PqFixture]] path): identical plan shape to
    * [[topK]] — two slim broadcast sides, m table lookups per
    * candidate, bounded-heap rank — with every per-row expression
    * compiled (dotQ) and every distance an exact integer, which is
    * what lets the sim_pq_adc oracle hash-pin the distances. */
  def topKQ(indexed: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, coarse: Seq[Seq[Long]],
      codebooks: Seq[Seq[Seq[Long]]], k: Int, nProbe: Int = 4): DataFrame = {
    import graft.plans.TopK
    val ksub = codebooks.head.size
    val m = codebooks.size
    val c = indexed.select(col(idCol).as("neighbor_id"),
      col("cluster").as("__bkt"), col(vecCol + "_pq").as("__codes"))
    val qProbe = queries.select(col(idCol).as("query_id"),
      explode(Similarity.nearestCentroidsQ(col(vecCol), coarse, nProbe))
        .as("__qbkt"))
    val qTable = queries.select(col(idCol).as("query_id"),
      adcTableQ(col(vecCol), codebooks).as("__table"))
    val dist = (0 until m).map(j =>
        element_at(col("__table"),
          lit(j * ksub + 1) + col("__codes").getItem(j).cast("int")))
      .reduce(_ + _)
    val cands = c.join(broadcast(qProbe),
        col("__bkt") === col("__qbkt") && col("neighbor_id") =!= col("query_id"))
      .join(broadcast(qTable), Seq("query_id"))
      .withColumn("adc_dist", dist)
    TopK.perKey(cands, Seq("query_id"),
        Seq(TopK.asc("adc_dist"), TopK.asc("neighbor_id")), k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("adc_dist"))
  }

  /** IVFADC top-k: `indexed` is a [[Similarity.kmeansIndex]]-clustered
    * corpus run through [[encode]] (only `cluster` + the code column
    * are read — the float vectors can be cold storage). Queries probe
    * their `nProbe` nearest coarse cells; candidate distance is m
    * table lookups. Output: (query_id, rank, neighbor_id, adc_dist),
    * rank 1 = nearest. */
  def topK(indexed: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, coarse: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]], k: Int, nProbe: Int = 4): DataFrame = {
    import graft.plans.TopK
    val ksub = codebooks.head.size
    val m = codebooks.size
    val c = indexed.select(col(idCol).as("neighbor_id"),
      col("cluster").as("__bkt"), col(vecCol + "_pq").as("__codes"))
    // two slim broadcast sides instead of one wide one: the probe side
    // carries only (query_id, cell) — exploding AFTER projecting the
    // ADC table would duplicate every query's m·ksub-double table
    // nProbe times in the broadcast — and the table side carries each
    // query's table exactly once, attached to candidates by query id
    val qProbe = queries.select(col(idCol).as("query_id"),
      explode(Similarity.nearestCentroids(col(vecCol), coarse, nProbe))
        .as("__qbkt"))
    val qTable = queries.select(col(idCol).as("query_id"),
      adcTable(col(vecCol), codebooks).as("__table"))
    val dist = (0 until m).map(j =>
        element_at(col("__table"),
          lit(j * ksub + 1) + col("__codes").getItem(j).cast("int")))
      .reduce(_ + _)
    val cands = c.join(broadcast(qProbe),
        col("__bkt") === col("__qbkt") && col("neighbor_id") =!= col("query_id"))
      .join(broadcast(qTable), Seq("query_id"))
      .withColumn("adc_dist", dist)
    TopK.perKey(cands, Seq("query_id"),
        Seq(TopK.asc("adc_dist"), TopK.asc("neighbor_id")), k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("adc_dist"))
  }

  /** ADC shortlist + exact re-rank — the production IVFADC pipeline:
    * PQ codes prune the corpus to a `shortlist` per query (cheap
    * lookups, no float math), then ONLY those rows' float vectors are
    * fetched and re-ranked by exact cosine. The shortlist id set is
    * broadcast-small (queries × shortlist), so the float fetch is a
    * broadcast hash join against the corpus — one scan, no shuffle of
    * the corpus; at deployment scale it is a point-lookup against the
    * hot-tier store while the PQ index is what lives in memory.
    * Output matches [[Similarity.bruteForceTopK]]'s shape:
    * (query_id, rank, neighbor_id, cosine). */
  def topKRefined(indexed: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, coarse: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]], k: Int, nProbe: Int = 4,
      shortlist: Int = 0): DataFrame = {
    import graft.plans.TopK
    import Similarity.{cosineFromParts, dotQ, normSqQ, quantize}
    val r = if (shortlist > 0) shortlist else 4 * k
    val cands = topK(indexed, queries, idCol, vecCol, coarse, codebooks,
        r, nProbe)
      .select(col("query_id"), col("neighbor_id"))
    // join FIRST, quantize after: a projection above the scan would
    // make every corpus row pay the O(d) quantize + norm loop before
    // the join discards all but queries×shortlist of them
    val c = indexed.select(col(idCol).as("neighbor_id"), col(vecCol))
      .join(broadcast(cands), Seq("neighbor_id"))
      .withColumn("__q", quantize(col(vecCol)))
      .withColumn("__nsq", normSqQ(col("__q")))
      .drop(vecCol)
    val q = queries.select(col(idCol).as("query_id"),
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

  private def vecDim(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head().getInt(0)
}
