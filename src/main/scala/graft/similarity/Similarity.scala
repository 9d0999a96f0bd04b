package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor and near-duplicate search over an
  * embedding column (`array<float>`).
  *
  * Engine-exact arithmetic: components quantize to integers via
  * `floor(double(x) · 10⁴)` — the float→double widening, the multiply,
  * and the floor are all single IEEE ops, bit-identical in any engine
  * (unlike float→decimal casts, whose rounding mode is engine-specific).
  * Dot products and norms are then exact 64-bit integer sums (order-free,
  * < 2⁵³ so their double images are exact), and only the final cosine
  * ratio touches floating point: one multiply, one sqrt, one divide —
  * bit-identical everywhere. This makes similarity results
  * hash-comparable across engines, and costs nothing at scale: the
  * quantized arrays are computed once per row inside codegen.
  *
  * Scale paths:
  *  - brute force: queries broadcast, corpus scanned once, top-k via
  *    per-query window — the baseline and the recall oracle;
  *  - bucketed (IVF-style): search only within a partition key (cluster
  *    id / LSH bucket), turning O(n·q) into O(n·q/buckets).
  */
object Similarity {

  /** Quantize an array<float> to array<long> at 4-decimal resolution. */
  def quantize(v: Column): Column =
    transform(v, x => floor(x.cast(DoubleType) * 10000.0d).cast(LongType))

  /** Exact integer dot product of two quantized vectors — native
    * expression ([[graft.functions.DotQExpr]]): one compiled loop, no
    * intermediate array, stays in whole-stage codegen. The candidate
    * join evaluates this once per pair, so interpreter overhead here
    * multiplies by O(pairs). */
  def dotQ(a: Column, b: Column): Column =
    graft.functions.NativeVec.dotQ(a, b)

  /** Pure-Column reference formulation of [[dotQ]] (parity tests). */
  def dotQReference(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Exact integer squared norm of a quantized vector. */
  def normSqQ(v: Column): Column = dotQ(v, v)

  /** Cosine from the exact integer parts — deterministic double. */
  def cosineFromParts(dot: Column, nsqA: Column, nsqB: Column): Column =
    dot.cast(DoubleType) / sqrt(nsqA.cast(DoubleType) * nsqB.cast(DoubleType))

  /** Corpus with precomputed quantized vector + squared norm (computed
    * once per row; reused by every query comparison). */
  def prepare(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), quantize(col(vecCol)).as("__q"))
      .withColumn("__nsq", normSqQ(col("__q")))

  /** Brute-force top-k cosine neighbors for each query vector.
    * `queries` is small (broadcast); the corpus is scanned once, never
    * shuffled — the only shuffle is the per-query top-k window over
    * q×n candidate rows. Self-matches are excluded. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = prepare(corpus, idCol, vecCol)
      .withColumnRenamed(idCol, "neighbor_id")
    val q = prepare(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("__q").as("__qq"), col("__nsq").as("__qnsq"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        cosineFromParts(dotQ(col("__q"), col("__qq")), col("__nsq"), col("__qnsq")))
    topK(scored, k)
  }

  /** Per-query top-k via the heap operator
    * ([[graft.plans.TopKPerKeyExec]]): one pass, O(n log k), no
    * per-partition sort of the full candidate set — the window+filter
    * spelling sorts EVERY candidate row before discarding all but k. */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    import graft.plans.TopK
    TopK.perKey(scored, Seq("query_id"),
        Seq(TopK.desc("cosine"), TopK.asc("neighbor_id")), k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Bucketed (IVF-style) search: candidates are restricted to rows
    * sharing `bucketCol` with the query — the coarse-quantizer pattern.
    * With KMeans centroids as buckets this is classic IVF; any
    * deterministic partitioner (label, LSH hyperplane signs) works.
    * Quantization + bucket ride ONE projection of the corpus — no
    * self-join to reattach the bucket. */
  def bucketedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, bucketCol: String, k: Int): DataFrame = {
    val cWithB = corpus
      .select(col(idCol).as("neighbor_id"), col(bucketCol).as("__bkt"),
        quantize(col(vecCol)).as("__q"))
      .withColumn("__nsq", normSqQ(col("__q")))
    val q = queries
      .select(col(idCol).as("query_id"), col(bucketCol).as("__qbkt"),
        quantize(col(vecCol)).as("__qq"))
      .withColumn("__qnsq", normSqQ(col("__qq")))
    val scored = cWithB.join(broadcast(q),
        col("__bkt") === col("__qbkt") && col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        cosineFromParts(dotQ(col("__q"), col("__qq")), col("__nsq"), col("__qnsq")))
    topK(scored, k)
  }

  /** IVF coarse quantizer built with MLlib KMeans (fixed seed ⇒
    * deterministic centroids for fixed input): assigns every row a
    * `cluster` column usable as the bucket for [[bucketedTopK]]. This is
    * the "build the index ourselves" path when no natural partition key
    * exists; nProbe>1 style multi-cell search comes from unioning the
    * query's closest cells.
    *
    * `maxTrainRows` bounds the ITERATIVE part: KMeans makes `maxIter`
    * passes over its training input, so fitting on a 100 TB corpus pays
    * 20 full scans. With Some(n), centroids are fit on a deterministic
    * hash-sample of ~n rows (id-hash bucketing — same subset on any
    * cluster layout) and only the single ASSIGNMENT pass touches every
    * row. Centroid quality needs a representative sample, not the
    * corpus: n in the 10⁵–10⁶ range is standard IVF practice. None fits
    * on the full input (exact-reproducibility path used by the oracle
    * queries at test scale). */
  def kmeansClusters(df: DataFrame, idCol: String, vecCol: String,
      k: Int, seed: Long = 42L,
      maxTrainRows: Option[Long] = None): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val featurized = df.withColumn("__features",
      array_to_vector(col(vecCol).cast(ArrayType(DoubleType))))
    val train = maxTrainRows match {
      case Some(n) =>
        val total = featurized.count()
        if (total <= n) featurized
        else graft.operators.Sampling.deterministicSample(
          featurized, idCol, n.toDouble / total)
      case None => featurized
    }
    val model = new KMeans()
      .setK(k).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("__features").setPredictionCol("cluster")
    model.fit(train).transform(featurized)
      .drop("__features")
  }

  /** Near-duplicate pairs by cosine ≥ threshold within a blocking key
    * (label / cluster): the embedding-space analog of
    * [[graft.dedup.Dedup.blockedJaccardPairs]]. */
  def blockedNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val p = df
      .select(col(idCol).as("__id"), col(blockCol).as("__blk"),
        quantize(col(vecCol)).as("__q"))
      .withColumn("__nsq", normSqQ(col("__q")))
    p.as("l").join(p.as("r"),
        col("l.__blk") === col("r.__blk") && col("l.__id") < col("r.__id"))
      .withColumn("cosine", cosineFromParts(
        dotQ(col("l.__q"), col("r.__q")), col("l.__nsq"), col("r.__nsq")))
      .filter(col("cosine") >= threshold)
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"), col("cosine"))
  }
}
