package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Deterministic surrogate-key assignment (SURVEY §2.6 T2) that scales.
  *
  * `row_number() OVER (ORDER BY key)` is the natural spelling but its
  * physical plan moves EVERY row to one partition (WindowExec with no
  * partition spec) — a non-starter at 100 TB. `monotonically_increasing_id`
  * is partition-layout-dependent, so it breaks reproducibility across
  * cluster sizes (SURVEY §7.5). This operator computes the exact same
  * dense 1-based rank as the global window, distributed:
  *
  *  1. one aggregate pass computes APPROXIMATE percentile boundaries of
  *     the key (`approx_percentile`, bounded sketch state — exact
  *     `percentile` would hold every distinct key in the aggregation
  *     state, ~the table itself for a unique-key table);
  *  2. each row gets an order-preserving bucket id = #boundaries < key
  *     (a codegen'd array filter — no shuffle);
  *  3. a tiny per-bucket count (B rows to the driver) yields each bucket's
  *     global offset;
  *  4. rank = offset(bucket) + row_number within the bucket — the window
  *     is PARTITIONED, so the sort is per-bucket, ~N/B rows each.
  *
  * Cost: two extra lightweight jobs (boundary agg + count agg, both
  * partial-aggregated map-side) and one shuffle by bucket — vs. the global
  * window's one shuffle to a SINGLE reducer. Result is bit-identical to
  * `row_number() OVER (ORDER BY key)` whenever `key` is unique: boundary
  * values only steer bucket ASSIGNMENT — offsets are recomputed from the
  * actual per-bucket counts, so approximate (even skewed) boundaries
  * change load balance, never rank values.
  */
object Keys {

  /** Dense 1-based global rank by a unique numeric `keyCol`, added as
    * `rankName`. `buckets` bounds both the driver collect (B rows) and the
    * per-partition sort size (~N/B).
    *
    * `tieBreakers` extend the ordering to `(keyCol, tieBreakers…)` when
    * `keyCol` alone is not unique — equal key values always land in the
    * same bucket (bucket id is a pure function of the key value), so the
    * tiebreak stays a within-bucket sort and the result equals
    * `row_number() OVER (ORDER BY keyCol, tieBreakers…)` exactly.
    *
    * Inputs whose optimizer size estimate is ≤ `smallBytes` take the
    * single-window path directly: for a dimension that fits in one
    * partition, one sort beats three jobs; the distributed path is the
    * default the moment the estimate crosses the threshold (so a 10B-row
    * table can never reach the global window). The session conf
    * `graft.rank.smallBytes` can LOWER the threshold (PlanAuditSpec
    * sets it to 0 to audit every query's AT-SCALE plan shape — zero
    * unpartitioned WindowExec — regardless of test-data size); it can
    * never raise it above the call site's value.
    *
    * Snapshot semantics: the boundary/offset metadata (and
    * [[globalRankWithCount]]'s N) is collected when the frame is BUILT —
    * the returned ranking is consistent for that snapshot of the input.
    * If the underlying source mutates, rebuild the frame; re-executing
    * a stale one would mix fresh rows with stale offsets. */
  def globalRank(df: DataFrame, keyCol: String, rankName: String,
      buckets: Int = 64, smallBytes: Long = 64L << 20,
      tieBreakers: Seq[Column] = Seq.empty): DataFrame =
    rankImpl(df, keyCol, rankName, buckets, smallBytes, tieBreakers)._1

  /** [[globalRank]], plus the exact total row count N — free on the
    * distributed path (N = the sum of the per-bucket counts the rank
    * already collects), one extra count job on the window paths. For
    * rank-arithmetic consumers (NTILE / PERCENT_RANK / CDF as
    * closed-form functions of `(rank, N)`) this avoids a second
    * aggregate branch and its scan entirely. */
  def globalRankWithCount(df: DataFrame, keyCol: String, rankName: String,
      buckets: Int = 64, smallBytes: Long = 64L << 20,
      tieBreakers: Seq[Column] = Seq.empty): (DataFrame, Long) = {
    val (ranked, counted) =
      rankImpl(df, keyCol, rankName, buckets, smallBytes, tieBreakers)
    (ranked, counted.getOrElse(df.count()))
  }

  /** Closed-form SQL-standard NTILE over a dense 1-based rank column
    * (the [[globalRank]] output): the first N%tiles tiles get
    * ceil(N/tiles) rows, the rest floor(N/tiles). Exact integer `div` —
    * double floor-division mis-rounds near tile boundaries once a tile
    * exceeds ~1e9 rows. The else-branch is unreachable when q == 0;
    * max(q, 1) just keeps the ANSI divide total. Shared by the query
    * AND its tests so the uneven-N branch is exercised on the same
    * expression that ships. */
  def ntileExpr(n: Long, tiles: Int, rankCol: String): Column = {
    val q = n / tiles; val r = n % tiles
    expr(s"CAST(IF($rankCol <= ${r * (q + 1)}, " +
      s"($rankCol - 1) div ${q + 1}, " +
      s"$r + ($rankCol - 1 - ${r * (q + 1)}) div ${math.max(q, 1L)}) " +
      "AS INT) + 1")
  }

  /** The INVERSE of [[ntileExpr]]'s fill rule, kept adjacent so the
    * two cannot drift: the 0-based rank at which 1-based tile
    * `bucketCol` starts (the first n%tiles tiles hold n/tiles + 1
    * rows). `rank − 1 − start(bucket)` is a row's 0-based position
    * WITHIN its tile, with no second window pass. */
  def ntileStartExpr(n: Long, tiles: Int, bucketCol: String): Column = {
    val q = n / tiles; val r = n % tiles
    expr(s"IF($bucketCol <= $r, ($bucketCol - 1) * ${q + 1}L, " +
      s"${r * (q + 1)}L + ($bucketCol - 1 - $r) * ${q}L)")
  }

  /** PERCENT_RANK for a unique ordering (rank == row number):
    * (rank-1)/(N-1), and 0.0 for the single-row frame. */
  def percentRankExpr(n: Long, rankCol: String): Column =
    if (n > 1) (col(rankCol) - 1).cast(DoubleType) / (n - 1) else lit(0.0)

  private def rankImpl(df: DataFrame, keyCol: String, rankName: String,
      buckets: Int, smallBytes: Long,
      tieBreakers: Seq[Column]): (DataFrame, Option[Long]) = {
    val key = col(keyCol).cast(DoubleType)
    val order = col(keyCol) +: tieBreakers

    // the conf can only LOWER the threshold (force the distributed
    // path) — never raise it: call sites that pass smallBytes = 0 to
    // pin the at-scale plan must stay pinned whatever the session sets
    val confBytes = df.sparkSession.conf.getOption("graft.rank.smallBytes")
      .map { v =>
        val parsed = scala.util.Try(v.toLong).toOption
        require(parsed.exists(_ >= 0),
          s"graft.rank.smallBytes must be a non-negative long, got '$v'")
        parsed.get
      }
    val threshold = math.min(smallBytes, confBytes.getOrElse(smallBytes))
    val estimated = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val numericKey = df.schema(keyCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    // percentile bucketing needs a numeric key; non-numeric keys (rare
    // for surrogate-key sources) fall back to the single window — at
    // scale, rank such tables via a numeric surrogate first
    if (estimated <= threshold || !numericKey) {
      val w = Window.orderBy(order: _*)
      return (df.withColumn(rankName, row_number().over(w)), None)
    }

    val bounds: Seq[Double] =
      if (buckets <= 1) Seq.empty
      else {
        val probs = (1 until buckets).map(i => i.toDouble / buckets)
        // approx_percentile keeps O(1/accuracy) sketch state per partition
        // instead of exact percentile's value→count map over EVERY distinct
        // key (OOM on a 10B-row unique-key table — the exact operator's
        // state is the table). 10k accuracy → ±0.01% bucket-size error,
        // irrelevant for load balance.
        val row = df
          .agg(expr(s"approx_percentile(CAST($keyCol AS DOUBLE), " +
            s"array(${probs.mkString(",")}), 10000)"))
          .head()
        if (row.isNullAt(0)) Seq.empty
        else row.getSeq[Double](0).toSeq
      }

    if (bounds.isEmpty) {
      // empty input or degenerate key distribution — single bucket
      val w = Window.orderBy(order: _*)
      return (df.withColumn(rankName, row_number().over(w)), None)
    }

    val boundsArr = array(bounds.map(lit): _*)
    // compiled binary search over the cut array (count of bounds
    // strictly below the key — identical right-closed predicate, null
    // key → bucket 0 in both spellings). The HOF spelling
    // `size(filter(bounds, b => b < key))` is ArrayFilter, which is
    // CodegenFallback: an interpreted per-row closure walk on the
    // engine-wide distributed-rank path every band split rides.
    val bucket = graft.functions.NativeBucket
      .bucketOf(key, boundsArr).cast("int")
    val bucketed = df.withColumn("__bucket", bucket)

    val counts: Map[Int, Long] = bucketed
      .groupBy(col("__bucket")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

    val offsets = (0 until buckets).scanLeft(0L) {
      (acc, b) => acc + counts.getOrElse(b, 0L)
    }
    val offsetMap = map(
      (0 until buckets).flatMap(b =>
        Seq(lit(b), lit(offsets(b)))): _*)

    val w = Window.partitionBy(col("__bucket")).orderBy(order: _*)
    val ranked = bucketed
      .withColumn(rankName,
        (element_at(offsetMap, col("__bucket")) + row_number().over(w)))
      .drop("__bucket")
    (ranked, Some(counts.values.sum))
  }
}
