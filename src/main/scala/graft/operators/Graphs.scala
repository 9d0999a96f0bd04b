package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed graph measures for corpus curation.
  *
  * The first citizen is domain-authority PageRank: web-scale curation
  * pipelines rank crawl domains by link authority before per-document
  * filtering (Common Crawl's harmonic-centrality-ranked domain lists
  * serve the same role; PageRank is Page et al. 1999, "The PageRank
  * citation ranking"). At 100 TB the link graph has ~10⁸ domains —
  * every step here is the Pregel-style join-aggregate spelling (one
  * shuffle per iteration on the edge dst key), never an adjacency
  * matrix, and the rank state is one row per NODE (domains), which is
  * 3-4 orders of magnitude smaller than the edge set.
  *
  * Arithmetic contract: ranks are BIGINT fixed-point (`scale` = 1
  * unit), every update is integer multiply/divide (`DIV`, floor for
  * non-negatives), and per-node in-flows are integer SUMs — order-free,
  * so the result is bit-identical under any partitioning AND exactly
  * replayable by the DuckDB oracle (double-precision PageRank would
  * drift by summation order). The recurrence, exactly:
  *
  *   contrib(u)  = rank(u) DIV outdeg(u)          (per source node)
  *   in(v)       = Σ_{(u,v,w)∈E} w · contrib(u)   (integer sum)
  *   rank'(v)    = (scale·(dd−dn) DIV dd) DIV n + (dn · in(v)) DIV dd
  *
  * with damping dn/dd (default 17/20 = 0.85). Truncation error is
  * ≤ 1 unit = 1/scale per term per iteration — at scale 10¹² that is
  * 10⁻¹² of total rank mass, far below any curation threshold.
  * Dangling nodes (no out-edges) contribute nothing (their mass fades
  * into the teleport term) — the convention KenLM-era crawl rankers
  * use; redistribute-to-all would need a second global aggregate per
  * iteration for no curation benefit.
  */
object Graphs {

  /** Fixed-point PageRank over a weighted edge list.
    *
    * Convergence: with `tolFp` > 0, iteration stops once the L1 rank
    * delta Σ|rank' − rank| ≤ tolFp — the standard stopping contract.
    * The delta check is NOT free (it is an extra aggregate action), so
    * it runs every `checkEvery` iterations (default 2) rather than per
    * iteration; `iters` becomes the hard CAP. The L1 delta is exact
    * integer arithmetic over the same fixed-point ranks, so the
    * decision is deterministic and cluster-layout-free, and a
    * converged-early run returns ranks IDENTICAL to the full
    * fixed-count run at any iteration count ≥ the stopping point
    * (once Σ|Δ| = 0 the map is at its integer fixed point — further
    * iterations cannot move it).
    *
    * @param edges      (srcCol, dstCol, wCol) rows; parallel edges may
    *                   be pre-aggregated or not (weights sum either way)
    * @param iters      max power iterations (each = one join + shuffle)
    * @param damping    (numerator, denominator) — integer damping
    * @param scale      fixed-point unit: total rank mass ≈ `scale`
    * @param tolFp      L1 convergence threshold in fixed-point units
    *                   (0 disables the check: exactly `iters` rounds —
    *                   the oracle-replayed configuration)
    * @param checkEvery how often to pay the convergence aggregate
    * @return one row per node: (node, rank_fp) with rank_fp summing to
    *         ≈ scale (minus integer-truncation dust)
    */
  def pageRankFixedPoint(
      edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
      iters: Int = 3, damping: (Int, Int) = (17, 20),
      scale: Long = 1000000000000L,
      tolFp: Long = 0L, checkEvery: Int = 2): DataFrame = {
    require(iters >= 1 && damping._1 > 0 && damping._2 > damping._1)
    require(checkEvery >= 1)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).cast(LongType).as("w"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      // ranks are re-joined every iteration; without a checkpoint each
      // iteration re-derives the whole lineage (and the node count
      // below re-scans the edges)
      .localCheckpoint()
    // node count is ONE driver scalar (the only action) — at web scale
    // this is a cheap count over the checkpointed node frame
    val n = nodes.count()
    require(n > 0, "empty graph")
    val outdeg = e.groupBy(col("src")).agg(sum(col("w")).as("outdeg"))
      .localCheckpoint()
    val (dn, dd) = damping
    val base = scale * (dd - dn) / dd / n
    var ranks = nodes.withColumn("rank_fp", lit(scale / n))
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"),
          (col("w") * expr("rank_fp DIV outdeg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inr"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($dn * coalesce(inr, 0L)) DIV $dd"))
            .as("rank_fp"))
        // break lineage growth: each kept plan is one iteration deep
        .localCheckpoint()
      it += 1
      if (tolFp > 0 && it < iters && it % checkEvery == 0) {
        // exact integer L1 delta over the two checkpointed rank frames
        // — one join + one scalar aggregate, paid every checkEvery
        // rounds only
        val l1 = next.join(
            ranks.withColumnRenamed("rank_fp", "__prev"), Seq("node"))
          .agg(sum(abs(col("rank_fp") - col("__prev"))).as("d"))
          .head().getLong(0)
        converged = l1 <= tolFp
      }
      ranks = next
    }
    ranks
  }
}
