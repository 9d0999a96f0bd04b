package graft.queries

import graft.er.EntityResolution
import graft.er.EntityResolution.{BlockingPass, ErScoring}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage) over the customer table — the
  * retail-MDM capability described in
  * [[graft.er.EntityResolution]]'s scaladoc. The "dirty feed" is
  * synthesized deterministically from `customer` (the driver ships no
  * noisy twin — same derivation precedent as T3's delta feed), so the
  * DuckDB oracle replays the synthesis, the blocking, the integer
  * Fellegi–Sunter scores, the transitive clustering (WITH RECURSIVE),
  * and the survivorship rules bit-for-bit. */
object ErQueries extends QueryPack {

  // localCheckpoint: the feed is read by every blocking pass AND both
  // sides of the scoring join (≥6 evaluations) — materializing the
  // slim synthesized frame once stops the parquet scan + name
  // synthesis re-running per consumer (measured ~2.5x on er2/er3)
  private def feed(s: SparkSession, dir: String): DataFrame =
    EntityResolution.dirtyCustomerFeed(table(s, dir, "customer"))
      .localCheckpoint()

  private val hard = Seq("nationkey")
  private def passes: Seq[BlockingPass] = EntityResolution.customerNamePasses
  private val scoring = ErScoring()

  /** ER blocking profile: blocks, max block size, skipped records per
    * pass — the observability row that keeps maxBlockSize honest. */
  def er1Blocking(s: SparkSession, dir: String): DataFrame =
    EntityResolution.blockProfile(feed(s, dir), hard, passes)
      .orderBy(col("pass"))

  /** ER matched links: blocked candidates scored with integer
    * agreement weights, thresholded. */
  def er2Links(s: SparkSession, dir: String): DataFrame = {
    val f = feed(s, dir)
    val cands = EntityResolution.candidatePairs(f, "rec_id", hard, passes)
    EntityResolution.matchLinks(
      EntityResolution.scorePairs(cands, f, "rec_id", "name", "segment",
        "acctbal", scoring), scoring)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** ER golden records after transitive clustering + survivorship. */
  def er3Golden(s: SparkSession, dir: String): DataFrame =
    EntityResolution.run(feed(s, dir), "rec_id", "name", "segment",
      "acctbal", hard, passes, scoring)
      .orderBy(col("entity_id"))

  /** ER golden records via INCREMENTAL component maintenance
    * ([[graft.dedup.Dedup.mergeComponents]]): the link set folds in
    * three arbitrary chunks — bootstrap closure on the first, each
    * later chunk merged through the delta-root-graph path (closure
    * cost ∝ chunk, never link history). The oracle is the SAME
    * one-shot recursive closure as er3_golden, so every fold-order
    * bridge/extend/mint case the feed contains is hash-pinned against
    * an independent full-closure replay. */
  def er4GoldenIncremental(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.Dedup
    val f = feed(s, dir)
    val cands = EntityResolution.candidatePairs(f, "rec_id", hard, passes)
    val links = EntityResolution.matchLinks(
      EntityResolution.scorePairs(cands, f, "rec_id", "name", "segment",
        "acctbal", scoring), scoring)
      .localCheckpoint()
    val chunks = (0 until 3).map(i =>
      links.filter(pmod(col("id_a"), lit(3)) === i))
    var asg = Dedup.connectedComponents(chunks.head, "rec_id")
    chunks.tail.foreach { c =>
      asg = Dedup.mergeComponents(asg, c, "rec_id").localCheckpoint()
    }
    val assigned = f
      .join(asg.withColumnRenamed("cluster_id", "entity_id"),
        Seq("rec_id"), "left")
      .withColumn("entity_id", coalesce(col("entity_id"), col("rec_id")))
    EntityResolution.goldenRecords(assigned, "rec_id", "name", "segment",
        "acctbal")
      .orderBy(col("entity_id"))
  }

  def queries: Map[String, QueryFn] = Map(
    "er1_blocking" -> (er1Blocking _),
    "er2_links" -> (er2Links _),
    "er3_golden" -> (er3Golden _),
    "er4_golden_incremental" -> (er4GoldenIncremental _))

  // ---- oracle SQL ----------------------------------------------------

  /** The dirty-feed synthesis, verbatim in DuckDB (see
    * [[graft.er.EntityResolution.dirtyCustomerFeed]]). */
  private val recsSql = """
    SELECT c_custkey * 2 AS rec_id, c_name AS name,
           c_nationkey AS nationkey, c_acctbal AS acctbal,
           c_mktsegment AS segment, 'base' AS src
    FROM customer
    UNION ALL
    SELECT c_custkey * 2 + 1,
           concat(substr(c_name, 1, 9),
                  substr(c_name, 10, CAST(c_custkey % 9 AS INT)),
                  chr(CAST(97 + c_custkey % 7 AS INT)),
                  substr(c_name, CAST(11 + c_custkey % 9 AS INT))),
           c_nationkey, c_acctbal + 0.25, c_mktsegment, 'dup'
    FROM customer WHERE c_custkey % 5 = 0"""

  // interleaved position classes — see customerNamePasses
  private val keyedSql = """
    SELECT rec_id, nationkey, 'p1' AS pass,
           concat(substr(name, 10, 1), substr(name, 12, 1),
                  substr(name, 14, 1), substr(name, 16, 1),
                  substr(name, 18, 1)) AS chunk FROM recs
    UNION ALL
    SELECT rec_id, nationkey, 'p2',
           concat(substr(name, 11, 1), substr(name, 13, 1),
                  substr(name, 15, 1), substr(name, 17, 1)) FROM recs"""

  private val linksSql = s"""
    keyed AS ($keyedSql),
    sized AS (
      SELECT *, COUNT(*) OVER (PARTITION BY pass, chunk, nationkey) AS bs
      FROM keyed),
    cand AS (
      SELECT DISTINCT a.rec_id AS id_a, b.rec_id AS id_b
      FROM sized a JOIN sized b
        ON a.pass = b.pass AND a.chunk = b.chunk
       AND a.nationkey = b.nationkey AND a.rec_id < b.rec_id
      WHERE a.bs <= 10000 AND b.bs <= 10000),
    scored AS (
      SELECT c.id_a, c.id_b,
        CAST(levenshtein(ra.name, rb.name) AS INT) AS lev,
        CAST(CASE WHEN levenshtein(ra.name, rb.name) = 0 THEN 40
                  WHEN levenshtein(ra.name, rb.name) <= 1 THEN 25
                  ELSE 0 END
           + CASE WHEN ra.segment = rb.segment THEN 10 ELSE 0 END
           + CASE WHEN abs(ra.acctbal - rb.acctbal) <= 1.0 THEN 15
                  WHEN abs(ra.acctbal - rb.acctbal) <= 100.0 THEN 5
                  ELSE 0 END AS INT) AS score
      FROM cand c
      JOIN recs ra ON c.id_a = ra.rec_id
      JOIN recs rb ON c.id_b = rb.rec_id),
    links AS (SELECT * FROM scored WHERE score >= 45)"""

  def oracles: Map[String, String] = Map(
    "er1_blocking" -> s"""
      WITH recs AS ($recsSql),
      keyed AS ($keyedSql),
      blocks AS (
        SELECT pass, chunk, nationkey, COUNT(*) AS block_size
        FROM keyed GROUP BY 1, 2, 3)
      SELECT pass, COUNT(*) AS n_blocks, MAX(block_size) AS max_block,
             CAST(SUM(CASE WHEN block_size > 10000 THEN block_size
                           ELSE 0 END) AS BIGINT) AS records_skipped
      FROM blocks GROUP BY pass ORDER BY pass""",
    "er2_links" -> s"""
      WITH recs AS ($recsSql),
      $linksSql
      SELECT id_a, id_b, lev, score FROM links ORDER BY id_a, id_b""",
    "er3_golden" -> goldenSql,
    // the incremental fold must land on EXACTLY the one-shot closure
    "er4_golden_incremental" -> goldenSql)

  private lazy val goldenSql = s"""
      WITH RECURSIVE recs AS ($recsSql),
      $linksSql,
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM links
        UNION SELECT id_b, id_a FROM links),
      reach(src, dst) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      comp AS (SELECT src AS rec_id, MIN(dst) AS entity_id
               FROM reach GROUP BY src),
      assigned AS (
        SELECT r.*, COALESCE(c.entity_id, r.rec_id) AS entity_id
        FROM recs r LEFT JOIN comp c ON r.rec_id = c.rec_id)
      SELECT entity_id, COUNT(*) AS n_records,
             min_by(name, rec_id) AS canon_name,
             min_by(segment, rec_id) AS canon_segment,
             MAX(acctbal) AS max_bal,
             COUNT(DISTINCT segment) AS n_segments
      FROM assigned GROUP BY entity_id ORDER BY entity_id"""
}
