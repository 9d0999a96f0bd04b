package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named query
  * over the driver's testdata tables, with a DuckDB oracle twin in
  * [[oracleSql]] where the semantics are ANSI-SQL-expressible. Query packs
  * live in `graft.queries`; the library itself (validators, transforms,
  * dedup, similarity, streaming) lives in the sibling packages.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    CoreQueries, ValidationQueries, TransformQueries, EventQueries,
    DedupQueries, SimilarityQueries, TextQueries, MultimodalQueries,
    ErQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
