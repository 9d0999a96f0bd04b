package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Query-pack plumbing shared by every SparkEntry entry.
  *
  * Oracle-parity conventions (the driver hash-compares our parquet output
  * against DuckDB running `oracleSql` on the same tables):
  *  - Double aggregations are ORDER-DEPENDENT in floating point, so any
  *    summed measure goes through `decSum`: per-row cast to DECIMAL(18,6)
  *    (deterministic, identical in both engines), exact decimal sum
  *    (order-free), then a final exact cast to DOUBLE. The SQL twin is
  *    `CAST(SUM(CAST(expr AS DECIMAL(18,6))) AS DOUBLE)`. Scale 6 matters:
  *    measures here are products of ≤3 two-decimal factors, i.e. exact at
  *    6 dp, so the cast never rounds — scale 4 would round at tie points
  *    where Spark (HALF_UP on the exact decimal expansion) and DuckDB
  *    (scaled-double rounding) disagree.
  *  - Timestamp columns in RESULTS are formatted to strings (`fmtTs`) —
  *    parquet timestamp flavors (ns/us, tz-adjusted or not) differ between
  *    writers and would break value comparison.
  *  - Every query ends in a total ORDER BY so row order is deterministic.
  */
package object queries {

  type QueryFn = (SparkSession, String) => DataFrame

  /** A named set of queries plus their DuckDB oracle SQL. */
  trait QueryPack {
    def queries: Map[String, QueryFn]
    def oracles: Map[String, String]
  }

  /** Load one testdata table (TESTDATA.md layout: `dir/name.parquet`).
    *
    * `events.parquet` is written with NANOSECOND timestamps, which Spark's
    * parquet reader rejects outright; we read them as raw longs
    * (`nanosAsLong`) and rebuild a microsecond timestamp. Result columns
    * holding timestamps are always formatted to second precision (fmtTs),
    * so the dropped sub-microsecond digits never reach a compared value —
    * but equality/boundary semantics finer than 1µs must not be used in
    * oracle-checked queries. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Events newer than `wm` (UTC "yyyy-MM-dd HH:mm:ss"), with the
    * watermark predicate applied in the RAW nanosecond-long domain
    * BEFORE the timestamp rebuild — so it pushes down to the parquet
    * scan (`PushedFilters: GreaterThan(ts, …)`) and row groups outside
    * the watermark are skipped via column statistics. Filtering the
    * derived timestamp instead would evaluate the conversion on every
    * row of a 100 TB table. */
  def eventsAfter(spark: SparkSession, dir: String, wm: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val nanos = java.time.LocalDateTime
      .parse(wm.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC)
      .toEpochMilli * 1000000L
    spark.read.parquet(s"$dir/events.parquet")
      .filter(col("ts") > lit(nanos))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Deterministic fixture segmentation shared by the line-granular
    * queries (d10_line_dedup, tx_c4_clean): the documents fixture is
    * single-line word salad, so a sentence break is inserted after
    * every "table" token. Spark side and oracle side MUST split
    * identically — one definition, two renderings. */
  def segmentLines(text: Column): Column =
    regexp_replace(text, "table", "table.\n")

  /** SQL twin of [[segmentLines]]. */
  val segmentLinesSql: String =
    "regexp_replace(text, 'table', 'table.' || chr(10), 'g')"

  /** SQL twin of `Sampling.hashBucket(col("doc_id"))` — ONE definition
    * for every sampler oracle (the sample_ and mix_ queries, the
    * funnel's sampling stage), so a bucket-scheme change can't silently
    * diverge one of them from the engine. */
  val bucketSql: String =
    "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000"

  /** Order-independent, engine-exact sum of a double measure (see above). */
  def decSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 6))).cast(DoubleType)

  /** SQL twin of [[decSum]]. */
  def decSumSql(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,6))) AS DOUBLE)"

  /** Exact average: exact decimal sum cast to double, divided by count —
    * both engines do the same single IEEE division. */
  def decAvg(c: Column): Column =
    sum(c.cast(DecimalType(18, 6))).cast(DoubleType) / count(c)

  def decAvgSql(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,6))) AS DOUBLE) / COUNT($expr)"

  /** Render a timestamp deterministically for result comparison. */
  def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** DuckDB twin of [[fmtTs]]. */
  def fmtTsSql(expr: String): String = s"strftime($expr, '%Y-%m-%d %H:%M:%S')"

  def ts(s: String): Column = to_timestamp(lit(s))
}
