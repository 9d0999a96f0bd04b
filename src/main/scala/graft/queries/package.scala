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
    * `events.parquet` has been generated with several timestamp flavors
    * across driver rounds — INT64 NANOSECONDS (which Spark's parquet
    * reader rejects without `nanosAsLong`), and plain microsecond
    * timestamps (read as TIMESTAMP_NTZ under Spark 4's NTZ inference).
    * We adapt to whatever is on disk and normalize `ts` to the session
    * TIMESTAMP type, interpreting naive wall-clock values as UTC (the
    * session zone) — the same instants the nanos path produced, so
    * every downstream query and oracle is flavor-independent. Result
    * columns holding timestamps are always formatted to second
    * precision (fmtTs); equality/boundary semantics finer than 1µs must
    * not be used in oracle-checked queries. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventTs(spark.read.parquet(s"$dir/$name.parquet"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize an events frame's `ts` to the session TIMESTAMP type
    * whatever flavor the file carried (see [[table]]). Works on batch
    * and streaming frames alike — the dispatch is on the SCHEMA, and
    * the rewrite is a plain column expression. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => // raw nanos → rebuild a microsecond timestamp
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => // naive wall-clock → UTC instant
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** Events newer than `wm` (UTC "yyyy-MM-dd HH:mm:ss"), with the
    * watermark predicate applied in the COLUMN'S NATIVE on-disk domain
    * (raw nanosecond long, or NTZ/LTZ timestamp) BEFORE any conversion —
    * so it pushes down to the parquet scan (`PushedFilters:
    * GreaterThan(ts, …)`) and row groups outside the watermark are
    * skipped via column statistics. Filtering a derived/cast timestamp
    * instead would evaluate the conversion on every row of a 100 TB
    * table and defeat pushdown. */
  def eventsAfter(spark: SparkSession, dir: String, wm: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        val nanos = java.time.LocalDateTime
          .parse(wm.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC)
          .toEpochMilli * 1000000L
        raw.filter(col("ts") > lit(nanos))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.filter(col("ts") > to_timestamp_ntz(lit(wm)))
          .withColumn("ts", col("ts").cast(TimestampType))
      case _ =>
        raw.filter(col("ts") > to_timestamp(lit(wm)))
    }
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
  /** [[bucketSql]] over an arbitrary key expression (the universe
    * sampler filters orders/lineitem keys, not doc_id). */
  def bucketSqlOf(key: String): String =
    s"CAST(concat('0x', substr(md5(CAST($key AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000"

  val bucketSql: String = bucketSqlOf("doc_id")

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
