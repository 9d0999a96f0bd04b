package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowed retail KPIs (SURVEY §7.2 step 5). Each builder works on BOTH a
  * batch DataFrame and a streaming one — the streaming caller adds
  * `withWatermark` before and a sink after; the aggregation logic is
  * shared, which is the point (one definition, two execution modes).
  *
  * Scale: tumbling/sliding windows group on (window, keys) — partial
  * aggregation happens map-side, so the shuffle carries one row per
  * (window × key), not per event. Session windows require a shuffle on the
  * user key; Spark's native `session_window` keeps state per key only for
  * the gap duration in streaming mode.
  */
object Windows {

  /** Tumbling-window aggregate: events → one row per (window, keys). */
  def tumbling(df: DataFrame, tsCol: String, width: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), width) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Sliding-window aggregate (width, slide) — each event lands in
    * width/slide windows (Spark replicates rows pre-agg; the shuffle
    * still carries only per-window partials). */
  def sliding(df: DataFrame, tsCol: String, width: String, slide: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), width, slide) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Session-window aggregate with inactivity gap, per key. Native
    * `session_window` — in streaming mode this is stateful with automatic
    * state eviction past the watermark. */
  def session(df: DataFrame, tsCol: String, gap: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(col(tsCol), gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .drop("session_window")
}
