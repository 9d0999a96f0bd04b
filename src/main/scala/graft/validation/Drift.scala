package graft.validation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Distribution-drift statistics for numeric columns.
  *
  * The categorical side (chi-square over buckets) lives with the
  * streaming monitor ([[graft.streaming.Streams.driftCountsSink]] /
  * `chi2Against`); this is the NUMERIC complement: the exact
  * two-sample Kolmogorov–Smirnov statistic. The sup of
  * |F_a(x) − F_b(x)| over x is attained at a data point, so
  * evaluating the CDF gap at every DISTINCT value computes KS
  * exactly — no binning, no approximation, and no assumption about
  * the value distribution.
  *
  * Determinism contract (the house oracle rule): everything up to
  * the final division is INTEGER — cumulative counts at each distinct
  * value are cross-multiplied by the opposite sample size, so
  * `ks_num = max |cum_a·n_b − cum_b·n_a|` is order-free and replays
  * bit-for-bit in DuckDB; `ks = ks_num / (n_a·n_b)` is one exact
  * double division at realistic magnitudes (< 2⁵³).
  *
  * Scale shape: one (group, value) aggregate collapses the raw rows
  * map-side, then cumulative windows PARTITIONED by the group column
  * (never an unpartitioned global sort — the fleet-wide WindowExec
  * audit applies). Distinct-value cardinality bounds the window
  * input, not the raw row count.
  */
object Drift {

  /** Per-group exact two-sample KS between the rows where `winCol` =
    * `refLabel` and the rest. Input columns: `groupCol` (the
    * partition key — e.g. event_type), `valueCol` (numeric),
    * `winCol` (two-valued window label). Returns one row per group:
    * (group, n_ref, n_cur, ks_num, ks). */
  def ksStatistic(df: DataFrame, groupCol: String, valueCol: String,
      winCol: String, refLabel: String = "ref"): DataFrame = {
    val byVal = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(
        sum(when(col(winCol) === refLabel, 1L).otherwise(0L)).as("c_ref"),
        sum(when(col(winCol) =!= refLabel, 1L).otherwise(0L)).as("c_cur"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    byVal
      .withColumn("cum_ref", sum(col("c_ref")).over(wCum))
      .withColumn("cum_cur", sum(col("c_cur")).over(wCum))
      .withColumn("n_ref", sum(col("c_ref")).over(wAll))
      .withColumn("n_cur", sum(col("c_cur")).over(wAll))
      .groupBy(col(groupCol))
      .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
        max(abs(col("cum_ref") * col("n_cur") - col("cum_cur") * col("n_ref")))
          .as("ks_num"))
      .withColumn("ks",
        col("ks_num").cast(DoubleType) /
          (col("n_ref") * col("n_cur")).cast(DoubleType))
  }
}
