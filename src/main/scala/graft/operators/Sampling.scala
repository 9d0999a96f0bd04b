package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Deterministic sampling and dataset mixing for training-data curation.
  *
  * `df.sample()` is seed-dependent on partitioning and row order — two
  * runs over a repartitioned table select different rows, which is
  * poison for reproducible training sets. These operators derive the
  * keep/drop decision from a HASH OF THE ROW KEY alone: any engine, any
  * partitioning, any run selects the identical subset (and the hash is
  * md5, so an external system — or the DuckDB oracle — reproduces it).
  *
  * All pure projections/filters: no shuffle, no state.
  */
object Sampling {

  val Buckets = 1000000L

  /** Uniform bucket in [0, Buckets) from the md5 of the key — the first
    * 15 hex digits (60 bits, < 2^63) as an integer, mod Buckets. */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast(StringType)), 1, 15), 16, 10)
      .cast(LongType) % Buckets

  /** Keep a deterministic `fraction` of rows by key hash. */
  def deterministicSample(df: DataFrame, keyCol: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    df.filter(hashBucket(col(keyCol)) < (fraction * Buckets).toLong)
  }

  /** Mix sources at per-source rates (unlisted sources drop): the
    * standard training-mixture downsample, reproducible row-for-row. */
  def stratifiedMix(df: DataFrame, sourceCol: String, keyCol: String,
      rates: Map[String, Double]): DataFrame = {
    val threshold = rates.foldLeft(lit(-1L)) { case (acc, (src, rate)) =>
      when(col(sourceCol) === src, lit((rate * Buckets).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < threshold)
  }
}
