package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: files clustered so that BOTH of
  * two filter columns get tight per-file min/max statistics — the
  * multi-dimensional generalization of sort-by-one-column, and at
  * 100 TB the difference between pruning on one predicate or on either.
  * A table sorted by `a` answers `a = ?` from a few files but scans
  * everything for `b = ?`; the z-ordered table prunes on both.
  *
  * The z-value interleaves the bits of the two columns' 16-bit uniform
  * bucket ids. Bit spreading is the classic mask-shift cascade — five
  * bitwise ops per column, all built-in codegen'd functions (no UDF,
  * no custom expression needed: `shiftleft`/`bitwise AND/OR` compile
  * into the row loop).
  */
object Layout {

  /** Spread the low 16 bits of `x` to even bit positions 0,2,…,30. */
  def spread16(x: Column): Column = {
    val m0 = x.bitwiseAND(lit(0xFFFFL))
    val m1 = (m0.bitwiseOR(shiftleft(m0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val m2 = (m1.bitwiseOR(shiftleft(m1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = (m2.bitwiseOR(shiftleft(m2, 2))).bitwiseAND(lit(0x33333333L))
    (m3.bitwiseOR(shiftleft(m3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton z-value of two 16-bit bucket ids (a in even bits, b in odd). */
  def mortonZ(aBucket: Column, bBucket: Column): Column =
    spread16(aBucket).bitwiseOR(shiftleft(spread16(bBucket), 1))

  /** Uniform 16-bit bucket of a numeric column over [lo, hi]. */
  def bucket16(x: Column, lo: Double, hi: Double): Column = {
    require(hi > lo, "bucket16 needs hi > lo")
    least(greatest(
      floor((x.cast("double") - lit(lo)) / lit(hi - lo) * 65536.0), lit(0.0)),
      lit(65535.0)).cast("long")
  }

  /** Write `df` z-ordered on (colA, colB): range-partition by the
    * z-value into `numFiles` files, sorted within each. Column bounds
    * come from ONE tiny min/max aggregate (4 scalars to the driver).
    * Rows with NULL in either column get z = −1 and cluster together
    * in the first file (their stats are useless anyway). */
  def zorderWrite(df: DataFrame, path: String, colA: String, colB: String,
      numFiles: Int): Unit = {
    // NaN sorts above every double in Spark's min/max — exclude it from
    // the bounds probe or one bad row poisons aHi and the whole relayout
    def cleanD(c: String) =
      when(!isnan(col(c).cast("double")), col(c).cast("double"))
    val b = df.agg(min(cleanD(colA)), max(cleanD(colA)),
        min(cleanD(colB)), max(cleanD(colB)))
      .collect().head
    if (b.isNullAt(0) || b.isNullAt(2)) {
      // empty input or a layout column with no usable values: there is
      // nothing to cluster — write the data unclustered rather than NPE
      df.repartition(math.max(1, numFiles)).write.mode("overwrite").parquet(path)
      return
    }
    val (aLo, aHi) = (b.getDouble(0), b.getDouble(1))
    val (bLo, bHi) = (b.getDouble(2), b.getDouble(3))
    // NULL/NaN rows get z = −1 and cluster into the first file
    val unusable = col(colA).isNull || col(colB).isNull ||
      isnan(col(colA).cast("double")) || isnan(col(colB).cast("double"))
    df.withColumn("__z",
        when(unusable, lit(-1L))
          .otherwise(mortonZ(
            bucket16(col(colA), aLo, math.nextUp(aHi)),
            bucket16(col(colB), bLo, math.nextUp(bHi)))))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file (min, max) spans of `c` in a parquet directory — the
    * pruning-quality probe used by tests and layout audits. */
  def fileSpans(spark: SparkSession, path: String,
      c: String): Array[(Double, Double)] =
    spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg(min(col(c)).cast("double").as("lo"), max(col(c)).cast("double").as("hi"))
      .collect()
      // a file of all-NULL values (the z = −1 cluster the writer itself
      // produces) has no span to report — skip it, don't NPE
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2))
      .map(r => (r.getDouble(1), r.getDouble(2)))
}
