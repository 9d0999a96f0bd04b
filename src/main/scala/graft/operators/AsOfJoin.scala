package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single right row with the
  * greatest `rightTs ≤ leftTs` for the same key — "the latest state of X
  * at or before this moment". Spark has no native as-of join; the naive
  * spelling (range join + per-row max) degenerates to O(n·m) per key.
  *
  * This implementation is the scalable union+carry-forward form:
  *
  *  1. tag both sides and union them — ONE dataset ordered by
  *     (key, ts, side) where right rows sort before left rows at equal
  *     timestamps (as-of is ≤, a tie matches);
  *  2. one window per key carries the last-seen right row forward
  *     (`last(_, ignoreNulls)` over rows unbounded-preceding..current);
  *  3. keep the left rows, now annotated with their as-of match.
  *
  * Cost: one shuffle on the key + one per-key sort — the same shape as
  * a sort-merge join, independent of time-range density. Right rows
  * must be unique per (key, ts); pre-collapse with
  * [[ChangeDetection.latestState]] when they aren't (also what makes
  * the semantics deterministic).
  */
object AsOfJoin {

  /** `left` ⟕asof `right`. `rightValues` are the right columns to carry;
    * left rows with no predecessor get nulls (left-outer semantics). */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightValues: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.contains("__side") && rightValues.forall(v => !leftCols.contains(v)),
      "column collision between sides")

    val taggedRight = right.select(
      (col(key) +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        rightValues.map(col)) ++
        leftCols.filterNot(_ == key).map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      (col(key) +: col(leftTs).cast("timestamp").as("__ts") +: lit(1).as("__side") +:
        rightValues.map(c => lit(null).cast(right.schema(c).dataType).as(c))) ++
        leftCols.filterNot(_ == key).map(col): _*)

    val unioned = taggedRight.unionByName(taggedLeft)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Carry all right values as ONE struct: the struct is non-null for
    // every right row even when individual fields are null, so the
    // match always reflects the LATEST right row — carrying fields
    // separately with ignoreNulls would resurrect an older row's value
    // whenever the matched row holds a null (not what ASOF means).
    val carried = unioned.withColumn("__asof",
      last(when(col("__side") === 0,
        struct(rightValues.map(col): _*)), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightValues.map(v => col("__asof").getField(v).as(v)): _*)
  }

  /** `left` ⟕asof `right` with a TOLERANCE: the carried predecessor only
    * counts if it is within `toleranceSeconds` of the left timestamp —
    * matches older than the window null out (the "last order, but only
    * if recent" semantics; pandas `merge_asof(tolerance=…)`). Same
    * single-shuffle carry-forward plan as [[asOf]]: the matched right
    * timestamp rides along as one more carried column and one codegen'd
    * conditional nulls the stale values — no second join, no extra
    * shuffle. */
  def asOfWithin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightValues: Seq[String],
      toleranceSeconds: Long): DataFrame = {
    val matched = asOf(left, right.withColumn("__rts", col(rightTs)),
      key, leftTs, rightTs, rightValues :+ "__rts")
    val fresh = col("__rts").isNotNull &&
      (unix_timestamp(col(leftTs).cast("timestamp")) -
        unix_timestamp(col("__rts").cast("timestamp"))) <= toleranceSeconds
    rightValues.foldLeft(matched) { (df, v) =>
      df.withColumn(v, when(fresh, col(v)).otherwise(lit(null).cast(df.schema(v).dataType)))
    }.drop("__rts")
  }
}
