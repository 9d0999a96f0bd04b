package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Compiled per-row bucketing against an ASCENDING cuts array — the
  * grid/drift hot path ([[graft.operators.Quantiles.bucketOfKeyed]]).
  *
  * The `aggregate()` HOF spelling (`acc + when(v > cut, 1, 0)` folded
  * over the array) is `ArrayAggregate`, which is `CodegenFallback`:
  * every corpus row pays an interpreted O(b) closure walk — in the
  * per-key drift monitor that is the full 100 TB row volume through
  * the interpreter, the same tax class the centroid argmin measured at
  * 23×. This expression is the identical right-closed convention as
  * one compiled O(log b) binary search (`lower_bound`: the count of
  * cuts strictly below the value), inside whole-stage codegen.
  *
  * Bit-parity with the HOF spelling, pinned by NativeBucketSpec
  * including the degenerate inputs: duplicate cuts (a value heavier
  * than a bucket's mass yields repeated cuts — the count convention
  * skips all of them identically), NaN values (Spark SQL comparison
  * semantics rank NaN ABOVE every double — `NaN > cut` is TRUE for
  * non-NaN cuts, so NaN lands in the TOP bucket, not bucket 0 as
  * IEEE/Java primitive comparison would give; the search uses the
  * same nan-safe ordering), NaN cuts (sort_array places them last;
  * NaN > NaN is false), ±Infinity, signed zero (−0.0 == 0.0 in both
  * orderings), NULL value (the `when` contributes 0 per cut → bucket
  * 0), and NULL array (the fold is null). Contract shared with
  * [[graft.operators.Quantiles.bucketOf]]: cuts ascending in Spark's
  * sort order, elements non-null (what `sort_array(collect_list(...))`
  * produces — binary search over an unsorted array is undefined, as
  * the comparison-sum would be over a misordered grid). */
object NativeBucketImpl {
  /** `a < b` under Spark SQL's total order on doubles: NaN is the
    * greatest value and equal to itself; −0.0 == 0.0. */
  private def nanLess(a: Double, b: Double): Boolean =
    if (java.lang.Double.isNaN(a)) false
    else if (java.lang.Double.isNaN(b)) true
    else a < b

  /** Count of cuts strictly below `v` (== right-closed bucket id). */
  def bucket(v: Double, bounds: ArrayData): Long = {
    var lo = 0
    var hi = bounds.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (nanLess(bounds.getDouble(mid), v)) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }
}

/** (double, array<double>) → bigint right-closed bucket id. NULL
  * semantics replicate the HOF fold: null array → null; null value →
  * bucket 0 (each `when(null > cut, 1).otherwise(0)` term is 0). */
case class BucketOfKeyedExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = right.nullable
  override def prettyName: String = "graft_bucket_of"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, array<double>), got ${l.sql}, ${r.sql}")
    }

  override def eval(input: InternalRow): Any = {
    val b = right.eval(input)
    if (b == null) null
    else {
      val v = left.eval(input)
      if (v == null) 0L
      else NativeBucketImpl.bucket(v.asInstanceOf[Double],
        b.asInstanceOf[ArrayData])
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val bGen = right.genCode(ctx)
    val vGen = left.genCode(ctx)
    ev.copy(code = code"""
      ${bGen.code}
      boolean ${ev.isNull} = ${bGen.isNull};
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        ${vGen.code}
        if (!${vGen.isNull}) {
          ${ev.value} = graft.functions.NativeBucketImpl.bucket(
            ${vGen.value}, ${bGen.value});
        }
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BucketOfKeyedExpr =
    copy(left = newLeft, right = newRight)
}

object NativeBucket {
  def bucketOf(value: Column, bounds: Column): Column =
    GraftShims.column(BucketOfKeyedExpr(
      GraftShims.expression(value), GraftShims.expression(bounds)))

  /** The HOF reference spelling (parity tests only — interpreted). */
  def bucketOfReference(value: Column, bounds: Column): Column = {
    import org.apache.spark.sql.functions._
    aggregate(bounds, lit(0L), (acc, cut) =>
      acc + when(value > cut, 1L).otherwise(0L))
  }
}
