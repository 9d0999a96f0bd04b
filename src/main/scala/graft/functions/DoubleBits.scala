package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Shared implementation — called from generated code. */
object DoubleBitsImpl {
  /** Monotone IEEE-754 bit key: key order == double order (NaN maps
    * above +∞ — callers exclude it). `bits ^ ((bits >> 63) & MAX)` —
    * positives keep their pattern, negatives flip magnitude bits so
    * more-negative sorts lower. */
  def key(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(v)
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }

  /** Inverse of [[key]] — the xor mask depends only on the sign bit,
    * which the transform preserves, so the map is an involution. */
  def unkey(k: Long): Double = {
    val b = k ^ ((k >> 63) & 0x7fffffffffffffffL)
    java.lang.Double.longBitsToDouble(b)
  }
}

/** double → long: the order-preserving IEEE bit key (codegen'd) —
  * lets order statistics binary-search the VALUE SPACE with integer
  * arithmetic ([[graft.operators.Quantiles]]). */
case class DoubleBitsKeyExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input, got ${child.dataType.sql}")
  override def prettyName: String = "graft_double_bits_key"

  override protected def nullSafeEval(input: Any): Any =
    DoubleBitsImpl.key(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DoubleBitsImpl.key($c)")

  override protected def withNewChildInternal(newChild: Expression): DoubleBitsKeyExpr =
    copy(child = newChild)
}

/** long → double: the inverse bit key (codegen'd) — lets the
  * DISTRIBUTED quantile refinement materialize final values without a
  * driver round-trip ([[graft.operators.Quantiles.exactQuantilesDist]]). */
case class DoubleBitsUnkeyExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long input, got ${child.dataType.sql}")
  override def prettyName: String = "graft_double_bits_unkey"

  override protected def nullSafeEval(input: Any): Any =
    DoubleBitsImpl.unkey(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DoubleBitsImpl.unkey($c)")

  override protected def withNewChildInternal(newChild: Expression): DoubleBitsUnkeyExpr =
    copy(child = newChild)
}

object NativeDoubleBits {
  def bitsKey(v: Column): Column =
    GraftShims.column(DoubleBitsKeyExpr(GraftShims.expression(v)))
  def bitsUnkey(k: Column): Column =
    GraftShims.column(DoubleBitsUnkeyExpr(GraftShims.expression(k)))
}
