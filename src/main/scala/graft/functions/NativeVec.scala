package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector arithmetic for the similarity-search hot path.
  *
  * The Column formulation `aggregate(zip_with(a, b, _*_), 0L, _+_)`
  * allocates an intermediate array and interprets two lambdas per
  * element; on an O(pairs) candidate join that interpreter cost
  * dominates the whole query. This expression is the same exact integer
  * dot product as one compiled loop — no allocation, inside
  * whole-stage codegen.
  */
object NativeVecImpl {
  /** Exact dot product of two long arrays (caller guarantees equal
    * lengths — quantized embeddings of one corpus). */
  def dotQ(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += a.getLong(i) * b.getLong(i)
      i += 1
    }
    sum
  }
}

/** (array<long>, array<long>) → long exact dot product. */
case class DotQExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dotq"

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeVecImpl.dotQ(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.NativeVecImpl.dotQ($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotQExpr =
    copy(left = newLeft, right = newRight)
}

object NativeVec {
  def dotQ(a: Column, b: Column): Column =
    GraftShims.column(DotQExpr(GraftShims.expression(a), GraftShims.expression(b)))
}
