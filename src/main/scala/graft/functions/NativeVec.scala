package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

/** array<long> → array<int>: indices of the `nProbe` nearest centroids
  * by exact integer squared-L2 (d_i = Σc_i² − 2·v·c_i; the shared-‖v‖²
  * term cancels in ranking), ties to the LOWER centroid index — the
  * [[graft.similarity.Similarity.nearestCentroidsQ]] contract, bit-for-
  * bit (pinned by SimilaritySpec against the Column-composed reference).
  *
  * The Column spelling expands to k struct-building dot products plus
  * an interpreter-only array_sort; past k ≈ 100 the generated method
  * also blows janino's size limit and whole-stage codegen falls back,
  * so every training/encode row pays interpreted evaluation. This is
  * one compiled loop with an nProbe-sized insertion buffer — O(k·dim)
  * per row, no allocation beyond the output, one janino-stable virtual
  * call from generated code (centroids ride addReferenceObj, so the
  * generated source is identical for every codebook and compiles
  * once). */
case class NearestCentroidsQExpr(child: Expression,
    centroids: Seq[Seq[Long]], nProbe: Int) extends UnaryExpression {
  require(centroids.nonEmpty && nProbe >= 1 && nProbe <= centroids.size)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_centroids_q"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  @transient private lazy val cents: Array[Array[Long]] =
    centroids.iterator.map(_.toArray).toArray
  @transient private lazy val normSq: Array[Long] =
    cents.map(c => c.map(x => x * x).sum)

  /** Called from generated code. */
  def nearest(arr: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val k = cents.length
    val bestD = new Array[Long](nProbe)
    val bestI = new Array[Int](nProbe)
    var filled = 0
    var i = 0
    while (i < k) {
      val c = cents(i)
      val n = math.min(arr.numElements(), c.length)
      var dot = 0L
      var j = 0
      while (j < n) { dot += arr.getLong(j) * c(j); j += 1 }
      val d = normSq(i) - 2L * dot
      // insertion point: first slot with a STRICTLY larger distance —
      // an equal-distance incumbent has a lower index and stays first
      var p = 0
      while (p < filled && bestD(p) <= d) p += 1
      if (p < nProbe) {
        var q = math.min(filled, nProbe - 1)
        while (q > p) { bestD(q) = bestD(q - 1); bestI(q) = bestI(q - 1); q -= 1 }
        bestD(p) = d; bestI(p) = i
        if (filled < nProbe) filled += 1
      }
      i += 1
    }
    val out = new Array[Any](filled)
    var o = 0
    while (o < filled) { out(o) = bestI(o); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    nearest(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestQ", this,
      "graft.functions.NearestCentroidsQExpr")
    defineCodeGen(ctx, ev, c => s"$ref.nearest($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidsQExpr =
    copy(child = newChild)
}

/** array<long> → array<double>: the per-query ADC lookup table — for
  * every subspace j and centroid i, the exact integer squared L2
  * ‖s_j‖² − 2·s_j·c_{j,i} + ‖c_{j,i}‖² cast to double, subspace-major
  * (m × ksub entries). Same janino story as
  * [[NearestCentroidsQExpr]]: the Column spelling is ~m·ksub inlined
  * dot products (≈ 8000 generated lines at m=8, ksub=128) and falls
  * out of codegen exactly where big codebooks make the table worth
  * having. Bit-parity with the Column reference pinned by PqSpec. */
case class AdcTableQExpr(child: Expression,
    codebooks: Seq[Seq[Seq[Long]]]) extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.head.nonEmpty)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_adc_table_q"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  @transient private lazy val books: Array[Array[Array[Long]]] =
    codebooks.iterator.map(_.iterator.map(_.toArray).toArray).toArray
  @transient private lazy val centNormSq: Array[Array[Long]] =
    books.map(_.map(c => c.map(x => x * x).sum))

  /** Called from generated code. */
  def table(arr: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val m = books.length
    val ksub = books(0).length
    val sub = books(0)(0).length
    val out = new Array[Any](m * ksub)
    var j = 0
    while (j < m) {
      val off = j * sub
      // slice semantics of the reference: elements past the vector's
      // end simply don't contribute (dotQ min-length)
      val lim = math.max(0, math.min(sub, arr.numElements() - off))
      var nq = 0L
      var t = 0
      while (t < lim) { val x = arr.getLong(off + t); nq += x * x; t += 1 }
      val cb = books(j)
      val ns = centNormSq(j)
      var i = 0
      while (i < ksub) {
        val c = cb(i)
        var dot = 0L
        var u = 0
        while (u < lim) { dot += arr.getLong(off + u) * c(u); u += 1 }
        out(j * ksub + i) = (nq - 2L * dot + ns(i)).toDouble
        i += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    table(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcTableQ", this,
      "graft.functions.AdcTableQExpr")
    defineCodeGen(ctx, ev, c => s"$ref.table($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): AdcTableQExpr =
    copy(child = newChild)
}

/** array<float|double> → array<long>: per-element floor(x·10⁴) — the
  * engine-wide quantization ([[graft.similarity.Similarity.quantize]])
  * as one compiled loop. The Column spelling is an `ArrayTransform`
  * HOF, which is `CodegenFallback`: every corpus row of every
  * similarity / PQ / index path paid an interpreted per-element
  * closure walk at the very start of the pipeline — the same
  * interpreter tax class as the argmin (measured 23×) and the bucket
  * fold. Semantics are bit-identical to
  * `transform(v, x => floor(x.cast(double) * 1e4).cast(long))`:
  * float→double widening then one IEEE multiply, `math.floor(_).toLong`
  * (NaN → 0, ±Inf → Long.Max/Min — Spark Floor's own double→long),
  * null elements stay null, null array stays null. Pinned by
  * NativeVecSpec against the retained Column reference. */
case class QuantizeExpr(child: Expression) extends UnaryExpression {
  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }
  override def dataType: DataType =
    ArrayType(LongType, containsNull = elemNullable)
  override def prettyName: String = "graft_quantize"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.sql}")
  }

  /** Called from generated code. */
  def quantize(arr: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    if (isFloat) {
      while (i < n) {
        if (!arr.isNullAt(i))
          out(i) = math.floor(arr.getFloat(i).toDouble * 10000.0).toLong
        i += 1
      }
    } else {
      while (i < n) {
        if (!arr.isNullAt(i))
          out(i) = math.floor(arr.getDouble(i) * 10000.0).toLong
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    quantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantizeQ", this,
      "graft.functions.QuantizeExpr")
    defineCodeGen(ctx, ev, c => s"$ref.quantize($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeExpr =
    copy(child = newChild)
}

object NativeVec {
  def quantize(v: Column): Column =
    GraftShims.column(QuantizeExpr(GraftShims.expression(v)))

  def dotQ(a: Column, b: Column): Column =
    GraftShims.column(DotQExpr(GraftShims.expression(a), GraftShims.expression(b)))

  def nearestCentroidsQ(v: Column, centroids: Seq[Seq[Long]],
      nProbe: Int): Column =
    GraftShims.column(NearestCentroidsQExpr(GraftShims.expression(v),
      centroids, nProbe))

  def adcTableQ(v: Column, codebooks: Seq[Seq[Seq[Long]]]): Column =
    GraftShims.column(AdcTableQExpr(GraftShims.expression(v), codebooks))
}
