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

/** FLOAT/DOUBLE twin of [[NearestCentroidsQExpr]] — the legacy float
  * index paths (kmeansIndex assignment, float PQ encode, ivfIngestSink,
  * float query probes) ran the `aggregate(zip_with(...))` fold per
  * centroid, interpreted, once per corpus row. Identical ranking
  * arithmetic to the Column reference: dot accumulated LEFT TO RIGHT
  * in element order (IEEE addition is order-dependent — the fold order
  * IS the contract), d = ‖c‖² − 2·dot with ‖c‖² summed at plan build
  * exactly like the `lit(...)` in the reference, ties to the lower
  * centroid index, and double ordering under Spark's total order
  * (NaN greatest — a NaN distance ranks LAST, as array_sort places
  * it). Element contract: non-null (the embedding-column contract);
  * length mismatches rank by the shorter prefix. */
case class NearestCentroidsDExpr(child: Expression,
    centroids: Seq[Seq[Double]], nProbe: Int) extends UnaryExpression {
  require(centroids.nonEmpty && nProbe >= 1 && nProbe <= centroids.size)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_centroids_d"
  // long elements allowed too: the generic-path callers feed QUANTIZED
  // vectors through the double spelling, whose reference lambda was
  // `x.cast(DoubleType) * y` — widening cast semantics replicated here
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double|bigint>, got ${other.sql}")
  }

  // 0 = double, 1 = float, 2 = long (read accessor per element type)
  @transient private lazy val elemKind: Int = child.dataType match {
    case ArrayType(FloatType, _) => 1
    case ArrayType(LongType, _) => 2
    case _ => 0
  }
  @transient private lazy val cents: Array[Array[Double]] =
    centroids.iterator.map(_.toArray).toArray
  @transient private lazy val normSq: Array[Double] =
    cents.map(c => c.map(x => x * x).sum)

  /** `a < b` under Spark SQL's total order on doubles (NaN greatest,
    * −0.0 == 0.0) — the order array_sort ranks the reference's
    * distance structs by. */
  @inline private def nanLess(a: Double, b: Double): Boolean =
    if (java.lang.Double.isNaN(a)) false
    else if (java.lang.Double.isNaN(b)) true
    else a < b

  /** Called from generated code. */
  def nearest(arr: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val k = cents.length
    val bestD = new Array[Double](nProbe)
    val bestI = new Array[Int](nProbe)
    var filled = 0
    var i = 0
    while (i < k) {
      val c = cents(i)
      val n = math.min(arr.numElements(), c.length)
      var dot = 0.0d
      var j = 0
      while (j < n) {
        val x = elemKind match {
          case 1 => arr.getFloat(j).toDouble
          case 2 => arr.getLong(j).toDouble
          case _ => arr.getDouble(j)
        }
        dot += x * c(j)
        j += 1
      }
      val d = normSq(i) - 2.0d * dot
      // first slot whose distance is STRICTLY greater — equal-distance
      // incumbents have lower indexes and stay first
      var p = 0
      while (p < filled && !nanLess(d, bestD(p))) p += 1
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
    val ref = ctx.addReferenceObj("nearestD", this,
      "graft.functions.NearestCentroidsDExpr")
    defineCodeGen(ctx, ev, c => s"$ref.nearest($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroidsDExpr =
    copy(child = newChild)
}

/** array<float|double> → bigint sign-LSH bucket: bit i = sign of
  * ⟨vec, plane_i⟩ — one compiled loop over the literal plane table;
  * the Column spelling runs an interpreted `aggregate(zip_with(...))`
  * fold PER PLANE per row. Exact reference semantics: dot accumulated
  * left to right; the sign test replicates Spark's `dot > 0.0`
  * comparison, under which NaN ranks ABOVE every double — a NaN dot
  * SETS the bit (Java's `NaN > 0` is false; the difference is pinned
  * by NativeVecSpec). */
case class HyperplaneBucketExpr(child: Expression,
    planes: Seq[Seq[Double]]) extends UnaryExpression {
  require(planes.nonEmpty && planes.size <= 63, s"1..63 planes, got ${planes.size}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_bucket"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double|bigint>, got ${other.sql}")
  }

  @transient private lazy val elemKind: Int = child.dataType match {
    case ArrayType(FloatType, _) => 1
    case ArrayType(LongType, _) => 2
    case _ => 0
  }
  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.iterator.map(_.toArray).toArray

  /** Called from generated code. */
  def bucket(arr: ArrayData): Long = {
    var bits = 0L
    var i = 0
    while (i < planeArr.length) {
      val p = planeArr(i)
      val n = math.min(arr.numElements(), p.length)
      var dot = 0.0d
      var j = 0
      while (j < n) {
        val x = elemKind match {
          case 1 => arr.getFloat(j).toDouble
          case 2 => arr.getLong(j).toDouble
          case _ => arr.getDouble(j)
        }
        dot += x * p(j)
        j += 1
      }
      if (java.lang.Double.isNaN(dot) || dot > 0.0d) bits |= 1L << i
      i += 1
    }
    bits
  }

  override protected def nullSafeEval(input: Any): Any =
    bucket(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneBucket", this,
      "graft.functions.HyperplaneBucketExpr")
    defineCodeGen(ctx, ev, c => s"$ref.bucket($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketExpr =
    copy(child = newChild)
}

/** array<long> → array<array<long>>: every k-length sliding window in
  * document order (size − k + 1 of them; inputs shorter than k yield
  * an empty array — callers pre-filter on size ≥ k). The
  * `transform(sequence(0, n−k), i => struct(element_at...))` spelling
  * this replaces built one struct per window through an interpreted
  * lambda (ArrayTransform is CodegenFallback) on the LM-scoring
  * corpus path — every n-gram order re-walked every document in the
  * interpreter. One compiled pass. */
case class NgramWindowsExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"window length must be positive: $k")
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "graft_ngram_windows"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  /** Called from generated code. */
  def windows(arr: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = arr.numElements()
    val m = math.max(0, n - k + 1)
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val w = new Array[Any](k)
      var j = 0
      while (j < k) { w(j) = arr.getLong(i + j); j += 1 }
      out(i) = new org.apache.spark.sql.catalyst.util.GenericArrayData(w)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    windows(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramWindows", this,
      "graft.functions.NgramWindowsExpr")
    defineCodeGen(ctx, ev, c => s"$ref.windows($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): NgramWindowsExpr =
    copy(child = newChild)
}

object NativeVec {
  def ngramWindows(v: Column, k: Int): Column =
    GraftShims.column(NgramWindowsExpr(GraftShims.expression(v), k))

  def quantize(v: Column): Column =
    GraftShims.column(QuantizeExpr(GraftShims.expression(v)))

  def nearestCentroidsD(v: Column, centroids: Seq[Seq[Double]],
      nProbe: Int): Column =
    GraftShims.column(NearestCentroidsDExpr(GraftShims.expression(v),
      centroids, nProbe))

  def hyperplaneBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    GraftShims.column(HyperplaneBucketExpr(GraftShims.expression(v), planes))

  def dotQ(a: Column, b: Column): Column =
    GraftShims.column(DotQExpr(GraftShims.expression(a), GraftShims.expression(b)))

  def nearestCentroidsQ(v: Column, centroids: Seq[Seq[Long]],
      nProbe: Int): Column =
    GraftShims.column(NearestCentroidsQExpr(GraftShims.expression(v),
      centroids, nProbe))

  def adcTableQ(v: Column, codebooks: Seq[Seq[Seq[Long]]]): Column =
    GraftShims.column(AdcTableQExpr(GraftShims.expression(v), codebooks))
}
