package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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
  /** Any null slot in the array (the degenerate-input check the
    * reference-faithful natives run before their compiled loops). */
  def hasNullElement(arr: ArrayData): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return true
      i += 1
    }
    false
  }

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

  // a NULL input array nulls every distance in the Column reference
  // (null dot → null struct field), the all-tied sort falls through to
  // the index field, and the result is indices 0..nProbe−1 — never a
  // null output (the reference's structs themselves are non-null)
  override def nullable: Boolean = false

  /** Called from generated code (the null-input branch). */
  def ties(): org.apache.spark.sql.catalyst.util.GenericArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.tabulate[Any](nProbe)(i => i))

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

  override def eval(input: InternalRow): Any = child.eval(input) match {
    case null => ties()
    case arr => nearest(arr.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestQ", this,
      "graft.functions.NearestCentroidsQExpr")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        ${c.isNull} ? $ref.ties() : $ref.nearest(${c.value});
    """, isNull = FalseLiteral)
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
  * it). Degenerate inputs reproduce the reference EXACTLY (pinned by
  * NativeVecSpec): a null element or a vector whose length differs
  * from the (uniform) centroid dim nulls the `aggregate(zip_with)`
  * fold in the Column spelling — EVERY distance goes null, the
  * null-dist structs tie, and array_sort falls through to the index
  * field, so the result is indices 0..nProbe−1. */
case class NearestCentroidsDExpr(child: Expression,
    centroids: Seq[Seq[Double]], nProbe: Int) extends UnaryExpression {
  require(centroids.nonEmpty && nProbe >= 1 && nProbe <= centroids.size)
  require(centroids.map(_.length).distinct.size == 1,
    "centroids must share one dimensionality")
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

  // see NearestCentroidsQExpr: a null input array also yields the
  // all-tied index order in the reference, never a null output
  override def nullable: Boolean = false

  /** Called from generated code (the null-input branch). */
  def ties(): org.apache.spark.sql.catalyst.util.GenericArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.tabulate[Any](nProbe)(i => i))

  /** Called from generated code. */
  def nearest(arr: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    // null element / length mismatch: the reference's fold nulls every
    // distance and the all-tied sort yields indices 0..nProbe−1
    if (arr.numElements() != cents(0).length ||
        NativeVecImpl.hasNullElement(arr)) return ties()
    val k = cents.length
    val bestD = new Array[Double](nProbe)
    val bestI = new Array[Int](nProbe)
    var filled = 0
    var i = 0
    while (i < k) {
      val c = cents(i)
      val n = c.length
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

  override def eval(input: InternalRow): Any = child.eval(input) match {
    case null => ties()
    case arr => nearest(arr.asInstanceOf[ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestD", this,
      "graft.functions.NearestCentroidsDExpr")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        ${c.isNull} ? $ref.ties() : $ref.nearest(${c.value});
    """, isNull = FalseLiteral)
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
  * by NativeVecSpec). Degenerate inputs reproduce the reference too
  * (pinned): a null element or a length mismatch against the
  * (uniform) plane dim nulls every dot in the Column fold, the
  * `when(dot > 0)` condition is null, and every bit falls to the
  * `otherwise(0)` branch — bucket 0. */
case class HyperplaneBucketExpr(child: Expression,
    planes: Seq[Seq[Double]]) extends UnaryExpression {
  require(planes.nonEmpty && planes.size <= 63, s"1..63 planes, got ${planes.size}")
  require(planes.map(_.length).distinct.size == 1,
    "planes must share one dimensionality")
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
    // null element / length mismatch: every dot is null in the
    // reference fold → every `when(dot > 0)` falls to otherwise(0)
    if (arr.numElements() != planeArr(0).length ||
        NativeVecImpl.hasNullElement(arr)) return 0L
    var bits = 0L
    var i = 0
    while (i < planeArr.length) {
      val p = planeArr(i)
      val n = p.length
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

  // a NULL input array nulls every dot in the reference; each
  // `when(dot > 0)` falls to otherwise(0) and the bit SUM is 0, not
  // null — so the expression never returns null
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = child.eval(input) match {
    case null => 0L
    case arr => bucket(arr.asInstanceOf[ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneBucket", this,
      "graft.functions.HyperplaneBucketExpr")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      long ${ev.value} = ${c.isNull} ? 0L : $ref.bucket(${c.value});
    """, isNull = FalseLiteral)
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
  * interpreter. One compiled pass. Null tokens copy through to the
  * windows exactly as the reference's `element_at` does (pinned by
  * NativeVecSpec; inner containsNull mirrors the input's, so
  * null-free tokenizer output keeps its null-free schema). */
case class NgramWindowsExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"window length must be positive: $k")
  override def dataType: DataType = {
    val inner = child.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    }
    ArrayType(ArrayType(LongType, containsNull = inner), containsNull = false)
  }
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
      while (j < k) {
        if (!arr.isNullAt(i + j)) w(j) = arr.getLong(i + j)
        j += 1
      }
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

/** (array<long>, array<long>) → decimal(38,0): the exact WIDE dot
  * product behind [[graft.similarity.Similarity.centroidCosine]] —
  * per-component products cast to decimal BEFORE multiplying in the
  * Column reference (a long·long product would overflow first), so
  * the per-corpus-row cosine scan of sim_semdedup / sim_cluster_sample
  * evaluated an interpreted `aggregate(zip_with(cast(dec)·cast(dec)))`
  * with a Decimal allocation per element. This is one compiled loop on
  * a two-long 128-bit accumulator (products via `Math.multiplyHigh`;
  * any long·long product ≈ ≤ 8.5·10³⁷ < 10³⁸ fits decimal(38,0), so
  * only SUMS can overflow — checked per step against ±(10³⁸−1), the
  * same intermediate bound ANSI decimal addition enforces, raising
  * exactly where the reference raises). Reference null semantics:
  * null element or length mismatch nulls the fold → null result. */
case class DecDotQExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DecimalType(38, 0)
  // decDot returns null on length mismatch / null elements even when
  // BOTH inputs are non-null — without this override, non-nullable
  // children (e.g. collect_list output: the sim_semdedup __csq
  // projection) make nullSafeCodeGen interpolate an UNDECLARED isNull
  // variable into the generated assignment; janino fails and the whole
  // stage silently falls back to interpreted (and a wrong nullable is
  // its own correctness hazard: Catalyst may fold isnull() to false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dec_dotq"

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
    DecDotQExpr.decDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
        ${ev.value} = graft.functions.DecDotQExpr.decDot($a, $b);
        ${ev.isNull} = ${ev.value} == null;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecDotQExpr =
    copy(left = newLeft, right = newRight)
}

object DecDotQExpr {
  // 10^38 − 1: the decimal(38,0) magnitude bound, split for the
  // 128-bit comparison (high signed word, low unsigned word)
  private val Bound = java.math.BigInteger.TEN.pow(38)
    .subtract(java.math.BigInteger.ONE)
  private val BoundHi = Bound.shiftRight(64).longValueExact()
  private val BoundLo = Bound.longValue()

  /** Called from generated code. Returns null for the inputs whose
    * reference fold nulls out (null element / length mismatch). */
  def decDot(a: ArrayData, b: ArrayData): org.apache.spark.sql.types.Decimal = {
    val n = a.numElements()
    if (n != b.numElements() || NativeVecImpl.hasNullElement(a) ||
        NativeVecImpl.hasNullElement(b)) return null
    var hi = 0L
    var lo = 0L
    var i = 0
    while (i < n) {
      val x = a.getLong(i)
      val y = b.getLong(i)
      val pHi = Math.multiplyHigh(x, y)
      val pLo = x * y
      val newLo = lo + pLo
      // unsigned carry out of the low-word add
      val carry = ((lo & pLo) | ((lo | pLo) & ~newLo)) >>> 63
      hi = hi + pHi + carry
      lo = newLo
      // |acc| ≤ 10^38−1, the bound ANSI decimal(38,0) addition
      // enforces per step (products alone can never exceed it)
      var aHi = hi
      var aLo = lo
      if (aHi < 0) { // two's-complement negate for the magnitude
        aLo = -lo
        aHi = if (lo == 0L) -hi else ~hi
      }
      if (aHi > BoundHi || (aHi == BoundHi &&
          java.lang.Long.compareUnsigned(aLo, BoundLo) > 0))
        throw new ArithmeticException(
          "graft_dec_dotq: intermediate sum exceeds decimal(38,0) (ANSI)")
      i += 1
    }
    val bytes = new Array[Byte](16)
    var k = 0
    while (k < 8) {
      bytes(k) = (hi >>> (56 - 8 * k)).toByte
      bytes(k + 8) = (lo >>> (56 - 8 * k)).toByte
      k += 1
    }
    org.apache.spark.sql.types.Decimal(
      scala.math.BigDecimal(new java.math.BigInteger(bytes)), 38, 0)
  }
}

/** array<long> → array<long>: the all-but-the-top correction
  * `out_i = q_i·(vᵀv) − (qᵀv)·v_i` with the qᵀv fold INLINE — one
  * compiled pass per corpus row. The Column spelling it replaces
  * (retained as `Similarity.removeTopComponentReference`) computed
  * qᵀv as `aggregate(zip_with(q, v, a·b), 0, +)` and the correction
  * as a second `zip_with` — ArrayAggregate/ZipWith are
  * CodegenFallback, so the sim_abtt corpus scan evaluated three
  * interpreted lambdas per element per row (the last corpus-scan
  * interpreter tax, VERDICT r13 #1). Exact reference semantics,
  * parity-pinned by NativeVecSpec:
  *  - a null element or a length mismatch against `v` nulls the qᵀv
  *    fold, which nulls EVERY corrected component — this returns an
  *    all-null array of zip_with's length max(|q|, |v|);
  *  - 64-bit overflow raises (`Math.*Exact`), as the reference's
  *    ANSI-mode arithmetic does — the caller's documented |q|,|v|
  *    bounds keep conforming corpora clear of it. */
case class AbttCorrectExpr(child: Expression, v: Seq[Long], vv: Long)
    extends UnaryExpression {
  require(v.nonEmpty, "empty principal component")
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_abtt_correct"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }
  @transient private lazy val vArr: Array[Long] = v.toArray

  /** Called from generated code. */
  def correct(arr: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = arr.numElements()
    val d = vArr.length
    if (n != d || NativeVecImpl.hasNullElement(arr))
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](math.max(n, d))) // all-null, the nulled-fold shape
    var qv = 0L
    var i = 0
    while (i < n) {
      qv = Math.addExact(qv, Math.multiplyExact(arr.getLong(i), vArr(i)))
      i += 1
    }
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) = Math.subtractExact(
        Math.multiplyExact(arr.getLong(i), vv),
        Math.multiplyExact(qv, vArr(i)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    correct(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("abttCorrect", this,
      "graft.functions.AbttCorrectExpr")
    defineCodeGen(ctx, ev, c => s"$ref.correct($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): AbttCorrectExpr =
    copy(child = newChild)
}

/** array<float> → double: the int8 symmetric-quantization scale
  * `max_i |x_i| / 127` as one compiled loop. The Column spelling
  * (retained as `Similarity.compressInt8Reference`) folds
  * `aggregate(vec, 0f, greatest(acc, abs(x)))` — interpreted per
  * element on the storage-tier conversion whose whole point is byte
  * volume (VERDICT r13 #2). Exact reference semantics: the max
  * accumulates in FLOAT left to right under Spark's ordering (NaN
  * greatest — one NaN element pins the scale to NaN), null elements
  * are SKIPPED (`greatest` ignores nulls), and the division happens
  * in double exactly as the analyzer widens `float / lit(127.0f)`. */
case class I8ScaleExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_i8_scale"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.sql}")
  }

  /** Called from generated code. */
  def scaleOf(arr: ArrayData): Double = {
    val n = arr.numElements()
    var acc = 0.0f
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = Math.abs(arr.getFloat(i))
        // Spark's greatest: NaN ranks above every float
        if (java.lang.Float.isNaN(x) || x > acc) acc = x
      }
      i += 1
    }
    acc.toDouble / 127.0d
  }

  override protected def nullSafeEval(input: Any): Any =
    scaleOf(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("i8Scale", this,
      "graft.functions.I8ScaleExpr")
    defineCodeGen(ctx, ev, c => s"$ref.scaleOf($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): I8ScaleExpr =
    copy(child = newChild)
}

/** (array<float>, double) → array<byte>: int8 symmetric-quantization
  * codes `round(x_i / scale)` in one compiled loop (the interpreted
  * `transform` twin is retained as `Similarity.compressInt8Reference`).
  * Exact reference semantics: scale 0 short-circuits to all-zero
  * codes (including null slots — the reference's constant lambda
  * ignores its input); otherwise x/scale divides in double, rounds
  * HALF_UP through the same BigDecimal path as Spark's `round`, and
  * null elements encode to null codes. A NaN/±Inf quotient raises,
  * as the reference's ANSI double→byte cast does. */
case class I8EncodeExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = {
    val inner = left.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    }
    ArrayType(ByteType, containsNull = inner)
  }
  override def prettyName: String = "graft_i8_encode"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, double), got ${l.sql}, ${r.sql}")
    }

  /** Called from generated code. */
  def encode(arr: ArrayData, scale: Double): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    if (scale == 0.0d) {
      while (i < n) { out(i) = 0.toByte; i += 1 }
    } else {
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val d = arr.getFloat(i).toDouble / scale
          if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
            throw new ArithmeticException(
              s"graft_i8_encode: $d cannot be cast to byte (ANSI)")
          // exact HALF_UP without BigDecimal (~8× on this, the
          // element-dominated pass): floor(d+0.5) is one ulp too high
          // exactly when d+0.5 rounded up across the boundary (e.g.
          // 0.49999999999999994) — the subtraction test corrects it.
          // Equal to Spark's BigDecimal.valueOf(d).setScale(0, HALF_UP)
          // for ALL doubles: a shortest-decimal repr of exactly x.5
          // implies d == x.5 in binary (x.5 is representable), so the
          // binary half-comparison and the decimal one always agree —
          // pinned against the reference round by NativeVecSpec's
          // boundary fixtures.
          val r =
            if (d >= 0.0d) {
              var t = Math.floor(d + 0.5d)
              if (t - d > 0.5d) t -= 1.0d
              t
            } else {
              var t = Math.ceil(d - 0.5d)
              if (d - t > 0.5d) t += 1.0d
              t
            }
          if (r < -128.0d || r > 127.0d)
            throw new ArithmeticException(
              s"graft_i8_encode: $r out of byte range (ANSI)")
          out(i) = r.toByte
        }
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    encode(a.asInstanceOf[ArrayData], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("i8Encode", this,
      "graft.functions.I8EncodeExpr")
    defineCodeGen(ctx, ev, (a, b) => s"$ref.encode($a, $b)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): I8EncodeExpr =
    copy(left = newLeft, right = newRight)
}

/** (array<byte>, double) → array<float>: int8 reconstruction
  * `x̂_i = code_i · scale` in one compiled loop (interpreted twin
  * retained as `Similarity.decompressInt8Reference`). Reference
  * arithmetic exactly: the product happens in double (the analyzer
  * widens `float × double`) and narrows to float at the end; null
  * codes decode to null. */
case class I8DecodeExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = {
    val inner = left.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    }
    ArrayType(FloatType, containsNull = inner)
  }
  override def prettyName: String = "graft_i8_decode"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<byte>, double), got ${l.sql}, ${r.sql}")
    }

  /** Called from generated code. */
  def decode(arr: ArrayData, scale: Double): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) out(i) = (arr.getByte(i).toDouble * scale).toFloat
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    decode(a.asInstanceOf[ArrayData], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("i8Decode", this,
      "graft.functions.I8DecodeExpr")
    defineCodeGen(ctx, ev, (a, b) => s"$ref.decode($a, $b)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): I8DecodeExpr =
    copy(left = newLeft, right = newRight)
}

object NativeVec {
  def decDotQ(a: Column, b: Column): Column =
    GraftShims.column(DecDotQExpr(
      GraftShims.expression(a), GraftShims.expression(b)))

  def abttCorrect(q: Column, v: Seq[Long], vv: Long): Column =
    GraftShims.column(AbttCorrectExpr(GraftShims.expression(q), v, vv))

  def i8Scale(v: Column): Column =
    GraftShims.column(I8ScaleExpr(GraftShims.expression(v)))

  def i8Encode(v: Column, scale: Column): Column =
    GraftShims.column(I8EncodeExpr(
      GraftShims.expression(v), GraftShims.expression(scale)))

  def i8Decode(codes: Column, scale: Column): Column =
    GraftShims.column(I8DecodeExpr(
      GraftShims.expression(codes), GraftShims.expression(scale)))

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
