package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MinHash signatures (SURVEY §7.2 step 6 / dedup extensions).
  *
  * The composable formulation is explode(shingles) → 64 min-aggregates:
  * correct, but it SHUFFLES one row per (doc, shingle) and runs a wide
  * aggregate. A MinHash signature is a pure function of one document's
  * shingle set, so it belongs in a projection: this expression computes
  * all k hash lanes in one compiled loop per row — no explode, no
  * shuffle, no aggregation. On a 100 TB corpus that converts the
  * signature stage from a full-shuffle job into a map-only scan.
  *
  * Exact-match semantics with the aggregate formulation (pinned by
  * parity test): h = pmod(xxhash64(shingle, seed=42), P);
  * sig_i = min over shingles of (a_i·h + b_i) mod P, with the (a_i, b_i)
  * splitmix64 coefficients from [[graft.dedup.Dedup.coefficients]].
  * Empty shingle sets yield NULL (the aggregate formulation simply has
  * no group — callers filter either way).
  */
object NativeMinHashImpl {

  /** (a, b) pairs flattened as [a0, b0, a1, b1, ...]. */
  def signature(shingles: ArrayData, coeffs: Array[Long], prime: Long): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val k = coeffs.length / 2
    val sig = Array.fill[Long](k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      val x = XXH64.hashUTF8String(s, 42L)
      val h = ((x % prime) + prime) % prime
      var j = 0
      while (j < k) {
        val v = (coeffs(2 * j) * h + coeffs(2 * j + 1)) % prime
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** array<string> shingles → array<long> MinHash signature. */
case class MinHashSigExpr(child: Expression, coeffs: Array[Long], prime: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NativeMinHashImpl.signature(input.asInstanceOf[ArrayData], coeffs, prime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coeffsRef = ctx.addReferenceObj("coeffs", coeffs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.NativeMinHashImpl.signature($c, $coeffsRef, ${prime}L);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)

  // Array[Long] field breaks case-class equality; compare by content
  override def equals(o: Any): Boolean = o match {
    case m: MinHashSigExpr =>
      m.child == child && java.util.Arrays.equals(m.coeffs, coeffs) &&
        m.prime == prime
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(coeffs)
}

object NativeMinHash {
  def signature(shingles: Column, coeffs: Seq[(Long, Long)],
      prime: Long): Column =
    GraftShims.column(MinHashSigExpr(GraftShims.expression(shingles),
      coeffs.flatMap(p => Seq(p._1, p._2)).toArray, prime))
}
