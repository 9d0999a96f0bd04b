package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-classification Cavnar-Trenkle language ID as ONE compiled call
  * per row: the committed profiles ([[graft.text.LangProfile]]) are
  * class constants, so the doc-side top-K trigram ranking, all 28
  * out-of-place distances, the arg-min, and the zero-overlap→unknown
  * rule run inside whole-stage codegen with ZERO shuffle — where the
  * relational spelling (explode langs × doc grams → broadcast join →
  * aggregate → heap) shuffles docs·langs·K slim rows. At 4 languages
  * that shuffle was tolerable; at 28 languages × K=80 it tripped the
  * bench's own shuffle-volume tripwire (0.4 → 3.1 MB at sf0.1, 14×),
  * which at 100 TB is exactly the volume class that decides a job.
  * The relational spelling survives as
  * [[graft.text.LangProfile.langIdProfileReference]], parity-pinned.
  */
object NativeLangImpl {

  private lazy val langs: Array[String] =
    graft.text.LangProfile.samples.map(_._1).toArray

  /** ONE combined map: gram → per-language committed rank vector
    * (−1 = absent). One hash lookup per doc gram instead of one per
    * (gram, language); the per-language accumulation is then a pure
    * int-array sweep. */
  private lazy val rankVectors: java.util.HashMap[String, Array[Int]] = {
    val idx = langs.zipWithIndex.toMap
    val m = new java.util.HashMap[String, Array[Int]]()
    graft.text.LangProfile.profiles.foreach { case (l, g, r) =>
      var v = m.get(g)
      if (v == null) { v = Array.fill(langs.length)(-1); m.put(g, v) }
      v(idx(l)) = r
    }
    m
  }

  /** (predicted_lang, oop_distance) for one document, or null when the
    * normalized text has no trigram — the same absent-row contract as
    * the relational path. Tie-breaks: distance asc, then language in
    * codepoint order; distance == n·penalty (no overlap with ANY
    * profile) predicts "unknown". */
  def langId(s: UTF8String): InternalRow = {
    val topK = graft.text.LangProfile.topK
    val penalty = graft.text.LangProfile.missingPenalty
    val arr = NativeTextImpl.topCharGrams(s, 3, topK)
    val n = arr.numElements()
    if (n == 0) return null
    val nl = langs.length
    val dist = new Array[Long](nl)
    var i = 0
    while (i < n) {
      val v = rankVectors.get(arr.getUTF8String(i).toString)
      var li = 0
      if (v == null) {
        while (li < nl) { dist(li) += penalty; li += 1 }
      } else {
        val r = i + 1
        while (li < nl) {
          val pr = v(li)
          dist(li) += (if (pr < 0) penalty else math.abs(r.toLong - pr))
          li += 1
        }
      }
      i += 1
    }
    var bestLang: String = null
    var bestDist = Long.MaxValue
    var li = 0
    while (li < nl) {
      if (dist(li) < bestDist ||
          (dist(li) == bestDist &&
            NativeTextImpl.cpCompare(langs(li), bestLang) < 0)) {
        bestDist = dist(li)
        bestLang = langs(li)
      }
      li += 1
    }
    val lang = if (bestDist == n.toLong * penalty) "unknown" else bestLang
    new GenericInternalRow(
      Array[Any](UTF8String.fromString(lang), bestDist))
  }
}

/** string → struct<predicted_lang: string, oop_distance: long>,
  * codegen'd; null (absent) for sub-trigram docs. */
case class LangIdProfileExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("predicted_lang", StringType, nullable = false),
    StructField("oop_distance", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")
  override def prettyName: String = "graft_lang_id"

  override protected def nullSafeEval(input: Any): Any =
    NativeLangImpl.langId(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.NativeLangImpl.langId($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): LangIdProfileExpr =
    copy(child = newChild)
}

object NativeLang {
  /** Column wrapper. */
  def langIdProfile(text: Column): Column =
    GraftShims.column(LangIdProfileExpr(GraftShims.expression(text)))
}
