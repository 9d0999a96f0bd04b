package graft.text

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class BoilerplateSpec extends AnyFunSuite with SparkSpec {

  // "a b c d e f" shares the spans "a b c d e"/"b c d e f" across docs
  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f"),
      (3L, "a b c d e f x y z w v"),
      (4L, "p q r s t u"),
      (5L, "short doc")
    ).toDF("doc_id", "text")
  }

  test("frequentSpans finds spans shared by >= minDocs documents") {
    val freq = Boilerplate.frequentSpans(docs, "doc_id", "text", n = 5, minDocs = 3L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(freq == Map("a b c d e" -> 3L, "b c d e f" -> 3L))
  }

  test("within-doc repeats do not inflate document frequency") {
    import spark.implicits._
    val rep = Seq(
      (1L, "a b c d e a b c d e"), // span "a b c d e" occurs twice in doc 1
      (2L, "a b c d e f")
    ).toDF("doc_id", "text")
    val freq = Boilerplate.frequentSpans(rep, "doc_id", "text", n = 5, minDocs = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(freq("a b c d e") == 2L) // 2 docs, not 3 occurrences
  }

  test("dupSpanCoverage: interval union of cross-doc duplicated spans") {
    val cov = Boilerplate.dupSpanCoverage(docs, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // docs 1/2: spans at pos 0,1 both duplicated → union = min(5,1) + 5 = 6
    // doc 3: same two dup spans, 11 tokens → covered 6 of 11
    // doc 4: unique spans → 0; doc 5: too short for any span → 0
    assert(cov == Map(
      1L -> ((6L, 6L)), 2L -> ((6L, 6L)), 3L -> ((11L, 6L)),
      4L -> ((6L, 0L)), 5L -> ((2L, 0L))))
  }

  test("dupSpanCoverage: within-doc repeats of a shared span union correctly") {
    import spark.implicits._
    val rep = Seq(
      // "a b c d e" at pos 0 and pos 10 — disjoint intervals, 5 + 5
      (1L, "a b c d e x1 x2 x3 x4 x5 a b c d e"),
      (2L, "a b c d e")
    ).toDF("doc_id", "text")
    val cov = Boilerplate.dupSpanCoverage(rep, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(cov == Map(1L -> ((15L, 10L)), 2L -> ((5L, 5L))))
  }

  test("ngramContamination counts distinct eval-set spans per corpus doc") {
    import spark.implicits._
    val eval = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    val hits = Boilerplate.ngramContamination(docs, eval, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 1-3 contain both eval spans "a b c d e" and "b c d e f";
    // repeats inside a doc count once (distinct spans), clean/short docs absent
    assert(hits == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("ngramContamination: within-doc span repeats count once") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c d e a b c d e")).toDF("doc_id", "text")
    val eval = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    val hits = Boilerplate.ngramContamination(corpus, eval, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 1L))
  }

  test("ngramDecontaminate: any shared 8-gram drops; 7-token overlap and short docs survive") {
    import spark.implicits._
    val e = (1 to 12).map(i => s"e$i")
    val eval = Seq((100L, e.mkString(" "))).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, ("x1 x2 " + e.take(8).mkString(" ") + " y1")), // embeds e1..e8
      (2L, (e.take(7).mkString(" ") + " z1 z2 z3 z4 z5")), // only 7 consecutive
      (3L, "tiny doc")                                      // shorter than n
    ).toDF("doc_id", "text")
    val kept = Boilerplate.ngramDecontaminate(corpus, "doc_id", "text",
        eval, "text", n = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("ngramDecontaminate catches a near-verbatim leak the whole-doc fingerprint misses") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the flagship's EXACT stage keys on minShingleFingerprint: edit one
    // token inside the minimal 5-shingle and the doc-level fingerprint
    // changes (the leak sails through the exact stage) while long runs
    // of verbatim 8-grams survive — the case the near stage exists for
    val evalTokens = (0 until 20).map(i => s"w$i")
    val evalText = evalTokens.mkString(" ")
    def fp(text: String): String =
      Seq(Tuple1(text)).toDF("text")
        .select(TextFunctions.minShingleFingerprint(col("text"), 5).as("fp"))
        .head.getString(0)
    val evalFp = fp(evalText)
    val p = (0 until 20).find { i =>
      fp(evalTokens.updated(i, "EDITED").mkString(" ")) != evalFp
    }.get
    val leakText = evalTokens.updated(p, "EDITED").mkString(" ")
    // exact-fingerprint decontamination would KEEP this near-copy…
    assert(fp(leakText) != evalFp)
    val corpus = Seq(
      (1L, leakText),
      (2L, "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10")).toDF("doc_id", "text")
    val eval = Seq((100L, evalText)).toDF("doc_id", "text")
    val kept = Boilerplate.ngramDecontaminate(corpus, "doc_id", "text",
        eval, "text", n = 8)
      .select("doc_id").as[Long].collect().toSet
    // …the 8-gram rule drops it; the unrelated doc survives
    assert(kept == Set(2L))
  }

  test("contaminationReport: per-eval-doc exposure counts, clean eval docs absent") {
    import spark.implicits._
    val eval = Seq(
      (100L, "a b c d e f g"),   // spans a..e, b..f, c..g — leaked twice
      (101L, "p q r s t"),       // one span, leaked once
      (102L, "u v w x y")        // clean
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b c d e f zz"),    // shares a..e and b..f with 100
      (2L, "x a b c d e x"),     // shares a..e with 100
      (3L, "p q r s t leak")     // shares p..t with 101
    ).toDF("doc_id", "text")
    val rep = Boilerplate.contaminationReport(corpus, eval, "doc_id", "text",
        n = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rep == Map(
      100L -> ((2L, 2L)), // 2 corpus docs, 2 distinct exposed spans
      101L -> ((1L, 1L))))
  }

  test("removeDupSpans: corpus-first occurrence survives, later ones deleted") {
    val out = Boilerplate.removeDupSpans(docs, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "a b c d e f",      // first occurrence of both spans: intact
      2L -> "",                 // exact copy: fully deleted
      3L -> "x y z w v",        // shared prefix [0,5] deleted, tail kept
      4L -> "p q r s t u",      // unique spans: untouched
      5L -> "short doc"))       // shorter than the shingle: untouched
  }

  test("removeDupSpans: within-doc repeat of a cross-doc span is also deleted") {
    import spark.implicits._
    val rep = Seq(
      (1L, "a b c d e x1 x2 x3 x4 x5 a b c d e"),
      (2L, "a b c d e")
    ).toDF("doc_id", "text")
    val out = Boilerplate.removeDupSpans(rep, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a b c d e x1 x2 x3 x4 x5", 2L -> ""))
  }

  test("removeDupSpans: corpus order is (doc id, position), not position alone") {
    import spark.implicits._
    val shifted = Seq(
      (1L, "z1 z2 a b c d e"), // span at pos 2 of the LOWER doc id wins
      (2L, "a b c d e")
    ).toDF("doc_id", "text")
    val out = Boilerplate.removeDupSpans(shifted, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "z1 z2 a b c d e", 2L -> ""))
  }

  test("removeDupSpans preserves schema and non-text columns") {
    import spark.implicits._
    val extra = Seq(
      (1L, "a b c d e", "src1"),
      (2L, "a b c d e", "src2")
    ).toDF("doc_id", "text", "source")
    val out = Boilerplate.removeDupSpans(extra, "doc_id", "text", n = 5)
    assert(out.columns.toSeq == Seq("doc_id", "text", "source"))
    val rows = out.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(rows == Map(1L -> (("a b c d e", "src1")), 2L -> (("", "src2"))))
  }

  test("removeDupRuns: only runs >= minRun are deleted; short matches survive") {
    import spark.implicits._
    val rep = Seq(
      // first occurrences of everything: intact
      (1L, "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10 u1 u2 u3 u4 s1 s2 s3 s4 s5"),
      // 10-token copied run (>= 8: deleted) + unique middle +
      // 5-token shared shingle (< 8: SURVIVES, unlike removeDupSpans)
      (2L, "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10 v1 v2 v3 v4 s1 s2 s3 s4 s5")
    ).toDF("doc_id", "text")
    val out = Boilerplate.removeDupRuns(rep, "doc_id", "text", n = 5, minRun = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10 u1 u2 u3 u4 s1 s2 s3 s4 s5")
    assert(out(2L) == "v1 v2 v3 v4 s1 s2 s3 s4 s5")
    // the span-granularity operator would ALSO delete the short match
    val spans = Boilerplate.removeDupSpans(rep, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(spans(2L) == "v1 v2 v3 v4")
  }

  test("removeDupRuns: run length is exact; threshold is inclusive") {
    import spark.implicits._
    // an 8-token duplicated run with minRun = 8 deletes (>=, not >);
    // a 7-token run with minRun = 8 survives
    val eight = Seq(
      (1L, "a1 a2 a3 a4 a5 a6 a7 a8 z1 z2 z3 z4"),
      (2L, "a1 a2 a3 a4 a5 a6 a7 a8 y1 y2 y3 y4")
    ).toDF("doc_id", "text")
    val out8 = Boilerplate.removeDupRuns(eight, "doc_id", "text", n = 5, minRun = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out8(2L) == "y1 y2 y3 y4")
    val seven = Seq(
      (1L, "a1 a2 a3 a4 a5 a6 a7 z1 z2 z3 z4"),
      (2L, "a1 a2 a3 a4 a5 a6 a7 y1 y2 y3 y4")
    ).toDF("doc_id", "text")
    val out7 = Boilerplate.removeDupRuns(seven, "doc_id", "text", n = 5, minRun = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out7(2L) == "a1 a2 a3 a4 a5 a6 a7 y1 y2 y3 y4")
  }

  test("removeDupRuns: touching duplicated regions merge and threshold jointly") {
    import spark.implicits._
    // doc 3 contains two 5-token substrings duplicated from DIFFERENT
    // docs, adjacent to each other: marked positions 0 and 5 (gap = n)
    // merge into one 10-token run → deleted even though each piece
    // alone is < minRun = 8
    val m = Seq(
      (1L, "a1 a2 a3 a4 a5 q1 q2 q3 q4 q5 q6"),
      (2L, "b1 b2 b3 b4 b5 w1 w2 w3 w4 w5 w6"),
      (3L, "a1 a2 a3 a4 a5 b1 b2 b3 b4 b5 t1 t2 t3 t4")
    ).toDF("doc_id", "text")
    val out = Boilerplate.removeDupRuns(m, "doc_id", "text", n = 5, minRun = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(3L) == "t1 t2 t3 t4")
    assert(out(1L).startsWith("a1") && out(2L).startsWith("b1"))
  }

  test("removeDupRuns invariants on 100 random docs with planted duplicates") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val block = (1 to 12).map(i => s"blk$i").mkString(" ") // 12-token run
    val docs = (1 to 100).map { i =>
      val body = (1 to 30).map(_ => vocab(rnd.nextInt(vocab.size)))
      val withBlock =
        if (i % 4 == 0) block +: body.map(w => s"$w$i") // unique-ify body
        else body.map(w => s"$w$i")
      (i.toLong, withBlock.mkString(" "))
    }.toDF("doc_id", "text")
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Boilerplate.removeDupRuns(docs, "doc_id", "text",
        n = 5, minRun = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == orig.keySet)
    out.foreach { case (id, cleaned) =>
      val kept = cleaned.split("\\s+").filter(_.nonEmpty)
      val source = orig(id).split("\\s+")
      // every doc's output is a SUBSEQUENCE of its input tokens
      var j = 0
      kept.foreach { t =>
        while (j < source.length && source(j) != t) j += 1
        assert(j < source.length, s"doc $id: '$t' not in order in source")
        j += 1
      }
    }
    // the planted block survives in exactly the first carrier
    val carriers = orig.keys.filter(_ % 4 == 0).toSeq.sorted
    val surviving = out.filter(_._2.contains(block)).keys.toSeq
    assert(surviving == Seq(carriers.head), s"block survivors: $surviving")
  }

  test("removeDupRuns requires minRun >= n") {
    intercept[IllegalArgumentException] {
      Boilerplate.removeDupRuns(docs, "doc_id", "text", n = 5, minRun = 3)
    }
  }

  test("boilerplateRatio: contaminated docs score high, clean docs zero, short docs absent") {
    val ratio = Boilerplate.boilerplateRatio(docs, "doc_id", "text", n = 5, minDocs = 3L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // docs 1 & 2: both spans frequent → ratio 1.0
    assert(ratio(1L) == ((2L, 2L, 1.0)))
    assert(ratio(2L) == ((2L, 2L, 1.0)))
    // doc 3: 7 spans, 2 frequent
    assert(ratio(3L)._1 == 7L && ratio(3L)._2 == 2L)
    assert(math.abs(ratio(3L)._3 - 2.0 / 7.0) < 1e-12)
    // doc 4: no frequent spans
    assert(ratio(4L) == ((2L, 0L, 0.0)))
    // doc 5: shorter than the shingle size → absent
    assert(!ratio.contains(5L))
  }
}
