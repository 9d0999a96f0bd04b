package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LmScoreSpec extends AnyFunSuite with SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private val reference = docsDf(Seq(
    1L -> "the cat sat on the mat",
    2L -> "the cat ate the fish"))

  test("fluent text scores above garbled text (cross-entropy + quantized)") {
    val corpus = docsDf(Seq(
      10L -> "the cat sat",          // seen bigrams
      11L -> "zz qq ww rr"))         // unseen everything
    val ce = LmScore.crossEntropy(corpus, reference, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ce(10L) < ce(11L), ce)    // lower cross-entropy = more fluent
    val q = LmScore.quantizedScores(corpus, reference, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(q(10L) > q(11L), q)       // higher mean prob = more fluent
  }

  test("quantized score matches hand computation (B=1024, no collisions)") {
    // reference bigrams: the-cat ×2, cat-sat, sat-on, on-the, the-mat,
    //                    cat-ate, ate-the, the-fish
    // prefixes: c1(the)=4 (cat,cat,mat,fish), c1(cat)=2, c1(sat)=1,
    //           c1(on)=1, c1(ate)=1
    // doc "the cat sat": W(the,cat)=1e6·3 div (4+1024)=2918
    //                    W(cat,sat)=1e6·2 div (2+1024)=1949
    val corpus = docsDf(Seq(10L -> "the cat sat"))
    // distinct tokens must not collide in 1024 buckets for the hand
    // counts to hold
    val toks = reference.unionByName(corpus)
      .select(explode(TextFunctions.tokens(col("text"))).as("t"))
      .select(LmScore.tokenBucket(col("t"), 1024).as("b"))
    assert(toks.distinct().count() ==
      reference.unionByName(corpus)
        .select(explode(TextFunctions.tokens(col("text"))).as("t"))
        .select(col("t")).distinct().count())
    val r = LmScore.quantizedScores(corpus, reference, "doc_id", "text").head()
    assert(r.getLong(1) == 2L)                 // n_bigrams
    assert(r.getLong(2) == 2918L + 1949L, r)   // lm_score
  }

  test("conditional probabilities normalize: sum_v p(v|u) == 1 given smoothing") {
    val (c2, c1) = LmScore.train(reference, "doc_id", "text", buckets = 64)
    val joined = c2.join(c1, "bu")
    // for each prefix: sum over SEEN v of (c2+1) plus (B - seen)·1
    // unseen mass = c1 + B exactly
    val ok = joined.groupBy(col("bu"), col("c1"))
      .agg(sum(col("c2") + 1).as("seen_mass"), count(lit(1)).as("n_seen"))
      .withColumn("total", col("seen_mass") + (lit(64) - col("n_seen")))
      .filter(col("total") =!= col("c1") + 64)
    assert(ok.isEmpty, "smoothed conditional distribution does not normalize")
  }

  test("quantizedScores5: hand computation through every backoff level") {
    // reference: one sentence, so every order-5 window of it is seen
    val ref = docsDf(Seq(1L -> "a b c d e f"))
    // corpus doc 10 = exact copy prefix "a b c d e": full 5-gram hit
    //   W = 1e6·c5(a b c d e) div c4(a b c d) = 1e6·1 div 1 = 1000000
    // corpus doc 11 = "x b c d e": 5-gram unseen, 4-gram (b c d e) seen
    //   W = 4e5·c4(b c d e) div c3(b c d) = 400000·1 div 1 = 400000
    // corpus doc 12 = "x y c d e": back off to 3-gram (c d e)
    //   W = 160000·1 div c2(c d)=1 = 160000
    // corpus doc 13 = "x y z d e": 2-gram (d e)
    //   W = 64000·1 div c1(d)=1 = 64000
    // corpus doc 14 = "x y z w e": unigram floor, c1(e)=1, T1=6
    //   W = 25600·(1+1) div (6+1024) = 51200 div 1030 = 49
    val corpus = docsDf(Seq(
      10L -> "a b c d e", 11L -> "x b c d e", 12L -> "x y c d e",
      13L -> "x y z d e", 14L -> "x y z w e"))
    val r = LmScore.quantizedScores5(corpus, ref, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map(
      10L -> ((1L, 1000000L)), 11L -> ((1L, 400000L)),
      12L -> ((1L, 160000L)), 13L -> ((1L, 64000L)), 14L -> ((1L, 49L))), r)
  }

  test("5-gram diverges on bigram-plausible stitched text; bigram model can't tell") {
    // every BIGRAM of the stitched doc is seen in the reference, with
    // identical counts/contexts to the genuine doc — the bigram scorer
    // gives both the same score; order-5 backs off on the stitch seam
    val ref = docsDf(Seq(
      1L -> "the cat sat on the mat today",
      2L -> "the dog ran on the park today"))
    val genuine = "the cat sat on the mat today"
    val stitched = "the cat sat on the park today" // seam: …on the park…
    val corpus = docsDf(Seq(10L -> genuine, 11L -> stitched))
    val q2 = LmScore.quantizedScores(corpus, ref, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // mat/park are interchangeable at order 2: same score
    assert(q2(10L) == q2(11L), q2)
    val q5 = LmScore.quantizedScores5(corpus, ref, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(q5(10L) > q5(11L), q5) // order 5 pays 0.4^d at the seam
  }

  test("5-gram vs bigram rank sanity: garbled ranks last under both") {
    val corpus = docsDf(Seq(
      10L -> "the cat sat on the mat today",  // verbatim reference
      11L -> "the cat sat on the park today", // near-reference stitch
      12L -> "zz qq ww rr vv uu tt")) // garbage
    def ranks(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.orderBy(col("mean_prob_q").desc, col("doc_id"))
        .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    val ref = docsDf(Seq(
      1L -> "the cat sat on the mat today",
      2L -> "the dog ran on the park today"))
    val r2 = ranks(LmScore.quantizedScores(corpus, ref, "doc_id", "text"))
    val r5 = ranks(LmScore.quantizedScores5(corpus, ref, "doc_id", "text"))
    assert(r2.last == 12L && r5.last == 12L, (r2, r5))
    assert(r5 == Seq(10L, 11L, 12L), r5) // order 5 separates the stitch
  }

  test("quality bands: exact thirds, ordered head > middle > tail") {
    val corpus = docsDf((1L to 9L).map(i =>
      // doc i repeats seen bigram "the cat" i times then pads with
      // unseen junk — more repeats = higher mean probability
      i -> (Seq.fill(i.toInt)("the cat").mkString(" ") + " zz" * (10 - i.toInt))))
    val banded = LmScore.withQualityBands(
      LmScore.quantizedScores(corpus, reference, "doc_id", "text"))
    val byBand = banded.groupBy(col("quality_band"))
      .agg(count(lit(1)).as("n"),
        min(col("mean_prob_q")).as("lo"), max(col("mean_prob_q")).as("hi"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(byBand.view.mapValues(_._1).toMap ==
      Map("head" -> 3L, "middle" -> 3L, "tail" -> 3L), byBand)
    assert(byBand("head")._2 >= byBand("middle")._3)   // head min ≥ middle max
    assert(byBand("middle")._2 >= byBand("tail")._3, byBand)
  }
}
