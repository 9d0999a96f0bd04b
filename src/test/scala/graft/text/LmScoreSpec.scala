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
