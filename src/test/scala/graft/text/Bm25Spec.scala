package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Bm25Spec extends AnyFunSuite with SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("quantized weights match hand computation (single term)") {
    // corpus: 4 docs, term 'cat' in docs 1 (tf=2, dl=4) and 2 (tf=1,
    // dl=2); N=4, L=4+2+3+3=12, avgq=3
    // df(cat)=2 → idf3 = (1000·(8−4+1)) div 5 = 1000
    // doc1: tfq = (1e6·22·2·3) div (10·2·3+3·3+9·4) = 132e6 div 105
    //     = 1257142; W = (1000·1257142) div 1000 = 1257142
    // doc2: tfq = (1e6·22·1·3) div (30+9+18) = 66e6 div 57 = 1157894
    val corpus = docsDf(Seq(
      1L -> "cat cat dog fish", 2L -> "cat bird",
      3L -> "dog fish bird", 4L -> "one two three"))
    val r = Bm25.quantizedTopK(corpus, "doc_id", "text", Seq("cat"), 10)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map(1L -> ((1L, 1257142L)), 2L -> ((1L, 1157894L))), r)
  }

  test("IDF ordering: rare term beats common term at equal tf/dl") {
    // 'rare' appears in 1 of 6 docs, 'common' in 5 of 6; docs 10/11
    // are identical in shape, differing only in which term they hold
    val corpus = docsDf(Seq(
      10L -> "rare aa bb cc", 11L -> "common aa bb cc",
      12L -> "common dd", 13L -> "common ee", 14L -> "common ff",
      15L -> "common gg"))
    val q = Bm25.quantizedTopK(corpus, "doc_id", "text",
        Seq("rare", "common"), 10)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(q(10L) > q(11L), q)
    val d = Bm25.scoreTopK(corpus, "doc_id", "text",
        Seq("rare", "common"), 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(d(10L) > d(11L), d)
  }

  test("tf saturation: doubling tf adds less than double score") {
    val corpus = docsDf(Seq(
      1L -> "cat aa bb cc dd ee ff gg",        // tf=1, dl=8
      2L -> "cat cat aa bb cc dd ee ff",       // tf=2, dl=8
      3L -> "cat cat cat cat aa bb cc dd",     // tf=4, dl=8
      4L -> "xx yy zz ww xx yy zz ww"))
    val q = Bm25.quantizedTopK(corpus, "doc_id", "text", Seq("cat"), 10)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(q(2L) > q(1L) && q(3L) > q(2L), q)          // monotone
    assert(q(2L) < 2 * q(1L) && q(3L) < 2 * q(2L), q)  // concave
  }

  test("length normalization: same tf, longer doc scores lower") {
    val corpus = docsDf(Seq(
      1L -> "cat aa", 2L -> "cat aa bb cc dd ee ff gg hh ii jj kk",
      3L -> "dog bird"))
    val q = Bm25.quantizedTopK(corpus, "doc_id", "text", Seq("cat"), 10)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(q(1L) > q(2L), q)
  }

  test("top-k contract: k bound, (score desc, doc_id) order, non-matchers absent") {
    val corpus = docsDf((1L to 20L).map(i =>
      i -> (if (i <= 10) Seq.fill(i.toInt)("cat").mkString(" ") + " pad"
            else "no match here")))
    val rows = Bm25.quantizedTopK(corpus, "doc_id", "text", Seq("cat"), 5)
      .collect()
    assert(rows.length == 5)
    val scores = rows.map(_.getLong(2)).toSeq
    assert(scores == scores.sorted.reverse, scores)
    assert(rows.map(_.getLong(0)).forall(_ <= 10L))
  }

  test("quantized and log-IDF renderings agree on fixture top-k membership") {
    // mixed-df term set over a vocabulary-structured corpus
    val corpus = docsDf((1L to 40L).map { i =>
      val terms = Seq.fill((i % 4).toInt)("merge") ++
        (if (i % 7 == 0) Seq("dup") else Nil) ++
        Seq.fill(3)("filler") ++ Seq.fill((i % 3).toInt)("batch")
      i -> terms.mkString(" ")
    })
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val q = ids(Bm25.quantizedTopK(corpus, "doc_id", "text",
      Seq("dup", "merge", "batch"), 8))
    val d = ids(Bm25.scoreTopK(corpus, "doc_id", "text",
      Seq("dup", "merge", "batch"), 8))
    // un-logged IDF over-weights rare terms relative to true BM25, so
    // exact rank equality is not the contract — membership overlap is
    assert((q intersect d).size >= 6, (q, d))
  }
}
