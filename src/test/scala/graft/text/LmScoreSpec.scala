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

  // ---- interpolated Kneser-Ney (quantizedScoresKN) ----

  /** Test-side md5-bucket twin of Dsir.featureBucket: first 15 hex
    * chars of md5 parsed base 16, mod B — independent code path. */
  private def bucket(tok: String, b: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tok.getBytes("UTF-8"))
      .map(x => f"$x%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % b
  }

  /** Plain-Scala reference implementation of the SAME fixed-point KN
    * estimator (Q=1e6, D=3/4), computed with Maps and integer / —
    * an independent derivation the Spark join pyramid must match
    * exactly. Returns docId -> (n_ngrams, lm_score). */
  private def knNaive(train: Seq[String], score: Seq[(Long, String)],
      b: Int): Map[Long, (Long, Long)] = {
    def toks(s: String): Seq[Long] =
      s.trim.split("\\s+").toSeq.filter(_.nonEmpty).map(bucket(_, b))
    def windows(docs: Seq[Seq[Long]], k: Int): Seq[Seq[Long]] =
      docs.flatMap(d => if (d.length >= k) d.sliding(k).toSeq else Nil)
    val tdocs = train.map(toks)
    val c = (1 to 5).map(k =>
      k -> windows(tdocs, k).groupBy(identity).view
        .mapValues(_.size.toLong).toMap).toMap
    def byKey(m: Map[Seq[Long], Long], f: Seq[Long] => Seq[Long]) =
      m.keys.groupBy(f).view.mapValues(_.size.toLong).toMap
    val typ5 = byKey(c(5), _.take(4)); val cc4 = byKey(c(5), _.drop(1))
    val mid4 = byKey(c(5), _.slice(1, 4)); val typ4 = byKey(c(4), _.take(3))
    val cc3 = byKey(c(4), _.drop(1)); val mid3 = byKey(c(4), _.slice(1, 3))
    val typ3 = byKey(c(3), _.take(2)); val cc2 = byKey(c(3), _.drop(1))
    val mid2 = byKey(c(3), _.slice(1, 2)); val typ2 = byKey(c(2), _.take(1))
    val cc1 = byKey(c(2), _.drop(1))
    val ccTot = c(2).size.toLong; val uTot = cc1.size.toLong
    val p0 = 1000000L / b
    def lvl(num: Long, typ: Long, den: Long, prev: Long): Long =
      if (den > 0)
        ((if (num > 0) (4 * num - 3) * 1000000L else 0L) + 3 * typ * prev) /
          (4 * den)
      else prev
    def w(win: Seq[Long]): Long = {
      val p1 = lvl(cc1.getOrElse(win.slice(4, 5), 0L), uTot, ccTot, p0)
      val p2 = lvl(cc2.getOrElse(win.slice(3, 5), 0L),
        typ2.getOrElse(win.slice(3, 4), 0L),
        mid2.getOrElse(win.slice(3, 4), 0L), p1)
      val p3 = lvl(cc3.getOrElse(win.slice(2, 5), 0L),
        typ3.getOrElse(win.slice(2, 4), 0L),
        mid3.getOrElse(win.slice(2, 4), 0L), p2)
      val p4 = lvl(cc4.getOrElse(win.slice(1, 5), 0L),
        typ4.getOrElse(win.slice(1, 4), 0L),
        mid4.getOrElse(win.slice(1, 4), 0L), p3)
      lvl(c(5).getOrElse(win, 0L), typ5.getOrElse(win.take(4), 0L),
        c(4).getOrElse(win.take(4), 0L), p4)
    }
    score.map { case (id, text) =>
      val t = toks(text)
      val ws = if (t.length >= 5) t.sliding(5).map(w).toSeq else Nil
      id -> ((ws.length.toLong, ws.sum))
    }.filter(_._2._1 > 0).toMap
  }

  test("KN matches the independent plain-Scala fixed-point reference exactly") {
    val train = Seq(
      "the cat sat on the mat today",
      "the dog ran on the park today",
      "a cat and a dog met on the mat",
      "the cat sat on the mat again and again")
    val score = Seq[(Long, String)](
      10L -> "the cat sat on the mat today",     // verbatim
      11L -> "the cat sat on the park today",    // stitch seam
      12L -> "a dog sat on the mat",             // partial contexts
      13L -> "zz qq ww rr vv uu",                // everything unseen
      14L -> "on the mat",                       // < 5 tokens: absent
      15L -> "today the again cat on mat dog a") // shuffled vocab
    val expected = knNaive(train, score, 1024)
    val got = LmScore.quantizedScoresKN(
        docsDf(score), docsDf(train.zipWithIndex.map {
          case (t, i) => (100L + i) -> t }), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected, s"got=$got expected=$expected")
    assert(!got.contains(14L)) // sub-5-token doc absent on both sides
  }

  test("KN Francisco effect: continuation counts demote one-collocation tokens") {
    // 'francisco' and 'common' have IDENTICAL raw unigram counts (5),
    // but francisco only ever follows 'san' (continuation count 1)
    // while common follows five distinct words (continuation count 5).
    // In a NOVEL context, stupid backoff ties them; KN ranks common up.
    val ref = docsDf(Seq(
      1L -> "go to san francisco now", 2L -> "fly to san francisco again",
      3L -> "ride to san francisco soon", 4L -> "walk to san francisco next",
      5L -> "run to san francisco fast",
      6L -> "a1 common b1", 7L -> "a2 common b2", 8L -> "a3 common b3",
      9L -> "a4 common b4", 10L -> "a5 common b5"))
    val corpus = docsDf(Seq(
      20L -> "q1 q2 q3 q4 francisco",
      21L -> "q1 q2 q3 q4 common"))
    // guard: distinct tokens must not collide in 1024 buckets
    val all = ref.unionByName(corpus)
      .select(explode(TextFunctions.tokens(col("text"))).as("t"))
    assert(all.select(LmScore.tokenBucket(col("t"), 1024)).distinct().count()
      == all.select(col("t")).distinct().count())
    val sb = LmScore.quantizedScores5(corpus, ref, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sb(20L) == sb(21L), s"stupid backoff should tie: $sb")
    val kn = LmScore.quantizedScoresKN(corpus, ref, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(kn(21L) > kn(20L), s"KN should prefer high-continuation: $kn")
  }

  test("native ngramWindowsOf ≡ HOF reference for k in {1,2,5} on real " +
      "docs; the windows projection carries no CodegenFallback") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val arr = LmScore.bucketArray(docs, "doc_id", "text", 1 << 20)
      .localCheckpoint()
    for (k <- Seq(1, 2, 5)) {
      val native = LmScore.ngramWindowsOf(arr, k)
      val ref = LmScore.ngramWindowsOfReference(arr, k)
      assert(native.schema == ref.schema, s"k=$k schema")
      val cols = native.columns.map(col)
      val n = native.groupBy(cols: _*).count()
      val r = ref.groupBy(cols: _*).count()
      assert(n.join(r, native.columns.toSeq :+ "count", "full_outer")
        .count() == r.count(), s"k=$k windows multiset")
      val found = graft.PlanProbe.codegenFallbacks(
        { native.collect(); native })
      assert(found.isEmpty, s"k=$k interpreted expressions: $found")
    }
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
