package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LangProfileSpec extends AnyFunSuite with SparkSpec {

  test("trigrams + profileOf: hand-checked normalization, ranking, ties") {
    assert(LangProfile.trigrams("ab") == Seq.empty)
    assert(LangProfile.trigrams("a b") == Seq("a_b"))
    // "aaab": aaa, aab — counts 1,1 → tie broken by gram asc
    assert(LangProfile.profileOf("aaab") == Seq(("aaa", 1), ("aab", 2)))
    // repeated gram outranks lexicographically-smaller singleton
    val p = LangProfile.profileOf("xyzxyz")
    // grams: xyz,yzx,zxy,xyz → xyz count 2 first, then yzx, zxy
    assert(p == Seq(("xyz", 1), ("yzx", 2), ("zxy", 3)))
  }

  test("committed profiles: 28 languages incl. non-Latin scripts, ranks 1..K") {
    val langs = LangProfile.profiles.map(_._1).distinct
    assert(langs.size == 28)
    assert(langs == LangProfile.samples.map(_._1))
    // the non-Latin block is present — these exercise codepaths an
    // ASCII fixture never touches
    assert(Seq("ru", "uk", "bg", "el", "he", "ar", "hi", "th", "ja", "ko")
      .forall(langs.contains))
    for (l <- langs) {
      val ranks = LangProfile.profiles.filter(_._1 == l).map(_._3)
      assert(ranks == (1 to ranks.max))
      assert(ranks.size <= LangProfile.topK)
    }
    // profiles of distinct languages are distinct gram sets
    val sets = langs.map(l =>
      LangProfile.profiles.filter(_._1 == l).map(_._2).toSet)
    assert(sets.distinct.size == langs.size)
  }

  test("each UDHR sample classifies as its own language") {
    val s = spark
    import s.implicits._
    val docs = LangProfile.samples.zipWithIndex
      .map { case ((lang, text), i) => (i.toLong, text, lang) }
      .toDF("doc_id", "text", "lang")
    val out = LangProfile.langIdProfile(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .collect()
    assert(out.length == LangProfile.samples.size)
    out.foreach(r => assert(r.getAs[String]("predicted_lang") ==
      r.getAs[String]("lang"), r.toString))
  }

  test("unseen non-Latin sentences classify to the right script/language") {
    val s = spark
    import s.implicits._
    // unseen sentences drawing on each language's ordinary function
    // words — what profile overlap actually keys on (a one-sentence
    // reference profile cannot cover arbitrary open-class vocabulary;
    // Cavnar-Trenkle built 300-gram profiles from whole documents)
    val docs = Seq(
      (1L, "Люди рождаются свободными и поступают в духе братства каждое утро.", "ru"),
      (2L, "Οι άνθρωποι γεννιούνται ελεύθεροι και οφείλουν να συμπεριφέρονται με πνεύμα αδελφοσύνης.", "el"),
      (3L, "בני האדם נוהגים ברוח של אחווה ובתבונה ובמצפון בכל בוקר.", "he"),
      (4L, "人間は理性と良心とをもって、互いに自由について行動しなければならない。", "ja"),
      (5L, "모든 인간은 이성과 양심의 정신으로 자유롭게 행동하여야 한다.", "ko"),
      (6L, "มนุษย์มีเหตุผลและมโนธรรมและควรปฏิบัติต่อกันในศักดิ์ศรีและสิทธิ", "th")
    ).toDF("doc_id", "text", "lang")
    val out = LangProfile.langIdProfile(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("predicted_lang"))
      .toMap
    // within Cyrillic a short sentence can land on a sibling (ru/uk/bg
    // share most frequent trigrams) — require the family; every other
    // script must be exact
    val cyrillic = Set("ru", "uk", "bg")
    docs.collect().foreach { r =>
      val got = out(r.getLong(0))
      val want = r.getString(2)
      if (cyrillic(want))
        assert(cyrillic(got), s"doc ${r.getLong(0)}: got $got, want Cyrillic")
      else assert(got == want,
        s"doc ${r.getLong(0)}: got $got, want $want")
    }
  }

  test("zero profile overlap predicts unknown, not the alphabetically-first lang") {
    val s = spark
    import s.implicits._
    // Armenian script — no committed profile shares a single trigram
    val docs = Seq((1L, "Բոլոր մարդիկ ծնվում են ազատ ու հավասար")).toDF("doc_id", "text")
    val out = LangProfile.langIdProfile(docs, "doc_id", "text").collect().head
    assert(out.getAs[String]("predicted_lang") == "unknown")
  }

  test("unseen sentences classify correctly; sub-trigram docs are absent") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "The weather in the mountains was beautiful this morning and the children were happy.", "en"),
      (2L, "Die Kinder spielen gern im Garten und die Sonne scheint über der Stadt.", "de"),
      (3L, "Les enfants jouent dans le jardin et le soleil brille sur la ville.", "fr"),
      (4L, "Los niños juegan en el jardín y el sol brilla sobre la ciudad.", "es"),
      (5L, "ab", "none")).toDF("doc_id", "text", "lang")
    val out = LangProfile.langIdProfile(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[String]("predicted_lang"), r.getAs[Long]("oop_distance"))).toMap
    assert(!out.contains(5L))
    assert(out(1L)._1 == "en", out(1L).toString)
    assert(out(2L)._1 == "de", out(2L).toString)
    assert(out(3L)._1 == "fr", out(3L).toString)
    assert(out(4L)._1 == "es", out(4L).toString)
    // distance is bounded by K · missingPenalty
    out.values.foreach { case (_, d) =>
      assert(d >= 0 && d <= LangProfile.topK * LangProfile.missingPenalty)
    }
  }

  test("native topCharGrams == plain-Scala profileOf on samples and edges") {
    val s = spark
    import s.implicits._
    val texts = LangProfile.samples.map(_._2) ++ Seq(
      "", "ab", "a b", "aaab", "xyzxyz", "  Tabs\tand\nNEWLINES  here ",
      "MIXED Case   runs")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val native = df.select(col("id"),
        graft.functions.NativeText.topCharGrams(col("text"), 3,
          LangProfile.topK).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(native(i.toLong) == LangProfile.profileOf(t).map(_._1),
        s"mismatch on <$t>")
    }
  }

  test("native expression == relational reference on samples + corpus slice") {
    val s = spark
    import s.implicits._
    // ids must be globally unique: the reference path aggregates by
    // doc_id, so a collision would merge two documents' grams
    val fromSamples = LangProfile.samples.zipWithIndex
      .map { case ((_, text), i) => (100000L + i, text) }
    val edges = Seq((200900L, ""), (200901L, "ab"), (200902L, "a b c"),
      (200903L, "Բոլոր մարդիկ ծնվում են ազատ"))
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).limit(60)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val docs = (fromSamples ++ edges ++ corpus).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val native = rows(LangProfile.langIdProfile(docs, "doc_id", "text"))
    val ref = rows(LangProfile.langIdProfileReference(docs, "doc_id", "text"))
    assert(native == ref,
      s"native/reference diverge: ${(native diff ref) ++ (ref diff native)}")
  }

  test("plan: native path is map-only; reference keeps heap + broadcast") {
    // parquet-backed input: a literal local table would constant-fold
    // the whole classification at plan time
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    // the production path classifies in one compiled projection — no
    // exchange anywhere in the plan
    val nativePlan = LangProfile.langIdProfile(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!nativePlan.contains("Exchange"), nativePlan.take(1500))
    assert(nativePlan.contains("graft_lang_id"), nativePlan.take(1500))
    val plan = LangProfile.langIdProfileReference(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan.take(1500))
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
  }
}
