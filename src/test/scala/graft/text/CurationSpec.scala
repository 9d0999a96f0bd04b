package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite with SparkSpec {

  private def features(text: String) = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(Curation.gopherFeatures(col("text")).as("f"))
      .select("f.*").head()
  }

  test("gopher features: each metric on hand-built documents") {
    val f = features("the cat and dog have fun")
    assert(f.getAs[Long]("n_tokens") == 6)
    // (3+3+3+3+4+3) chars / 6 tokens
    assert(f.getAs[Double]("mean_word_len") == 19.0 / 6.0)
    assert(f.getAs[Long]("n_stop_words") == 3) // the, and, have
    assert(f.getAs[Double]("alpha_word_ratio") == 1.0)
    assert(f.getAs[Double]("symbol_ratio") == 0.0)

    // symbols: one '#' and one '...' over 3 tokens; '....' counts once
    val sym = features("x # y....")
    assert(sym.getAs[Double]("symbol_ratio") == 2.0 / 3.0)

    // numeric tokens don't count as alphabetic words
    assert(features("abc 123 d4").getAs[Double]("alpha_word_ratio") == 2.0 / 3.0)

    // line ratios: 2 of 4 bulleted, 1 of 4 ellipsis-terminated
    val lines = features("- a\n* b\nplain c...\nplain d")
    assert(lines.getAs[Double]("bullet_ratio") == 0.5)
    assert(lines.getAs[Double]("ellipsis_ratio") == 0.25)
  }

  test("gopher pass rule: boundaries and each failure mode") {
    import spark.implicits._
    def passed(text: String, minTokens: Long = 2L, minStop: Long = 1L) =
      Seq(text).toDF("text")
        .select(Curation.gopherPassed(Curation.gopherFeatures(col("text")),
          minTokens = minTokens, minStopWords = minStop).as("p"))
        .head().getBoolean(0)
    assert(passed("the quick brown fox jumps over all"))
    assert(!passed("the ox"))                       // mean word len < 3
    assert(!passed("the one", minTokens = 5))       // too few tokens
    assert(!passed("quick brown foxes jump"))       // no stop words
    assert(!passed("the ### quick ### brown ###"))  // symbol ratio
    assert(!passed("- the alpha\n- the beta"))      // bullet ratio
  }

  private def repFeatures(text: String) = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(Curation.repetitionFeatures(col("text")).as("f"))
      .select("f.*").head()
  }

  test("repetition features: duplicate line/paragraph fractions by hand") {
    // lines: [aa., b., aa., c] — the SECOND "aa." is the duplicate
    // (occurrences after the first) → 1/4; chars 3 of 3+2+3+1 = 3/9
    val f = repFeatures("aa.\nb.\naa.\nc")
    assert(f.getAs[Double]("dup_line_frac") == 0.25)
    assert(f.getAs[Double]("dup_line_char_frac") == 3.0 / 9.0)
    // one paragraph (no \n\n) → nothing duplicated at para granularity
    assert(f.getAs[Double]("dup_para_frac") == 0.0)
    assert(f.getAs[Double]("dup_para_char_frac") == 0.0)

    // paragraphs: [x, y, x] → second x duplicated → 1/3; chars 1 of 3
    val p = repFeatures("x\n\ny\n\nx")
    assert(p.getAs[Double]("dup_para_frac") == 1.0 / 3.0)
    assert(p.getAs[Double]("dup_para_char_frac") == 1.0 / 3.0)

    // all distinct → zero everywhere; empty text → guards, not NULL/NaN
    val d = repFeatures("a\nb\nc")
    assert(d.getAs[Double]("dup_line_frac") == 0.0)
    val e = repFeatures("")
    assert(e.getAs[Double]("dup_line_char_frac") == 0.0)
    assert(e.getAs[Double]("dup_para_char_frac") == 0.0)
  }

  test("repetition pass rule: each threshold fires independently") {
    import spark.implicits._
    val big = "B" * 50
    val docs = Seq(
      // no dups at all
      ("clean", "a.\nb.\nc.\nd.\ne.\nf.\ng.\nh.\ni.\nj."),
      // 2 extra of 5 lines = 0.40 > 0.30
      ("lines", "a.\na.\na.\nb.\nc."),
      // 2 extra of 4 paragraphs = 0.50 > 0.30
      ("paras", "xx\n\nxx\n\nxx\n\nyy"),
      // line FRACTION passes (1/10 = 0.10) but duplicated CHARS fail:
      // 50 of 108 = 0.46 > 0.20
      ("linechars", (Seq(big, big) ++ ('a' to 'h').map(_.toString))
        .mkString("\n"))
    ).toDF("id", "text")
    val out = docs.select(col("id"),
        Curation.repetitionPassed(
          Curation.repetitionFeatures(col("text"))).as("p"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out == Map("clean" -> true, "lines" -> false,
      "paras" -> false, "linechars" -> false))
  }

  test("top n-gram char fraction: counts, ties, and short-doc absence") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b a c"), (2L, "x y")).toDF("doc_id", "text")
    val rows = Curation.topNgramCharFrac(docs, "doc_id", "text", Seq(2, 3, 4))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getString(2), r.getLong(3), r.getDouble(4)))).toMap
    // doc 1 (11 chars): 2-grams [a b, b a, a b, b a, a c] — "a b"/"b a"
    // tie at 2, lexical asc → "a b"; 3-grams "a b a" ×2; 4-grams all
    // unique, len-tie → lexical asc "a b a b"
    assert(rows((1L, 2)) == (("a b", 2L, 6.0 / 11.0)))
    assert(rows((1L, 3)) == (("a b a", 2L, 10.0 / 11.0)))
    assert(rows((1L, 4)) == (("a b a b", 1L, 7.0 / 11.0)))
    // doc 2 has 2 tokens: a (2, n) row only for n = 2
    assert(rows((2L, 2)) == (("x y", 1L, 1.0)))
    assert(!rows.contains((2L, 3)) && !rows.contains((2L, 4)))
  }

  test("c4 line cleaning keeps exactly the compliant lines, in order") {
    import spark.implicits._
    val text = Seq(
      "Good line number one.",   // kept
      "short.",                  // < 3 words
      "no terminal punctuation", // no . ! ? \"
      "Another good line!",      // kept
      "the javascript line stays out.", // mentions javascript
      "A quoted good line\"",    // kept (quote terminal)
      "").mkString("\n")
    val cleaned = Seq(text).toDF("text")
      .select(Curation.c4CleanedText(col("text")).as("c"))
      .head().getString(0)
    assert(cleaned == Seq("Good line number one.", "Another good line!",
      "A quoted good line\"").mkString("\n"))
    // minWords is honored
    val loose = Seq(text).toDF("text")
      .select(Curation.c4CleanedText(col("text"), minWords = 1).as("c"))
      .head().getString(0)
    assert(loose.split("\n").contains("short."))
  }

  test("c4 doc drop: lorem ipsum and code braces, case-insensitive") {
    import spark.implicits._
    val res = Seq(
      "Fine document with text.",
      "Has Lorem Ipsum inside.",
      "function() { return 1; }").toDF("text")
      .select(col("text"), Curation.c4DocDrop(col("text")).as("d"))
      .collect().map(r => r.getString(0).take(4) -> r.getBoolean(1)).toMap
    assert(res == Map("Fine" -> false, "Has " -> true, "func" -> true))
  }

  test("blocklist: whole-token case-insensitive hits; spellings agree") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the Spam and more SPAM arrives"),     // 2 hits, case-folded
      (2L, "spammy classify assassin"),           // substrings must NOT hit
      (3L, "clean text entirely"),
      (4L, "spam")).toDF("doc_id", "text")
    val terms = Seq("spam", "JUNK")
    val hits = docs.select(col("doc_id"),
        Curation.blocklistHits(col("text"), terms).as("h"),
        Curation.blocklistPassed(col("text"), terms).as("p"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(hits == Map(1L -> ((2L, false)), 2L -> ((0L, true)),
      3L -> ((0L, true)), 4L -> ((1L, false))))
    // the broadcast-join spelling for big lists: identical counts,
    // zero-hit docs absent
    val joined = Curation.blocklistHitsJoin(docs, "doc_id", "text",
        terms.toDF("term"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(joined == Map(1L -> 2L, 4L -> 1L))
  }

  test("routedCurationFlags: per-language dispatch, substring gates, other bucket") {
    val s = spark
    import s.implicits._
    val routes = Seq(
      Curation.LangRoute("en", Seq("the", "and"), Seq("bad"),
        minTokens = 3, minStopWords = 2),
      // unspaced route: minTokens 1, substring matching carries the gates
      Curation.LangRoute("ja", Seq("の", "は"), Seq("禁"),
        minTokens = 1, minStopWords = 2))
    val docs = Seq(
      (1L, "en", "the cat and the dog"),   // passes both en gates
      (2L, "en", "the bad cat and dog"),   // blocklist hit
      (3L, "en", "the cat runs"),          // only 1 stopword -> quality fail
      (4L, "en", "the and"),               // 2 tokens < minTokens
      (5L, "ja", "これは猫の話"),            // unspaced: 1 token, both stops
      (6L, "ja", "これは禁の話"),            // blocklisted char
      (7L, "xx", "the cat and the dog")    // unrouted language
    ).toDF("doc_id", "lang", "text")
    val flags = Curation.routedCurationFlags(docs, "doc_id", "text",
        "lang", routes)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(flags == Map(
      1L -> (("en", true, true)),
      2L -> (("en", false, true)),
      3L -> (("en", true, false)),
      4L -> (("en", true, false)),
      5L -> (("ja", true, true)),
      6L -> (("ja", false, true)),
      7L -> (("other", false, false))), flags)
    val funnel = Curation.multilingualFunnel(docs, "doc_id", "text",
        "lang", routes)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // stages cumulative: quality counted among blocklist survivors
    assert(funnel == Map(
      "en" -> ((4L, 3L, 1L)),
      "ja" -> ((2L, 1L, 1L)),
      "other" -> ((1L, 0L, 0L))), funnel)
  }

  /** Adversarial corpus for the native-vs-HOF parity pins: whitespace
    * zoo (tab, VT, FF, CR), boundary/empty lines, multi-byte scripts,
    * the unicode lowercasing traps (U+0130 İ lowers to i + combining
    * dot; U+212A Kelvin lowers to ASCII k; final sigma is contextual),
    * duplicate lines/paragraphs, and NULL. */
  private def adversarialDocs = {
    import spark.implicits._
    Seq[Option[String]](
      Some(""), Some(" "), Some("\n"), Some("\n\n\n"),
      Some("\t\n\f\r x\t"),
      Some("the cat and dog have fun"),
      Some("- a\n* b\nplain c...\nplain d"),
      Some("  - padded bullet \n   * star   \n...\n .. \na..."),
      Some("Words here. And more!\nshort\nNo js mention of " +
        "JavaScript here.\nOk line with enough words?\n" +
        "\"Quoted line three words.\""),
      Some("This has JAVASCRİPT inside it."),
      Some("This has JAVASCRIPT plainly spelled."),
      Some("javascript"),
      Some("ΣΟΦΟΣ ΣΟΦΟΣ the end."),
      Some("K (kelvin) and Å signs here."),
      Some("multi  spaces\tand\ttabs between words."),
      Some("a\n\n a\n\na\n\n\na"),
      Some("lorem\nlorem\nlorem\npara\n\npara\n\npara"),
      Some("混ざった 言語 tokens the of"),
      Some("emoji 🙂 token and ascii."),
      None
    ).toDF("text").repartition(3)
  }

  test("native gate scorers ≡ HOF reference spellings on the " +
      "adversarial corpus (whitespace zoo, unicode lowering traps, " +
      "boundary lines, NULL)") {
    val docs = adversarialDocs
    def pin(name: String, native: org.apache.spark.sql.Column,
        ref: org.apache.spark.sql.Column): Unit = {
      val bad = docs.select(col("text"), native.as("n"), ref.as("r"))
        .filter(not(col("n") <=> col("r")))
      assert(bad.count() == 0,
        s"$name diverges from the HOF reference:\n" +
          bad.collect().mkString("\n"))
    }
    pin("gopherFeatures",
      Curation.gopherFeatures(col("text")),
      Curation.gopherFeaturesReference(col("text")))
    pin("repetitionFeatures",
      Curation.repetitionFeatures(col("text")),
      Curation.repetitionFeaturesReference(col("text")))
    pin("c4CleanedText(3)",
      Curation.c4CleanedText(col("text")),
      Curation.c4CleanedTextReference(col("text")))
    pin("c4CleanedText(1)",
      Curation.c4CleanedText(col("text"), minWords = 1),
      Curation.c4CleanedTextReference(col("text"), minWords = 1))
    val terms = Seq("JavaScript", "the", "σοφός",
      "k", "plain")
    pin("blocklistHits",
      Curation.blocklistHits(col("text"), terms),
      Curation.blocklistHitsReference(col("text"), terms))
    val subs = Seq("java", "JAVASCRIPT", "ΣΟ", "\n\n", "...", " ")
    pin("containsCount",
      Curation.containsCount(col("text"), subs),
      Curation.containsCountReference(col("text"), subs))
  }

  test("gopherGate (single-pass boolean) ≡ gopherPassed over the HOF " +
      "reference features, across threshold combos and NULL") {
    val docs = adversarialDocs
    for ((minT, maxT, minS) <- Seq((50L, 100000L, 2L), (2L, 100L, 1L),
        (1L, 100000L, 0L))) {
      val bad = docs.select(
          Curation.gopherGate(col("text"), minT, maxT, minS).as("n"),
          Curation.gopherPassed(
            Curation.gopherFeaturesReference(col("text")), minT, maxT,
            minS).as("r"))
        .filter(not(col("n") <=> col("r")))
      assert(bad.count() == 0,
        s"($minT,$maxT,$minS): " + bad.collect().mkString("\n"))
    }
  }

  test("gate plans carry no CodegenFallback expression; the retired " +
      "HOF classes ARE CodegenFallback (the tax the natives remove)") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    val docs = adversarialDocs.filter(col("text").isNotNull)
    val gates = docs.select(
      Curation.gopherFeatures(col("text")).as("g"),
      Curation.repetitionFeatures(col("text")).as("rep"),
      Curation.c4CleanedText(col("text")).as("c4"),
      Curation.blocklistHits(col("text"), Seq("bad", "worse")).as("bl"),
      Curation.containsCount(col("text"), Seq("x", "y")).as("cc"))
      .filter(Curation.gopherPassed(col("g")) ||
        Curation.repetitionPassed(col("rep")) || col("c4") =!= "")
    gates.collect()
    val found = graft.PlanProbe.codegenFallbacks(gates)
    assert(found.isEmpty,
      s"interpreted expressions on the gate path: $found")
    // reflection pins: what we removed was interpreted; what we added
    // is compiled
    for (c <- Seq(
        classOf[org.apache.spark.sql.catalyst.expressions.ArrayFilter],
        classOf[org.apache.spark.sql.catalyst.expressions.ArrayAggregate],
        classOf[org.apache.spark.sql.catalyst.expressions.ArrayTransform]))
      assert(classOf[CodegenFallback].isAssignableFrom(c), c.toString)
    for (c <- Seq(classOf[graft.functions.AlphaTokenCountExpr],
        classOf[graft.functions.GopherLineStatsExpr],
        classOf[graft.functions.DupUnitStatsExpr],
        classOf[graft.functions.TokenSetHitsExpr],
        classOf[graft.functions.ContainsCountExpr],
        classOf[graft.functions.C4CleanExpr]))
      assert(!classOf[CodegenFallback].isAssignableFrom(c), c.toString)
  }
}
