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
}
