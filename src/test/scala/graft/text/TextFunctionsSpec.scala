package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite with SparkSpec {

  private def one(c: org.apache.spark.sql.Column): org.apache.spark.sql.Row = {
    import spark.implicits._
    Seq("the quick brown fox jumps over the lazy dog").toDF("text")
      .select(c.as("v")).collect()(0)
  }

  test("tokenShingles: sliding distinct n-grams; empty below n tokens") {
    import spark.implicits._
    val r = Seq("a b c d").toDF("text")
      .select(TextFunctions.tokenShingles(col("text"), 3).as("sh"))
      .collect()(0).getSeq[String](0)
    assert(r == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("text")
      .select(TextFunctions.tokenShingles(col("text"), 3).as("sh"))
      .collect()(0).getSeq[String](0)
    assert(short.isEmpty)
  }

  test("jaccard on known sets") {
    import spark.implicits._
    val j = Seq(("a b c d", "c d e f")).toDF("x", "y")
      .select(TextFunctions.jaccard(
        TextFunctions.tokenShingles(col("x"), 1),
        TextFunctions.tokenShingles(col("y"), 1)).as("j"))
      .collect()(0).getDouble(0)
    assert(math.abs(j - 2.0 / 6.0) < 1e-12)
  }

  test("langId votes stopwords, unknown when no hits") {
    import spark.implicits._
    val r = Seq("the cat of the house", "der hund ist ein tier", "zzz qqq")
      .toDF("text")
      .select(TextFunctions.langId(col("text")).as("l"))
      .collect().map(_.getString(0)).toSeq
    assert(r == Seq("en", "de", "unknown"))
  }

  test("repetition score: known values and short-doc zero") {
    import spark.implicits._
    def score(s: String): Double =
      Seq(s).toDF("text")
        .select(TextFunctions.repetitionScore(col("text"), 3).as("r"))
        .collect()(0).getDouble(0)
    // "a b c a b c a b c": 7 total 3-grams, 3 distinct → 1 − 3/7
    assert(math.abs(score("a b c a b c a b c") - (1.0 - 3.0 / 7.0)) < 1e-12)
    // all-distinct text repeats nothing
    assert(score("the quick brown fox jumps") == 0.0)
    // shorter than n tokens → 0, not NaN/negative
    assert(score("a b") == 0.0)
  }

  test("quality features on known text") {
    val f = one(TextFunctions.qualityFeatures(col("text")))
    val s = f.getStruct(0)
    assert(s.getAs[Int]("n_tokens") == 9)
    assert(s.getAs[Int]("n_chars") == 43)
    assert(s.getAs[Double]("distinct_token_ratio") == 8.0 / 9.0)
  }

  test("simhash: identical text → distance 0; near text close, far text far") {
    import spark.implicits._
    val df = Seq(
      ("a", "spark query join filter the fast table scan merge sort"),
      ("b", "spark query join filter the fast table scan merge sort"),
      ("c", "spark query join filter the fast table scan merge dup"),
      ("d", "zebra yak xylophone walrus vulture tiger snake rhino")
    ).toDF("id", "text")
      .select(col("id"), TextFunctions.simhash64(col("text")).as("h"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") == m("b"))
    assert(java.lang.Long.bitCount(m("a") ^ m("c")) <= 16)
    assert(java.lang.Long.bitCount(m("a") ^ m("d")) > 16)
  }

  test("redact scrubs emails and URLs, leaves clean text alone") {
    import spark.implicits._
    val df = Seq(
      "mail me at alice.smith+x@test-mail.org today",
      "see https://example.com/a?b=1#frag and http://x.io/y",
      "nothing sensitive here").toDF("t")
    val out = df.select(TextFunctions.redact(col("t"))).collect().map(_.getString(0))
    assert(out(0) == "mail me at <EMAIL> today")
    assert(out(1) == "see <URL> and <URL>")
    assert(out(2) == "nothing sensitive here")
  }

  test("redact scrubs phones, IPs, and ID numbers; shapes stay disjoint") {
    import spark.implicits._
    val df = Seq(
      "call +1 (555) 123-4567 maybe",
      "or (555) 123-4567 or 555-867-5309 or 555.867.5309",
      "host 10.0.0.1 and 255.255.255.0",
      "v6 2001:0db8:85a3:0000:0000:8a2e:0370:7334 and fe80:1:2:3",
      "ssn 078-05-1120 here",
      // an SSN is 3-2-4, a phone 3-3-4 — each placeholder is its own
      "id 078-05-1120 phone 555-867-5309",
      // a dotted quad must become <IP>, never a half-matched <PHONE>
      "ip 192.168.100.200 stays ip",
      "clock 12:34:56 is not an ip").toDF("t")
    val out = df.select(TextFunctions.redact(col("t"))).collect().map(_.getString(0))
    assert(out(0) == "call <PHONE> maybe")
    assert(out(1) == "or <PHONE> or <PHONE> or <PHONE>")
    assert(out(2) == "host <IP> and <IP>")
    assert(out(3) == "v6 <IP> and <IP>")
    assert(out(4) == "ssn <ID> here")
    assert(out(5) == "id <ID> phone <PHONE>")
    assert(out(6) == "ip <IP> stays ip")
    assert(out(7) == "clock 12:34:56 is not an ip")
  }

  test("fingerprint is a 32-hex md5, stable") {
    val fp = one(TextFunctions.minShingleFingerprint(col("text"), 3)).getString(0)
    assert(fp.matches("[0-9a-f]{32}"))
  }

  test("chunkTokens invariants on 200 random docs: cover, count, reassembly") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = Seq.fill(200) {
      val n = rnd.nextInt(60) + 1
      (1 to n).map(i => s"w${rnd.nextInt(50)}").mkString(" ")
    }
    val (size, stride) = (7, 7) // stride == size → exact partition of the doc
    val rows = docs.toDF("t")
      .select(col("t"), TextFunctions.chunkTokens(col("t"), size, stride).as("c"),
        TextFunctions.chunkTokensReference(col("t"), size, stride).as("ref"),
        TextFunctions.chunkTokensReference(col("t"), 5, 3).as("ref53"),
        TextFunctions.chunkTokens(col("t"), 5, 3).as("c53"))
      .collect()
    rows.foreach { r =>
      val (t, chunks) = (r.getString(0), r.getSeq[String](1))
      val n = t.split("\\s+").length
      // chunk count formula, full cover on reassembly, width bound
      assert(chunks.length == (n - 1) / stride + 1)
      assert(chunks.mkString(" ") == t) // non-overlapping chunks partition the doc
      assert(chunks.forall(_.split("\\s+").length <= size))
      // native expression == Column reference, partitioned AND overlapping
      assert(chunks == r.getSeq[String](2))
      assert(r.getSeq[String](4) == r.getSeq[String](3))
    }
  }

  test("chunkTokens: overlapping windows, short tail, empty doc yields none") {
    import spark.implicits._
    val ten = (1 to 10).map(i => s"t$i").mkString(" ")
    val df = Seq(ten, "a b", "", "   ").toDF("t")
    val rows = df.select(TextFunctions.chunkTokens(col("t"), 4, 3).as("c"))
      .collect().map(_.getSeq[String](0))
    // 10 tokens, size 4, stride 3 → starts 0,3,6,9 → 4 chunks, tail short
    assert(rows(0) == Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10"))
    assert(rows(1) == Seq("a b")) // shorter than one window: one chunk
    assert(rows(2).isEmpty && rows(3).isEmpty)
  }

  test("chunkTokens edge parity: NULL → [], tab/newline docs match the reference") {
    import spark.implicits._
    // NULL text: the reference contract is an EMPTY array, not NULL
    val nullRow = Seq(Option.empty[String]).toDF("t")
      .select(TextFunctions.chunkTokens(col("t"), 4, 3).as("c"),
        TextFunctions.chunkTokensReference(col("t"), 4, 3).as("ref"))
      .collect().head
    assert(nullRow.getSeq[String](0) == Seq.empty)
    assert(nullRow.getSeq[String](1) == Seq.empty)
    // whitespace without 0x20: SQL trim() keeps it → native must agree
    // with the Column reference (and so with the DuckDB oracle) exactly
    Seq("\t", "\n", " \t ", "a\tb", "a\nb c").foreach { t =>
      val r = Seq(t).toDF("t")
        .select(TextFunctions.chunkTokens(col("t"), 3, 2).as("c"),
          TextFunctions.chunkTokensReference(col("t"), 3, 2).as("ref"))
        .collect().head
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"input ${t.map(_.toInt)}")
    }
  }

  test("compressionRatio: repetitive text compresses far below prose; deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val prose = "The quarterly report shows diversified revenue growth " +
      "across regions, with notable variance in seasonal demand patterns."
    val repetitive = Seq.fill(40)("spam spam spam").mkString(" ")
    val df = Seq((1L, prose), (2L, repetitive), (3L, "")).toDF("id", "text")
      .select(col("id"),
        graft.text.TextFunctions.compressionRatio(col("text")).as("r"),
        graft.functions.NativeText.deflateLen(col("text")).as("dl"))
    val out = df.collect().map(r => r.getLong(0) ->
      (r.getDouble(1), r.getLong(2))).toMap
    assert(out(1L)._1 > 0.4 && out(1L)._1 <= 1.2, out(1L).toString)
    assert(out(2L)._1 < 0.15, s"repetitive ratio ${out(2L)}")
    assert(out(2L)._1 < out(1L)._1 / 3)
    assert(out(3L)._1 == 1.0)
    // deterministic across evaluations (same native zlib, same level)
    val again = df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again(1L) == out(1L)._2 && again(2L) == out(2L)._2)
  }
}
