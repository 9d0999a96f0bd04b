package graft.functions

import graft.SparkSpec
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity of the native codegen expressions with the pure-Column
  * reference formulations, over the real corpus. */
class NativeTextSpec extends AnyFunSuite with SparkSpec {

  lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("native simhash64 ≡ Column-reference simhash64 on the corpus") {
    val cmp = docs.select(
      TextFunctions.simhash64(col("text")).as("native"),
      TextFunctions.simhash64Reference(col("text")).as("ref"))
    assert(cmp.filter(col("native") =!= col("ref")).count() == 0)
  }

  test("native shingles ≡ Column-reference shingles (values and order)") {
    val cmp = docs.select(
      TextFunctions.tokenShingles(col("text"), 5).as("native"),
      TextFunctions.tokenShinglesReference(col("text"), 5).as("ref"))
    assert(cmp.filter(not(col("native") <=> col("ref"))).count() == 0)
  }

  test("native ALL-shingles ≡ Column-reference (occurrences and order)") {
    for (n <- Seq(2, 5)) {
      val cmp = docs.select(
        TextFunctions.tokenShinglesAll(col("text"), n).as("native"),
        TextFunctions.tokenShinglesAllReference(col("text"), n).as("ref"))
      assert(cmp.filter(not(col("native") <=> col("ref"))).count() == 0, s"n=$n")
    }
    // short/empty edges mirror the reference's guard
    import spark.implicits._
    val edge = Seq("one two three", "one", "", "a a").toDF("text")
      .select(TextFunctions.tokenShinglesAll(col("text"), 2).as("sh")).collect()
    assert(edge(0).getSeq[String](0) == Seq("one two", "two three"))
    assert(edge(1).getSeq[String](0).isEmpty)
    assert(edge(3).getSeq[String](0) == Seq("a a"))
  }

  test("native bucketArray ≡ Column-reference md5 buckets: corpus, " +
      "whitespace edges, unicode, null") {
    import spark.implicits._
    val ref = graft.text.LmScore.bucketArrayReference(docs, "doc_id",
      "text", 1024).withColumnRenamed("bs", "ref")
    val got = graft.text.LmScore.bucketArray(docs, "doc_id", "text", 1024)
      .withColumnRenamed("bs", "native")
    val cmp = got.join(ref, Seq("doc_id"))
    assert(cmp.filter(col("native") =!= col("ref")).count() == 0)
    // whitespace-edge texts: leading/trailing spaces produce the same
    // empty tokens (split limit -1 semantics), multi-space runs
    // collapse, unicode hashes over UTF-8 bytes — and null stays null
    val edge = Seq(Option(""), Option(" "), Option("  a  b "),
      Option("café 日本語 tok"), Option("one"),
      None).toDF("text").withColumn("doc_id", monotonically_increasing_id())
    val eCmp = graft.text.LmScore
      .bucketArray(edge, "doc_id", "text", 7)
      .withColumnRenamed("bs", "native")
      .join(graft.text.LmScore
        .bucketArrayReference(edge, "doc_id", "text", 7)
        .withColumnRenamed("bs", "ref"), Seq("doc_id"))
    val bad = eCmp.filter(
      (col("native").isNull =!= col("ref").isNull) ||
        (col("native").isNotNull && (col("native") =!= col("ref"))))
    assert(bad.count() == 0, bad.collect().mkString("\n"))
  }

  test("native minShingleFingerprint ≡ Column reference: corpus, " +
      "short docs null, null text") {
    import spark.implicits._
    val cmp = docs.select(
      graft.text.TextFunctions.minShingleFingerprint(col("text"), 5)
        .as("native"),
      graft.text.TextFunctions.minShingleFingerprintReference(col("text"), 5)
        .as("ref"))
    val bad = cmp.filter(
      (col("native").isNull =!= col("ref").isNull) ||
        (col("native").isNotNull && (col("native") =!= col("ref"))))
    assert(bad.count() == 0, bad.collect().mkString("\n"))
    val edge = Seq(Option("a b c"), Option("one two three four five six"),
      Option(""), None).toDF("text")
    val eCmp = edge.select(
      graft.text.TextFunctions.minShingleFingerprint(col("text"), 5)
        .as("native"),
      graft.text.TextFunctions.minShingleFingerprintReference(col("text"), 5)
        .as("ref"))
    val eBad = eCmp.filter(
      (col("native").isNull =!= col("ref").isNull) ||
        (col("native").isNotNull && (col("native") =!= col("ref"))))
    assert(eBad.count() == 0, eBad.collect().mkString("\n"))
  }

  test("edge cases: short docs, empty-ish strings, nulls") {
    import spark.implicits._
    val df = Seq("one two three", "one", "", "a a a a a a").toDF("text")
    val out = df.select(
      TextFunctions.tokenShingles(col("text"), 5).as("sh"),
      TextFunctions.simhash64(col("text")).as("h")).collect()
    assert(out(0).getSeq[String](0).isEmpty) // 3 tokens < 5
    assert(out(1).getSeq[String](0).isEmpty)
    // repeated tokens → single distinct shingle
    val rep = df.select(TextFunctions.tokenShingles(col("text"), 5))
      .collect()(3).getSeq[String](0)
    assert(rep == Seq("a a a a a"))
    // null text → null outputs
    val nulls = Seq[Option[String]](None).toDF("text")
      .select(TextFunctions.simhash64(col("text")),
        TextFunctions.tokenShingles(col("text"), 5)).head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("expressions stay inside whole-stage codegen") {
    val plan = docs.select(TextFunctions.simhash64(col("text")),
      TextFunctions.tokenShingles(col("text"), 5))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into WholeStageCodegen
    assert(plan.contains("*(1) Project"), plan.take(500))
  }

  test("nfcNormalize ≡ JDK Normalizer; identity fast path; codegen") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      "plain ascii stays",
      "cafe\u0301",         // e + combining acute (decomposed)
      "A\u030A ring",       // A + combining ring (decomposed)
      "\u212B angstrom",    // ANGSTROM SIGN singleton
      "caf\u00e9 already composed",
      "mixed cafe\u0301 and caf\u00e9",
      "")
    val got = cases.toDF("t")
      .select(NativeText.nfcNormalize(col("t"))).as[String].collect()
    val expect = cases.map(
      java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(got.toSeq == expect)
    // decomposed and composed spellings collide post-NFC
    assert(got(1) == "caf\u00e9" && got(3).startsWith("\u00c5"))
    // null → null
    assert(Seq(Option.empty[String]).toDF("t")
      .select(NativeText.nfcNormalize(col("t"))).head().isNullAt(0))
    // codegen over a real scan
    val plan = docs.select(NativeText.nfcNormalize(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan.take(500))
  }

  test("lcsLength ≡ brute-force LCS on random token arrays + edges") {
    val s = spark
    import s.implicits._
    // reference: full-table DP, the textbook formulation
    def bf(a: Seq[String], b: Seq[String]): Long = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
                   else math.max(dp(i - 1)(j), dp(i)(j - 1))
      dp(a.length)(b.length).toLong
    }
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e")
    val cases = Seq(
      (Seq.empty[String], Seq("a", "b")),            // empty left
      (Seq("a", "b", "c"), Seq.empty[String]),       // empty right
      (Seq("x"), Seq("x")),                          // identical singleton
      (Seq("a", "b", "c", "d"), Seq("a", "b", "c", "d")), // identical
      (Seq("a", "b", "c"), Seq("c", "b", "a")),      // reversal → 1
      (Seq("the", "cat", "sat"), Seq("a", "cat", "sat", "down"))
    ) ++ (1 to 40).map { _ =>
      (Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(5))),
       Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(5))))
    }
    val got = cases.toDF("a", "b")
      .select(NativeText.lcsLength(col("a"), col("b"))).as[Long].collect()
    assert(got.toSeq == cases.map { case (a, b) => bf(a, b) },
      "LCS mismatch vs brute force")
    // null input → null output (BinaryExpression default null handling)
    val n = Seq((Some(Seq("a")), Option.empty[Seq[String]]))
      .toDF("a", "b").select(NativeText.lcsLength(col("a"), col("b"))).head()
    assert(n.isNullAt(0))
    // codegen path actually exercised over a real scan (a local
    // relation constant-folds to LocalTableScan with no Project)
    val plan = docs.select(NativeText.lcsLength(
        split(col("text"), "\\s+"), slice(split(col("text"), "\\s+"), 1, 5)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan.take(500))
  }
}
