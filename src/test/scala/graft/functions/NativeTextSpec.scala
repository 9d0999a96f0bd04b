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
}
