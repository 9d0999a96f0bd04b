package graft.functions

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NativeMinHashSpec extends AnyFunSuite with SparkSpec {

  lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("projection signatures ≡ explode+aggregate signatures on the corpus") {
    val native = Dedup.minhashSignatures(docs, "doc_id", "text")
    val ref = Dedup.minhashSignaturesReference(docs, "doc_id", "text")
    assert(native.count() == ref.count())
    val joined = native.as("n").join(ref.as("r"), "doc_id")
      .filter(not(col("n.sig") <=> col("r.sig")))
    assert(joined.count() == 0)
  }

  test("signature stage is map-only: no shuffle in the plan") {
    val plan = Dedup.minhashSignatures(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("short docs (no shingles) are excluded, as in the aggregate form") {
    import spark.implicits._
    val df = Seq((1L, "one two"), (2L, "a b c d e f g")).toDF("id", "text")
    val sigs = Dedup.minhashSignatures(df, "id", "text").collect()
    assert(sigs.map(_.getLong(0)).toSeq == Seq(2L))
    assert(sigs.head.getSeq[Long](1).length == 64)
  }
}
