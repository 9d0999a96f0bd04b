package graft.functions

import graft.SparkSpec
import graft.similarity.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NativeVecSpec extends AnyFunSuite with SparkSpec {

  test("native dotQ ≡ Column-reference dotQ over real embeddings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.select(Similarity.quantize(col("embedding")).as("q"))
    val cmp = q.select(
      Similarity.dotQ(col("q"), col("q")).as("native"),
      Similarity.dotQReference(col("q"), col("q")).as("ref"))
    assert(cmp.filter(col("native") =!= col("ref")).count() == 0)
  }

  test("dotQ known values and null propagation") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
    assert(df.select(graft.functions.NativeVec.dotQ(col("a"), col("b")))
      .head().getLong(0) == 32L)
    val n = Seq((Option.empty[Seq[Long]], Option(Seq(1L)))).toDF("a", "b")
      .select(NativeVec.dotQ(col("a"), col("b"))).head()
    assert(n.isNullAt(0))
  }
}
