package graft.text
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DsirTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    println("docs=" + docs.count())
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    time("warm count")(docs.count())
    time("docFeatures explode+md5")(
      Dsir.docFeatures(docs, "doc_id", "text", 4096).count())
    time("docBucketCounts")(
      Dsir.docBucketCounts(docs, "doc_id", "text", 4096).count())
    time("bucketCounts corpus")(
      Dsir.bucketCounts(docs, "doc_id", "text", 4096).count())
    time("quantizedWeights full")(
      Dsir.quantizedWeights(docs, docs.filter(col("lang")==="en"), "doc_id", "text", 4096)
        .write.format("noop").mode("overwrite").save())
    time("quantizedWeights again")(
      Dsir.quantizedWeights(docs, docs.filter(col("lang")==="en"), "doc_id", "text", 4096)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
