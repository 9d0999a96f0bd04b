package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc local profiler for the dedup hot path (not part of the library API). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("prof").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count(); docs.count()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-24s ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    // warm codegen
    graft.dedup.Dedup.minhashNearDuplicates(docs.limit(100), "doc_id", "text").count()
    time("sig_count")(graft.dedup.Dedup.minhashSignatures(docs, "doc_id", "text").count())
    time("sig_count2")(graft.dedup.Dedup.minhashSignatures(docs, "doc_id", "text").count())
    val sigs = graft.dedup.Dedup.minhashSignatures(docs, "doc_id", "text")
    val cands = graft.dedup.Dedup.lshCandidatePairs(sigs, "doc_id", bands = 16)
    time("cands_count")(cands.count())
    time("cands_count2")(cands.count())
    time("full_d2")(graft.dedup.Dedup.minhashNearDuplicates(docs, "doc_id", "text").count())
    time("full_d2_again")(graft.dedup.Dedup.minhashNearDuplicates(docs, "doc_id", "text").count())
    val pairs = graft.dedup.Dedup.minhashNearDuplicates(docs, "doc_id", "text")
    time("d7_transitive")(graft.dedup.Dedup.removeNearDuplicatesTransitive(docs, pairs, "doc_id").count())
    println(cands.queryExecution.executedPlan.toString.linesIterator.filter(l => l.contains("Reused") || l.contains("Exchange") || l.contains("Scan")).mkString("\n"))
    spark.stop()
  }
}
