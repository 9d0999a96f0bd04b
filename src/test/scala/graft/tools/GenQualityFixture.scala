package graft.tools

import graft.text.QualityClassifier
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off generator for [[graft.text.QualityModelFixture]]: distill a
  * rule gate into the hashed-bigram logistic model (the DCLM move —
  * train the cheap classifier to imitate a reference label). The
  * label is the stopword lang-id rule ([[graft.text.TextFunctions
  * .langId]] == "en"): on this synthetic corpus it is the one gate
  * whose signal genuinely lives in n-gram space (the `lang`/Gopher
  * columns are random tags / length rules — unlearnable from
  * length-normalized bigram bags). Quantizes and prints the Scala
  * literal to paste into the fixture.
  * Run: sbt "Test/runMain graft.tools.GenQualityFixture [iters lr l2]" */
object GenQualityFixture {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"),
        (graft.text.TextFunctions.langId(col("text")) === "en")
          .cast("int").as("label"))
    val iters = args.headOption.map(_.toInt).getOrElse(200)
    val lr = args.lift(1).map(_.toDouble).getOrElse(200.0)
    val l2 = args.lift(2).map(_.toDouble).getOrElse(1e-6)
    // class-balance the training set (the full corpus is ~9:1): all
    // negatives + the lowest-doc_id equal count of positives —
    // deterministic, so re-running regenerates the same fixture
    val nNeg = docs.filter(col("label") === 0).count().toInt
    val balanced = docs.filter(col("label") === 0).unionAll(
      docs.filter(col("label") === 1).orderBy(col("doc_id")).limit(nNeg))
    val m = QualityClassifier.train(balanced, "doc_id", "text", "label",
      buckets = 4096, iters = iters, lr = lr, l2 = l2)
    val balAcc = QualityClassifier.score(balanced, "doc_id", "text", m)
      .join(balanced.select(col("doc_id"), col("label")), Seq("doc_id"))
      .filter(col("clf_pass") === col("label")).count()
    println(s"// diag: bias=${m.bias} maxW=${m.weights.map(math.abs).max} " +
      s"nzW=${m.weights.count(_ != 0.0)} balancedAcc=$balAcc/${2 * nNeg}")
    val floatAcc = QualityClassifier.score(docs, "doc_id", "text", m)
      .join(docs.select(col("doc_id"), col("label")), Seq("doc_id"))
      .filter(col("clf_pass") === col("label")).count()
    println(s"// float-model training accuracy: $floatAcc (iters=$iters lr=$lr l2=$l2)")
    val (wq, biasQ) = QualityClassifier.quantize(m, topK = 320)
    // report distillation fidelity on the training corpus
    val scored = QualityClassifier.scoreQuantized(docs, "doc_id", "text",
        wq, biasQ, 4096)
      .join(docs.select(col("doc_id"), col("label")), Seq("doc_id"))
    val n = scored.count()
    val agree = scored.filter(col("clf_pass") === col("label")).count()
    println(s"// quantized fidelity vs label: $agree/$n")
    println(s"  val buckets = 4096")
    println(s"  val biasQ = ${biasQ}L")
    println("  val weightsQ: Seq[(Int, Long)] = Seq(")
    println(wq.map { case (b, w) => s"    ($b, ${w}L)" }.mkString(",\n"))
    println("  )")
    spark.stop()
  }
}
