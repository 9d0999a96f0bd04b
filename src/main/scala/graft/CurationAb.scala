package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B for the round-13 native curation gates
  * (`sbt "runMain graft.CurationAb"`): the compiled single-pass
  * scorers vs their retained HOF reference spellings, on the same
  * cached corpus in the same session — the measurement discipline for
  * interpreter-tax claims (cross-window wall comparisons drift ~1.2×;
  * same-JVM alternation doesn't). Each variant runs twice
  * interleaved; the MIN is reported. Numbers land in SCALE.md. */
object CurationAb {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // 40× the sf0.1 documents table ≈ 200k docs — big enough that the
    // per-row expression cost dominates scan/setup
    val docs = graft.queries.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), lit(39L))).as("__rep"))
      .select((col("doc_id") * 40 + col("__rep")).as("doc_id"), col("text"))
      .localCheckpoint()
    val n = docs.count()
    println(s"corpus: $n docs")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def ab(label: String, native: DataFrame => DataFrame,
        ref: DataFrame => DataFrame): Unit = {
      // interleave twice; min per variant
      var tn = Double.MaxValue; var tr = Double.MaxValue
      for (_ <- 1 to 2) {
        tn = math.min(tn, time(native(docs).collect()))
        tr = math.min(tr, time(ref(docs).collect()))
      }
      println(f"$label%-22s native=$tn%6.2f s  hof=$tr%6.2f s  " +
        f"speedup=${tr / tn}%4.1f×")
    }

    import graft.text.Curation
    // hash(struct) forces EVERY field — selecting one field would let
    // Catalyst prune the HOF side to a slice while the native struct
    // computes whole (the production gates consume all fields)
    ab("gopherFeatures",
      d => d.agg(sum(hash(Curation.gopherFeatures(col("text"))))),
      d => d.agg(sum(hash(Curation.gopherFeaturesReference(col("text"))))))
    ab("repetitionFeatures",
      d => d.agg(sum(hash(Curation.repetitionFeatures(col("text"))))),
      d => d.agg(sum(hash(Curation.repetitionFeaturesReference(col("text"))))))
    ab("c4CleanedText",
      d => d.agg(sum(length(Curation.c4CleanedText(col("text"))))),
      d => d.agg(sum(length(Curation.c4CleanedTextReference(col("text"))))))
    val terms = Seq("lorem", "ipsum", "slow", "click", "the")
    ab("blocklistHits",
      d => d.agg(sum(Curation.blocklistHits(col("text"), terms))),
      d => d.agg(sum(Curation.blocklistHitsReference(col("text"), terms))))
    val subs = Seq("lorem ipsum", "javascript", "the", "zzz")
    ab("containsCount",
      d => d.agg(sum(Curation.containsCount(col("text"), subs))),
      d => d.agg(sum(Curation.containsCountReference(col("text"), subs))))
    spark.stop()
  }
}
