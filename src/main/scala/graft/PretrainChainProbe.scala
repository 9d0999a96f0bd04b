package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adjudication probe for the BATCH pretrain flagship
  * (tx_pretrain_ledger 3.4 s / tx_pretrain_pipeline 3.0 s at the
  * round-15 seal — the #4/#6 bench rows): phase-times the chain at
  * its REAL job boundaries — the four eager `localCheckpoint`s the
  * chain materializes (gates→survivors, classifier→exact-dedup,
  * minhash→near-dedup, decontamination×2) — plus each query's tail
  * (the ledger's id joins + sort, the pipeline's stage counts +
  * packing), so "where do the ~3 s go" is a table, not a guess. Two
  * rounds, the SECOND reported (first-call codegen priced separately
  * — the SNIPPETS warm-vs-cold rule). The composition replicates
  * [[graft.queries.TextQueries]]' `pretrainChain` spelling verbatim
  * (same operators, same constants) — the PretrainStreamProbe
  * precedent; results land in SCALE.md/OPTIMIZATION_r15.md.
  *
  * `sbt "runMain graft.PretrainChainProbe"`, SPARK_GRAFT_SF_DIR /
  * SPARK_GRAFT_CPUS as in Bench. */
object PretrainChainProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- checkpoint-placement sweep (`runMain … sweep`) -------------
    // Which of the chain's four stage-boundary localCheckpoints are
    // load-bearing? Build the WHOLE ledger with each checkpoint
    // individually disabled (the frame passes through un-materialized,
    // so Catalyst re-derives its subtree once per downstream consumer)
    // and time the end-to-end materialization. Two rounds, warm
    // reported.
    if (args.headOption.contains("sweep")) {
      import graft.text.{Curation, QualityClassifier, QualityModelFixture, TextFunctions}
      def ledger(drop: String): DataFrame = {
        def ck(name: String)(df: DataFrame): DataFrame =
          if (name == drop) df else df.localCheckpoint()
        val docs = graft.queries.table(spark, dir, "documents")
        val terms = Seq("slow", "Lorem", "ipsum")
        val flagged = docs
          .withColumn("__s1",
            Curation.blocklistPassed(col("text"), terms, maxHits = 2L))
          .withColumn("__sL",
            col("__s1") && (TextFunctions.langId(col("text")) === "en"))
          .withColumn("__s2", col("__sL") && Curation.gopherGate(
            col("text"), minTokens = 50, minStopWords = 1))
          .withColumn("__t2", graft.queries.segmentLines(col("text")))
          .withColumn("clean",
            Curation.c4CleanedText(col("__t2"), minWords = 3))
          .withColumn("__s3", col("__s2") &&
            !Curation.c4DocDrop(col("__t2")) && col("clean") =!= "")
        val survivors = ck("survivors")(flagged.filter(col("__s3"))
          .select(col("doc_id"), col("source"), col("clean")))
        val modelKept = survivors.join(
          QualityClassifier.scoreQuantized(survivors, "doc_id", "clean",
              QualityModelFixture.weightsQ, QualityModelFixture.biasQ,
              QualityModelFixture.buckets)
            .filter(col("clf_pass") === 1).select(col("doc_id")),
          Seq("doc_id"))
        val exact = ck("exact")(
          graft.dedup.Dedup.exactByContent(modelKept, "doc_id", "clean"))
        val pairs = graft.dedup.Dedup.minhashNearDuplicates(exact,
          "doc_id", "clean", shingleSize = 5, threshold = 0.8)
        val near = ck("near")(graft.dedup.Dedup
          .removeNearDuplicatesTransitive(exact, pairs, "doc_id"))
        val evalFps = docs.filter(col("source") === "src0")
          .select(TextFunctions.minShingleFingerprint(col("text"), 5)
            .as("__fp"))
          .filter(col("__fp").isNotNull).distinct()
        val decon = near
          .withColumn("__fp",
            TextFunctions.minShingleFingerprint(col("clean"), 5))
          .join(broadcast(evalFps), Seq("__fp"), "left_anti")
          .drop("__fp")
        val deconNear = ck("deconNear")(
          graft.text.Boilerplate.ngramDecontaminate(
            decon, "doc_id", "clean",
            docs.filter(col("source") === "src0"), "text", n = 8))
        val sampled = graft.operators.Sampling.deterministicSample(
          deconNear, "doc_id", 0.5)
        val reached = Seq(modelKept, exact, near, decon, deconNear, sampled)
          .zipWithIndex.map { case (df, i) =>
            df.select(col("doc_id"), lit(i + 1).as("__st"))
          }.reduce(_.union(_))
          .groupBy(col("doc_id")).agg(max(col("__st")).as("__reach"))
        flagged
          .select(col("doc_id"), col("__s1"), col("__sL"), col("__s2"),
            col("__s3"))
          .join(reached, Seq("doc_id"), "left")
          .select(col("doc_id"), col("__reach"))
          .orderBy(col("doc_id"))
      }
      for (round <- 1 to 2) {
        println(s"— sweep round $round${if (round == 2) " (WARM)" else ""} —")
        for (drop <- Seq("none", "survivors", "exact", "near", "deconNear"))
          t(s"ledger e2e, drop=$drop")(noop(ledger(drop)))
      }
      spark.stop()
      return
    }

    for (round <- 1 to 2) {
      println(s"— round $round (${if (round == 1) "cold: first-call codegen" else "WARM — the reported numbers"}) —")
      import graft.text.{Curation, QualityClassifier, QualityModelFixture, TextFunctions}
      val docs = graft.queries.table(spark, dir, "documents")
      val terms = Seq("slow", "Lorem", "ipsum")
      val flagged = docs
        .withColumn("__s1",
          Curation.blocklistPassed(col("text"), terms, maxHits = 2L))
        .withColumn("__sL",
          col("__s1") && (TextFunctions.langId(col("text")) === "en"))
        .withColumn("__s2", col("__sL") && Curation.gopherGate(
          col("text"), minTokens = 50, minStopWords = 1))
        .withColumn("__t2", graft.queries.segmentLines(col("text")))
        .withColumn("clean", Curation.c4CleanedText(col("__t2"), minWords = 3))
        .withColumn("__s3",
          col("__s2") && !Curation.c4DocDrop(col("__t2")) && col("clean") =!= "")
      val survivors = t("gates scan → survivors ckpt") {
        flagged.filter(col("__s3"))
          .select(col("doc_id"), col("source"), col("clean"))
          .localCheckpoint()
      }
      val modelKept = survivors.join(
        QualityClassifier.scoreQuantized(survivors, "doc_id", "clean",
            QualityModelFixture.weightsQ, QualityModelFixture.biasQ,
            QualityModelFixture.buckets)
          .filter(col("clf_pass") === 1).select(col("doc_id")),
        Seq("doc_id"))
      val exact = t("classifier + exact-dedup ckpt") {
        graft.dedup.Dedup.exactByContent(modelKept, "doc_id", "clean")
          .localCheckpoint()
      }
      val near = t("minhash pairs + near-dedup ckpt") {
        val pairs = graft.dedup.Dedup.minhashNearDuplicates(exact, "doc_id",
          "clean", shingleSize = 5, threshold = 0.8)
        graft.dedup.Dedup.removeNearDuplicatesTransitive(
          exact, pairs, "doc_id").localCheckpoint()
      }
      val deconNear = t("decon (fp anti-join + 8-gram) ckpt") {
        val evalFps = docs.filter(col("source") === "src0")
          .select(TextFunctions.minShingleFingerprint(col("text"), 5).as("__fp"))
          .filter(col("__fp").isNotNull).distinct()
        val decon = near
          .withColumn("__fp",
            TextFunctions.minShingleFingerprint(col("clean"), 5))
          .join(broadcast(evalFps), Seq("__fp"), "left_anti")
          .drop("__fp")
        graft.text.Boilerplate.ngramDecontaminate(
            decon, "doc_id", "clean",
            docs.filter(col("source") === "src0"), "text", n = 8)
          .localCheckpoint()
      }
      val sampled = graft.operators.Sampling.deterministicSample(
        deconNear, "doc_id", 0.5)
      // the two query tails over the SAME chain frames
      t("ledger tail (6 id joins + sort)") {
        def ids(df: DataFrame, mark: String): DataFrame =
          df.select(col("doc_id"), lit(1).as(mark))
        noop(flagged
          .select(col("doc_id"), col("__s1"), col("__sL"), col("__s2"),
            col("__s3"))
          .join(ids(modelKept, "__m"), Seq("doc_id"), "left")
          .join(ids(exact, "__e"), Seq("doc_id"), "left")
          .join(ids(near, "__n"), Seq("doc_id"), "left")
          .join(ids(deconNear, "__dn"), Seq("doc_id"), "left")
          .join(ids(sampled, "__sp"), Seq("doc_id"), "left")
          .orderBy(col("doc_id")))
      }
      t("pipeline tail (8 counts + packing)") {
        val bCount = graft.operators.Sampling.packSequences(sampled,
            "source", "doc_id",
            graft.text.TextFunctions.bpeTokenCount(col("clean")), 2048L)
          .select(col("source"), col("batch_id")).distinct()
          .agg(count(lit(1)).as("batches"))
        val head = flagged.agg(
          count(lit(1)).as("total"),
          sum(col("__s1").cast("long")).as("blocklist"),
          sum(col("__s3").cast("long")).as("c4"))
        noop(head.crossJoin(sampled.agg(count(lit(1)).as("sampled")))
          .crossJoin(bCount))
      }
    }
    spark.stop()
  }
}
