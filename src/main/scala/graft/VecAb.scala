package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B for the round-14 compiled vector passes
  * (`sbt "runMain graft.VecAb"`): [[graft.functions.AbttCorrectExpr]]
  * (the sim_abtt correction scan) and the int8 codec
  * ([[graft.functions.I8ScaleExpr]]/I8EncodeExpr/I8DecodeExpr) vs
  * their retained Column reference spellings, interleaved on the same
  * cached corpus in the same session (the measurement discipline for
  * interpreter-tax claims — cross-window wall comparisons drift
  * ~1.2×; same-JVM alternation doesn't). Numbers land in SCALE.md. */
object VecAb {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.similarity.Similarity

    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // 40× the sf0.1 embeddings table ≈ 1.28M vectors × 64 dims — the
    // per-row expression cost dominates scan/setup
    val emb = graft.queries.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0L), lit(39L))).as("__rep"))
      .select((col("vec_id") * 40 + col("__rep")).as("vec_id"),
        col("embedding"))
      .localCheckpoint()
    println(s"corpus: ${emb.count()} vectors")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def ab(label: String, native: => DataFrame, ref: => DataFrame): Unit = {
      var tn = Double.MaxValue; var tr = Double.MaxValue
      for (_ <- 1 to 2) {
        tn = math.min(tn, time(native.write.format("noop")
          .mode("overwrite").save()))
        tr = math.min(tr, time(ref.write.format("noop")
          .mode("overwrite").save()))
      }
      println(f"$label%-18s native=$tn%6.2f s  column=$tr%6.2f s  " +
        f"speedup=${tr / tn}%4.1f×")
    }

    // end-to-end (both variants pay the same PC1 power iteration — the
    // fixed aggregate dilutes the per-row ratio)
    ab("abtt end-to-end",
      Similarity.removeTopComponent(emb, "vec_id", "embedding"),
      Similarity.removeTopComponentReference(emb, "vec_id", "embedding"))
    // correction scan only, PC1 fixed: the per-row interpreter tax
    val pc = Seq.tabulate(64)(i => (i * 1000 + 7).toLong)
    val vv = pc.map(x => x * x).sum
    val vArr = array(pc.map(lit): _*)
    val q = emb.select(col("vec_id"),
      Similarity.quantize(col("embedding")).as("__q")).localCheckpoint()
    ab("abtt correction",
      q.select(col("vec_id"), posexplode(
        graft.functions.NativeVec.abttCorrect(col("__q"), pc, vv))
        .as(Seq("pos", "corrected"))),
      q.withColumn("__qv", aggregate(
          zip_with(col("__q"), vArr, (a, b) => a * b),
          lit(0L), (acc, x) => acc + x))
        .select(col("vec_id"), posexplode(zip_with(col("__q"), vArr,
          (qi, vi) => qi * lit(vv) - col("__qv") * vi))
          .as(Seq("pos", "corrected"))))
    // the centroidCosine corpus-row decimal dot (sim_semdedup scan)
    ab("decDotQ",
      q.select(graft.functions.NativeVec.decDotQ(col("__q"), col("__q"))
        .as("d")),
      q.select(Similarity.decDotReference(col("__q"), col("__q")).as("d")))
    ab("compressInt8",
      Similarity.compressInt8(emb, "embedding"),
      Similarity.compressInt8Reference(emb, "embedding"))
    val comp = Similarity.compressInt8(emb, "embedding").localCheckpoint()
    ab("decompressInt8",
      Similarity.decompressInt8(comp, "embedding"),
      Similarity.decompressInt8Reference(comp, "embedding"))
    spark.stop()
  }
}
