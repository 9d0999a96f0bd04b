package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class ExportSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .withColumn("shard", (Sampling.hash60(col("doc_id")) % 4).cast("int"))
  private val cols = Seq("doc_id", "text", "source")

  test("manifest is partitioning- and order-free") {
    val a = Export.manifest(docs, "shard", cols)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val b = Export.manifest(docs.repartition(7).orderBy(desc("doc_id")),
        "shard", cols)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(a == b && a.nonEmpty)
  }

  test("write + verify round-trip: intact export has no mismatches") {
    val dir = Files.createTempDirectory("graft-export").toString
    Export.writeWithManifest(docs.select(col("shard") +: cols.map(col): _*),
      dir, "shard", cols)
    assert(Export.verifyManifest(spark, dir, "shard", cols).isEmpty)
    graft.core.AtomicSwap.deleteRecursively(new java.io.File(dir))
  }

  test("truncation, duplication, and mutation all fail verification") {
    val dir = Files.createTempDirectory("graft-export-bad").toString
    val data = docs.select(col("shard") +: cols.map(col): _*).localCheckpoint()
    Export.writeWithManifest(data, dir, "shard", cols)

    // truncation: drop one shard's rows entirely
    data.filter(col("shard") =!= 0).write.mode("overwrite")
      .partitionBy("shard").parquet(s"$dir/data")
    val truncated = Export.verifyManifest(spark, dir, "shard", cols)
    assert(truncated.count() == 1 &&
      truncated.head().getAs[Int]("shard") == 0)

    // duplication: a shard's rows written twice
    data.unionAll(data.filter(col("shard") === 1))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$dir/data")
    val duplicated = Export.verifyManifest(spark, dir, "shard", cols)
    assert(duplicated.collect().map(_.getAs[Int]("shard")).toSeq == Seq(1))

    // mutation: same row count, one value changed — counts agree, the
    // fingerprint does not
    data.withColumn("text",
        when(col("doc_id") === data.select(min("doc_id")).head().getLong(0),
          lit("tampered")).otherwise(col("text")))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$dir/data")
    val mutated = Export.verifyManifest(spark, dir, "shard", cols)
    assert(mutated.count() == 1)
    val m = mutated.head()
    assert(m.getAs[Long]("stored_rows") == m.getAs[Long]("n_rows"),
      "row counts agree — only the fingerprint catches a mutation")
    graft.core.AtomicSwap.deleteRecursively(new java.io.File(dir))
  }

  test("rebuildManifest is the pre-v2 upgrade path: a legacy " +
      "(unreduced) fp_sum fails verification until rebuilt") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-export-v1").toString
    Export.writeWithManifest(docs.select(col("shard") +: cols.map(col): _*),
      dir, "shard", cols)
    // simulate a manifest written by the pre-v2 format: one shard's
    // fp_sum stored UNREDUCED (the old sum exceeded 2^32 and kept its
    // raw value, mod-equivalent to the canonical one)
    val legacy = s.read.parquet(s"$dir/_manifest").collect().map { r =>
      val sum = r.getAs[Long]("fp_sum")
      (r.getAs[Int]("shard"), r.getAs[Long]("n_rows"),
        if (r.getAs[Int]("shard") == 2) sum + (1L << 32) else sum,
        r.getAs[Long]("fp_xor"))
    }.toSeq
    legacy.toDF("shard", "n_rows", "fp_sum", "fp_xor")
      .write.mode("overwrite").parquet(s"$dir/_manifest")
    // the data is INTACT, but the stored value is non-canonical —
    // verification flags exactly that shard
    val stale = Export.verifyManifest(s, dir, "shard", cols)
    assert(stale.collect().map(_.getAs[Int]("shard")).toSeq == Seq(2))
    // the documented repair: recompute the manifest from the (trusted)
    // export itself
    Export.rebuildManifest(s, dir, "shard", cols)
    assert(Export.verifyManifest(s, dir, "shard", cols).isEmpty)
    graft.core.AtomicSwap.deleteRecursively(new java.io.File(dir))
  }
}
