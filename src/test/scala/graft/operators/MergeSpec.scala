package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class MergeSpec extends AnyFunSuite with SparkSpec {

  private lazy val sess = spark
  import sess.implicits._

  test("latestWins: upserts, stale rejects, deletes") {
    val base = Seq((1L, "a", 10), (2L, "b", 10), (3L, "c", 10))
      .toDF("id", "v", "ver")
    val delta = Seq((2L, "B", 20), (3L, "stale", 5), (4L, "d", 20))
      .toDF("id", "v", "ver")
    val merged = Merge.latestWins(base, delta, Seq("id"), col("ver"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(merged == Map(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "d"))

    // delete path requires symmetric schemas (unionByName)
    val baseD = base.withColumn("del", lit(false))
    val out = Merge.latestWins(baseD,
      Seq((2L, "B", 20, true)).toDF("id", "v", "ver", "del"),
      Seq("id"), col("ver"), deleteMarker = Some(col("del")))
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 3L))
  }

  test("latestWins schema evolution: new delta column null-fills history") {
    val base = Seq((1L, "a", 10), (2L, "b", 10)).toDF("id", "v", "ver")
    val delta = Seq((2L, "B", 20, "tagged"), (3L, "c", 20, "fresh"))
      .toDF("id", "v", "ver", "note")
    // strict default: drift fails loudly
    intercept[org.apache.spark.sql.AnalysisException] {
      Merge.latestWins(base, delta, Seq("id"), col("ver")).collect()
    }
    val merged = Merge.latestWins(base, delta, Seq("id"), col("ver"),
        allowEvolution = true)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.getAs[String]("note"))))
      .toMap
    assert(merged == Map(
      1L -> ("a", None),            // historical row: new column nulls
      2L -> ("B", Some("tagged")),  // delta wins, carries new column
      3L -> ("c", Some("fresh"))))
  }

  test("mergeIntoPartitioned rewrites ONLY touched partitions") {
    val dir = Files.createTempDirectory("graft-merge").toString + "/fact"
    val base = Seq(
      (1L, "2024-01-01", "a", 10), (2L, "2024-01-01", "b", 10),
      (3L, "2024-01-02", "c", 10), (4L, "2024-01-03", "d", 10))
      .toDF("id", "dt", "v", "ver")
    base.write.partitionBy("dt").parquet(dir)

    def filesOf(part: String): Map[String, Long] = {
      val p = Paths.get(dir, s"dt=$part")
      Files.list(p).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(f => f.toString -> Files.getLastModifiedTime(f).toMillis).toMap
    }
    val before01 = filesOf("2024-01-01")
    val before02 = filesOf("2024-01-02")
    val before03 = filesOf("2024-01-03")
    Thread.sleep(1100) // mtime resolution

    // delta touches only 2024-01-01 (update id=2, insert id=5)
    val delta = Seq((2L, "2024-01-01", "B", 20), (5L, "2024-01-01", "e", 20))
      .toDF("id", "dt", "v", "ver")
    Merge.mergeIntoPartitioned(spark, dir, delta, Seq("id"), col("ver"), "dt")

    // untouched partitions: identical files, identical mtimes
    assert(filesOf("2024-01-02") == before02)
    assert(filesOf("2024-01-03") == before03)
    // touched partition: rewritten
    assert(filesOf("2024-01-01") != before01)

    val out = spark.read.parquet(dir)
      .select("id", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "d", 5L -> "e"))
  }

  test("mergeIntoPartitioned bootstraps an empty table") {
    val dir = Files.createTempDirectory("graft-merge0").toString + "/fact"
    val delta = Seq((1L, "2024-01-01", "a", 1)).toDF("id", "dt", "v", "ver")
    Merge.mergeIntoPartitioned(spark, dir, delta, Seq("id"), col("ver"), "dt")
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("forgetKeys: deletes only listed keys, rewrites only touched partitions") {
    val dir = Files.createTempDirectory("graft-forget").toString + "/t"
    Seq(
      (1L, "2024-01-01", "a"), (2L, "2024-01-01", "b"),
      (3L, "2024-01-02", "c"), (4L, "2024-01-02", "d"),
      (5L, "2024-01-03", "e"))
      .toDF("user_id", "dt", "v").write.partitionBy("dt").parquet(dir)
    def mtimes(part: String): Map[String, Long] = {
      val p = Paths.get(dir, s"dt=$part")
      Files.list(p).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(f => f.toString -> Files.getLastModifiedTime(f).toMillis).toMap
    }
    val before0103 = mtimes("2024-01-03")

    val audit = Merge.forgetKeys(spark, dir,
        Seq(2L, 3L, 99L).toDF("user_id"), "user_id", "dt")
      .collect().map(r => r.get(0).toString -> ((r.getLong(1), r.getLong(2))))
      .toMap  // partition col reads back as DATE via partition inference
    // per-partition audit: only partitions with matches appear
    assert(audit == Map("2024-01-01" -> ((2L, 1L)), "2024-01-02" -> ((2L, 1L))))

    val left = spark.read.parquet(dir)
      .select($"user_id").as[Long].collect().toSet
    assert(left == Set(1L, 4L, 5L))
    // untouched partition's files were not rewritten
    assert(mtimes("2024-01-03") == before0103)
  }

  test("forgetKeys: a fully-forgotten partition's directory is removed") {
    val dir = Files.createTempDirectory("graft-forget2").toString + "/t"
    Seq((1L, "2024-01-01", "a"), (2L, "2024-01-01", "b"),
        (3L, "2024-01-02", "c"))
      .toDF("user_id", "dt", "v").write.partitionBy("dt").parquet(dir)
    Merge.forgetKeys(spark, dir,
      Seq(1L, 2L).toDF("user_id"), "user_id", "dt")
    // dynamic overwrite alone would leave dt=2024-01-01 serving the
    // "deleted" rows — the directory itself must be gone
    assert(!Files.exists(Paths.get(dir, "dt=2024-01-01")))
    assert(spark.read.parquet(dir)
      .select($"user_id").as[Long].collect().toSeq == Seq(3L))
  }

  test("forgetKeys: no matches is a no-op with an empty audit") {
    val dir = Files.createTempDirectory("graft-forget3").toString + "/t"
    Seq((1L, "2024-01-01", "a")).toDF("user_id", "dt", "v")
      .write.partitionBy("dt").parquet(dir)
    val audit = Merge.forgetKeys(spark, dir,
      Seq(42L).toDF("user_id"), "user_id", "dt")
    assert(audit.isEmpty)
    assert(spark.read.parquet(dir).count() == 1)
  }
}
