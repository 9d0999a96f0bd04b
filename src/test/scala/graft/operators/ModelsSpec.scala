package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SCD2 semantics: interval chaining, tie-break determinism, current
  * flag. (The T1–T3 models are oracle-verified; this covers the corner
  * cases small fixtures can express precisely.) */
class ModelsSpec extends AnyFunSuite with SparkSpec {

  test("scd2: versions chain, ties break on seq, last version is current") {
    val spark2 = spark
    import spark2.implicits._
    val hist = Seq(
      // key 1: three versions, two sharing a timestamp (seq breaks tie)
      (1L, 10L, "2024-01-01 00:00:00", "a"),
      (1L, 11L, "2024-01-02 00:00:00", "b"),
      (1L, 12L, "2024-01-02 00:00:00", "c"),
      // key 2: single version — immediately current
      (2L, 20L, "2024-03-01 00:00:00", "z"))
      .toDF("k", "seq", "ts", "attr")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Models.scd2(hist, Seq("k"), "ts", "seq")
      .select(col("k"), col("seq"), col("valid_from").cast("string"),
        col("valid_to").cast("string"), col("is_current"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), Option(r.getString(3)), r.getBoolean(4))).toSet
    assert(out == Set(
      (1L, 10L, "2024-01-01 00:00:00", Some("2024-01-02 00:00:00"), false),
      (1L, 11L, "2024-01-02 00:00:00", Some("2024-01-02 00:00:00"), false),
      (1L, 12L, "2024-01-02 00:00:00", None, true),
      (2L, 20L, "2024-03-01 00:00:00", None, true)))
  }
}
