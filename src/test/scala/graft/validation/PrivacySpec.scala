package graft.validation

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PrivacySpec extends AnyFunSuite with SparkSpec {

  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  // hand-checkable fixture: QI = (zip, age_band), sensitive = diagnosis
  //   (10001, a): 3 records, 2 distinct diagnoses
  //   (10001, b): 1 record, 1 diagnosis        <- k=1 class, l=1
  //   (10002, a): 2 records, 1 diagnosis       <- l=1 class
  private lazy val df = spark.createDataFrame(
    Seq(
      Row("10001", "a", "flu"), Row("10001", "a", "flu"),
      Row("10001", "a", "cold"),
      Row("10001", "b", "hiv"),
      Row("10002", "a", "flu"), Row("10002", "a", "flu")).asJava,
    StructType(Seq(
      StructField("zip", StringType), StructField("age_band", StringType),
      StructField("diagnosis", StringType))))

  private val qi = Seq(col("zip"), col("age_band"))

  test("equivalence classes: sizes and distinct sensitive counts") {
    val cls = Privacy.equivalenceClasses(df, qi, Some(col("diagnosis")))
      .orderBy("zip", "age_band").collect()
    assert(cls.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3))).toSeq ===
      Seq(("10001", "a", 3L, 2L), ("10001", "b", 1L, 1L),
        ("10002", "a", 2L, 1L)))
  }

  test("k-anonymity histogram partitions every record exactly once") {
    val h = Privacy.kAnonymityHistogram(df, qi)
    assert(h.agg(sum("n_records")).head().getLong(0) === df.count())
    val m = h.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("k-anonymity report: dataset k and below-k tallies") {
    val r = Privacy.kAnonymityReport(df, qi, k = 2).head()
    assert(r.getAs[Long]("n_classes") === 3L)
    assert(r.getAs[Long]("dataset_k") === 1L)
    assert(r.getAs[Long]("classes_below_k") === 1L)
    assert(r.getAs[Long]("records_below_k") === 1L)
    assert(r.getAs[Int]("required_k") === 2)
  }

  test("l-diversity: a k-anonymous class can still fail l") {
    // (10002, a) is 2-anonymous but has ONE diagnosis — the disclosure
    // l-diversity exists to catch
    val r = Privacy.lDiversityReport(df, qi, col("diagnosis"), l = 2).head()
    assert(r.getAs[Long]("dataset_l") === 1L)
    assert(r.getAs[Long]("classes_below_l") === 2L)
    assert(r.getAs[Long]("records_below_l") === 3L) // 1 + 2
  }

  test("suppressing the k=1 class raises dataset k") {
    val suppressed = df.filter(!(col("zip") === "10001" &&
      col("age_band") === "b"))
    val r = Privacy.kAnonymityReport(suppressed, qi, k = 2).head()
    assert(r.getAs[Long]("dataset_k") === 2L)
    assert(r.getAs[Long]("classes_below_k") === 0L)
  }
}
