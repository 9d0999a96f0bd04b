package graft.validation

import graft.SparkSpec
import graft.core._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's two-fixture test pattern
  * (`tests/unit/test_validators.py:17-42`): a clean table and a
  * problematic table with known violation counts per rule. */
class ValidatorSpec extends AnyFunSuite with SparkSpec {
  import Rules._

  private lazy val sess = spark
  import sess.implicits._

  // (id, email, age, status, signup)
  private lazy val clean = Seq(
    (1L, "a@example.com", 30.0, "active", "2024-01-01"),
    (2L, "b@example.org", 41.0, "inactive", "2024-02-01"),
    (3L, "c@test.net", 25.0, "active", "2024-03-01")
  ).toDF("id", "email", "age", "status", "signup")

  // problems: dup id, null email, bad email, age out of range,
  // bad status, future signup
  private lazy val dirty = Seq(
    (1L, "a@example.com", 30.0, "active", "2024-01-01"),
    (1L, "not-an-email", 250.0, "active", "2024-01-02"),
    (2L, null, -5.0, "bogus", "2031-01-01"),
    (3L, "c@test.net", 25.0, "active", "2024-03-01")
  ).toDF("id", "email", "age", "status", "signup")

  private val schema = TableSchema(
    table = "users",
    columns = Seq(
      "id" -> GDataType.GInteger,
      "email" -> GDataType.GEmail,
      "age" -> GDataType.GFloat,
      "status" -> GDataType.GString,
      "signup" -> GDataType.GDate),
    requiredColumns = Seq("id", "email", "age"),
    nullableColumns = Seq.empty,
    uniqueColumns = Seq("id"),
    primaryKey = Seq("id"))

  private val rules = Seq(
    Rule("not_null", "email", Severity.Error, notNull(col("email"))),
    Rule("range", "age", Severity.Error, range(col("age"), Some(0), Some(120))),
    Rule("allowed_values", "status", Severity.Warning,
      allowedValues(col("status"), Seq("active", "inactive"))),
    Rule("future_date", "signup", Severity.Warning,
      futureDate(to_date(col("signup")), to_date(lit("2026-01-01")))),
    Rule("pattern", "email", Severity.Warning,
      pattern(col("email"), GDataType.EmailRegex)),
    Rule("length", "status", Severity.Info,
      lengthRule(col("status"), Some(2), Some(8))))

  test("clean data validates with score 1.0") {
    val r = Validator.validate(clean, schema, rules)
    assert(r.isValid)
    assert(r.rowCount == 3)
    assert(r.allIssues.isEmpty)
    assert(r.qualityScore == 1.0)
  }

  test("dirty data: exact violation counts per rule") {
    val r = Validator.validate(dirty, schema, rules)
    val byKey = r.allIssues.map(i => (i.rule, i.column) -> i.affectedRows).toMap
    assert(byKey(("not_null", "email")) == 1)
    assert(byKey(("range", "age")) == 2) // 250 and -5
    assert(byKey(("allowed_values", "status")) == 1)
    assert(byKey(("future_date", "signup")) == 1)
    assert(byKey(("pattern", "email")) == 1) // null email skipped
    assert(byKey(("duplicate_values", "id")) == 1) // one dup of id=1
    assert(byKey(("pk_duplicates", "")) == 1)
    assert(byKey(("null_violations", "email")) == 1)
    assert(!byKey.contains(("length", "status"))) // no length violations
    assert(!r.isValid)
  }

  test("quality score formula matches reference weights (1.0/0.5/0.1, round 3)") {
    val issues = Seq(
      ValidationIssue("a", "c1", Severity.Error, 2, ""),
      ValidationIssue("b", "c2", Severity.Warning, 3, ""),
      ValidationIssue("c", "c3", Severity.Info, 10, ""))
    // total = 2*1.0 + 3*0.5 + 10*0.1 = 4.5; rows=10, ncols=5 → 1 - 4.5/50 = 0.91
    assert(Validator.qualityScore(10, 5, issues) == 0.91)
    assert(Validator.qualityScore(0, 5, issues) == 0.0)
  }

  test("missing required column is an error (V9)") {
    val df = clean.drop("email")
    val r = Validator.validate(df, schema, rules.filter(_.column != "email"))
    assert(r.errors.exists(i => i.rule == "required_columns" && i.column == "email"))
  }

  test("type conformance (V10): lexical boolean + integer coercion") {
    val df = Seq(("yes", "12"), ("NO", "x"), ("maybe", "3.7"), (null, null))
      .toDF("flag", "n")
    val sch = TableSchema("t",
      Seq("flag" -> GDataType.GBoolean, "n" -> GDataType.GInteger))
    val row = Validator.countsFrame(df, sch, Seq.empty).collect()(0)
    assert(row.getAs[Long]("type_violations__flag") == 1) // "maybe"
    // "x" fails; "3.7" also fails long-cast (reference coerces via to_numeric
    // then checks int-ness only loosely — we declare stricter integral cast)
    assert(row.getAs[Long]("type_violations__n") == 2)
  }

  test("empty-dataset check (V16) and size guardrail (V22)") {
    assert(Validator.emptyCheck(clean).isEmpty)
    assert(Validator.emptyCheck(clean.filter(col("id") < 0))
      .exists(_.rule == "empty_dataset"))
    assert(Validator.sizeGuardrail(clean, maxBytes = 1L << 40).isEmpty)
    assert(Validator.sizeGuardrail(clean, maxBytes = 1L)
      .exists(_.rule == "size_guardrail"))
  }

  test("observe(): violation counters ride an existing pass, no extra scan") {
    val obs = new org.apache.spark.sql.Observation("graft_validation")
    val df = Validator.observed(dirty, obs, rules.take(2))
    df.collect() // one action; counters come along for free
    val row = obs.get
    assert(row("row_count") == 4L)
    assert(row("not_null__email") == 1L)
    assert(row("range__age") == 2L)
  }

  test("profiling (P1-P5): fused stats in one pass") {
    val profiles = Validator.collectProfiles(dirty, Seq("id", "email", "age"))
    val byCol = profiles.map(p => p.column -> p).toMap
    assert(byCol("id").distinctCount == 3)
    assert(byCol("email").nullCount == 1)
    assert(byCol("age").negativeCount.contains(1L))
    assert(byCol("age").min.contains(-5.0))
    assert(byCol("age").max.contains(250.0))
    assert(byCol("email").minLength.contains(10L)) // c@test.net
  }

  test("approx profile path: sketch-based distinct/median, exact-free plan") {
    val events = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val exact = Validator.profileFrame(events, Seq("o_totalprice")).head()
    val approx = Validator
      .profileFrame(events, Seq("o_totalprice"), approx = true)
    // the approx plan must contain NO exact-percentile / exact-distinct
    // aggregates (their state scales with cardinality, the whole point)
    val plan = approx.queryExecution.optimizedPlan.toString
    assert(!plan.contains("percentile(") || plan.contains("approx_percentile"), plan)
    assert(!plan.toLowerCase.contains("count(distinct"), plan)
    val a = approx.head()
    def f(r: org.apache.spark.sql.Row, n: String): Double =
      r.getAs[Any](n) match { case l: Long => l.toDouble; case d: Double => d }
    // HLL ships with rsd=0.05 → allow 10% (2σ); the percentile sketch at
    // accuracy 10000 is far tighter
    assert(math.abs(f(a, "distinct_count__o_totalprice") -
      f(exact, "distinct_count__o_totalprice")) <=
      0.10 * f(exact, "distinct_count__o_totalprice"))
    assert(math.abs(f(a, "median__o_totalprice") -
      f(exact, "median__o_totalprice")) <=
      0.02 * math.abs(f(exact, "median__o_totalprice")))
  }
}
