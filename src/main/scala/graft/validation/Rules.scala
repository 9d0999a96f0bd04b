package graft.validation

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's validation-rule library (SURVEY §2.4 V1–V8), re-expressed
  * as pure `Column` violation predicates. Each rule is a per-row predicate;
  * the Validator counts violations with `sum(when(pred,1))` — all rules for a
  * table fuse into ONE aggregation pass (single scan + single partial/final
  * agg, no shuffle-per-rule), where the reference iterates pandas rows per
  * rule (`src/ingestion/validators.py:306-349`).
  *
  * No reflection dispatch (reference `validators.py:342-349`): custom rules
  * are plain entries in a registry map, `Column => Column`.
  */
object Rules {

  /** A named rule instance bound to a column. */
  case class Rule(
      name: String,
      column: String,
      severity: String,
      violationPredicate: Column) {
    /** Aggregate expression counting violating rows. */
    def violationCount: Column =
      sum(when(violationPredicate, 1L).otherwise(0L)).as(s"${name}__$column")
  }

  /** V1 `not_null` — reference `validators.py:312-314`. */
  def notNull(c: Column): Column = c.isNull

  /** V2 `range` — (x < min) ∨ (x > max); nulls don't violate.
    * Reference `validators.py:316-321`. */
  def range(c: Column, min: Option[Double], max: Option[Double]): Column = {
    val lo = min.map(m => c < lit(m)).getOrElse(lit(false))
    val hi = max.map(m => c > lit(m)).getOrElse(lit(false))
    c.isNotNull && (lo || hi)
  }

  /** V3 `length` — string length outside [min,max]; casts all to string
    * first like the reference. Reference `validators.py:323-328`. */
  def lengthRule(c: Column, min: Option[Int], max: Option[Int]): Column = {
    val l = length(c.cast(StringType))
    val lo = min.map(m => l < lit(m)).getOrElse(lit(false))
    val hi = max.map(m => l > lit(m)).getOrElse(lit(false))
    c.isNotNull && (lo || hi)
  }

  /** V4 `pattern` — regex non-match; nulls skipped.
    * Reference `validators.py:330-335`. */
  def pattern(c: Column, regex: String): Column =
    c.isNotNull && !c.cast(StringType).rlike(regex)

  /** V5 `allowed_values` — set-membership violation.
    * Reference `validators.py:337-340`. */
  def allowedValues(c: Column, values: Seq[Any]): Column =
    c.isNotNull && !c.isin(values: _*)

  /** V7 custom `business_hours` — hour-of-day outside [start, end).
    * Reference `validators.py:442-459`. */
  def businessHours(c: Column, startHour: Int = 9, endHour: Int = 17): Column =
    c.isNotNull && (hour(c) < lit(startHour) || hour(c) >= lit(endHour))

  /** V8 custom `future_date` — date strictly after `asOf` (reference uses
    * wall-clock `today`, `validators.py:461-477`; we parameterize so tested
    * paths never read the wall clock — SURVEY §7.5 risk 6). */
  def futureDate(c: Column, asOf: Column = current_date()): Column =
    c.isNotNull && (c > asOf)

  /** Registry of named custom rules (replaces the reference's reflection
    * dispatch to `_validate_<name>`, `validators.py:342-349`). */
  val customRules: Map[String, Column => Column] = Map(
    "business_hours" -> (c => businessHours(c)),
    "future_date" -> (c => futureDate(c))
  )

  /** Q7 quarantine split: one pass tags each row with the names of the
    * rules it violates; callers route `reasons == []` to the target and
    * the rest to the quarantine table (design.md:262-265 — reject
    * capture instead of the reference's silent dropna). The reasons
    * column is a comma-joined string in declaration order (array-free
    * for portable comparison). */
  def withViolationReasons(df: org.apache.spark.sql.DataFrame,
      rules: Seq[Rule]): org.apache.spark.sql.DataFrame = {
    val tags = rules.map(r =>
      when(r.violationPredicate, lit(s"${r.name}__${r.column}")))
    // concat_ws skips null operands itself, so no array_compact —
    // which is RuntimeReplaceable to ArrayFilter, an interpreted
    // (CodegenFallback) pass per row; this spelling stays codegen'd
    df.withColumn("reasons", concat_ws(",", tags: _*))
  }

  def quarantineSplit(df: org.apache.spark.sql.DataFrame, rules: Seq[Rule])
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val tagged = withViolationReasons(df, rules)
    (tagged.filter(col("reasons") === "").drop("reasons"),
      tagged.filter(col("reasons") =!= ""))
  }

  // ---- whole-row checks (SURVEY §2.4 V17, V18, V20) ----

  /** V17 all-null-row predicate over the given columns.
    * Reference `src/ingestion/extractors.py:236-239`. */
  def allNullRow(cols: Seq[Column]): Column =
    cols.map(_.isNull).reduce(_ && _)

  /** V20 infinite-value predicate for a numeric column.
    * Reference `src/ingestion/extractors.py:261-265`. */
  def isInfinite(c: Column): Column =
    c === lit(Double.PositiveInfinity) || c === lit(Double.NegativeInfinity)
}
