package graft.validation

import graft.core._

/** Ingest-time quality-gate thresholds, the reference's
  * `quality_thresholds` config block (`src/ingestion/validators.py:80-84`)
  * with its defaults. `failOnBreach` routes a breach Q6-style: true ⇒ the
  * ingest task fails (the reference raises NonRetryableError,
  * `extractors.py:111-117`), false ⇒ warn-and-continue. */
case class QualityThresholds(
    minQualityScore: Double = 0.8,
    maxErrorPct: Double = 0.05,
    maxNullPct: Double = 0.1,
    failOnBreach: Boolean = true)

/** Applies [[QualityThresholds]] to a [[graft.core.ValidationReport]].
  *
  * The reference computes the score and thresholds but only ever enforces
  * `min_data_quality_score` (`validators.py:428-431`); here all three
  * gate. No extra scan happens in this object — it reads the counts the
  * validator's single fused aggregation already produced. */
object QualityGate {

  /** Failure messages for every breached threshold; empty ⇒ gate passes.
    *
    * - `quality_score`: the reference formula's score vs the minimum.
    * - `error_pct`: largest single error-severity violation count over
    *   row count — a lower bound on the failed-row union that needs no
    *   second scan (the reference's union estimate is likewise
    *   approximate, `validators.py:419-423`).
    * - `null_pct`: worst per-column `null_violations` ratio.
    */
  def check(report: ValidationReport, t: QualityThresholds): Seq[String] = {
    val n = report.rowCount.toDouble
    val score =
      if (report.qualityScore < t.minQualityScore)
        Seq(f"quality_score ${report.qualityScore}%.3f < ${t.minQualityScore}%.3f")
      else Seq.empty
    val errPct =
      if (n > 0) (report.errors.map(_.affectedRows) :+ 0L).max / n else 0.0
    val err =
      if (errPct > t.maxErrorPct)
        Seq(f"error_pct $errPct%.4f > ${t.maxErrorPct}%.4f")
      else Seq.empty
    val nullIssues = (report.errors ++ report.warnings)
      .filter(_.rule == "null_violations")
    val nulls = nullIssues.flatMap { i =>
      val pct = if (n > 0) i.affectedRows / n else 0.0
      if (pct > t.maxNullPct)
        Seq(f"null_pct(${i.column}) $pct%.4f > ${t.maxNullPct}%.4f")
      else Seq.empty
    }
    score ++ err ++ nulls
  }

  /** Validate `df` against the source's declared rules and gate it:
    * one fused aggregation job, then threshold checks on the counts.
    * Returns (report, breach messages). */
  def evaluate(df: org.apache.spark.sql.DataFrame, schema: TableSchema,
      rules: Seq[Rules.Rule], t: QualityThresholds): (ValidationReport, Seq[String]) = {
    val report = Validator.validate(df, schema, rules)
    (report, check(report, t))
  }
}
