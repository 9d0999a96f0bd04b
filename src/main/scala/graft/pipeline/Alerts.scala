package graft.pipeline

/** Declarative alert-rule evaluation over a run's task results
  * (SURVEY §2.8 monitoring; reference
  * `config/pipelines/sample_pipeline.yaml:144-159` — `pipeline_failure`
  * on `task_failed`, `data_quality_warning` on `validation_warning`,
  * `long_running_task` on `task_duration > 3600` — routed to the
  * configured channels with a severity).
  *
  * Control-plane only: conditions evaluate over the driver-side
  * [[TaskResult]] map (at most one row per task), never over data.
  * Delivery is a pluggable callback on [[PipelineRunner.alertSink]] —
  * the reference's email/Slack delivery is an infra concern outside a
  * zero-egress library, so the default sink is the structured JSON log
  * (severity-routed), exactly like its console fallback.
  */
case class AlertChannel(kind: String, target: String)

/** `condition` grammar (the reference's three forms, in its YAML
  * spelling): `task_failed` | `validation_warning` |
  * `task_duration > <seconds>` (also `>=`, `<`, `<=`). */
case class AlertRule(name: String, condition: String, severity: String)

case class Alert(rule: String, severity: String, taskId: String,
    message: String)

case class MonitoringSpec(enableMetrics: Boolean,
    alertChannels: Seq[AlertChannel], alertRules: Seq[AlertRule])

object Alerts {

  private val DurationCond = """task_duration\s*(>=|>|<=|<)\s*(\d+(?:\.\d+)?)""".r

  /** Evaluate every rule against every task result; returns one alert
    * per (rule, matching task). A validation warning is a SUCCEEDED
    * task that carries a warning payload (the Q6 warn route stores it
    * in `error` with a `WARN` prefix). Unknown conditions yield a
    * config alert once per rule rather than silently never firing. */
  def evaluate(rules: Seq[AlertRule],
      results: Map[String, TaskResult]): Seq[Alert] =
    rules.flatMap { rule =>
      rule.condition.trim match {
        case "task_failed" =>
          results.values.toSeq.filter(_.status == TaskStatus.Failed)
            .sortBy(_.taskId)
            .map(r => Alert(rule.name, rule.severity, r.taskId,
              s"task ${r.taskId} failed: ${r.error.getOrElse("")}"))
        case "validation_warning" =>
          results.values.toSeq
            .filter(r => r.status == TaskStatus.Success &&
              r.error.exists(_.startsWith("WARN")))
            .sortBy(_.taskId)
            .map(r => Alert(rule.name, rule.severity, r.taskId,
              s"task ${r.taskId} warned: ${r.error.getOrElse("")}"))
        case DurationCond(op, secs) =>
          val bound = secs.toDouble
          def hit(d: Double): Boolean = op match {
            case ">" => d > bound
            case ">=" => d >= bound
            case "<" => d < bound
            case "<=" => d <= bound
          }
          results.values.toSeq
            .filter(r => r.status != TaskStatus.Skipped &&
              hit(r.durationSeconds))
            .sortBy(_.taskId)
            .map(r => Alert(rule.name, rule.severity, r.taskId,
              f"task ${r.taskId} duration ${r.durationSeconds}%.1f s $op $bound"))
        case other =>
          // keep the rule's own severity: a typo in a CRITICAL rule's
          // condition must surface at critical visibility, not warning
          Seq(Alert(rule.name, rule.severity, "",
            s"unknown alert condition: $other"))
      }
    }
}
