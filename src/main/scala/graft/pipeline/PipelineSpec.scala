package graft.pipeline

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import scala.jdk.CollectionConverters._

/** Declarative pipeline specification (SURVEY §2.8 O4, §3.1 step 1).
  *
  * Mirrors the YAML shape of the reference's pipeline config
  * (`config/pipelines/sample_pipeline.yaml:1-141`,
  * `src/orchestration/dag_generator.py:70-84,142-156`) as typed case
  * classes. The control plane stays driver-side and tiny: Spark executes
  * the data work; this layer only decides *what* runs and in what order.
  */
case class SourceSpec(
    sourceId: String,
    sourceType: String, // database | api | file
    connectionParams: Map[String, String],
    changeDetection: Map[String, String],
    validationRules: Map[String, Seq[String]],
    retries: Int,
    retryDelayMinutes: Int,
    // ingest-time quality gate (reference validators.py:80-84); None ⇒ no gate
    qualityThresholds: Option[graft.validation.QualityThresholds] = None,
    priority: Int = 1)

case class ModelTest(kind: String, columns: Seq[String],
    relatedModel: Option[String] = None, field: Option[String] = None)

case class TransformationSpec(
    modelName: String,
    modelType: String, // staging | mart
    dependencies: Seq[String],
    materialization: String, // table | incremental
    incrementalStrategy: Option[String],
    uniqueKey: Option[String],
    tests: Seq[ModelTest],
    retries: Int,
    retryDelayMinutes: Int,
    priority: Int = 1)

case class CustomCheck(name: String, query: String,
    expectedResult: Option[Long], expectedRowCount: Option[Long])

case class TargetSpec(
    tableName: String,
    minRowCount: Option[Long],
    maxAgeHours: Option[Int],
    customChecks: Seq[CustomCheck],
    failOnValidationError: Boolean,
    priority: Int = 1)

case class PipelineSpec(
    name: String,
    description: String,
    scheduleInterval: String,
    sources: Seq[SourceSpec],
    transformations: Seq[TransformationSpec],
    targets: Seq[TargetSpec],
    dependencies: Map[String, Seq[String]],
    monitoring: Option[MonitoringSpec] = None) {

  /** Task ids in the reference's naming scheme
    * (`dag_generator.py:204-274`): ingest_/transform_/validate_. */
  def taskIds: Seq[String] =
    sources.map("ingest_" + _.sourceId) ++
      transformations.map("transform_" + _.modelName) ++
      targets.map("validate_" + _.tableName)

  /** Per-task scheduling priority (reference `TaskConfig.priority`,
    * `task_manager.py:93`; default 1) keyed by task id. */
  def priorities: Map[String, Int] =
    (sources.map(s => s"ingest_${s.sourceId}" -> s.priority) ++
      transformations.map(t => s"transform_${t.modelName}" -> t.priority) ++
      targets.map(t => s"validate_${t.tableName}" -> t.priority)).toMap
}

object PipelineSpec {

  private val mapper = new ObjectMapper(new YAMLFactory())

  /** Parse a pipeline YAML document (sample_pipeline.yaml shape).
    * `${VAR}` placeholders in connection params resolve from `env`
    * (reference: `headers: Authorization: Bearer ${API_TOKEN}`). */
  def fromYaml(yaml: String, env: Map[String, String] = Map.empty): PipelineSpec = {
    val root = mapper.readTree(yaml)

    def str(n: JsonNode, field: String, default: String = ""): String =
      if (n.hasNonNull(field)) n.get(field).asText() else default
    def interp(s: String): String =
      "\\$\\{([A-Za-z0-9_]+)\\}".r.replaceAllIn(s,
        m => java.util.regex.Matcher.quoteReplacement(
          env.getOrElse(m.group(1), m.matched)))
    def strMap(n: JsonNode, field: String): Map[String, String] =
      if (!n.hasNonNull(field)) Map.empty
      else n.get(field).properties().asScala
        .map(e => e.getKey -> interp(flatText(e.getValue))).toMap
    def strSeq(n: JsonNode): Seq[String] =
      if (n == null) Seq.empty
      else if (n.isArray) n.elements().asScala.map(_.asText()).toSeq
      else Seq(n.asText())

    def flatText(n: JsonNode): String =
      if (n.isContainerNode) n.toString else n.asText()

    val sources = elems(root, "sources").map { s =>
      SourceSpec(
        sourceId = str(s, "source_id"),
        sourceType = str(s, "source_type"),
        connectionParams = strMap(s, "connection_params"),
        changeDetection = strMap(s, "change_detection"),
        validationRules =
          if (!s.hasNonNull("validation_rules")) Map.empty
          else s.get("validation_rules").properties().asScala
            .map(e => e.getKey -> strSeq(e.getValue)).toMap,
        retries = if (s.hasNonNull("retries")) s.get("retries").asInt else 3,
        retryDelayMinutes =
          if (s.hasNonNull("retry_delay_minutes")) s.get("retry_delay_minutes").asInt else 5,
        qualityThresholds =
          if (!s.hasNonNull("quality_thresholds")) None
          else {
            val q = s.get("quality_thresholds")
            def dbl(field: String, default: Double): Double =
              if (q.hasNonNull(field)) q.get(field).asDouble else default
            Some(graft.validation.QualityThresholds(
              minQualityScore = dbl("min_data_quality_score", 0.8),
              maxErrorPct = dbl("max_error_percentage", 0.05),
              maxNullPct = dbl("max_null_percentage", 0.1),
              failOnBreach = str(q, "enforcement", "fail") != "warn"))
          },
        priority = if (s.hasNonNull("priority")) s.get("priority").asInt else 1)
    }

    val transformations = elems(root, "transformations").map { t =>
      val tests = elems(t, "tests").flatMap { test =>
        test.properties().asScala.map { e =>
          e.getKey match {
            case "relationships" =>
              ModelTest("relationships", Seq.empty,
                relatedModel = Option(e.getValue.get("to")).map(_.asText()),
                field = Option(e.getValue.get("field")).map(_.asText()))
            case kind => ModelTest(kind, strSeq(e.getValue))
          }
        }
      }
      TransformationSpec(
        modelName = str(t, "model_name"),
        modelType = str(t, "model_type"),
        dependencies = strSeq(t.get("dependencies")),
        materialization = str(t, "materialization", "table"),
        incrementalStrategy =
          Option(t.get("incremental_strategy")).map(_.asText()),
        uniqueKey = Option(t.get("unique_key")).map(_.asText()),
        tests = tests,
        retries = if (t.hasNonNull("retries")) t.get("retries").asInt else 2,
        retryDelayMinutes =
          if (t.hasNonNull("retry_delay_minutes")) t.get("retry_delay_minutes").asInt else 10,
        priority = if (t.hasNonNull("priority")) t.get("priority").asInt else 1)
    }

    val targets = elems(root, "targets").map { tg =>
      val vr = tg.get("validation_rules")
      val checks =
        if (vr == null || !vr.hasNonNull("custom_checks")) Seq.empty
        else vr.get("custom_checks").elements().asScala.map { c =>
          CustomCheck(
            name = str(c, "name"),
            query = str(c, "query"),
            expectedResult =
              Option(c.get("expected_result")).map(_.asLong()),
            expectedRowCount =
              Option(c.get("expected_row_count")).map(_.asLong()))
        }.toSeq
      TargetSpec(
        tableName = str(tg, "table_name"),
        minRowCount =
          Option(vr).flatMap(v => Option(v.get("min_row_count"))).map(_.asLong()),
        maxAgeHours =
          Option(vr).flatMap(v => Option(v.get("max_age_hours"))).map(_.asInt()),
        customChecks = checks,
        failOnValidationError =
          !tg.hasNonNull("fail_on_validation_error") ||
            tg.get("fail_on_validation_error").asBoolean(),
        priority = if (tg.hasNonNull("priority")) tg.get("priority").asInt else 1)
    }

    val deps =
      if (!root.hasNonNull("dependencies")) Map.empty[String, Seq[String]]
      else root.get("dependencies").properties().asScala
        .map(e => e.getKey -> strSeq(e.getValue)).toMap

    // monitoring: alert channels are a list of single-key maps
    // (`- email: addr` / `- slack: "#chan"`, sample_pipeline.yaml:146-148),
    // rules are name/condition/severity triples (yaml:150-159)
    val monitoring =
      if (!root.hasNonNull("monitoring")) None
      else {
        val m = root.get("monitoring")
        val channels = elems(m, "alert_channels").flatMap(
          _.properties().asScala.map(e =>
            AlertChannel(e.getKey, e.getValue.asText())))
        val rules = elems(m, "alert_rules").map(r =>
          AlertRule(str(r, "name"), str(r, "condition"),
            str(r, "severity", "warning")))
        Some(MonitoringSpec(
          enableMetrics =
            !m.hasNonNull("enable_metrics") ||
              m.get("enable_metrics").asBoolean(),
          alertChannels = channels,
          alertRules = rules))
      }

    PipelineSpec(
      name = str(root, "name"),
      description = str(root, "description"),
      scheduleInterval = str(root, "schedule_interval"),
      sources = sources,
      transformations = transformations,
      targets = targets,
      dependencies = deps,
      monitoring = monitoring)
  }

  private def elems(n: JsonNode, field: String): Seq[JsonNode] =
    if (n == null || !n.hasNonNull(field)) Seq.empty
    else n.get(field).elements().asScala.toSeq
}
