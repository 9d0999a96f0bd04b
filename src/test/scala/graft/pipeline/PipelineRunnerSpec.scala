package graft.pipeline

import graft.SparkSpec
import graft.operators.Models
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pipeline over the driver's testdata: ingest parquet →
  * staging/dim/fact models with dbt-style tests → target validation,
  * ordered by the task graph — SURVEY §3.1 compressed into one driver. */
class PipelineRunnerSpec extends AnyFunSuite with SparkSpec {

  val yaml: String =
    """name: retail_pipeline
      |schedule_interval: "0 */2 * * *"
      |sources:
      |  - source_id: orders_src
      |    source_type: file
      |  - source_id: customer_src
      |    source_type: file
      |transformations:
      |  - model_name: staging_orders
      |    model_type: staging
      |    dependencies: [orders_src]
      |    tests:
      |      - unique: [order_id]
      |      - not_null: [order_id, customer_id]
      |  - model_name: staging_customers
      |    model_type: staging
      |    dependencies: [customer_src]
      |    tests:
      |      - unique: [customer_id]
      |  - model_name: dim_customers
      |    model_type: mart
      |    dependencies: [staging_customers]
      |    tests:
      |      - unique: [customer_key]
      |      - not_null: [customer_key]
      |  - model_name: fact_orders
      |    model_type: mart
      |    dependencies: [staging_orders, dim_customers]
      |    tests:
      |      - unique: [order_id]
      |      - relationships:
      |          to: ref('dim_customers')
      |          field: customer_key
      |targets:
      |  - table_name: fact_orders
      |    validation_rules:
      |      min_row_count: 100
      |      max_age_hours: 876000
      |      custom_checks:
      |        - name: negative_amount_check
      |          query: "SELECT COUNT(*) FROM fact_orders WHERE total_amount < 0"
      |          expected_result: 0
      |        - name: dup_order_check
      |          query: "SELECT order_id, COUNT(*) FROM fact_orders GROUP BY order_id HAVING COUNT(*) > 1"
      |          expected_row_count: 0
      |    fail_on_validation_error: true
      |dependencies:
      |  transform_staging_orders: [ingest_orders_src]
      |  transform_staging_customers: [ingest_customer_src]
      |  transform_dim_customers: [transform_staging_customers]
      |  transform_fact_orders: [transform_staging_orders, transform_dim_customers]
      |  validate_fact_orders: [transform_fact_orders]
      |""".stripMargin

  def runner: PipelineRunner = new PipelineRunner(
    spark,
    sources = Map(
      "orders_src" -> (s => s.read.parquet(s"$sf/orders.parquet")),
      "customer_src" -> (s => s.read.parquet(s"$sf/customer.parquet"))),
    models = Map(
      "staging_orders" -> (deps => Models.stagingOrders(deps("orders_src"))),
      "staging_customers" -> (deps => Models.stagingCustomers(deps("customer_src"))),
      "dim_customers" -> (deps => Models.dimCustomers(deps("staging_customers"))),
      "fact_orders" -> (deps =>
        Models.factOrders(deps("staging_orders"),
          deps("staging_orders").limit(0), deps("dim_customers")))),
    asOf = java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))

  test("full pipeline run: every task succeeds in dependency order") {
    val spec = PipelineSpec.fromYaml(yaml)
    val results = runner.run(spec)
    assert(results.size == 7)
    val failed = results.values.filter(_.status != TaskStatus.Success)
    assert(failed.isEmpty, failed.map(r => s"${r.taskId}: ${r.error}").mkString("; "))
  }

  test("sources come straight from the spec's connection params") {
    val configDriven = yaml
      .replace("  - source_id: orders_src\n    source_type: file\n",
        s"""  - source_id: orders_src
           |    source_type: file
           |    connection_params:
           |      path: $sf/orders.parquet
           |""".stripMargin)
      .replace("  - source_id: customer_src\n    source_type: file\n",
        s"""  - source_id: customer_src
           |    source_type: file
           |    connection_params:
           |      path: $sf/customer.parquet
           |""".stripMargin)
    val spec = PipelineSpec.fromYaml(configDriven)
    val fromSpec = new PipelineRunner(
      spark,
      sources = PipelineRunner.sourcesFromSpec(spec),
      models = Map(
        "staging_orders" -> (deps => Models.stagingOrders(deps("orders_src"))),
        "staging_customers" -> (deps => Models.stagingCustomers(deps("customer_src"))),
        "dim_customers" -> (deps => Models.dimCustomers(deps("staging_customers"))),
        "fact_orders" -> (deps =>
          Models.factOrders(deps("staging_orders"),
            deps("staging_orders").limit(0), deps("dim_customers")))),
      asOf = java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    val results = fromSpec.run(spec)
    val failed = results.values.filter(_.status != TaskStatus.Success)
    assert(failed.isEmpty, failed.map(r => s"${r.taskId}: ${r.error}").mkString("; "))
  }

  test("failing model test fails the task; downstream is skipped") {
    val badYaml = yaml.replace("- unique: [order_id]\n",
      "- unique: [order_status]\n") // order_status is massively duplicated
    val spec = PipelineSpec.fromYaml(badYaml)
    val results = runner.run(spec)
    assert(results("transform_staging_orders").status == TaskStatus.Failed)
    assert(results("transform_staging_orders").error.get.contains("duplicates"))
    // downstream of the failed task must not run (all_success default)
    assert(results("transform_fact_orders").status == TaskStatus.Skipped)
    assert(results("validate_fact_orders").status == TaskStatus.Skipped)
  }

  test("transient task failures retry per the spec; data-fact failures don't") {
    // a source that fails twice then succeeds — retries: 3 in the spec
    var calls = 0
    val flaky = new PipelineRunner(
      spark,
      sources = Map(
        "orders_src" -> (s => {
          calls += 1
          if (calls < 3) throw new RuntimeException("connection reset")
          s.read.parquet(s"$sf/orders.parquet")
        }),
        "customer_src" -> (s => s.read.parquet(s"$sf/customer.parquet"))),
      models = Map(
        "staging_orders" -> (deps => Models.stagingOrders(deps("orders_src"))),
        "staging_customers" -> (deps => Models.stagingCustomers(deps("customer_src"))),
        "dim_customers" -> (deps => Models.dimCustomers(deps("staging_customers"))),
        "fact_orders" -> (deps =>
          Models.factOrders(deps("staging_orders"),
            deps("staging_orders").limit(0), deps("dim_customers")))),
      asOf = java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    val delays = Seq.newBuilder[Long]
    flaky.sleeper = delays += _
    val withRetries = yaml.replace("  - source_id: orders_src\n    source_type: file\n",
      "  - source_id: orders_src\n    source_type: file\n    retries: 3\n    retry_delay_minutes: 5\n")
    val results = flaky.run(PipelineSpec.fromYaml(withRetries))
    assert(results("ingest_orders_src").status == TaskStatus.Success)
    assert(calls == 3)
    assert(delays.result() == Seq(300000L, 300000L))

    // model-test (data-fact) failures must NOT retry
    var modelBuilds = 0
    val counting = new PipelineRunner(
      spark,
      sources = Map(
        "orders_src" -> (s => s.read.parquet(s"$sf/orders.parquet")),
        "customer_src" -> (s => s.read.parquet(s"$sf/customer.parquet"))),
      models = Map(
        "staging_orders" -> (deps => {
          modelBuilds += 1
          Models.stagingOrders(deps("orders_src"))
        }),
        "staging_customers" -> (deps => Models.stagingCustomers(deps("customer_src"))),
        "dim_customers" -> (deps => Models.dimCustomers(deps("staging_customers"))),
        "fact_orders" -> (deps =>
          Models.factOrders(deps("staging_orders"),
            deps("staging_orders").limit(0), deps("dim_customers")))),
      asOf = java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    counting.sleeper = _ => ()
    val badYaml = yaml.replace("- unique: [order_id]\n", "- unique: [order_status]\n")
    val r2 = counting.run(PipelineSpec.fromYaml(badYaml))
    assert(r2("transform_staging_orders").status == TaskStatus.Failed)
    assert(modelBuilds == 1) // built once, not retried
  }

  test("target validation failure with fail_on_validation_error=false warns") {
    val warnYaml = yaml
      .replace("min_row_count: 100", "min_row_count: 999999999")
      .replace("fail_on_validation_error: true", "fail_on_validation_error: false")
    val results = runner.run(PipelineSpec.fromYaml(warnYaml))
    val v = results("validate_fact_orders")
    assert(v.status == TaskStatus.Success)
    assert(v.error.exists(e => e.startsWith("WARN") && e.contains("min_row_count")))
  }

  test("target validation failure with fail_on_validation_error=true fails") {
    val failYaml = yaml.replace("min_row_count: 100", "min_row_count: 999999999")
    val results = runner.run(PipelineSpec.fromYaml(failYaml))
    assert(results("validate_fact_orders").status == TaskStatus.Failed)
  }

  test("parallelism runs a level's independent ingests concurrently") {
    val active = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var highWater = 0
    def tracked(path: String): org.apache.spark.sql.SparkSession => org.apache.spark.sql.DataFrame =
      s => {
        val n = active.incrementAndGet()
        highWater = math.max(highWater, n)
        try { Thread.sleep(150); s.read.parquet(path) }
        finally active.decrementAndGet()
      }
    def make = new PipelineRunner(
      spark,
      sources = Map(
        "orders_src" -> tracked(s"$sf/orders.parquet"),
        "customer_src" -> tracked(s"$sf/customer.parquet")),
      models = Map.empty,
      asOf = java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    val yaml2 =
      """name: par
        |sources:
        |  - source_id: orders_src
        |    source_type: file
        |  - source_id: customer_src
        |    source_type: file
        |""".stripMargin
    val spec = PipelineSpec.fromYaml(yaml2)

    val seq = make.run(spec) // default: sequential
    assert(seq.values.forall(_.status == TaskStatus.Success))
    assert(highWater == 1, s"sequential run overlapped: $highWater")

    highWater = 0
    val par = make.run(spec, parallelism = 2)
    assert(par.values.forall(_.status == TaskStatus.Success))
    assert(highWater == 2, s"parallel run never overlapped: $highWater")
  }

  // ---- ingest-time quality gate (reference validators.py:80-84) ----

  private def gateYaml(thresholds: String,
      required: String = "o_orderkey"): String =
    s"""name: gated
       |sources:
       |  - source_id: gated_src
       |    source_type: file
       |    retries: 2
       |    validation_rules:
       |      required_columns: [$required]
       |      unique: [$required]
       |    quality_thresholds:
       |$thresholds
       |""".stripMargin

  private def gateRunner(table: String, onIngest: () => Unit = () => ()) = {
    val r = new PipelineRunner(
      spark,
      sources = Map("gated_src" -> (s => {
        onIngest(); graft.queries.table(s, sf, table) })),
      models = Map.empty,
      asOf = java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    r.sleeper = _ => () // retries must never wall-clock-sleep in tests
    r
  }

  test("quality gate passes on clean data (defaults)") {
    val spec = PipelineSpec.fromYaml(gateYaml(
      "      min_data_quality_score: 0.8\n"))
    val r = gateRunner("orders").run(spec)("ingest_gated_src")
    assert(r.status == TaskStatus.Success && r.error.isEmpty, r.error)
  }

  test("quality gate breach fails the ingest task and does not retry") {
    var calls = 0
    val spec = PipelineSpec.fromYaml(gateYaml(
      "      min_data_quality_score: 1.01\n")) // unreachable: score ≤ 1.0
    val r = gateRunner("orders", () => calls += 1).run(spec)("ingest_gated_src")
    assert(r.status == TaskStatus.Failed)
    assert(r.error.exists(e => e.startsWith("quality:") && e.contains("quality_score")))
    assert(calls == 1, s"quality breach is a data fact, must not retry (got $calls)")
  }

  test("quality gate breach with enforcement=warn succeeds with warning") {
    val spec = PipelineSpec.fromYaml(gateYaml(
      "      min_data_quality_score: 1.01\n      enforcement: warn\n"))
    val r = gateRunner("orders").run(spec)("ingest_gated_src")
    assert(r.status == TaskStatus.Success)
    assert(r.error.exists(_.startsWith("WARN quality:")))
  }

  // ---- declarative alert rules (sample_pipeline.yaml:144-159) ----

  test("alert rules: each condition fires on its matching task, severity routed") {
    val monYaml =
      """name: mon
        |sources:
        |  - source_id: ok_src
        |    source_type: file
        |    quality_thresholds:
        |      min_data_quality_score: 1.01
        |      enforcement: warn
        |  - source_id: bad_src
        |    source_type: file
        |    retries: 0
        |monitoring:
        |  alert_channels:
        |    - email: data-team@example.com
        |    - slack: "#data-alerts"
        |  alert_rules:
        |    - name: pipeline_failure
        |      condition: task_failed
        |      severity: critical
        |    - name: data_quality_warning
        |      condition: validation_warning
        |      severity: warning
        |    - name: long_running_task
        |      condition: task_duration > 3600
        |      severity: warning
        |    - name: any_duration
        |      condition: task_duration >= 0
        |      severity: info
        |""".stripMargin
    val spec = PipelineSpec.fromYaml(monYaml)
    assert(spec.monitoring.exists(_.alertRules.size == 4))
    val r = new PipelineRunner(
      spark,
      sources = Map(
        "ok_src" -> (s => s.read.parquet(s"$sf/orders.parquet")),
        "bad_src" -> (_ => throw new RuntimeException("boom"))),
      models = Map.empty,
      asOf = java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    r.sleeper = _ => ()
    val fired = Seq.newBuilder[(Alert, Seq[AlertChannel])]
    r.alertSink = (a, chs) => fired += ((a, chs))
    r.run(spec)
    val alerts = fired.result()
    val byRule = alerts.map(_._1).groupBy(_.rule)
    // task_failed → the failing ingest, critical
    assert(byRule("pipeline_failure").map(a => (a.taskId, a.severity)) ==
      Seq(("ingest_bad_src", "critical")))
    assert(byRule("pipeline_failure").head.message.contains("boom"))
    // validation_warning → the succeeded-with-WARN ingest
    assert(byRule("data_quality_warning").map(_.taskId) == Seq("ingest_ok_src"))
    // the 1-hour duration rule must not fire on a test pipeline
    assert(!byRule.contains("long_running_task"))
    // a trivially-true duration rule fires once per executed task
    assert(byRule("any_duration").map(_.taskId).sorted ==
      Seq("ingest_bad_src", "ingest_ok_src"))
    // the spec's channels reach the sink verbatim
    assert(alerts.head._2 == Seq(
      AlertChannel("email", "data-team@example.com"),
      AlertChannel("slack", "#data-alerts")))
  }

  test("default alert sink routes severity case-insensitively") {
    val r = new PipelineRunner(spark, sources = Map.empty, models = Map.empty,
      asOf = java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    val lines = Seq.newBuilder[String]
    r.log = new PipelineLogger("graft.test.alerts", Some(l => lines += l))
    Seq("critical", "Critical", "CRITICAL", "warning").foreach { sev =>
      r.alertSink(Alert("rule", sev, "t1", s"msg-$sev"),
        Seq(AlertChannel("email", "x@example.com")))
    }
    val levels = lines.result().map { l =>
      (raw""""level":"(\w+)"""".r.findFirstMatchIn(l).get.group(1),
        raw""""message":"msg-(\w+)"""".r.findFirstMatchIn(l).get.group(1))
    }
    // every critical spelling lands at ERROR; warning stays WARN
    assert(levels == Seq("ERROR" -> "critical", "ERROR" -> "Critical",
      "ERROR" -> "CRITICAL", "WARN" -> "warning"), levels)
  }

  test("AlertSinks.routed delivers per channel kind: file, webhook, log fallback") {
    import com.sun.net.httpserver.HttpServer
    val tmp = java.nio.file.Files.createTempDirectory("graft-alerts")
    val alertFile = tmp.resolve("sub/alerts.jsonl").toString
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    server.createContext("/hook", ex => {
      received.add(new String(ex.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8))
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    // a second endpoint that always fails: delivery must log-and-continue
    server.createContext("/broken", ex => {
      ex.sendResponseHeaders(500, -1); ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val logLines = Seq.newBuilder[String]
      val log = new PipelineLogger("graft.test.alertsinks",
        Some(l => logLines += l))
      val fallbackHits = Seq.newBuilder[(Alert, Seq[AlertChannel])]
      val sink = AlertSinks.routed(
        Map("file" -> AlertSinks.file, "webhook" -> AlertSinks.webhook),
        (a, chs) => fallbackHits += ((a, chs)), log)
      val a1 = Alert("pipeline_failure", "critical", "t1", "task t1 failed")
      val a2 = Alert("quality", "warning", "t2", "task t2 warned")
      val channels = Seq(
        AlertChannel("file", alertFile),
        AlertChannel("webhook", s"http://127.0.0.1:$port/hook"),
        AlertChannel("webhook", s"http://127.0.0.1:$port/broken"),
        AlertChannel("email", "data-team@example.com"))
      sink(a1, channels)
      sink(a2, channels)
      // file channel: one parseable JSON line per alert, channel stamped
      val fileLines = java.nio.file.Files
        .readAllLines(java.nio.file.Paths.get(alertFile))
      assert(fileLines.size == 2)
      assert(fileLines.get(0).contains("\"rule\":\"pipeline_failure\"") &&
        fileLines.get(0).contains("\"channel_kind\":\"file\""))
      assert(fileLines.get(1).contains("\"rule\":\"quality\""))
      // webhook channel: both alerts POSTed to the healthy endpoint
      val posts = received.toArray(Array.empty[String]).toSeq
      assert(posts.size == 2 &&
        posts.exists(_.contains("\"task_id\":\"t1\"")) &&
        posts.exists(_.contains("\"task_id\":\"t2\"")), posts)
      // broken endpoint: swallowed into the log, run uninterrupted
      val failures = logLines.result()
        .filter(_.contains("alert delivery failed"))
      assert(failures.size == 2 && failures.forall(_.contains("/broken")))
      // unmatched kind (email) falls back once per alert with ONLY the
      // unmatched channels
      assert(fallbackHits.result().map { case (a, chs) =>
        (a.rule, chs.map(_.kind)) } ==
        Seq(("pipeline_failure", Seq("email")), ("quality", Seq("email"))))
    } finally server.stop(0)
  }

  test("enable_metrics gates the run-summary metrics log line") {
    def specWith(flag: String) = PipelineSpec.fromYaml(
      s"""name: met
         |sources:
         |  - source_id: src
         |    source_type: file
         |monitoring:
         |  enable_metrics: $flag
         |  alert_rules: []
         |""".stripMargin)
    def runCapturing(flag: String): Seq[String] = {
      val lines = Seq.newBuilder[String]
      val r = new PipelineRunner(
        spark,
        sources = Map("src" -> (s => s.read.parquet(s"$sf/orders.parquet"))),
        models = Map.empty,
        asOf = java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
      r.log = new PipelineLogger("cap", sink = Some(lines += _))
      r.run(specWith(flag))
      lines.result().filter(_.contains("pipeline metrics"))
    }
    val on = runCapturing("true")
    assert(on.size == 1)
    assert(on.head.contains("\"tasks_total\":\"1\"") &&
      on.head.contains("\"tasks_success\":\"1\""))
    assert(runCapturing("false").isEmpty)
  }

  test("alert rules: unknown condition surfaces a config alert, not silence") {
    val alerts = Alerts.evaluate(
      Seq(AlertRule("typo_rule", "task_filed", "critical")),
      Map("t" -> TaskResult("t", TaskStatus.Failed)))
    assert(alerts.map(a => (a.rule, a.message)) ==
      Seq(("typo_rule", "unknown alert condition: task_filed")))
  }

  // ---- task execution history (reference task_manager.py:330-388) ----

  test("execution history and statistics accumulate across runs") {
    val histYaml =
      """name: hist
        |sources:
        |  - source_id: src
        |    source_type: file
        |    retries: 0
        |""".stripMargin
    val spec = PipelineSpec.fromYaml(histYaml)
    var fail = false
    val r = new PipelineRunner(
      spark,
      sources = Map("src" -> (s => {
        if (fail) throw new RuntimeException("down")
        s.read.parquet(s"$sf/orders.parquet")
      })),
      models = Map.empty,
      asOf = java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    r.sleeper = _ => ()
    r.run(spec); fail = true; r.run(spec)
    val h = r.executionHistory("ingest_src")
    assert(h.map(_.status) == Seq(TaskStatus.Success, TaskStatus.Failed))
    assert(r.executionHistory("ingest_src", limit = 1)
      .map(_.status) == Seq(TaskStatus.Failed))
    val stats = r.taskStatistics("ingest_src")
    assert(stats.totalExecutions == 2 && stats.successfulExecutions == 1)
    assert(stats.successRate == 50.0)
    assert(stats.lastStatus.contains(TaskStatus.Failed))
    assert(stats.avgDurationSeconds > 0.0)
    assert(r.statsReport.map(_.taskId) == Seq("ingest_src"))
    // never-executed task → empty stats, not a crash
    assert(r.taskStatistics("nope") ==
      TaskStats("nope", 0, 0, 0.0, 0.0, None))

    // the history ring is capped like the reference's max_execution_history
    r.maxExecutionHistory = 3
    fail = false
    r.run(spec); r.run(spec)
    assert(r.executionHistory("ingest_src").size == 3)
    assert(r.executionHistory("ingest_src").map(_.status) ==
      Seq(TaskStatus.Failed, TaskStatus.Success, TaskStatus.Success))
  }

  test("quality gate null-percentage threshold catches nullable column") {
    // 20% planted nulls breach the default max_null_percentage of 0.1
    val spec = PipelineSpec.fromYaml(gateYaml(
      "      max_null_percentage: 0.1\n", required = "value"))
    val r = new PipelineRunner(
      spark,
      sources = Map("gated_src" -> (s => s.range(100)
        .selectExpr("id", "CASE WHEN id % 5 = 0 THEN NULL ELSE id END AS value"))),
      models = Map.empty,
      asOf = java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    r.sleeper = _ => ()
    val res = r.run(spec)("ingest_gated_src")
    assert(res.status == TaskStatus.Failed)
    assert(res.error.exists(e => e.contains("null_pct(value)")), res.error)
  }
}
