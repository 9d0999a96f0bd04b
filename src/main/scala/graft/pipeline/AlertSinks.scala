package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Reference alert-delivery transports for [[PipelineRunner.alertSink]]
  * (SURVEY §2.8; reference `config/pipelines/sample_pipeline.yaml:146-148`
  * declares per-channel routing — email/Slack there, infra-neutral
  * file/webhook here: a zero-egress library ships transports that need
  * no credentials or external service, and a host grafts email/Slack in
  * through the same per-kind dispatch seam).
  *
  * Contract: delivery is BEST-EFFORT and must never fail the pipeline —
  * an alert is a report about a problem, and a broken reporting channel
  * must not become a second problem that masks the first. Every
  * transport failure is swallowed into the structured log and the next
  * channel still gets its delivery attempt.
  *
  * Control-plane only: one small JSON line per (alert, channel); no
  * data-path involvement.
  */
object AlertSinks {

  /** One JSON object per delivery — the same escape rules as
    * [[PipelineLogger]] so both streams parse with one reader. */
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private[pipeline] def render(a: Alert, ch: AlertChannel): String =
    Seq(
      "timestamp" -> java.time.Instant.now().toString,
      "rule" -> a.rule,
      "severity" -> a.severity,
      "task_id" -> a.taskId,
      "message" -> a.message,
      "channel_kind" -> ch.kind,
      "channel_target" -> ch.target)
      .map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")

  /** Append one JSON line to the file named by the channel's target
    * (parent dirs created). Synchronized per JVM: concurrent runs'
    * alerts interleave as whole lines, never torn ones. */
  val file: (Alert, AlertChannel) => Unit = (a, ch) => synchronized {
    val p = Paths.get(ch.target)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.write(p, (render(a, ch) + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** POST the JSON body to the channel's target URL (content-type
    * application/json, bounded timeouts — a hung alert endpoint must
    * not hang the run). Non-2xx is a delivery failure. */
  val webhook: (Alert, AlertChannel) => Unit = {
    // one shared client: connection pooling across alerts of a run
    lazy val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(5)).build()
    (a, ch) => {
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(ch.target))
        .timeout(java.time.Duration.ofSeconds(10))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers
          .ofString(render(a, ch), StandardCharsets.UTF_8))
        .build()
      val status = client
        .send(req, java.net.http.HttpResponse.BodyHandlers.discarding())
        .statusCode()
      if (status < 200 || status >= 300)
        throw new RuntimeException(s"webhook ${ch.target} returned $status")
    }
  }

  /** Kind-routed sink: dispatch each channel to its transport;
    * unmatched kinds (e.g. the reference's email/slack with no host
    * transport installed) fall back to `fallback` — typically the
    * severity-routed structured-log default — so no configured channel
    * is ever silently dropped. Transport failures log-and-continue per
    * the best-effort contract. */
  def routed(transports: Map[String, (Alert, AlertChannel) => Unit],
      fallback: (Alert, Seq[AlertChannel]) => Unit,
      log: PipelineLogger): (Alert, Seq[AlertChannel]) => Unit =
    (a, chs) => {
      val (known, unknown) = chs.partition(c => transports.contains(c.kind))
      known.foreach { ch =>
        try transports(ch.kind)(a, ch)
        catch {
          case e: Throwable =>
            log.warn(s"alert delivery failed: ${e.getMessage}",
              "alert" -> a.rule, "channel_kind" -> ch.kind,
              "channel_target" -> ch.target)
        }
      }
      if (unknown.nonEmpty) fallback(a, unknown)
    }
}
