package graft.pipeline

import org.slf4j.LoggerFactory

/** O13: structured JSON logging with pipeline context.
  *
  * The reference's `JSONFormatter` + `PipelineLogger`
  * (`src/utils/logging.py:15-95`) emit one JSON object per log line with
  * a sticky context (source/table/run id) merged into every entry. This
  * is that surface on the JVM: entries are rendered to a single JSON
  * line HERE (so the output is structured regardless of the installed
  * log4j2 layout) and emitted through slf4j → Spark's log4j2 backend.
  *
  * For whole-process JSON logs (Spark's own loggers included), launch
  * with `-Dlog4j2.configurationFile=graft-log4j2.properties` — the
  * bundled config renders everything through log4j's JsonTemplateLayout.
  *
  * `sink` is injectable for tests (and for routing to a metrics bus);
  * production default is the slf4j logger at the entry's level.
  */
class PipelineLogger(name: String, sink: Option[String => Unit] = None) {

  private val underlying = LoggerFactory.getLogger(name)
  @volatile private var context: Map[String, String] = Map.empty

  /** Sticky context merged into every subsequent entry
    * (`logging.py:58-61`: e.g. source_id, table_name, run_id). */
  def setContext(kv: (String, String)*): Unit =
    synchronized { context = context ++ kv }

  def clearContext(): Unit = synchronized { context = Map.empty }

  /** Child logger: same name and sink, but an INDEPENDENT sticky context
    * seeded from this logger's context plus `kv`. Lets each pipeline run
    * log under its own context — two overlapping `run()` calls on one
    * runner never cross-contaminate the `pipeline` field. */
  def withContext(kv: (String, String)*): PipelineLogger = {
    val child = new PipelineLogger(name, sink)
    child.setContext((context.toSeq ++ kv): _*)
    child
  }

  // JSON string escape: quote, backslash, and all control chars
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private val FixedFields = Set("timestamp", "level", "logger", "message")

  /** Render one entry: fixed fields first (`logging.py:24-32`), then
    * sticky context, then per-call extras (extras win on key clash; a
    * context/extra key that collides with a fixed field is prefixed
    * `ctx_` — duplicate keys in one JSON object make parsers disagree,
    * the reference filters them the same way, `logging.py:38-45`). */
  private[pipeline] def entry(level: String, message: String,
      extra: Seq[(String, String)]): String = {
    val fields =
      Seq(
        "timestamp" -> java.time.Instant.now().toString,
        "level" -> level,
        "logger" -> name,
        "message" -> message) ++
        (context ++ extra.toMap).toSeq.sortBy(_._1)
          .map { case (k, v) =>
            (if (FixedFields.contains(k)) s"ctx_$k" else k) -> v
          }
    fields.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
  }

  private def emit(level: String, message: String,
      extra: Seq[(String, String)], out: String => Unit): Unit = {
    val line = entry(level, message, extra)
    sink.getOrElse(out)(line)
  }

  def debug(message: String, extra: (String, String)*): Unit =
    emit("DEBUG", message, extra, underlying.debug(_))
  def info(message: String, extra: (String, String)*): Unit =
    emit("INFO", message, extra, underlying.info(_))
  def warn(message: String, extra: (String, String)*): Unit =
    emit("WARN", message, extra, underlying.warn(_))
  def error(message: String, extra: (String, String)*): Unit =
    emit("ERROR", message, extra, underlying.error(_))

  /** Exception entry with class + message + top frame, the reference's
    * `exception` field (`logging.py:34-36`). */
  def error(message: String, t: Throwable, extra: (String, String)*): Unit = {
    val top = t.getStackTrace.headOption.map(_.toString).getOrElse("")
    error(message,
      (extra :+ ("exception" ->
        s"${t.getClass.getName}: ${Option(t.getMessage).getOrElse("")} at $top")): _*)
  }
}
