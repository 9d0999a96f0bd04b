package graft.pipeline

import java.time.{Duration, LocalDateTime}

/** Schedule evaluation (SURVEY §2.8 O11) — interval strings and 5-field
  * cron, dependency-free. Mirrors `task_manager.py:421-604`: interval
  * parser accepts `30s/30m/1h/2d`; cron is minute-resolution. Never reads
  * wall-clock itself (SURVEY §7.5 risk 6) — callers pass `now`.
  */
object Schedules {

  private val IntervalRe = "^(\\d+)([smhd])$".r

  /** `"30m"` → Duration (`task_manager.py:549-570`). */
  def parseInterval(s: String): Duration = s.toLowerCase match {
    case IntervalRe(v, "s") => Duration.ofSeconds(v.toLong)
    case IntervalRe(v, "m") => Duration.ofMinutes(v.toLong)
    case IntervalRe(v, "h") => Duration.ofHours(v.toLong)
    case IntervalRe(v, "d") => Duration.ofDays(v.toLong)
    case _ => throw new IllegalArgumentException(s"Invalid interval format: $s")
  }

  /** One cron field matches a value? Supports star, step (star-slash-n),
    * ranges `a-b` (with steps), comma lists, and plain values. */
  private def fieldMatches(field: String, value: Int, min: Int, max: Int): Boolean =
    field.split(",").exists { part =>
      val (rangePart, step) = part.split("/") match {
        case Array(r) => (r, 1)
        case Array(r, s) => (r, s.toInt)
      }
      val (lo, hi) = rangePart match {
        case "*" => (min, max)
        case r if r.contains("-") =>
          val Array(a, b) = r.split("-"); (a.toInt, b.toInt)
        case v => val x = v.toInt; (x, x)
      }
      value >= lo && value <= hi && (value - lo) % step == 0
    }

  /** Does `t` (minute resolution) satisfy the 5-field cron expression?
    * Fields: minute hour day-of-month month day-of-week (0=Sunday). */
  def cronMatches(expr: String, t: LocalDateTime): Boolean = {
    val f = expr.trim.split("\\s+")
    require(f.length == 5, s"cron must have 5 fields: $expr")
    val dow = t.getDayOfWeek.getValue % 7 // java Mon=1..Sun=7 → cron Sun=0
    fieldMatches(f(0), t.getMinute, 0, 59) &&
      fieldMatches(f(1), t.getHour, 0, 23) &&
      fieldMatches(f(2), t.getDayOfMonth, 1, 31) &&
      fieldMatches(f(3), t.getMonthValue, 1, 12) &&
      fieldMatches(f(4), dow, 0, 6)
  }

  /** Next cron firing strictly after `from` (bounded scan, ≤ 4 years). */
  def nextCron(expr: String, from: LocalDateTime): Option[LocalDateTime] = {
    var t = from.withSecond(0).withNano(0).plusMinutes(1)
    val limit = from.plusYears(4)
    while (t.isBefore(limit)) {
      if (cronMatches(expr, t)) return Some(t)
      t = t.plusMinutes(1)
    }
    None
  }

  /** Next interval firing given the last execution (`task_manager.py:578-604`):
    * first run fires immediately. */
  def nextInterval(interval: String, lastExecution: Option[LocalDateTime],
      now: LocalDateTime): LocalDateTime =
    lastExecution.map(_.plus(parseInterval(interval))).getOrElse(now)

  /** Catchup/backfill enumeration: every cron firing in `(from, to]`,
    * oldest first, capped at `max` (a runaway guard for a years-stale
    * watermark — callers page through). This is the scheduler-catchup
    * primitive: a pipeline that was down computes the run dates it owes,
    * then replays them through `PipelineRunner` oldest-first so
    * incremental models see data in order. */
  def runsBetween(expr: String, from: LocalDateTime, to: LocalDateTime,
      max: Int = 1000): Seq[LocalDateTime] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[LocalDateTime]
    var t = nextCron(expr, from)
    while (out.size < max && t.exists(!_.isAfter(to))) {
      out += t.get
      t = nextCron(expr, t.get)
    }
    out.toSeq
  }
}
