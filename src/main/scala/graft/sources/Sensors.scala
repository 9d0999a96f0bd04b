package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Driver-side change sensors (SURVEY §2.8 O5–O9).
  *
  * In streaming mode these are subsumed by Structured Streaming's file
  * source / triggers; batch pipelines still need cheap "anything new?"
  * probes before launching jobs. Each sensor is a pure function of
  * (config, observed state) → decision, with all clocks injected
  * (SURVEY §7.5 risk 6 — the reference's table sensor is a random stub,
  * `sensors.py:216-217`; we implement the declared semantics for real).
  */
object Sensors {

  /** O5 threshold gate (`sensors.py:82-91`): trigger when
    * `min ≤ n` and, if `max` set, fail when `n > max`. */
  sealed trait GateResult
  case object NotReady extends GateResult
  case object Ready extends GateResult
  case class Exceeded(count: Long, max: Long) extends GateResult

  def changeGate(nChanges: Long, minChanges: Long,
      maxChanges: Option[Long]): GateResult =
    maxChanges match {
      case Some(mx) if nChanges > mx => Exceeded(nChanges, mx)
      case _ if nChanges >= minChanges => Ready
      case _ => NotReady
    }

  /** O7 file-system sensor (`sensors.py:226-353`): glob paths whose
    * mtime advanced past `lastSeenMtime`, are at least `minAgeSeconds`
    * old (quiesced — still being written ⇒ skip), and at least
    * `minSizeBytes` big. */
  case class FileChange(path: String, mtimeMillis: Long, sizeBytes: Long)

  def detectFileChanges(dir: String, glob: String, lastSeenMtime: Long,
      nowMillis: Long, minAgeSeconds: Long = 0,
      minSizeBytes: Long = 0): Seq[FileChange] = {
    val base = Paths.get(dir)
    if (!Files.isDirectory(base)) return Seq.empty
    val matcher = base.getFileSystem.getPathMatcher(s"glob:$glob")
    val stream = Files.walk(base)
    try {
      stream.iterator().asScala
        .filter(p => Files.isRegularFile(p) && matcher.matches(base.relativize(p)))
        .flatMap { p: Path =>
          val mtime = Files.getLastModifiedTime(p).toMillis
          val size = Files.size(p)
          val ageOk = nowMillis - mtime >= minAgeSeconds * 1000
          if (mtime > lastSeenMtime && ageOk && size >= minSizeBytes)
            Some(FileChange(p.toString, mtime, size))
          else None
        }
        .toSeq.sortBy(_.path)
    } finally stream.close()
  }

  /** O8 API sensor (`sensors.py:356-445`): change when the dot-path
    * field of the latest poll differs from the previous poll. */
  def dotPath(json: String, path: String): Option[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = path.split("\\.").foldLeft(
      Option(mapper.readTree(json))) {
      case (Some(n), key) if n.hasNonNull(key) => Some(n.get(key))
      case _ => None
    }
    node.map(n => if (n.isContainerNode) n.toString else n.asText())
  }

  def apiChanged(previousValue: Option[String], currentPayload: String,
      fieldPath: String): Boolean =
    dotPath(currentPayload, fieldPath) match {
      case None => false
      case cur @ Some(_) => previousValue != cur
    }

  /** O6 table probe: newest timestamp / row count vs last observation —
    * the DECLARED semantics (the reference's timestamp path is a random
    * stub). Caller supplies the probe result (e.g. from
    * `JdbcSource.probeSql` or a parquet `max(ts)` scan). */
  def tableChanged(lastRowCount: Option[Long], lastMaxTs: Option[Long],
      rowCount: Long, maxTs: Option[Long]): Boolean =
    lastRowCount.forall(_ != rowCount) ||
      ((maxTs, lastMaxTs) match {
        case (Some(cur), Some(prev)) => cur > prev
        case (Some(_), None) => true
        case _ => false
      })

  /** O9 custom sensor: user-supplied predicate (`sensors.py:448-480`). */
  def custom(predicate: () => Boolean): Boolean = predicate()
}
