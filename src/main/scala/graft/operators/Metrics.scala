package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Batch-side execution metrics (SURVEY §2.2 E6 — the reference keeps
  * per-(source, table) row/duration tallies under a lock,
  * `extractors.py:318-336`). Spark already measures everything; this
  * listener surfaces rows-written/duration per named action without
  * touching the data path. */
class BatchMetricsListener extends QueryExecutionListener {
  case class ActionMetrics(rows: Long, durationNs: Long, failed: Boolean)

  private val metrics =
    new java.util.concurrent.ConcurrentHashMap[String, ActionMetrics]()

  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit = {
    // Delivery is ASYNC (ExecutionListenerBus): by the time this runs,
    // the world the plan referenced may be gone (e.g. a temp dir the
    // caller swapped away), and on a shared session the event may
    // belong to a query this listener's owner never ran. A listener
    // must never throw into the bus — that line in the log is exactly
    // the diagnostic noise a regression hunt greps for.
    val rows =
      try Option(qe.executedPlan.metrics.get("numOutputRows"))
        .flatten.map(_.value).getOrElse(-1L)
      catch { case _: Throwable => -1L }
    metrics.put(s"$funcName#${metrics.size}",
      ActionMetrics(rows, durationNs, failed = false))
  }

  override def onFailure(funcName: String, qe: QueryExecution,
      error: Exception): Unit =
    metrics.put(s"$funcName#${metrics.size}",
      ActionMetrics(-1L, 0L, failed = true))

  def snapshot: Map[String, ActionMetrics] = {
    import scala.jdk.CollectionConverters._
    metrics.asScala.toMap
  }

  def totalActions: Int = metrics.size
  def anyFailure: Boolean = snapshot.values.exists(_.failed)
}

object Metrics {
  /** Attach a fresh listener to the session; caller keeps the handle. */
  def attach(spark: SparkSession): BatchMetricsListener = {
    val l = new BatchMetricsListener
    spark.listenerManager.register(l)
    l
  }
  def detach(spark: SparkSession, l: BatchMetricsListener): Unit =
    spark.listenerManager.unregister(l)
}
