package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Custom keyed state via `flatMapGroupsWithState` (SURVEY §2.3 C3 as a
  * continuously-running stream).
  *
  * The reference's `TimestampBasedChangeDetector` keeps a per-(source,
  * table) watermark in a JSON file and, each poll, emits one change
  * event counting rows past it (`change_detection.py:137-227`). The
  * streaming twin holds that watermark in Spark's state store — fault
  * tolerant through checkpoints, scaled by key partitioning — and emits
  * one [[DetectedChange]] per key per micro-batch that actually
  * advanced. Events at or below the stored watermark are suppressed
  * (exactly the reference's "skip unnecessary processing", req 1.5).
  */
case class KeyedEvent(key: String, ts: Timestamp)

case class DetectedChange(key: String, changeCount: Long,
    newWatermark: Timestamp)

/** One user interaction for streaming funnel tracking. */
case class FunnelEvent(userId: Long, ts: Timestamp, eventType: String)

/** A user's funnel progress: highest stage reached so far and when. */
case class FunnelProgress(userId: Long, stage: Int, stageTs: Timestamp)

object Stateful {

  /** Per-key stateful change detection. State = last watermark millis;
    * emission = count + advanced watermark for fresh events only. */
  def detectChanges(events: Dataset[KeyedEvent]): Dataset[DetectedChange] = {
    implicit val longEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[DetectedChange]
    implicit val strEnc = Encoders.STRING
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[Long, DetectedChange](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[KeyedEvent], state: GroupState[Long]) =>
          val last = state.getOption.getOrElse(Long.MinValue)
          var count = 0L
          var maxTs = last
          batch.foreach { e =>
            val t = e.ts.getTime
            if (t > last) {
              count += 1
              if (t > maxTs) maxTs = t
            }
          }
          if (count == 0) Iterator.empty
          else {
            state.update(maxTs)
            Iterator(DetectedChange(key, count, new Timestamp(maxTs)))
          }
      }
  }

  /** Streaming twin of the batch funnel (`w_funnel_steps`): per-user
    * ordered progression view → click → purchase, held as ONE (stage,
    * timestamp) pair in the state store — constant state per user, the
    * shape that survives unbounded streams. A batch's events sort
    * in-memory (per user per micro-batch — bounded), advance the stage
    * strictly in order (a click before the first view does NOT count),
    * and a [[FunnelProgress]] row is emitted only when the stage
    * actually advanced — the same suppress-no-change contract as
    * [[detectChanges]]. */
  def funnelTrack(events: Dataset[FunnelEvent],
      steps: Seq[String] = Seq("view", "click", "purchase"))
      : Dataset[FunnelProgress] = {
    implicit val stEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    implicit val outEnc = Encoders.product[FunnelProgress]
    implicit val keyEnc = Encoders.scalaLong
    val stepIdx = steps.zipWithIndex.toMap
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[(Int, Long), FunnelProgress](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[FunnelEvent],
            state: GroupState[(Int, Long)]) =>
          var (stage, stageTs) = state.getOption.getOrElse((0, Long.MinValue))
          val entered = stage
          // within-batch events replay in event-time order; each step
          // must be STRICTLY after the previous step's timestamp (same
          // contract as the batch funnel). Cross-batch late arrivals
          // can only be missed, never wrongly counted: the ts > stageTs
          // guard still holds for whatever order batches deliver.
          // e.ts != null: a null event timestamp would NPE inside the
          // state function and kill the whole streaming query — an
          // un-timestamped event can never advance a time-ordered
          // funnel, so it is dropped with the non-step events
          val relevant = batch
            .filter(e => e.ts != null && stepIdx.contains(e.eventType))
            .toArray
            .sortBy(e => (e.ts.getTime, stepIdx(e.eventType)))
          relevant.foreach { e =>
            if (stage < steps.length && stepIdx(e.eventType) == stage &&
                (stage == 0 || e.ts.getTime > stageTs)) {
              stage += 1
              stageTs = e.ts.getTime
            }
          }
          if (stage == entered) Iterator.empty
          else {
            state.update((stage, stageTs))
            Iterator(FunnelProgress(userId, stage, new Timestamp(stageTs)))
          }
      }
  }
}
