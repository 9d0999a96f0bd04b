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
}
