package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch-mode change detection (SURVEY §2.3 C1–C7, §2.1 S2/S3).
  *
  * The streaming path uses checkpoints + `withWatermark` +
  * `dropDuplicatesWithinWatermark` (see `graft.streaming`); these are the
  * batch-incremental equivalents, where the watermark lives in a tiny
  * keyed table instead of a checkpoint (reference `MetadataStore`,
  * `change_detection.py:28-90`, was a JSON file per (source, table)).
  *
  * Scale: detection is a filter + per-key aggregate — one scan, one
  * shuffle of per-key partial aggregates (bytes, not rows). The watermark
  * table is broadcast; the event table never shuffles raw rows.
  */
object ChangeDetection {

  /** S2/C3: timestamp-watermark scan. For each key group, count rows
    * newer than that key's watermark and compute the advanced watermark —
    * the exact probe the reference builds as
    * `SELECT COUNT(*), MAX(ts) WHERE ts > :last` per table
    * (`data_sources.py:128-164`), generalized to one pass over ALL keys.
    *
    * `watermarks`: (key, last_ts). Keys absent from it get `defaultTs`. */
  def detectChanges(df: DataFrame, keyCol: String, tsCol: String,
      watermarks: DataFrame, defaultTs: Column): DataFrame = {
    val wm = watermarks.withColumnRenamed("key", keyCol)
    df.join(broadcast(wm), Seq(keyCol), "left")
      .withColumn("__wm", coalesce(col("last_ts"), defaultTs))
      .filter(col(tsCol) > col("__wm"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("change_count"), max(col(tsCol)).as("new_watermark"))
  }

  /** C2: event dedup on the reference's composite key
    * source:table:type:timestamp (`change_detection.py:102-104`) — only
    * EXACT re-deliveries collapse, not logical duplicates. Timestamps are
    * compared at millisecond precision (the reference's `.timestamp()`
    * float seconds carry ~µs; parquet writers differ below that). */
  def dedupExactRedeliveries(df: DataFrame, keyCols: Seq[String],
      tsCol: String): DataFrame = {
    val tsMs = date_trunc("millisecond", col(tsCol)).as("__ts_ms")
    df.withColumn("__ts_ms", tsMs)
      .dropDuplicates(keyCols :+ "__ts_ms")
      .drop("__ts_ms")
  }

  /** S3/C4: log-based CDC apply — collapse a changelog to latest state
    * per key (deterministic tie-break on `seqCol`, e.g. a log offset).
    * This is the read-side of `MERGE`: one shuffle on the key, then a
    * k=1 heap per key ([[graft.plans.TopKPerKeyExec]]) — no per-key
    * sort of the whole changelog, which is the dominant cost when keys
    * have deep histories. */
  def latestState(changelog: DataFrame, keys: Seq[String], tsCol: String,
      seqCol: String): DataFrame = {
    import graft.plans.TopK
    TopK.perKey(
        changelog.withColumn("__ts_ms", date_trunc("millisecond", col(tsCol))),
        keys,
        Seq(TopK.desc("__ts_ms"), TopK.desc(seqCol)), k = 1)
      .drop("rank", "__ts_ms")
  }
}
