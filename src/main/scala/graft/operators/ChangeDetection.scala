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

  /** Snapshot diff: classify every primary key across two table
    * versions as `added` / `removed` / `changed` / (dropped)
    * `unchanged`, with the exact set of changed columns per row — the
    * audit view behind "what did yesterday's load do to this table?",
    * and the batch analog of a CDC changelog when the source system
    * ships only full snapshots (the reference's FULL extraction mode,
    * `data_sources.py`, has no delta log to read — diffing successive
    * snapshots IS its change stream).
    *
    * `compareCols` defaults to all shared non-key columns. Column
    * comparison is null-safe (`<=>`); `changed_cols` lists differing
    * columns in `compareCols` order via `concat_ws` (skips the
    * non-differing entries' NULLs — identical semantics in DuckDB for
    * the oracle).
    *
    * Scale: ONE full outer join on the primary key — both sides
    * shuffle-partition by pk (or co-locate for free if both snapshots
    * are bucketed by pk, the layout [[graft.operators.Layout]]
    * recommends for fact tables); the per-column comparison is
    * map-side on the joined row. `unchanged` rows are dropped before
    * the result materializes, so output size is proportional to the
    * CHANGE volume, not the table. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, pk: Seq[String],
      compareCols: Seq[String] = Nil): DataFrame = {
    val cols =
      if (compareCols.nonEmpty) compareCols
      else oldDf.columns.filter(c => !pk.contains(c) &&
        newDf.columns.contains(c)).toSeq
    val o = oldDf.select((pk ++ cols).map(col): _*)
      .withColumn("__in_old", lit(true))
    val n = newDf.select((pk ++ cols).map(col): _*)
      .withColumn("__in_new", lit(true))
    val oldR = o.toDF(o.columns.map(c =>
      if (pk.contains(c)) c else s"${c}_old").toIndexedSeq: _*)
    val newR = n.toDF(n.columns.map(c =>
      if (pk.contains(c)) c else s"${c}_new").toIndexedSeq: _*)
    val joined = oldR.join(newR, pk, "full_outer")
    val changedCols = concat_ws(",", cols.map(c =>
      when(!(col(s"${c}_old") <=> col(s"${c}_new")), lit(c))): _*)
    joined
      .withColumn("change_type",
        when(col("__in_old_old").isNull, lit("added"))
          .when(col("__in_new_new").isNull, lit("removed"))
          .when(changedCols =!= "", lit("changed"))
          .otherwise(lit("unchanged")))
      .withColumn("changed_cols",
        when(col("change_type") === "changed", changedCols)
          .otherwise(lit("")))
      .filter(col("change_type") =!= "unchanged")
      .select(pk.map(col) ++
        Seq(col("change_type"), col("changed_cols")): _*)
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
