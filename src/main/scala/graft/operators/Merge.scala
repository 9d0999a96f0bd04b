package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental MERGE semantics (SURVEY §2.6 T3, §7.5 risk 1).
  *
  * The reference declares `incremental_strategy: merge` on
  * `unique_key: order_id` (`config/pipelines/sample_pipeline.yaml:93-94`)
  * but ships no implementation (empty dbt project). Plain parquet has no
  * ACID MERGE, so the engine re-expresses it as a deterministic
  * latest-wins rewrite: union base and delta, keep one row per key by
  * (version, sourceRank) — a standard upsert pattern for non-transactional
  * lakes.
  *
  * Scale: the union + window shuffles once on the unique key — the same
  * shuffle a MERGE join would need. For 100 TB fact tables, partition the
  * stored table by a coarse key (e.g. order date) and rewrite only the
  * partitions the delta touches (see [[mergeIntoPartitioned]]-style usage
  * in the streaming sink); the latest-wins core below is unchanged.
  */
object Merge {

  /** Upsert `delta` into `base`: one surviving row per `keys`, the one
    * with the highest (`version`, delta-over-base) rank. Deletes are
    * handled by filtering `deleteMarker` rows after the merge.
    *
    * `allowEvolution=true` accepts schema drift between base and delta
    * (the CDC reality: upstream adds a column mid-stream): columns
    * missing on either side are null-filled, so a new delta column
    * appears in the merged table with nulls for historical rows, and a
    * column dropped upstream keeps its history. Default is strict —
    * silent drift on a curated fact table should fail loudly. */
  def latestWins(base: DataFrame, delta: DataFrame, keys: Seq[String],
      version: Column, deleteMarker: Option[Column] = None,
      allowEvolution: Boolean = false): DataFrame = {
    import graft.plans.TopK
    val tagged = base.withColumn("__src", lit(0))
      .unionByName(delta.withColumn("__src", lit(1)),
        allowMissingColumns = allowEvolution)
      .withColumn("__version", version)
    // k=1 heap per key (no per-key sort): the winner is the highest
    // (version, delta-over-base) row
    val merged = TopK.perKey(tagged, keys,
        Seq(TopK.desc("__version"), TopK.desc("__src")), k = 1)
      .drop("rank", "__version", "__src")
    deleteMarker.map(m => merged.filter(!coalesce(m, lit(false)))).getOrElse(merged)
  }

  /** The 100 TB merge path: upsert `delta` into a parquet table
    * PARTITIONED by `partitionCol`, rewriting ONLY the partitions the
    * delta touches.
    *
    *  1. the delta's distinct partition values (small — one row per
    *     touched partition) drive both the base-side read (partition
    *     pruning: untouched partitions are never scanned) and
    *  2. the write, under dynamic partition-overwrite mode, replaces
    *     only partitions present in the written data — untouched
    *     partition directories keep their files byte-for-byte.
    *
    * Cost is proportional to |delta ∪ touched-partition data|, not to
    * the table. This is the engine's answer to the reference's declared
    * `incremental_strategy: merge` without a transactional format. */
  def mergeIntoPartitioned(spark: SparkSession, basePath: String,
      delta: DataFrame, keys: Seq[String], version: Column,
      partitionCol: String): Unit = {
    val touched = delta.select(col(partitionCol)).distinct().collect()
      .map(_.get(0)).toSeq
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // resolve by the path's own scheme — FileSystem.get(conf) returns
      // the defaultFS client and throws on e.g. an s3a:// base path
      val basePathP = new org.apache.hadoop.fs.Path(basePath)
      val fs = basePathP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val exists = fs.exists(basePathP)
      val base =
        if (exists)
          spark.read.parquet(basePath)
            .filter(col(partitionCol).isin(touched: _*))
        else delta.limit(0)
      val merged = latestWins(base, delta, keys, version)
      merged.write.mode(SaveMode.Overwrite)
        .partitionBy(partitionCol).parquet(basePath)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  /** Targeted key deletion from a partitioned parquet table — the
    * right-to-be-forgotten / takedown-propagation primitive. Rewrites
    * ONLY the partitions that contain at least one matching row (the
    * [[mergeIntoPartitioned]] cost model: work ∝ affected partitions,
    * never the table), anti-joining the deletion list (broadcast — a
    * deletion list is request-sized; a crawl-sized purge should go
    * through a full compaction instead). A partition whose EVERY row is
    * forgotten produces no output files, and dynamic partition
    * overwrite only replaces partitions present in the written frame —
    * the stale directory is deleted explicitly, or the "deleted" rows
    * would still be served. Returns the per-partition audit
    * (rows_before, rows_removed) a compliance process records; the
    * audit is materialized BEFORE the rewrite so it reflects the
    * pre-delete table even though the read path is being replaced. */
  def forgetKeys(spark: SparkSession, basePath: String, forget: DataFrame,
      keyCol: String, partitionCol: String): DataFrame = {
    val keys = forget.select(col(keyCol)).distinct()
    val base = spark.read.parquet(basePath)
    val audit = base
      .join(broadcast(keys), Seq(keyCol), "left_semi")
      .groupBy(col(partitionCol)).agg(count(lit(1)).as("rows_removed"))
      .join(base.groupBy(col(partitionCol))
        .agg(count(lit(1)).as("rows_before")), Seq(partitionCol))
      .select(col(partitionCol), col("rows_before"), col("rows_removed"))
      .localCheckpoint()
    val touched = audit.select(col(partitionCol)).collect().map(_.get(0)).toSeq
    if (touched.nonEmpty) {
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        val kept = base.filter(col(partitionCol).isin(touched: _*))
          .join(broadcast(keys), Seq(keyCol), "left_anti")
          // materialize before the overwrite replaces the files it reads
          .localCheckpoint()
        kept.write.mode(SaveMode.Overwrite)
          .partitionBy(partitionCol).parquet(basePath)
        val keptParts = kept.select(col(partitionCol)).distinct()
          .collect().map(_.get(0)).toSet
        val basePathP = new org.apache.hadoop.fs.Path(basePath)
        val fs = basePathP.getFileSystem(spark.sparkContext.hadoopConfiguration)
        touched.filterNot(keptParts).foreach { p =>
          fs.delete(new org.apache.hadoop.fs.Path(basePathP,
            s"$partitionCol=$p"), true)
        }
      } finally {
        prev match {
          case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
          case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
      }
    }
    audit
  }

  /** Log-structured versioned table (poor-man's Delta log on plain
    * parquet): each published version is an APPEND-ONLY delta
    * directory `path/version=N` of upserts and tombstones
    * (`_deleted = true` rows); nothing is ever rewritten, so every
    * historical version stays readable — the time-travel capability
    * snapshotDiff's full-snapshot world lacks. Publish with
    * [[appendVersion]], read any point in time with [[readAsOf]].
    *
    * Scale: [[readAsOf]] filters `version <= asOf` BEFORE the read
    * resolves — `version` is a partition column, so pruning skips
    * newer delta directories entirely — then collapses to one row per
    * key via the bounded k=1 heap ([[graft.plans.TopKPerKeyExec]]) on
    * ONE key shuffle (no per-key sort of deep histories). Compact old
    * versions out of band when the changelog outgrows the base (the
    * [[graft.streaming.Streams.compactBatchOutput]] pattern). */
  def appendVersion(df: DataFrame, path: String, version: Long,
      deletedCol: Option[String] = None): Unit = {
    val withDel = deletedCol match {
      case Some(c) => df.withColumnRenamed(c, "_deleted")
      case None if df.columns.contains("_deleted") => df
      case None => df.withColumn("_deleted", lit(false))
    }
    withDel.write.mode(SaveMode.Overwrite)
      .parquet(s"$path/version=$version")
  }

  /** Compact the changelog: fold every version ≤ `upTo` into ONE base
    * delta at `version=upTo` (the materialized [[readAsOf]] snapshot —
    * tombstoned keys vanish entirely, their history having served its
    * purpose) and delete the older version directories. Reads at
    * asOf ≥ upTo are BIT-identical before and after; reads at
    * asOf < upTo become unavailable — compaction is the retention
    * boundary, the same trade Delta/Iceberg expose as VACUUM. Crash
    * safety: the compacted base is written to a temp dir and swapped
    * into `version=upTo` via the checked rename pair BEFORE the older
    * directories are deleted — a crash mid-delete leaves extra (stale
    * but shadowed) versions, never a missing base. The scratch and
    * backup directories are UNDERSCORE-prefixed and `=`-free
    * (`_compact_N__new`): Spark's file index skips `_`-paths ONLY
    * when they contain no `=` (an `=` makes it parse them as
    * partition dirs), so this naming guarantees a crash
    * mid-compaction (or a concurrent reader racing the tmp write)
    * can never poison
    * [[readAsOf]]'s partition discovery with a non-numeric `version`
    * value — and a re-run heals itself because its own readAsOf never
    * sees the leftovers. */
  def compactVersions(spark: SparkSession, path: String, upTo: Long,
      keys: Seq[String], zorderBy: Seq[String] = Nil,
      zorderFiles: Int = 16): Unit = {
    val base = readAsOf(spark, path, upTo, keys)
      .withColumn("_deleted", lit(false))
      .localCheckpoint() // materialize before the rewrite deletes inputs
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(root, s"version=$upTo")
    val tmp = new org.apache.hadoop.fs.Path(root, s"_compact_$upTo" + "__new")
    val backup = new org.apache.hadoop.fs.Path(root, s"_compact_$upTo" + "__old")
    graft.core.AtomicSwap.heal(fs, target, backup)
    // a stale tmp from a crashed run is fully replaced (Overwrite), and
    // was invisible to the readAsOf above (underscore prefix).
    // Compaction rewrites every row anyway, so it is the free moment to
    // CLUSTER the base: with `zorderBy`, route through the N-dim
    // z-order writer so a long-lived filter-heavy table gains tight
    // per-file min/max on all listed columns instead of key-shuffle
    // row order.
    if (zorderBy.nonEmpty)
      graft.operators.Layout.zorderWrite(base, tmp.toString, zorderBy,
        zorderFiles)
    else
      base.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    graft.core.AtomicSwap.publish(fs, target, tmp, backup)
    val stat = fs.listStatus(root)
    stat.map(_.getPath).filter { p =>
      val n = p.getName
      n.startsWith("version=") && !n.contains("__") &&
        n.stripPrefix("version=").toLong < upTo
    }.foreach(p => fs.delete(p, true))
  }

  /** The table as of `asOf`: latest version ≤ asOf per key, tombstones
    * dropped. Keys never written by any version ≤ asOf are absent —
    * exactly the snapshot a reader at that version would have seen.
    *
    * Schema evolution: versions may ADD or DROP columns over the
    * table's life — `mergeSchema` resolves the read to the UNION
    * schema of all delta directories, null-filling columns a version
    * didn't write. A key's as-of row carries exactly the columns its
    * LATEST ≤ asOf version wrote (others null), and [[compactVersions]]
    * preserves the union schema (its base is this read). */
  def readAsOf(spark: SparkSession, path: String, asOf: Long,
      keys: Seq[String]): DataFrame = {
    import graft.plans.TopK
    val log = spark.read.option("mergeSchema", "true").parquet(path)
      .filter(col("version") <= asOf)
    TopK.perKey(log, keys, Seq(TopK.desc("version")), k = 1)
      .filter(!col("_deleted"))
      .drop("rank", "version", "_deleted")
  }
}
