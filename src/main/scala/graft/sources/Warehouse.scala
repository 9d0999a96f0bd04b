package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** S8: warehouse DDL management over the session catalog — the loader
  * ABC's `table_exists` / `create_table` surface
  * (reference `src/interfaces/base.py:114-130`) that the merge sinks in
  * [[graft.streaming.Streams]] sit on top of.
  *
  * Tables are EXTERNAL parquet tables: the catalog holds schema +
  * location + partition spec, the data directory stays the single source
  * of truth (so the same paths the sinks write remain readable by any
  * engine). All operations here are catalog metadata — no data jobs. */
object Warehouse {

  /** Backtick-quote one identifier part (embedded backticks double). */
  private def quotePart(part: String): String =
    "`" + part.replace("`", "``") + "`"

  /** Quote a possibly-qualified table name (`db.table`) part by part. */
  private def quoteTable(table: String): String =
    table.split('.').map(quotePart).mkString(".")

  /** Escape a path for a single-quoted SQL string literal. */
  private def quoteLocation(location: String): String =
    "'" + location.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** `table_exists` (`base.py:127-130`). */
  def tableExists(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(table)

  /** `create_table` (`base.py:114-125`): external parquet table at
    * `location` with an explicit schema; `partitionBy` columns become the
    * table's partition spec (the 100 TB layout lever — partition pruning
    * needs the spec declared, not inferred). No-op if it exists.
    * Identifiers are backtick-quoted and the location is escaped, so
    * paths with quotes or table names needing quoting can't break (or
    * inject into) the statement. */
  def createTable(spark: SparkSession, table: String, location: String,
      schema: StructType, partitionBy: Seq[String] = Seq.empty): Unit = {
    val partClause =
      if (partitionBy.isEmpty) ""
      else partitionBy.map(quotePart).mkString(" PARTITIONED BY (", ", ", ")")
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS ${quoteTable(table)} (${schema.toDDL})
         |USING PARQUET$partClause
         |LOCATION ${quoteLocation(location)}""".stripMargin)
    if (partitionBy.nonEmpty)
      // register partitions already present at the location
      spark.sql(s"MSCK REPAIR TABLE ${quoteTable(table)}")
  }

  /** Idempotent ensure-then-report: create if missing, return whether a
    * create happened. */
  def ensureTable(spark: SparkSession, table: String, location: String,
      schema: StructType, partitionBy: Seq[String] = Seq.empty): Boolean =
    if (tableExists(spark, table)) false
    else { createTable(spark, table, location, schema, partitionBy); true }

  def dropTable(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS ${quoteTable(table)}")

  /** Small-files compaction — the hygiene every micro-batch sink needs
    * at scale: thousands of tiny per-batch files turn a 100 TB scan
    * into a listing/open-seek storm and starve the scheduler with
    * sub-MB tasks. Rewrites the directory into ≈`targetBytes`-sized
    * files (computed from the CURRENT total size, so compaction stays
    * proportional to the data), then atomically swaps via write-new +
    * rename — same single-writer contract as the merge sinks. Run it
    * OFFLINE between streaming runs (single writer); for continuously
    * live tables, compact partition-by-partition instead.
    *
    * Crash-safe: the live directory is RENAMED aside (never deleted
    * before the replacement is in place), so every interruption point
    * leaves a complete copy under `path`, `path__compact`, or
    * `path__compact_old`, and the next call heals: a missing live dir
    * with the rewrite present finishes the swap; a leftover backup
    * beside a live dir is retired; an unswapped rewrite is discarded
    * (the live dir is still authoritative). Every FS mutation's return
    * value is checked — a failed rename must surface, not report a
    * successful compaction.
    *
    * `zorderBy` re-CLUSTERS during the rewrite (the free moment — every
    * row moves anyway) via [[graft.operators.Layout.zorderWrite]], so a
    * filter-heavy table gains per-file pruning on all listed columns.
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024,
      zorderBy: Seq[String] = Nil): (Long, Long) = {
    import org.apache.hadoop.fs.Path
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + "__compact")
    val backup = new Path(path + "__compact_old")
    import graft.core.AtomicSwap
    if (!fs.exists(dir) && fs.exists(tmp))
      // crashed between the two renames: the rewrite (complete by
      // construction — the live dir is only moved aside after the write
      // returns) becomes the live dir; the backup, if also present, is
      // the OLDER un-compacted copy and is retired below
      AtomicSwap.checked(fs.rename(tmp, dir), "compact heal: publish rewrite", dir)
    else
      // only the moved-aside original remains — restore it
      AtomicSwap.heal(fs, dir, backup)
    if (fs.exists(backup))
      AtomicSwap.checked(fs.delete(backup, true), "compact: retire backup", backup)
    if (fs.exists(tmp))
      AtomicSwap.checked(fs.delete(tmp, true), "compact: discard stale rewrite", tmp)
    val files = fs.listFiles(dir, true)
    var nBefore = 0L
    var totalBytes = 0L
    while (files.hasNext) {
      val f = files.next()
      if (!f.getPath.getName.startsWith("_") &&
          !f.getPath.toString.contains("/_")) {
        nBefore += 1; totalBytes += f.getLen
      }
    }
    val parts = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    // the rewrite touches every row anyway — with `zorderBy`, spend it
    // on clustering (tight per-file min/max on all listed columns)
    // instead of a plain round-robin repartition
    if (zorderBy.nonEmpty)
      graft.operators.Layout.zorderWrite(
        spark.read.parquet(path), tmp.toString, zorderBy, parts)
    else
      spark.read.parquet(path).repartition(parts)
        .write.mode("overwrite").parquet(tmp.toString)
    graft.core.AtomicSwap.publish(fs, dir, tmp, backup)
    val after = fs.listFiles(dir, true)
    var nAfter = 0L
    while (after.hasNext) {
      val f = after.next()
      if (!f.getPath.getName.startsWith("_")) nAfter += 1
    }
    (nBefore, nAfter)
  }

  /** Bucketed external table write — the co-location lever for repeated
    * fact-fact joins at 100 TB. Two tables bucketed (and optionally
    * sorted) on the same key with the same bucket count join with NO
    * exchange on either side: the scan's output partitioning already
    * satisfies the join's required distribution, so the single biggest
    * shuffle in a fact-fact plan (e.g. orders ⨝ lineitem on orderkey)
    * disappears from every downstream run. Aggregations on the bucket
    * key and equality filters (bucket pruning: only 1/N of the files
    * read) get the same treatment. Bucket metadata lives in the session
    * catalog, so this must go through `saveAsTable`; the data stays
    * external parquet at `location`.
    *
    * Pick `numBuckets` so one bucket ≈ one healthy task input
    * (128–512 MB): e.g. a 10 TB fact at 256 MB/bucket → ~40k buckets.
    * Both join sides must use the SAME count (Spark joins equal-count
    * bucketed scans shuffle-free; mismatched counts shuffle the smaller
    * side). */
  def writeBucketed(df: org.apache.spark.sql.DataFrame, table: String,
      location: String, bucketCols: Seq[String], numBuckets: Int,
      sortCols: Seq[String] = Seq.empty,
      mode: String = "overwrite"): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    var w = df.write.mode(mode).format("parquet")
      .option("path", location)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(table)
  }

  /** Write parquet with BLOOM FILTERS on `bloomCols`: row groups that
    * cannot contain a point-predicate value are skipped at scan time —
    * the data-skipping lever for high-cardinality point lookups (id
    * probes on a 100 TB fact) where min/max statistics are useless
    * because every row group spans the whole id range. `ndv` sizes the
    * filter (bits ∝ distinct values per row group at the configured
    * false-positive rate). Sorting by the bloom column first
    * concentrates each value into few row groups — combine with
    * [[writeBucketed]] or a sort for best skipping. */
  def writeWithBloomFilters(df: org.apache.spark.sql.DataFrame, path: String,
      bloomCols: Seq[String], ndv: Long = 100000L): Unit = {
    require(bloomCols.nonEmpty, "bloomCols must be non-empty")
    var w = df.write.mode("overwrite")
    bloomCols.foreach { c =>
      w = w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }
    w.parquet(path)
  }

  /** Do the parquet files at `path` carry a bloom filter for `column`?
    * Reads the footers (metadata only — no data I/O); used by tests and
    * layout audits. */
  def hasBloomFilter(spark: SparkSession, path: String,
      column: String): Boolean = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val parts = fs.listStatus(dir)
      .filter(f => f.getPath.getName.endsWith(".parquet"))
    parts.nonEmpty && parts.forall { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
      try {
        val blocks = reader.getFooter.getBlocks
        !blocks.isEmpty && {
          import scala.jdk.CollectionConverters._
          blocks.asScala.forall(_.getColumns.asScala
            .exists(c => c.getPath.toDotString == column &&
              c.getBloomFilterOffset >= 0))
        }
      } finally reader.close()
    }
  }

  /** Compute catalog statistics so the cost-based optimizer has real
    * numbers: table-level size/row count, plus per-column NDV/min/max
    * histogramless stats for `columns` (join-reorder and broadcast
    * decisions read these — without ANALYZE, Spark falls back to file
    * sizes only, and a compact-but-wide dimension can miss its
    * broadcast). One pass per ANALYZE statement, metadata-only
    * afterwards. */
  def analyze(spark: SparkSession, table: String,
      columns: Seq[String] = Seq.empty): Unit =
    // FOR COLUMNS also computes table-level row count/size — running the
    // plain statement first would scan the table a second time for
    // statistics the column pass produces anyway
    if (columns.isEmpty)
      spark.sql(s"ANALYZE TABLE ${quoteTable(table)} COMPUTE STATISTICS")
    else
      spark.sql(s"ANALYZE TABLE ${quoteTable(table)} COMPUTE STATISTICS " +
        s"FOR COLUMNS ${columns.map(quotePart).mkString(", ")}")

  /** Catalog row-count statistic for `table` (None until [[analyze]]
    * has run). */
  def tableRowCount(spark: SparkSession, table: String): Option[BigInt] =
    spark.sql(s"DESCRIBE TABLE EXTENDED ${quoteTable(table)}")
      .collect()
      .find(_.getString(0) == "Statistics")
      .flatMap { r =>
        "(\\d+) rows".r.findFirstMatchIn(r.getString(1)).map(m => BigInt(m.group(1)))
      }
}
