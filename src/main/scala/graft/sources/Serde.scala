package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** DataFrame serialization in the reference's formats (SURVEY §2.1 S7):
  * Parquet, CSV, JSON — plus ORC and XML (both native to Spark 4) —
  * each with optional compression. Pickle (`extractors.py:353-413`)
  * has no JVM analog and is dropped by design.
  *
  * Unlike the reference (bytes in driver memory), these go through
  * distributed writers/readers — at 100 TB a "serialize" is a parallel
  * write, never a single-buffer materialization. Round-trip fidelity is
  * format-bound: Parquet is exact; CSV/JSON need the declared schema on
  * read (schema inference would widen types), which callers pass back in.
  */
object Serde {

  sealed trait Format { def name: String }
  case object Parquet extends Format { val name = "parquet" }
  case object Csv extends Format { val name = "csv" }
  case object Json extends Format { val name = "json" }
  case object Orc extends Format { val name = "orc" }
  /** Spark 4 ships the XML source natively (the donated spark-xml) —
    * API feeds and legacy enterprise interchange, no extra dependency. */
  case object Xml extends Format { val name = "xml" }

  def write(df: DataFrame, path: String, format: Format,
      compression: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .option("compression", compression.getOrElse("none"))
    format match {
      case Parquet => w.parquet(path)
      case Csv => w.option("header", "true")
        // explicit formats so timestamps survive the text round-trip
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .csv(path)
      case Json => w.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .json(path)
      case Orc => w.orc(path)
      case Xml => w.option("rowTag", "row")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS[XXX]")
        .format("xml").save(path)
    }
  }

  /** V19, schema-enforced form: read text-format data PERMISSIVEly with
    * a corrupt-record column — malformed rows survive (nulled fields +
    * raw line captured) instead of failing the job or silently skewing
    * type inference. The reference samples 100 values per object column
    * to guess at mixed types (`extractors.py:247-254`); under a declared
    * schema the honest equivalent is counting rows that failed to parse. */
  def readJsonTracking(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record",
      org.apache.spark.sql.types.StringType)
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .json(path)
  }

  /** Corrupt-row count from a tracking read (requires the frame to be
    * cached or re-readable — Spark computes _corrupt_record per scan). */
  def corruptCount(df: DataFrame): Long =
    df.filter(org.apache.spark.sql.functions.col("_corrupt_record").isNotNull)
      .count()

  /** Read back with the original schema enforced (exact round-trip). */
  def read(spark: SparkSession, path: String, format: Format,
      schema: Option[StructType] = None): DataFrame = {
    format match {
      case Parquet =>
        spark.read.parquet(path)
      case Csv =>
        val r = spark.read.option("header", "true")
          .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        schema.map(r.schema).getOrElse(r.option("inferSchema", "true")).csv(path)
      case Json =>
        val r = spark.read
          .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        schema.map(r.schema).getOrElse(r).json(path)
      case Orc =>
        spark.read.orc(path)
      case Xml =>
        val r = spark.read.option("rowTag", "row")
          .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS[XXX]")
        schema.map(r.schema).getOrElse(r).format("xml").load(path)
    }
  }
}
