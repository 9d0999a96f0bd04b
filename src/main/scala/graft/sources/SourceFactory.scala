package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pluggable source registry (SURVEY §2.1 S5) keyed by `source_type`,
  * mirroring `DataSourceFactory` (`data_sources.py:489-517`) without
  * reflection: a builder takes (SparkSession, connection params) and
  * yields a DataFrame provider.
  */
object SourceFactory {

  type Builder = (SparkSession, Map[String, String]) => DataFrame

  private val registry =
    scala.collection.concurrent.TrieMap[String, Builder](
      "file" -> { (spark, params) =>
        val format = params.getOrElse("format", "parquet")
        val reader = spark.read.format(format)
        val withOpts =
          if (format == "csv") reader.option("header", "true") else reader
        withOpts.load(params("path"))
      },
      "database" -> { (spark, params) =>
        JdbcSource.load(spark, JdbcSourceConfig(
          url = params("url"),
          table = params("table"),
          user = params.getOrElse("user", ""),
          password = params.getOrElse("password", ""),
          fetchSize = params.getOrElse("fetchsize", "1000").toInt))
      },
      "api" -> { (spark, params) =>
        val cfg = ApiSourceConfig(
          url = params("url"),
          timeoutSeconds = params.getOrElse("timeout", "30").toInt)
        ApiSource.extract(spark,
          new ApiSource.JdkHttp(java.time.Duration.ofSeconds(cfg.timeoutSeconds)),
          cfg, since = params.get("since"))
      })

  /** Register/override a source type (`data_sources.py:507-512`). */
  def register(sourceType: String, builder: Builder): Unit =
    registry.put(sourceType, builder)

  def create(sourceType: String, spark: SparkSession,
      params: Map[String, String]): DataFrame =
    registry.getOrElse(sourceType,
      throw new IllegalArgumentException(
        s"Unsupported source type: $sourceType. " +
          s"Supported types: ${registry.keys.toSeq.sorted.mkString(", ")}"))
      .apply(spark, params)

  def supportedTypes: Seq[String] = registry.keys.toSeq.sorted
}
