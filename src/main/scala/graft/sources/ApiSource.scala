package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** HTTP-polling source (SURVEY §2.1 S4).
  *
  * The fetch is inherently driver-side (one small JSON payload per poll —
  * the reference does the same with `requests`,
  * `src/ingestion/data_sources.py:288-486`); distribution starts at
  * parse time: the payload becomes a `Dataset[String]` and
  * `spark.read.json` schema-infers + parses on executors. Incremental
  * polls carry `?since=<last>`; 429 responses back off exponentially
  * (`data_sources.py:383-409`).
  */
case class ApiSourceConfig(
    url: String,
    headers: Map[String, String] = Map.empty,
    timeoutSeconds: Int = 30,
    retryAttempts: Int = 3,
    retryDelayMs: Long = 1000)

object ApiSource {

  trait Http { def get(url: String, headers: Map[String, String]): (Int, String) }

  /** Production transport on java.net.http. */
  class JdkHttp(timeout: Duration) extends Http {
    private val client = HttpClient.newBuilder().connectTimeout(timeout).build()
    def get(url: String, headers: Map[String, String]): (Int, String) = {
      val b = HttpRequest.newBuilder(URI.create(url)).timeout(timeout).GET()
      headers.foreach { case (k, v) => b.header(k, v) }
      val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
  }

  /** GET with the reference's retry shape: 200 → done; 429 → exponential
    * backoff (delay × 2^attempt); other statuses / IO errors → linear
    * delay retry; all attempts exhausted → None. */
  def getWithRetry(http: Http, cfg: ApiSourceConfig, url: String,
      sleep: Long => Unit = Thread.sleep): Option[String] = {
    var attempt = 0
    while (attempt < cfg.retryAttempts) {
      val status =
        try {
          val (code, body) = http.get(url, cfg.headers)
          if (code == 200) return Some(body)
          code
        } catch { case _: java.io.IOException => -1 }
      if (status == 429) sleep(cfg.retryDelayMs * (1L << attempt))
      else if (attempt < cfg.retryAttempts - 1) sleep(cfg.retryDelayMs)
      attempt += 1
    }
    None
  }

  /** Poll URL with incremental `since` param (`data_sources.py:352-355`). */
  def pollUrl(cfg: ApiSourceConfig, since: Option[String]): String =
    since match {
      case Some(s) =>
        val sep = if (cfg.url.contains("?")) "&" else "?"
        s"${cfg.url}$sep" + "since=" +
          java.net.URLEncoder.encode(s, "UTF-8")
      case None => cfg.url
    }

  /** JSON payload → DataFrame, with the reference's three shapes
    * (`data_sources.py:425-433`): top-level array, `{"data": [...]}`
    * envelope, or single object. Parsing/inference runs distributed via
    * `spark.read.json` over a Dataset of row-strings. */
  def jsonToDataFrame(spark: SparkSession, payload: String): DataFrame = {
    import spark.implicits._
    val trimmed = payload.trim
    val rows: Seq[String] =
      if (trimmed.startsWith("[")) splitTopLevelArray(trimmed)
      else {
        // {"data": [...]} envelope, else single object
        val envelope = "\"data\"\\s*:".r.findFirstMatchIn(trimmed)
        if (trimmed.startsWith("{") && envelope.isDefined) {
          val node = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(trimmed)
          if (node.hasNonNull("data") && node.get("data").isArray) {
            val it = node.get("data").elements()
            val buf = Seq.newBuilder[String]
            while (it.hasNext) buf += it.next().toString
            buf.result()
          } else Seq(trimmed)
        } else Seq(trimmed)
      }
    val ds: Dataset[String] = rows.toDS()
    spark.read.json(ds)
  }

  private def splitTopLevelArray(json: String): Seq[String] = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val it = node.elements()
    val buf = Seq.newBuilder[String]
    while (it.hasNext) buf += it.next().toString
    buf.result()
  }

  /** One incremental extract: poll → retry → shape → DataFrame.
    * Empty payloads become empty DataFrames (V16 guard lives upstream). */
  def extract(spark: SparkSession, http: Http, cfg: ApiSourceConfig,
      since: Option[String], sleep: Long => Unit = Thread.sleep): DataFrame =
    getWithRetry(http, cfg, pollUrl(cfg, since), sleep) match {
      case Some(body) if body.trim.nonEmpty && body.trim != "[]" =>
        jsonToDataFrame(spark, body)
      case _ => spark.emptyDataFrame
    }
}
