package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SerdeSpec extends AnyFunSuite with SparkSpec {

  def tmp(): String =
    Files.createTempDirectory("graft-serde").toString + "/out"

  test("parquet round-trip is exact") {
    val df = spark.read.parquet(s"$sf/orders.parquet")
    val path = tmp()
    Serde.write(df, path, Serde.Parquet, compression = Some("snappy"))
    val back = Serde.read(spark, path, Serde.Parquet)
    assert(back.schema == df.schema)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("orc round-trip is exact") {
    val df = spark.read.parquet(s"$sf/orders.parquet")
    val path = tmp()
    Serde.write(df, path, Serde.Orc, compression = Some("zlib"))
    val back = Serde.read(spark, path, Serde.Orc)
    assert(back.schema == df.schema)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("csv round-trip with declared schema is exact") {
    val df = spark.read.parquet(s"$sf/orders.parquet")
    val path = tmp()
    Serde.write(df, path, Serde.Csv)
    val back = Serde.read(spark, path, Serde.Csv, Some(df.schema))
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("corrupt-record tracking (V19): malformed rows counted, not dropped") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-corrupt")
    Files.writeString(dir.resolve("data.json"),
      """{"id": 1, "v": "ok"}
        |{"id": 2, "v": "also ok"}
        |{not json at all
        |{"id": "not-a-number", "v": 3}
        |{"id": 4, "v": "fine"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val df = Serde.readJsonTracking(spark, dir.toString, schema).cache()
    try {
      assert(df.count() == 5) // nothing silently dropped
      assert(Serde.corruptCount(df) == 2) // bad syntax + bad type
      val good = df.filter(col("_corrupt_record").isNull)
      assert(good.count() == 3)
      assert(good.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
    } finally df.unpersist()
  }

  test("json round-trip with declared schema is exact") {
    val df = spark.read.parquet(s"$sf/customer.parquet")
    val path = tmp()
    Serde.write(df, path, Serde.Json, compression = Some("gzip"))
    val back = Serde.read(spark, path, Serde.Json, Some(df.schema))
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("xml round-trip with declared schema is exact") {
    val df = spark.read.parquet(s"$sf/orders.parquet")
    val path = tmp()
    Serde.write(df, path, Serde.Xml, compression = Some("gzip"))
    val back = Serde.read(spark, path, Serde.Xml, Some(df.schema))
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }
}

class RetrySpec extends AnyFunSuite {

  test("retries transient failures with exponential backoff, then succeeds") {
    var calls = 0
    val delays = Seq.newBuilder[Long]
    val out = Retry.withRetry(maxRetries = 3, baseDelayMs = 100,
      sleep = delays += _) {
      calls += 1
      if (calls < 3) throw new java.io.IOException("connection reset")
      "ok"
    }
    assert(out == "ok" && calls == 3)
    assert(delays.result() == Seq(100, 200)) // base × 2^n
  }

  test("non-retryable errors propagate immediately") {
    var calls = 0
    intercept[Retry.NonRetryableException] {
      Retry.withRetry(maxRetries = 3, sleep = _ => ()) {
        calls += 1
        throw new Retry.NonRetryableException("validation failed")
      }
    }
    assert(calls == 1)
    intercept[IllegalStateException] {
      Retry.withRetry(maxRetries = 3, sleep = _ => ()) {
        throw new IllegalStateException("schema mismatch")
      }
    }
  }

  test("exhausted retries rethrow the last error") {
    var calls = 0
    intercept[java.io.IOException] {
      Retry.withRetry(maxRetries = 2, sleep = _ => ()) {
        calls += 1
        throw new java.io.IOException("timeout")
      }
    }
    assert(calls == 3) // initial + 2 retries
  }

  test("message-substring classifier") {
    assert(Retry.isRetryable(new RuntimeException("Rate limit hit")))
    assert(Retry.isRetryable(new RuntimeException("service unavailable")))
    assert(!Retry.isRetryable(new RuntimeException("bad schema")))
  }
}

class JdbcSourceSpec extends AnyFunSuite {

  test("watermark probe and extract SQL match the reference shapes") {
    assert(JdbcSource.probeSql("customers", "updated_at") ==
      "SELECT COUNT(*) AS row_count, MAX(updated_at) AS max_timestamp " +
        "FROM customers WHERE updated_at > ?")
    assert(JdbcSource.incrementalSql("customers", "updated_at",
      "2024-01-01 00:00:00") ==
      "SELECT * FROM customers WHERE updated_at > '2024-01-01 00:00:00' " +
        "ORDER BY updated_at")
    assert(JdbcSource.changelogSql("orders").contains("orders_changelog"))
    assert(JdbcSource.changelogSql("orders").contains("processed = false"))
  }

  test("op-code mapping: I/U/D plus default") {
    assert(JdbcSource.opToChangeType("I") == "INSERT")
    assert(JdbcSource.opToChangeType("U") == "UPDATE")
    assert(JdbcSource.opToChangeType("D") == "DELETE")
    assert(JdbcSource.opToChangeType("X") == "UPDATE")
  }
}

class ApiSourceSpec extends AnyFunSuite with SparkSpec {

  class FakeHttp(responses: Iterator[(Int, String)]) extends ApiSource.Http {
    val seen = Seq.newBuilder[String]
    def get(url: String, headers: Map[String, String]): (Int, String) = {
      seen += url
      responses.next()
    }
  }

  val cfg = ApiSourceConfig(url = "http://api.test/orders")

  test("rate-limit retry: 429 backs off exponentially then succeeds") {
    val http = new FakeHttp(Iterator((429, ""), (429, ""), (200, """[{"a":1}]""")))
    val delays = Seq.newBuilder[Long]
    val out = ApiSource.getWithRetry(http, cfg, cfg.url, sleep = delays += _)
    assert(out.contains("""[{"a":1}]"""))
    assert(delays.result() == Seq(1000, 2000))
  }

  test("incremental since param is appended and URL-encoded") {
    assert(ApiSource.pollUrl(cfg, Some("2024-01-01T00:00:00")) ==
      "http://api.test/orders?since=2024-01-01T00%3A00%3A00")
    assert(ApiSource.pollUrl(cfg.copy(url = cfg.url + "?page=1"),
      Some("x")).contains("&since=x"))
  }

  test("JSON shaping: array, data envelope, single object") {
    val arr = ApiSource.jsonToDataFrame(spark,
      """[{"id":1,"v":"a"},{"id":2,"v":"b"}]""")
    assert(arr.count() == 2 && arr.columns.sorted.toSeq == Seq("id", "v"))
    val env = ApiSource.jsonToDataFrame(spark,
      """{"data":[{"id":3},{"id":4},{"id":5}],"meta":{"n":3}}""")
    assert(env.count() == 3 && env.columns.toSeq == Seq("id"))
    val single = ApiSource.jsonToDataFrame(spark, """{"id":9,"v":"z"}""")
    assert(single.count() == 1 && single.select("id").head().getLong(0) == 9)
  }

  test("end-to-end extract against a real local HTTP server") {
    import com.sun.net.httpserver.HttpServer
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    server.createContext("/orders", exchange => {
      val q = Option(exchange.getRequestURI.getQuery).getOrElse("")
      val body =
        if (q.contains("since=")) """[{"order_id":7,"amount":10.5}]"""
        else """[{"order_id":1,"amount":3.25},{"order_id":2,"amount":4.0}]"""
      val bytes = body.getBytes("UTF-8")
      exchange.getResponseHeaders.add("Content-Type", "application/json")
      exchange.sendResponseHeaders(200, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val liveCfg = ApiSourceConfig(url = s"http://localhost:$port/orders")
      val http = new ApiSource.JdkHttp(java.time.Duration.ofSeconds(5))
      val full = ApiSource.extract(spark, http, liveCfg, since = None)
      assert(full.count() == 2)
      val incr = ApiSource.extract(spark, http, liveCfg,
        since = Some("2024-01-01T00:00:00"))
      assert(incr.count() == 1 &&
        incr.select("order_id").head().getLong(0) == 7)
    } finally server.stop(0)
  }
}

class SourceFactorySpec extends AnyFunSuite with SparkSpec {

  test("file source builds from connection params") {
    val df = SourceFactory.create("file", spark,
      Map("path" -> s"$sf/region.parquet"))
    assert(df.count() == 5)
  }

  test("unknown type lists supported ones") {
    val e = intercept[IllegalArgumentException] {
      SourceFactory.create("kafka", spark, Map.empty)
    }
    assert(e.getMessage.contains("Unsupported source type"))
    assert(SourceFactory.supportedTypes.toSet
      .subsetOf(Set("api", "database", "file") ++ SourceFactory.supportedTypes))
  }

  test("custom registration is pluggable") {
    SourceFactory.register("constant", (s, _) => {
      import s.implicits._
      Seq(1, 2, 3).toDF("n")
    })
    assert(SourceFactory.create("constant", spark, Map.empty).count() == 3)
  }
}

class SensorsSpec extends AnyFunSuite {
  import Sensors._

  test("change gate: min/max thresholds") {
    assert(changeGate(0, 1, None) == NotReady)
    assert(changeGate(5, 1, None) == Ready)
    assert(changeGate(5, 1, Some(10)) == Ready)
    assert(changeGate(11, 1, Some(10)) == Exceeded(11, 10))
  }

  test("file sensor: glob + mtime + min-age + min-size") {
    val dir = Files.createTempDirectory("graft-sensor")
    val f1 = dir.resolve("data_1.csv"); Files.writeString(f1, "a,b\n1,2\n")
    val f2 = dir.resolve("skip.txt"); Files.writeString(f2, "nope")
    val f3 = dir.resolve("tiny.csv"); Files.writeString(f3, "")
    val now = System.currentTimeMillis()
    val hits = detectFileChanges(dir.toString, "*.csv", lastSeenMtime = 0,
      nowMillis = now, minAgeSeconds = 0, minSizeBytes = 1)
    assert(hits.map(f => f.path.split('/').last) == Seq("data_1.csv"))
    // nothing new past the observed mtime
    val seen = hits.head.mtimeMillis
    assert(detectFileChanges(dir.toString, "*.csv", seen, now, 0, 1).isEmpty)
    // not yet quiesced
    assert(detectFileChanges(dir.toString, "*.csv", 0, now,
      minAgeSeconds = 3600, minSizeBytes = 1).isEmpty)
  }

  test("api sensor: dot-path change detection") {
    val v1 = """{"status":"ok","meta":{"last_modified":"2024-01-01"}}"""
    val v2 = """{"status":"ok","meta":{"last_modified":"2024-01-02"}}"""
    assert(dotPath(v1, "meta.last_modified").contains("2024-01-01"))
    assert(apiChanged(None, v1, "meta.last_modified"))
    assert(!apiChanged(Some("2024-01-01"), v1, "meta.last_modified"))
    assert(apiChanged(Some("2024-01-01"), v2, "meta.last_modified"))
    assert(!apiChanged(Some("x"), v1, "meta.nope")) // missing path → no change
  }

  test("table sensor: row-count or max-ts advance") {
    assert(tableChanged(None, None, 100, None)) // first observation
    assert(!tableChanged(Some(100), Some(5), 100, Some(5L)))
    assert(tableChanged(Some(100), Some(5), 101, Some(5L)))
    assert(tableChanged(Some(100), Some(5), 100, Some(6L)))
  }
}

class WatermarkStoreSpec extends AnyFunSuite with SparkSpec {
  import graft.operators.WatermarkStore
  import java.sql.Timestamp

  test("get/update round-trip and min-across-tables") {
    val path = Files.createTempDirectory("graft-wm").toString + "/wm"
    val store = new WatermarkStore(spark, path)
    assert(store.get("src", "orders").isEmpty)
    store.update("src", "orders", Timestamp.valueOf("2024-01-02 00:00:00"))
    store.update("src", "customers", Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(store.get("src", "orders")
      .contains(Timestamp.valueOf("2024-01-02 00:00:00")))
    // update advances in place
    store.update("src", "orders", Timestamp.valueOf("2024-01-03 00:00:00"))
    assert(store.get("src", "orders")
      .contains(Timestamp.valueOf("2024-01-03 00:00:00")))
    assert(store.minWatermark("src")
      .contains(Timestamp.valueOf("2024-01-01 00:00:00")))
    assert(store.asWatermarkFrame("src").count() == 2)
  }

  test("store heals a crash between the swap renames from the backup") {
    val path = Files.createTempDirectory("graft-wmheal").toString + "/wm"
    val store = new WatermarkStore(spark, path)
    store.update("src", "orders", Timestamp.valueOf("2024-01-02 00:00:00"))
    // crash window: live store renamed aside, replacement never landed
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + "__old")))
    // a lost store would silently answer None → full re-extraction;
    // the heal restores the backup instead
    assert(store.get("src", "orders")
      .contains(Timestamp.valueOf("2024-01-02 00:00:00")))
    store.update("src", "orders", Timestamp.valueOf("2024-01-05 00:00:00"))
    assert(store.get("src", "orders")
      .contains(Timestamp.valueOf("2024-01-05 00:00:00")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__old")))
  }
}
