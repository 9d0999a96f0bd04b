package graft.sources

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import java.sql.DriverManager

/** End-to-end JDBC source tests against an embedded in-memory Derby
  * database (ships with Spark) — the real reader path, not mocks:
  * full scan, bounded partitioned read, and the incremental extract
  * whose watermark predicate executes INSIDE the database. */
class JdbcIntegrationSpec extends AnyFunSuite with SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute(
      """CREATE TABLE customers (
        |  id INT NOT NULL, email VARCHAR(64), updated_at TIMESTAMP)""".stripMargin)
    (1 to 100).foreach { i =>
      val day = (i % 28) + 1
      st.execute(
        f"INSERT INTO customers VALUES ($i, 'u$i%d@test.com', " +
          f"TIMESTAMP('2024-01-$day%02d 12:00:00'))")
    }
    conn.close()
  }

  private def cfg = JdbcSourceConfig(
    url = url, table = "customers", timestampColumn = "updated_at")

  test("full scan through the JDBC reader") {
    seeded
    val df = JdbcSource.reader(spark, cfg).option("driver", driver).load()
    assert(df.count() == 100)
    assert(df.columns.map(_.toLowerCase).toSet ==
      Set("id", "email", "updated_at"))
  }

  test("partitioned read splits the table across bound ranges") {
    seeded
    val df = JdbcSource.reader(spark, cfg.copy(
        partitionColumn = Some("id"), lowerBound = Some("1"),
        upperBound = Some("101"), numPartitions = 4))
      .option("driver", driver).load()
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
  }

  test("jdbc write: append + overwrite round-trip with LoadResult counts") {
    seeded
    val spark2 = spark
    import spark2.implicits._
    val out = cfg.copy(table = "loaded_customers")
    val batch = Seq((1, "a@test.com"), (2, "b@test.com")).toDF("id", "email")

    val r1 = JdbcSource.write(batch, out, mode = "overwrite")
    assert(r1.success && r1.rowsLoaded == 2 && r1.tableName == "loaded_customers")
    val r2 = JdbcSource.write(Seq((3, "c@test.com")).toDF("id", "email"), out)
    assert(r2.success && r2.rowsLoaded == 1)

    val back = JdbcSource.reader(spark, out).option("driver", driver).load()
    assert(back.count() == 3)
    assert(back.select("email").as[String].collect().toSet ==
      Set("a@test.com", "b@test.com", "c@test.com"))

    val r3 = JdbcSource.write(batch, out, mode = "overwrite")
    assert(r3.rowsLoaded == 2)
    assert(JdbcSource.reader(spark, out).option("driver", driver)
      .load().count() == 2)
  }

  test("incremental extract: watermark predicate runs in the database") {
    seeded
    val df = JdbcSource.incrementalReader(spark, cfg, "2024-01-20 00:00:00")
      .option("driver", driver).load()
    val got = df.count()
    // rows are at 12:00, so day 20 itself is past the midnight watermark
    val expected = (1 to 100).count(i => (i % 28) + 1 >= 20)
    assert(got == expected)
    // and the watermark lives inside the pushed JDBC subquery — no
    // Spark-side Filter node
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WHERE updated_at > '2024-01-20 00:00:00'"), plan)
    assert("\\(\\d+\\) Filter".r.findFirstIn(plan).isEmpty, plan)
  }

  private def snapshot(table: String): Seq[(Int, String)] = {
    val back = JdbcSource.reader(spark, cfg.copy(table = table))
      .option("driver", driver).load()
    back.collect().map(r => (r.getInt(0), r.getString(1))).toSeq.sorted
  }

  test("writeExactlyOnce: replaying a batch leaves the table byte-identical") {
    seeded
    val spark2 = spark
    import spark2.implicits._
    val out = cfg.copy(table = "eo_customers")
    val b0 = Seq((1, "a@test.com"), (2, "b@test.com")).toDF("id", "email")

    val r0 = JdbcSource.writeExactlyOnce(b0, out, batchId = 0L)
    assert(r0.success && r0.rowsLoaded == 2 && r0.errorMessage.isEmpty)
    val afterFirst = snapshot("eo_customers")
    assert(afterFirst == Seq(1 -> "a@test.com", 2 -> "b@test.com"))

    // replay of the SAME batch id: skipped, table unchanged
    val r0b = JdbcSource.writeExactlyOnce(b0, out, batchId = 0L)
    assert(r0b.success && r0b.rowsLoaded == 0)
    assert(r0b.errorMessage.exists(_.contains("already loaded")))
    assert(snapshot("eo_customers") == afterFirst)

    // a NEW batch id appends; its replay is also a no-op
    val b1 = Seq((3, "c@test.com")).toDF("id", "email")
    val r1 = JdbcSource.writeExactlyOnce(b1, out, batchId = 1L)
    assert(r1.rowsLoaded == 1)
    val r1b = JdbcSource.writeExactlyOnce(b1, out, batchId = 1L)
    assert(r1b.rowsLoaded == 0)
    assert(snapshot("eo_customers") ==
      Seq(1 -> "a@test.com", 2 -> "b@test.com", 3 -> "c@test.com"))

    // the ledger carries one row per batch, rows committed with the data
    val ledger = JdbcSource.reader(spark, cfg.copy(table = "eo_customers_batch_ledger"))
      .option("driver", driver).load()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(ledger == Seq(0L -> 2L, 1L -> 1L))
  }

  test("writeExactlyOnce upsert: keyed merge, one row per key, replay-safe") {
    seeded
    val spark2 = spark
    import spark2.implicits._
    val out = cfg.copy(table = "eo_upsert_customers")
    val keys = Seq("id")
    val b0 = Seq((1, "a@test.com"), (2, "b@test.com")).toDF("id", "email")
    val r0 = JdbcSource.writeExactlyOnce(b0, out, batchId = 0L, keys)
    assert(r0.success && r0.rowsLoaded == 2)

    // second batch UPDATES key 2 and inserts key 3: exactly one row per
    // key afterwards, update applied
    val b1 = Seq((2, "b2@test.com"), (3, "c@test.com")).toDF("id", "email")
    val r1 = JdbcSource.writeExactlyOnce(b1, out, batchId = 1L, keys)
    assert(r1.success && r1.rowsLoaded == 2)
    val afterUpsert = snapshot("eo_upsert_customers")
    assert(afterUpsert ==
      Seq(1 -> "a@test.com", 2 -> "b2@test.com", 3 -> "c@test.com"))

    // replaying EITHER batch is byte-identical (ledger skip — the
    // stale b0 replay must NOT resurrect b@test.com)
    assert(JdbcSource.writeExactlyOnce(b0, out, 0L, keys).rowsLoaded == 0)
    assert(snapshot("eo_upsert_customers") == afterUpsert)
    assert(JdbcSource.writeExactlyOnce(b1, out, 1L, keys).rowsLoaded == 0)
    assert(snapshot("eo_upsert_customers") == afterUpsert)

    // a fresh batch id re-carrying key 3 still converges to one row
    val b2 = Seq((3, "c3@test.com")).toDF("id", "email")
    assert(JdbcSource.writeExactlyOnce(b2, out, 2L, keys).rowsLoaded == 1)
    assert(snapshot("eo_upsert_customers") ==
      Seq(1 -> "a@test.com", 2 -> "b2@test.com", 3 -> "c3@test.com"))
  }

  test("writeExactlyOnce upsert against a KEY-INDEXED target (the " +
      "stated operational contract): converges, index intact") {
    seeded
    val spark2 = spark
    import spark2.implicits._
    // pre-create the target with a PRIMARY KEY over the merge key —
    // the index the API contract requires so the correlated DELETE is
    // an index probe per staged row, not a scan. Quoted lower-case
    // identifiers to match Spark's JDBC writer column spelling.
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("""CREATE TABLE eo_upsert_indexed (
        |  "id" INT NOT NULL, "email" VARCHAR(64),
        |  PRIMARY KEY ("id"))""".stripMargin)
      st.close()
    } finally conn.close()
    val out = cfg.copy(table = "eo_upsert_indexed")
    val keys = Seq("id")
    assert(JdbcSource.writeExactlyOnce(
      Seq((1, "a@test.com"), (2, "b@test.com")).toDF("id", "email"),
      out, 0L, keys).rowsLoaded == 2)
    assert(JdbcSource.writeExactlyOnce(
      Seq((2, "b2@test.com"), (3, "c@test.com")).toDF("id", "email"),
      out, 1L, keys).rowsLoaded == 2)
    assert(snapshot("eo_upsert_indexed") ==
      Seq(1 -> "a@test.com", 2 -> "b2@test.com", 3 -> "c@test.com"))
    // the key index survived the delete+insert path (a duplicate-key
    // violation would have aborted the transaction had the upsert
    // tried insert-before-delete) and Derby still reports it
    val conn2 = DriverManager.getConnection(url)
    try {
      val rs = conn2.getMetaData.getIndexInfo( // Derby stores unquoted
        null, null, "EO_UPSERT_INDEXED", false, false) // names upper-case
      val indexed = Iterator.continually(rs)
        .takeWhile(_.next()).map(_.getString("COLUMN_NAME")).toSet
      rs.close()
      assert(indexed.contains("id"),
        s"merge-key index missing on target (indexed cols: $indexed)")
    } finally conn2.close()
  }

  test("jdbcExactlyOnceSink with mergeKeys: streamed upsert converges") {
    seeded
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Int, String)]
    val out = cfg.copy(table = "eo_stream_upsert")
    val q = graft.streaming.Streams.jdbcExactlyOnceSink(
        input.toDS().toDF("id", "email"), out,
        java.nio.file.Files.createTempDirectory("graft-eou-ckpt").toString,
        graft.streaming.Streams.trigger(1),
        mergeKeys = Seq("id"))
      .start()
    try {
      input.addData((1, "a@test.com"), (2, "b@test.com"))
      q.processAllAvailable()
      input.addData((2, "b2@test.com"), (3, "c@test.com"))
      q.processAllAvailable()
      assert(snapshot("eo_stream_upsert") ==
        Seq(1 -> "a@test.com", 2 -> "b2@test.com", 3 -> "c@test.com"))
    } finally q.stop()
  }

  test("jdbcExactlyOnceSink: checkpointed stream lands batches exactly once") {
    seeded
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Int, String)]
    val out = cfg.copy(table = "eo_stream_customers")
    val loads = scala.collection.mutable.ArrayBuffer.empty[graft.core.LoadResult]
    val q = graft.streaming.Streams.jdbcExactlyOnceSink(
        input.toDS().toDF("id", "email"), out,
        java.nio.file.Files.createTempDirectory("graft-eo-ckpt").toString,
        graft.streaming.Streams.trigger(1),
        onLoad = r => loads.synchronized { loads += r })
      .start()
    try {
      input.addData((1, "a@test.com"), (2, "b@test.com"))
      q.processAllAvailable()
      input.addData((3, "c@test.com"))
      q.processAllAvailable()
      assert(snapshot("eo_stream_customers") ==
        Seq(1 -> "a@test.com", 2 -> "b@test.com", 3 -> "c@test.com"))
      assert(loads.count(_.rowsLoaded > 0) == 2 && loads.forall(_.success))
    } finally q.stop()
  }
}
