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
}
