package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one per suite via lazy val). */
trait SparkSpec { self: AnyFunSuite =>
  lazy val spark: SparkSession = SparkSpec.session
  val sf: String = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // Known-benign per-test WARN spam that pollutes the logs a
    // regression hunt greps: every streaming test without an explicit
    // checkpointLocation triggers ResolveWriteToStream's temp-dir
    // notice, and a torn-down session can race one late
    // ExecutionListenerBus delivery. Both are expected in a test
    // harness — raise just those two loggers to ERROR; everything
    // else keeps WARN so real warnings still surface.
    Seq("org.apache.spark.sql.execution.streaming.runtime.ResolveWriteToStream",
        "org.apache.spark.sql.util.ExecutionListenerBus")
      .foreach { name =>
        org.apache.logging.log4j.core.config.Configurator.setLevel(
          name, org.apache.logging.log4j.Level.ERROR)
      }
    s
  }
}
