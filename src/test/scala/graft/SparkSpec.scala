package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one per suite via lazy val). */
trait SparkSpec { self: AnyFunSuite =>
  lazy val spark: SparkSession = SparkSpec.session
  val sf: String = "/root/testdata/sf0.001"
}

/** Shared plan probes for the interpreter-tax asserts: walk a
  * DataFrame's executed plan (through AQE wrappers) and report every
  * expression that is `CodegenFallback` — the class the native-
  * expression sweep exists to keep OFF corpus-linear paths. */
object PlanProbe {
  import org.apache.spark.sql.execution.SparkPlan

  def codegenFallbacks(df: org.apache.spark.sql.DataFrame): Seq[String] =
    fallbacks(df.queryExecution.executedPlan).distinct

  private def fallbacks(p: SparkPlan): Seq[String] = {
    val here = p.expressions.flatMap(_.collect {
      case f: org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback =>
        f.getClass.getSimpleName
    })
    val nested = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        fallbacks(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        fallbacks(q.plan)
      case _ => Seq.empty
    }
    // subquery plans hang off expressions, not children — a fallback
    // inside a scalar subquery would otherwise escape the audit
    val sub = p.subqueries.flatMap(fallbacks)
    here ++ nested ++ sub ++ p.children.flatMap(fallbacks)
  }
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
