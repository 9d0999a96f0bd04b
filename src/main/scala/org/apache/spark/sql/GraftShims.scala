package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst expressions.
  *
  * Spark 4 moved Column internals behind `private[sql]`
  * (columnNodeSupport.scala); a library shipping native expressions
  * needs exactly two conversions, re-exported here from inside the sql
  * package. No Spark behavior is modified.
  */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a logical plan (for library-defined logical
    * nodes — the analyzer/optimizer/planner run as usual). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Drain the async listener bus (private[spark]): lets a measurement
    * harness read listener-accumulated task metrics AFTER all events
    * for the just-finished job have been delivered — without this the
    * per-query attribution races the delivery thread. */
  def drainListenerBus(spark: SparkSession): Unit =
    try spark.sparkContext.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }

  /** Explicitly free the storage blocks behind a `localCheckpoint`ed
    * DataFrame (the checkpointed RDD hides inside a `LogicalRDD` leaf;
    * `Dataset.unpersist` cannot reach it and ContextCleaner only frees
    * it on GC). For fixed-point loops that re-checkpoint every round —
    * [[graft.text.BpeTrain.trainDistributed]], graph iteration — this
    * bounds storage to ONE round deterministically instead of trusting
    * the driver's GC cadence. Only call on a frame whose successor
    * checkpoint has already materialized (eager=true default).
    * Spark logs a benign WARN per call ("locally checkpointed …
    * cannot be recomputed after unpersisting") — expected: nothing
    * reads the superseded frame again, which is the point. */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Register a native function on an existing session (the config-time
    * path is `spark.sql.extensions`; this is the runtime equivalent). */
  def registerFunction(spark: SparkSession, name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
