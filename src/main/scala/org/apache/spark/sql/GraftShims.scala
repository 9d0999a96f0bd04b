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
}
