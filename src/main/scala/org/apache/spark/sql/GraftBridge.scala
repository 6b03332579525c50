package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` conversion utilities so graft's native
  * Catalyst expressions can be exposed as `Column`s (the Spark 4 Column no
  * longer wraps Expression publicly after the Connect refactor).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
