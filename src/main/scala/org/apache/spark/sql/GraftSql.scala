package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column <-> Expression
  * converters, so graft's custom Catalyst expressions can be exposed as
  * ordinary `Column`s without registering session extensions. This is
  * the standard third-party-expression shim (the converters are stable
  * internals used by every Column operation); nothing else from the
  * private surface is touched. */
object GraftSql {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
