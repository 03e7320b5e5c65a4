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

  /** Register graft's SQL functions into an EXISTING session (the
    * `withExtensions`/`spark.sql.extensions` path in
    * [[graft.GraftExtensions]] only applies to sessions built after
    * configuration — e.g. the driver harness owns session creation). */
  def registerFunctions(spark: SparkSession): Unit =
    graft.GraftExtensions.functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
