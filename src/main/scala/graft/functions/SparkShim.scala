package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-placed bridge to the `private[sql]` Expression ↔ Column
  * converters — the standard pattern for libraries that ship custom
  * Catalyst expressions (the public `Column` API intentionally hides its
  * expression node since Spark 4's Connect split). */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
