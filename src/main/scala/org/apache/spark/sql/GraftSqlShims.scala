package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access shim: the Column ⇄ Expression bridges are `private[sql]` in
  * Spark 4 (org.apache.spark.sql.classic.ExpressionUtils), but building a
  * `Column` from a custom Catalyst `Expression` is exactly the supported
  * extension path for native functions. This object lives in the sql
  * package purely to re-export those two bridges to graft code. */
object GraftSqlShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
