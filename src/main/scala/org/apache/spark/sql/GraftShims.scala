package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 moved the `Column` ↔ `Expression` bridge behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`).
  * This shim lives in the `org.apache.spark.sql` package solely to
  * re-export those two conversions for graft's custom Catalyst
  * expressions; no other Spark internals are touched.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
