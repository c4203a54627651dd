package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ⇄ Expression converters —
  * the one sanctioned way for a library to lift a custom Catalyst
  * `Expression` (e.g. [[graft.expressions.DotProduct]]) into the
  * public Column API in Spark 4's classic runtime. Lives in the
  * `org.apache.spark.sql` package solely for access; no Spark
  * internals are modified. */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
