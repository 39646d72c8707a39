package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's Catalyst expressions and the public Column API.
  *
  * Spark 4.x wraps `Column` around `ColumnNode` rather than `Expression`;
  * the conversion utilities live in `org.apache.spark.sql.classic` and are
  * `private[sql]`, so the bridge lives in this package. This is the only
  * file outside the `graft` namespace.
  */
package object graftx {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def exprColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst expression backing a Column. */
  def columnExpr(c: Column): Expression = ExpressionUtils.expression(c)
}
