package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4's Column is a ColumnNode wrapper and the converter utilities
  * live behind private[sql]; this one-file shim (the standard pattern
  * for Catalyst-extension libraries) re-exports exactly the two
  * conversions the engine's custom expressions need. Everything else in
  * the engine stays on the public API.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
