package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal Column ⇄ Expression bridge for graft's custom Catalyst
  * expressions. Spark 4 made `classic.ExpressionUtils` private[sql]; an
  * extension library that defines native expressions needs exactly these
  * two hooks, so they are re-exported from inside the package — the same
  * pattern every Spark-native extension (Delta, Sedona, etc.) uses for
  * private[sql] surface.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
