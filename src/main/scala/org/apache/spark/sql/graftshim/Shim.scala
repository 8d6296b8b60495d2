package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the classic Column ↔ Expression converters, which
  * are private[sql] in Spark 4 — the standard extension-library shim
  * (one object, no behavior) that lets engine code construct Columns
  * from custom Catalyst expressions.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
