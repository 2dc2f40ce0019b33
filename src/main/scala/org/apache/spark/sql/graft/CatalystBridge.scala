package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's Column⇄Expression converters are private[sql]; this bridge
  * lives inside the org.apache.spark.sql namespace to re-export the two
  * calls our custom Catalyst expressions need. (Same technique every
  * Spark extension library uses for classic-API interop.) */
object CatalystBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
