package org.apache.spark.sql.xbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 split the public `Column` API from Catalyst; the supported bridge
  * (`org.apache.spark.sql.classic.ExpressionUtils`) is `private[sql]`, so this
  * one-file shim inside the sql package namespace re-exports the two
  * conversions custom expressions need. No Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
