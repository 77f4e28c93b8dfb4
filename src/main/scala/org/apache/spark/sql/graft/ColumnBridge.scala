package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ↔ Expression conversions
  * (`org.apache.spark.sql.classic.ExpressionUtils`), needed to expose
  * custom Catalyst expressions (graft.plans) as user-facing Columns.
  * Lives under the spark.sql package namespace solely for access —
  * the standard pattern for Spark-native extensions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
