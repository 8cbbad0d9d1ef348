package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters (Spark
  * 4.x moved `Column` onto ColumnNode; `classic.ExpressionUtils` is the
  * supported classic-backend adapter). Lives under `org.apache.spark.sql`
  * solely to satisfy the access scope — the standard pattern for Catalyst
  * extension libraries.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
