package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for graft code outside the
  * `org.apache.spark.sql` package: `ExpressionUtils` is private[sql],
  * and the function-registry path (the other public route to a custom
  * expression) forces every argument through literals — unusable for
  * expressions that carry runtime handles like a broadcast Bloom
  * filter.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
