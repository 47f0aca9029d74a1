package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column⇄Expression converters — the only
  * supported way to lift a custom Catalyst Expression into the public
  * Column API in Spark 4 without spark-internal access modifiers. */
object GraftColumnBridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toCol(e: Expression): Column = ExpressionUtils.column(e)
}
