package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access bridge: Spark 4 makes `Column(expr)` / `col.expr` private[sql]
  * (`classic.ExpressionUtils`). graft's native Catalyst expressions need
  * exactly these two conversions, so this one-file shim lives in the
  * `org.apache.spark.sql` package. No Spark internals are reimplemented.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
