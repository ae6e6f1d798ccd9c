package graft

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Catalyst-Expression bridge for the native graft expressions
  * (Spark 4 hides the direct `Column(expr)` constructor behind
  * `classic.ExpressionUtils`; [[GraftBridge]] re-exports it).
  */
package object expr {
  def nat(e: Expression): Column = GraftBridge.column(e)
  def toExpr(c: Column): Expression = GraftBridge.expression(c)
}
