package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.Bridge

/** Bridge between the public Column API and Catalyst Expressions.
  * Spark 4 moved `new Column(expr)` behind `private[sql]`
  * `org.apache.spark.sql.classic.ExpressionUtils`; the actual access
  * lives in org.apache.spark.sql.graftshim (a legal subpackage). */
object Cols {
  def column(e: Expression): Column = Bridge.column(e)
  def expr(c: Column): Expression = Bridge.expression(c)
}
