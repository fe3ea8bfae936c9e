package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4's Connect refactor made `ExpressionUtils` (and the Column
  * constructor taking an Expression) `private[sql]`. Custom native
  * Expressions still need to surface as `Column`s, so this one-file
  * shim lives under the `org.apache.spark.sql` package scope to
  * re-export the two conversions. No Spark internals are modified.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
