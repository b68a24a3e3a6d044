package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access shim for Spark 4's `private[sql]` Column ⇄ Expression conversions.
  * Lives under `org.apache.spark.sql` solely to satisfy the access qualifier;
  * all engine code goes through [[graft.functions.VectorFunctions]]'s bridge.
  */
object ColumnShim {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
