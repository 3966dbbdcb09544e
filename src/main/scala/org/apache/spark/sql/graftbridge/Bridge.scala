package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed `new Column(expr)`; the classic bridge
  * (`ExpressionUtils`) is `private[sql]`, so this one-file subpackage
  * re-exports the two conversions the engine needs. No Spark internals
  * are reimplemented here. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
