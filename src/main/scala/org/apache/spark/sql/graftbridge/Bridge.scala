package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed `new Column(expr)`; the classic bridge
  * (`ExpressionUtils`) is `private[sql]`, so this one-file subpackage
  * re-exports the conversions the engine needs (plus the
  * plan ↔ DataFrame hop for custom logical operators). No Spark
  * internals are reimplemented here. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (possibly custom) logical plan as a DataFrame — runs the
    * full analyzer, so relation dedup / checkAnalysis apply. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Analyzed logical plan of a DataFrame. */
  def analyzed(df: Dataset[_]): LogicalPlan = df.queryExecution.analyzed
}
