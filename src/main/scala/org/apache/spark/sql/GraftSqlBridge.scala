package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction

/** Spark 4 removed the public Column(Expression) constructor (Column is a
  * ColumnNode facade in sql-api); extensions that build custom Catalyst
  * expressions reach the classic converter through a same-package bridge —
  * the standard pattern for Spark-native libraries. */
object GraftSqlBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  def aggColumn(f: AggregateFunction): Column =
    column(f.toAggregateExpression())
}
