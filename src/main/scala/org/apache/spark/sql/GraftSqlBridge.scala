package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column <-> Expression conversions (Spark
  * 4 split the public Column API from Catalyst). This is the standard
  * extension-library technique for registering custom expressions
  * without a SparkSessionExtensions round-trip. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
