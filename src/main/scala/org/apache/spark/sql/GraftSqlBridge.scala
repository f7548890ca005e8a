package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column <-> Expression conversions in Spark
  * 4.x (the Column class is Connect-agnostic and no longer exposes
  * `.expr`). Same technique used by open-source Spark extensions
  * (Delta Lake, Iceberg) to attach custom Catalyst expressions to the
  * classic DataFrame API.
  */
object GraftSqlBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
