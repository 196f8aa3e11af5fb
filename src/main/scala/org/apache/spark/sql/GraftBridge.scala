package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Minimal bridge into Spark's `private[sql]` Column↔Expression converters
 * (Spark 4 made `Column` a ColumnNode wrapper; `classic.ExpressionUtils` is
 * the supported internal accessor, used the same way Spark's own built-in
 * function helpers use it). Lives in the org.apache.spark.sql package solely
 * for access; no Spark internals are modified.
 */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
