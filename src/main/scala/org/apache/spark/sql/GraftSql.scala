package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge. Spark 4 moved these conversions into
  * `org.apache.spark.sql.classic.ExpressionUtils` with package-private
  * visibility; extension libraries bridge from inside the package (the
  * standard pattern for custom-Expression DSLs). */
object GraftSql {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
