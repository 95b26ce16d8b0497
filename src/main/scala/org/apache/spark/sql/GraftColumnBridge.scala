package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters of Spark 4's
  * classic module — the supported pattern for libraries that define custom
  * Catalyst expressions (the converters became package-private with the
  * sql-api split in Spark 4.0; extension projects host a shim in the
  * org.apache.spark.sql package, as connector libraries do). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
