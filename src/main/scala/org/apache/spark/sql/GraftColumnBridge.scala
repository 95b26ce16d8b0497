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

  /** EAGER Column → Expression conversion. `expression` wraps the column
    * node lazily (`ColumnNodeExpression`), which only unwraps on the
    * Dataset API's analysis path — an expression returned from a
    * FunctionRegistry builder never takes that path and would reach
    * codegen unconverted (Unevaluable). This converts the node tree to
    * catalyst expressions up front; any UnresolvedFunction nodes inside
    * become ordinary catalyst unresolved functions the analyzer then
    * resolves like hand-written SQL. */
  def resolvedExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a function builder on a LIVE session's registry (the
    * `spark.sql.extensions=graft.GraftExtensions` config path covers
    * sessions built with the config; this covers sessions someone else
    * already built). Temp-function scope: session-local, no catalog
    * persistence — the same scope `spark.udf.register` uses. */
  def registerTempFunction(spark: SparkSession, name: String,
                           builder: Seq[Expression] => Expression): Unit = {
    val registry =
      spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
    // re-registration is a WARN-logged replace; graft builders are
    // stateless singletons, so skipping is both quiet and equivalent
    if (!registry.functionExists(catalyst.FunctionIdentifier(name)))
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
