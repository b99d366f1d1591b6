package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for custom Catalyst expressions. The
  * converters are `private[sql]` in Spark 4, so this one-file shim
  * lives under the `org.apache.spark.sql` package — the standard
  * pattern Spark extension libraries use to register native
  * expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER conversion of a Column's node tree into a real catalyst
    * expression (possibly still unresolved — the analyzer finishes
    * it). [[expression]] wraps in a lazy `ColumnNodeExpression` shim,
    * which Dataset operations convert during analysis but a
    * `FunctionRegistry` builder result does NOT pass through that
    * path — the shim then reaches codegen unevaluable. Builders
    * registered via `SparkSessionExtensions.injectFunction` that
    * re-enter Column-composition functions must use THIS. */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)
}
