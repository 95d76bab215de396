package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for custom Catalyst expressions.
  * Spark 4 made these conversions `private[sql]`; extension libraries
  * host a shim inside the package namespace (the same technique Spark
  * connector packages use).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER conversion to a catalyst expression tree (possibly with
    * unresolved function nodes for the analyzer to resolve).
    * [[expression]] returns a lazy `ColumnNodeExpression` wrapper that
    * only the Dataset API's own conversion pass unwraps — returned
    * from a `SparkSessionExtensions.injectFunction` builder it reaches
    * codegen unresolved and fails; this form converts immediately.
    */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
