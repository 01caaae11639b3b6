package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 hid the Column(expr) constructor behind `private[sql]`
  * ExpressionUtils; this bridge re-exports the two conversions our
  * native Catalyst expressions need. Lives under org.apache.spark.sql
  * solely for access — no Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Test seam: apply a SparkSessionExtensions' injected functions to a
    * live registry (what BaseSessionStateBuilder does at session build).
    */
  def registerExtensionFunctions(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry): Unit =
    ext.registerFunctions(registry)
}
