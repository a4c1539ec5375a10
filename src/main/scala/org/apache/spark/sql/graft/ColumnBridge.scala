package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters so the
  * engine can register custom Catalyst expressions as plain `Column`s
  * (the classic-API equivalent of `SparkSessionExtensions.injectFunction`
  * without requiring session construction to go through us). Lives under
  * `org.apache.spark.sql` for package-private access — the standard
  * pattern used by Spark-native extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column→Expression conversion. [[expression]] returns a lazy
    * `ColumnNodeExpression` wrapper that only the Dataset API's plan
    * construction unwraps — an expression returned from a
    * FunctionRegistry builder never passes through that path and would
    * reach codegen unevaluable. This runs the classic converter
    * immediately instead. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Register a SQL function into an EXISTING session's function registry
    * (`sessionState` is `private[sql]`) — the runtime counterpart of
    * `SparkSessionExtensions.injectFunction` for sessions the library
    * didn't construct. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)
}
