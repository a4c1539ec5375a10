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
}
