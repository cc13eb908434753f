package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst expressions.
  *
  * Spark 4 made `Column` implementation-agnostic; attaching a custom
  * Catalyst `Expression` needs `classic.ExpressionUtils`, which is
  * `private[sql]` — hence this shim package under org.apache.spark.sql
  * (the standard technique used by Spark-native libraries).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
