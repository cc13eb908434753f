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

  /** Build a DataFrame over a hand-constructed logical plan
    * (`Dataset.ofRows` is `private[sql]`, hence here) — the entry
    * point for graft's custom operators (e.g. the native as-of join
    * node in `graft.plans`).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame (stable attribute
    * references for hand-built operator nodes).
    */
  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed

  /** Formatted explain of a DataFrame's final (AQE-resolved) plan —
    * the form whose per-node `Input [..]` lists let tests pin which
    * columns ride each exchange (the simple toString shows only
    * partitioning keys).
    */
  def explainFormatted(df: org.apache.spark.sql.DataFrame): String =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** The session's UUID string (`sessionUUID` is `private[sql]`,
    * hence here) — the identity the cross-query memos key on so a
    * stopped session is never pinned by a map key.
    */
  def sessionUUID(spark: org.apache.spark.sql.SparkSession): String =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionUUID

  /** Register a function builder on a live session's registry
    * (`sessionState` is `private[sql]`, hence here).
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(id, info, builder)
}
