package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between user-facing `Column` and Catalyst `Expression` for the
  * graft engine's native expressions. Spark 4.x made this conversion
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so the
  * engine exposes it via this in-package shim — same technique widely used
  * by open-source Spark extension libraries. */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a builder in the session's function registry so native
    * expressions are also callable from SQL. */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Drain the listener bus (private[spark]) — lets tests assert on
    * listener-observed facts (e.g. job counts) without sleeps. */
  def waitListenerBusEmpty(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
