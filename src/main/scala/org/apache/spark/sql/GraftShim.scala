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

  /** The file-stream source's durable per-batch file manifest
    * (`<checkpoint>/sources/0`), written by the source BEFORE a batch's
    * foreachBatch runs — the recovery journal of the pipelined streaming
    * apply. `private[sql]` in Spark, hence this in-package bridge. */
  def sourceBatchFiles(spark: SparkSession, checkpointRoot: String,
      batchId: Long): Seq[String] = {
    import org.apache.spark.sql.execution.streaming.runtime.FileStreamSourceLog
    val log = new FileStreamSourceLog(FileStreamSourceLog.VERSION, spark,
      s"$checkpointRoot/sources/0")
    // compact log files carry the full history; keep THIS batch's entries
    log.get(batchId).map(_.filter(_.batchId == batchId).map(_.path).toSeq)
      .getOrElse(Seq.empty)
  }

  /** All batches the file-stream source has planned, from `fromBatchId` on:
    * (batchId, files) in batch order. */
  def sourceLogBatches(spark: SparkSession, checkpointRoot: String,
      fromBatchId: Long): Seq[(Long, Seq[String])] = {
    import org.apache.spark.sql.execution.streaming.runtime.FileStreamSourceLog
    val dir = s"$checkpointRoot/sources/0"
    val log = new FileStreamSourceLog(FileStreamSourceLog.VERSION, spark, dir)
    log.get(Some(fromBatchId), None).toSeq.map { case (id, entries) =>
      id -> entries.filter(_.batchId == id).map(_.path).toSeq
    }.sortBy(_._1)
  }
}
