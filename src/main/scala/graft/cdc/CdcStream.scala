package graft.cdc

import graft.lake.LakeTable
import graft.model.Model
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Structured Streaming front of the CDC engine: tail a directory of log
 * segments (the sandbox stand-in for a binlog/Kafka topic) and apply each
 * micro-batch through [[CdcApply]] into a [[LakeTable]].
 *
 * Exactly-once: the file source's offsets live in the checkpoint; the sink
 * is idempotent because [[LakeTable.merge]] records applied `batchId`s in
 * the snapshot. On restart after a crash, Structured Streaming re-runs the
 * last uncommitted batch with the SAME batchId — the merge no-ops if the
 * snapshot already contains it, so state is never double-applied
 * (SURVEY.md §7 "exactly-once with foreachBatch").
 *
 * Schema note: the stream reads with the FULL (post-evolution) event
 * schema; pre-evolution segment files simply read `tool` as null, while
 * the lake table itself evolves additively on first sight of the column
 * (LakeTable.merge). maxFilesPerTrigger bounds micro-batch size — the
 * backpressure knob standing in for the reference's bounded queues
 * (simple_executor_threaded.cpp:26-69).
 */
object CdcStream {

  def start(
      spark: SparkSession,
      logDir: String,
      table: LakeTable,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 8,
      opts: CdcApply.Options = CdcApply.Options()): StreamingQuery = {
    val events = spark.readStream
      .schema(Model.changeEventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("recursiveFileLookup", "true")
      .parquet(logDir)
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        CdcApply.applyBatch(table, batch, batchId, opts)
        ()
      }
      .start()
  }

  /** Run to completion of currently-available data (AvailableNow). */
  def runOnce(spark: SparkSession, logDir: String, table: LakeTable,
      checkpointDir: String, maxFilesPerTrigger: Int = 8,
      opts: CdcApply.Options = CdcApply.Options()): Unit = {
    val q = start(spark, logDir, table, checkpointDir, maxFilesPerTrigger, opts)
    q.awaitTermination()
    table.flushLineage() // lineage is buffered per flush window; drain at end
  }
}
