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
 *
 * Pipelined mode (`opts.mergeOnRead && opts.pipelineDepth > 1`): batches
 * flow through a [[CdcPipeline]] — concurrent delta-write jobs, strictly
 * ordered commits, durable per-batch journal for exactly-once across
 * kill/restart (see CdcPipeline's scaladoc for the recovery argument).
 * This gives the Structured Streaming deployment the same write/commit
 * overlap the batch `replayPipelined` measured (round-3 verdict item 1).
 */
object CdcStream {

  private def source(spark: SparkSession, logDir: String,
      maxFilesPerTrigger: Int): org.apache.spark.sql.DataFrame =
    spark.readStream
      .schema(Model.changeEventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("recursiveFileLookup", "true")
      .parquet(logDir)

  def start(
      spark: SparkSession,
      logDir: String,
      table: LakeTable,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 8,
      opts: CdcApply.Options = CdcApply.Options()): StreamingQuery =
    source(spark, logDir, maxFilesPerTrigger).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        CdcApply.applyBatch(table, batch, batchId, opts)
        ()
      }
      .start()

  /** Start the stream with the pipelined sink. Recovery of any
    * journaled-but-uncommitted batches from a previous (killed) run happens
    * here, before the query starts. The caller MUST call
    * `pipeline.close()` after the query terminates (drains ordered
    * commits) — [[runOnce]] does. */
  def startPipelined(
      spark: SparkSession,
      logDir: String,
      table: LakeTable,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 8,
      opts: CdcApply.Options = CdcApply.Options(mergeOnRead = true, pipelineDepth = 4))
      : (StreamingQuery, CdcPipeline) = {
    CdcPipeline.recoverPending(spark, table, checkpointDir, opts)
    val pipeline = new CdcPipeline(spark, table, checkpointDir, opts)
    val q = source(spark, logDir, maxFilesPerTrigger).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        pipeline.submit(batch, batchId)
        ()
      }
      .start()
    (q, pipeline)
  }

  /** Pick `maxFilesPerTrigger` so micro-batches hold ≈ `targetEvents`
    * rows, from the parquet footers of a few log files (no data pages
    * read). The 10^8 measurement (BASELINE.md round 4) showed per-batch
    * fixed cost grows with table state: batches must grow with the table
    * (≥ ~10M events at 10^8 scale) or the fixed cost dominates — this is
    * the sizing helper that encodes that operational rule. */
  def suggestMaxFilesPerTrigger(spark: SparkSession, logDir: String,
      targetEvents: Long = 10000000L, sampleFiles: Int = 8): Int = {
    import scala.jdk.CollectionConverters._
    val st = java.nio.file.Files.walk(java.nio.file.Paths.get(logDir))
    // UNIFORM reservoir sample over the whole walk (one streaming pass, no
    // materialization): segments differ in rows/file (e.g. the
    // schema-evolution cut segment is short), so a walk-order prefix — or
    // a stride over a capped prefix — would skew toward whichever segments
    // the filesystem yields first. Fixed seed = reproducible suggestion.
    val rnd = new scala.util.Random(42)
    val reservoir = new scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
    var seen = 0L
    try st.iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .foreach { p =>
        seen += 1
        if (reservoir.size < sampleFiles) reservoir += p
        else {
          val j = (rnd.nextDouble() * seen).toLong
          if (j < sampleFiles) reservoir(j.toInt) = p
        }
      }
    finally st.close()
    if (reservoir.isEmpty) return 8
    val files = reservoir.toSeq
    val conf = spark.sessionState.newHadoopConf()
    val avg = files.map(p => graft.lake.ParquetStats.rowCount(p.toString, conf)).sum /
      math.max(1, files.size)
    math.max(1, math.ceil(targetEvents.toDouble / math.max(1L, avg)).toInt)
  }

  /** Run to completion of currently-available data (AvailableNow).
    * Dispatches to the pipelined sink when opts ask for it. */
  def runOnce(spark: SparkSession, logDir: String, table: LakeTable,
      checkpointDir: String, maxFilesPerTrigger: Int = 8,
      opts: CdcApply.Options = CdcApply.Options()): Unit = {
    if (opts.mergeOnRead && opts.pipelineDepth > 1) {
      val (q, pipeline) = startPipelined(spark, logDir, table, checkpointDir,
        maxFilesPerTrigger, opts)
      try q.awaitTermination() finally pipeline.close()
    } else {
      val q = start(spark, logDir, table, checkpointDir, maxFilesPerTrigger, opts)
      q.awaitTermination()
      table.awaitMaintenance() // settle background compaction debt
      table.flushLineage() // lineage is buffered per flush window; drain at end
    }
  }
}
