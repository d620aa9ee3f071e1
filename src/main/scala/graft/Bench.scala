package graft

import graft.cdc.CdcApply
import graft.gen.ChangeLogGen
import graft.lake.LakeTable
import graft.model.Model
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: headline queries at SPARK_GRAFT_SF_DIR plus the
  * flagship CDC replay throughput. Prints ONE JSON line. */
object Bench {

  /** Write (or reuse) the deterministic benchmark log; returns segment
    * dirs. Generation is parallelism-independent, so a log written by any
    * session is byte-identical and reusable across sessions. */
  def genLog(spark: SparkSession, workDir: String, numEvents: Long,
      numSegments: Int): Seq[String] = {
    val logDir = s"$workDir/log-$numEvents-$numSegments"
    val marker = java.nio.file.Paths.get(s"$logDir/_COMPLETE")
    val cfg = ChangeLogGen.Config(numEvents = numEvents,
      numConversations = math.max(64L, numEvents / 500), maxTurns = 64)
    if (java.nio.file.Files.exists(marker)) {
      val st = java.nio.file.Files.list(java.nio.file.Paths.get(logDir))
      try st.toArray.map(_.toString).filter(_.contains("segment-")).sorted.toSeq
      finally st.close() // close-safe listing, same discipline as LakeTable
    } else {
      val segs = ChangeLogGen.writeLog(spark, logDir, cfg, numSegments)
      java.nio.file.Files.writeString(marker, "ok")
      segs
    }
  }

  /** One full replay into a fresh table; returns (sec, events/sec). */
  def replayOnce(spark: SparkSession, segments: Seq[String], numEvents: Long,
      buckets: Int, opts: CdcApply.Options = CdcApply.Options()): (Double, Double) = {
    val tableDir = java.nio.file.Files.createTempDirectory("graft-bench-table").toString
    val table = new LakeTable(spark, tableDir, numBuckets = buckets)
    table.create(Model.transcriptSchema)
    val t0 = System.nanoTime()
    CdcApply.replay(spark, table, segments, opts)
    val sec = (System.nanoTime() - t0) / 1e9
    deleteRec(tableDir)
    (sec, numEvents / sec)
  }

  /** One full STREAMING replay (Structured Streaming, pipelined sink when
    * opts ask) into a fresh table + fresh checkpoint; returns
    * (sec, events/sec). `logRoot` is the directory holding segment-* dirs
    * (the file source reads it recursively). */
  def streamReplayOnce(spark: SparkSession, logRoot: String, numEvents: Long,
      buckets: Int, opts: CdcApply.Options, maxFilesPerTrigger: Int = 32): (Double, Double) = {
    val tableDir = java.nio.file.Files.createTempDirectory("graft-bench-stbl").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-bench-sck").toString
    val table = new LakeTable(spark, tableDir, numBuckets = buckets)
    table.create(Model.transcriptSchema)
    val t0 = System.nanoTime()
    graft.cdc.CdcStream.runOnce(spark, logRoot, table, ckDir, maxFilesPerTrigger, opts)
    val sec = (System.nanoTime() - t0) / 1e9
    deleteRec(tableDir); deleteRec(ckDir)
    (sec, numEvents / sec)
  }

  /** One full replay through the CONTINUOUS tail (ProcessingTime trigger +
    * idle stop) into a fresh table; returns (sec, events/sec) with the
    * trailing idle-detection window excluded from the measured time (the
    * tail only learns the log is exhausted by waiting idleStopMs). */
  def streamTailReplayOnce(spark: SparkSession, logRoot: String, numEvents: Long,
      buckets: Int, opts: CdcApply.Options, maxFilesPerTrigger: Int = 32,
      idleStopMs: Long = 2000L): (Double, Double) = {
    val tableDir = java.nio.file.Files.createTempDirectory("graft-bench-ttbl").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-bench-tck").toString
    val table = new LakeTable(spark, tableDir, numBuckets = buckets)
    table.create(Model.transcriptSchema)
    val t0 = System.nanoTime()
    val r = graft.cdc.CdcStream.runTail(spark, logRoot, table, ckDir,
      maxFilesPerTrigger, intervalMs = 100L, idleStopMs = idleStopMs, opts = opts)
    // subtract the MEASURED dead window (idle threshold + detection
    // overshoot), not the nominal idleStopMs — commits that outlast the
    // dead window stay counted because runTail's close() blocks on them
    val sec = math.max(0.001, (System.nanoTime() - t0) / 1e9 - r.deadMs / 1000.0)
    deleteRec(tableDir); deleteRec(ckDir)
    (sec, numEvents / sec)
  }

  /** The full LIVE loop: continuous-tail ingest of the log into an
    * upstream table WHILE a `graft-changes` consumer maintains a
    * downstream table from its change feed — binlog → lake → derived
    * table, all concurrent (north-star deployment in one number). Returns
    * (sec, events/sec) measured until the DOWNSTREAM converges to the
    * upstream's final row count, minus the producer's measured
    * idle-detection dead window. */
  def liveLoopOnce(spark: SparkSession, logRoot: String, numEvents: Long,
      buckets: Int, opts: CdcApply.Options): (Double, Double) = {
    val upDir = java.nio.file.Files.createTempDirectory("graft-bench-lup").toString
    val downDir = java.nio.file.Files.createTempDirectory("graft-bench-ldown").toString
    val ckUp = java.nio.file.Files.createTempDirectory("graft-bench-lcku").toString
    val ckDown = java.nio.file.Files.createTempDirectory("graft-bench-lckd").toString
    val upstream = new LakeTable(spark, upDir, numBuckets = buckets)
    upstream.create(Model.transcriptSchema)
    val downstream = new LakeTable(spark, downDir, numBuckets = buckets)
    downstream.create(Model.transcriptSchema)
    val t0 = System.nanoTime()
    val q = spark.readStream.format("graft-changes")
      .option("path", upDir).option("startingVersion", "0").load()
      .writeStream
      .option("checkpointLocation", ckDown)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        CdcApply.applyBatch(downstream,
          df.withColumnRenamed("_lsn", "lsn").withColumnRenamed("_op", "op"), id, opts)
        ()
      }
      .start()
    val r = graft.cdc.CdcStream.runTail(spark, logRoot, upstream, ckUp,
      maxFilesPerTrigger = 32, intervalMs = 100L, idleStopMs = 2000L, opts = opts)
    val target = upstream.read().count()
    val deadline = System.nanoTime() + 300L * 1000000000L
    while (downstream.read().count() != target && System.nanoTime() < deadline) {
      q.exception.foreach(throw _)
      Thread.sleep(250)
    }
    q.stop(); q.awaitTermination()
    val converged = downstream.read().count() == target
    val sec = math.max(0.001, (System.nanoTime() - t0) / 1e9 - r.deadMs / 1000.0)
    deleteRec(upDir); deleteRec(downDir); deleteRec(ckUp); deleteRec(ckDown)
    if (!converged) sys.error(s"live loop did not converge: downstream != $target rows")
    (sec, numEvents / sec)
  }

  def cdcReplay(spark: SparkSession, numEvents: Long, numSegments: Int,
      buckets: Int): (Double, Double) = {
    val work = java.nio.file.Files.createTempDirectory("graft-bench").toString
    val segments = genLog(spark, work, numEvents, numSegments)
    val r = replayOnce(spark, segments, numEvents, buckets)
    deleteRec(work)
    r
  }

  def deleteRec(dir: String): Unit =
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => }

  /** 1-minute loadavg — identifies noisy-host runs (this shared box shows
    * documented 1.4–4× co-tenant swings; round-3's bench "regression" was
    * adjudicated as exactly this, so runs now self-report load). */
  private def loadAvg: Double =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // bench data is MBs; AQE's 64MB advisory size would coalesce every
      // shuffle to 1-2 partitions and serialize the measurement
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warm-up so the first measured query doesn't pay it
    try SparkEntry.queries.head._2(spark, sfDir).count() catch { case _: Throwable => }

    val loadBefore = loadAvg
    val runStartMs = System.currentTimeMillis()
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val started = scala.collection.mutable.LinkedHashMap[String, Long]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      started(name) = System.currentTimeMillis() - runStartMs
      val t0 = System.nanoTime()
      // a failed query must NOT masquerade as a fast run: record -1 and
      // surface the error in the output JSON
      try {
        fn(spark, sfDir).count()
        results(name) = (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        results(name) = -1.0
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(120)
      }
    }
    // flagship: CDC replay throughput (2M events, 4 micro-batches),
    // copy-on-write MERGE and merge-on-read append modes
    val work = java.nio.file.Files.createTempDirectory("graft-bench").toString
    val segments = genLog(spark, work, 2000000L, 4)
    val (replaySec, eps) = replayOnce(spark, segments, 2000000L, buckets = 32)
    results("cdc_replay_2m") = replaySec
    val (morSec, epsMor) = replayOnce(spark, segments, 2000000L, buckets = 32,
      CdcApply.Options(mergeOnRead = true, compactEvery = 16))
    results("cdc_replay_2m_mor") = morSec
    // pipelined MoR: concurrent delta writes, ordered commits
    val (pipeSec, epsPipe) = replayOnce(spark, segments, 2000000L, buckets = 32,
      CdcApply.Options(mergeOnRead = true, compactEvery = 16, pipelineDepth = 4))
    results("cdc_replay_2m_mor_pipelined") = pipeSec
    // CLUSTERED (sort-ordered) compaction A/B: same MoR replay, rewrites
    // range-partitioned on the key — write-path cost of the read
    // optimization (the pruning payoff itself is spec-pinned: point reads
    // touch <=2 files instead of every salted slice)
    val (clusSec, epsClus) = replayOnce(spark, segments, 2000000L, buckets = 32,
      CdcApply.Options(mergeOnRead = true, compactEvery = 16,
        clusteredCompaction = true))
    results("cdc_replay_2m_mor_clustered") = clusSec
    // STREAMING-path pipelined apply: Structured Streaming + CdcPipeline
    // over the same log (one segment ≈ one micro-batch via
    // maxFilesPerTrigger) — the north-star deployment mode; target is
    // within ~10% of the batch pipelined run above
    val (streamSec, epsStream) = streamReplayOnce(spark, s"$work/log-2000000-4",
      2000000L, buckets = 32,
      CdcApply.Options(mergeOnRead = true, compactEvery = 16, pipelineDepth = 4))
    results("cdc_replay_2m_stream_pipelined") = streamSec
    // CONTINUOUS tail (ProcessingTime trigger, idle-stop) over the same
    // log — the binlog-tail deployment; target: sustained rate ≈ the
    // AvailableNow streaming run above
    val (tailSec, epsTail) = streamTailReplayOnce(spark, s"$work/log-2000000-4",
      2000000L, buckets = 32,
      CdcApply.Options(mergeOnRead = true, compactEvery = 16, pipelineDepth = 4))
    results("cdc_replay_2m_stream_tail") = tailSec
    // LIVE LOOP: tail-ingest the same log into an upstream table while a
    // graft-changes consumer maintains a downstream table concurrently —
    // end-to-end binlog → lake → derived-table rate (events/sec over the
    // time until the DOWNSTREAM holds the final state)
    val (loopSec, epsLoop) = liveLoopOnce(spark, s"$work/log-2000000-4",
      2000000L, buckets = 32,
      CdcApply.Options(mergeOnRead = true, compactEvery = 16, pipelineDepth = 4))
    results("cdc_live_loop_2m") = loopSec
    // CDC-OUT: drain the full change feed of a freshly MoR-replayed table
    // through the streaming graft-changes source (AvailableNow) — the
    // downstream-consumer side of the engine. Rate is per EMITTED event
    // (delta files hold per-batch LWW winners, so emitted < raw replayed).
    val cfTableDir = java.nio.file.Files.createTempDirectory("graft-bench-cf").toString
    val cfCk = java.nio.file.Files.createTempDirectory("graft-bench-cfck").toString
    val cfTable = new LakeTable(spark, cfTableDir, numBuckets = 32)
    cfTable.create(Model.transcriptSchema)
    CdcApply.replay(spark, cfTable, segments,
      CdcApply.Options(mergeOnRead = true, compactEvery = 16, pipelineDepth = 4))
    val drained = new java.util.concurrent.atomic.AtomicLong()
    val t0cf = System.nanoTime()
    val qcf = spark.readStream.format("graft-changes")
      .option("path", cfTableDir).option("startingVersion", "0").load()
      .writeStream
      .option("checkpointLocation", cfCk)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        drained.addAndGet(df.count()); ()
      }
      .start()
    qcf.awaitTermination()
    val cfSec = (System.nanoTime() - t0cf) / 1e9
    val epsCf = drained.get() / cfSec
    results("cdf_drain_2m") = cfSec
    deleteRec(cfTableDir); deleteRec(cfCk)
    deleteRec(work)

    val loadAfter = loadAvg
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }.mkString("{", ",", "}")
    val starts = started.map { case (k, v) => "\"" + k + s"""":${v / 1000.0}""" }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replaceAll("[\"\\\\\n\r\t]", " ") + "\"" }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"query_start_sec":$starts,"errors":$errs,"sf":"$sfDir","cdc_events_per_sec":$eps%.0f,"cdc_events_per_sec_mor":$epsMor%.0f,"cdc_events_per_sec_mor_pipelined":$epsPipe%.0f,"cdc_events_per_sec_mor_clustered":$epsClus%.0f,"cdc_events_per_sec_stream_pipelined":$epsStream%.0f,"cdc_events_per_sec_stream_tail":$epsTail%.0f,"cdc_live_loop_events_per_sec":$epsLoop%.0f,"cdf_drain_events_per_sec":$epsCf%.0f,"cdf_drained_events":${drained.get()},"loadavg_before":$loadBefore%.2f,"loadavg_after":$loadAfter%.2f,"run_epoch_ms":$runStartMs}"""
    println(line)
    // the driver captures only a log TAIL — round 4's per-query evidence
    // fell off the front of the artifact. The file copy is always complete.
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get("target/bench.json"), line + "\n")
    } catch { case _: Throwable => }
    spark.stop()
  }
}
