package graft

import graft.cdc.{CdcApply, CdcStream}
import graft.lake.LakeTable
import graft.model.Model
import org.apache.spark.sql.SparkSession

/** 10^8-event live CDC loop with LAG MEASUREMENT (round-5 verdict item 5):
  * continuous-tail ingest of the generated change log into an upstream
  * table WHILE a `graft-changes` consumer maintains a downstream table —
  * the full binlog → lake → derived-table chain — with a sampler thread
  * recording the consumer's version lag behind the upstream head every
  * second (no Spark jobs: upstream head is a pointer read, consumer
  * position comes from the streaming query's own progress). The 100-TB
  * question this answers: does the consumer's admission walk + downstream
  * apply keep BOUNDED lag over a long commit history, or does the backlog
  * snowball? NOT part of the frozen driver bench.
  *
  * Usage: sbt "runMain graft.ProbeLiveLoop [numEvents] [segments] [buckets]"
  */
object ProbeLiveLoop {

  def main(args: Array[String]): Unit = {
    val numEvents = args.headOption.map(_.toLong).getOrElse(100000000L)
    val numSegments = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val buckets = args.drop(2).headOption.map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = sys.env.getOrElse("GRAFT_WORK_DIR", "/tmp/graft-liveloop")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(work))
    val tGen0 = System.nanoTime()
    Bench.genLog(spark, work, numEvents, numSegments)
    val logRoot = s"$work/log-$numEvents-$numSegments"
    println(f"PROBE gen/reuse ${(System.nanoTime() - tGen0) / 1e9}%.1f s")

    val upDir = java.nio.file.Files.createTempDirectory("probe-lup").toString
    val downDir = java.nio.file.Files.createTempDirectory("probe-ldown").toString
    val ckUp = java.nio.file.Files.createTempDirectory("probe-lcku").toString
    val ckDown = java.nio.file.Files.createTempDirectory("probe-lckd").toString
    val upstream = new LakeTable(spark, upDir, numBuckets = buckets)
    upstream.create(Model.transcriptSchema)
    val downstream = new LakeTable(spark, downDir, numBuckets = buckets)
    downstream.create(Model.transcriptSchema)
    val opts = CdcApply.Options(mergeOnRead = true, compactEvery = 16, pipelineDepth = 4)
    // operational sizing rule: micro-batches of ~10M events at this scale
    val mft = CdcStream.suggestMaxFilesPerTrigger(spark, logRoot, targetEvents = 10000000L)
    println(s"PROBE maxFilesPerTrigger=$mft")

    val t0 = System.nanoTime()
    val q = spark.readStream.format("graft-changes")
      .option("path", upDir).option("startingVersion", "0").load()
      .writeStream
      .option("checkpointLocation", ckDown)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(200))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        CdcApply.applyBatch(downstream,
          df.withColumnRenamed("_lsn", "lsn").withColumnRenamed("_op", "op"), id, opts)
        ()
      }
      .start()

    // lag sampler: metadata-only — upstream head (pointer read) vs the
    // consumer's committed source offset (query progress)
    @volatile var producerDoneAtMs = -1L
    @volatile var stopSampler = false
    val samples = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    val sampler = new Thread(() => {
      while (!stopSampler) {
        val up = try upstream.currentVersion catch { case _: Throwable => -1L }
        val consumed = try {
          val p = q.lastProgress
          if (p == null || p.sources.isEmpty || p.sources(0).endOffset == null) 0L
          else p.sources(0).endOffset.trim.stripPrefix("\"").stripSuffix("\"").toLong
        } catch { case _: Throwable => 0L }
        samples.add((System.currentTimeMillis(), up, consumed))
        Thread.sleep(1000)
      }
    }, "lag-sampler")
    sampler.setDaemon(true); sampler.start()

    // producer: continuous-tail ingest of the whole log
    val r = CdcStream.runTail(spark, logRoot, upstream, ckUp,
      maxFilesPerTrigger = mft, intervalMs = 200L, idleStopMs = 3000L, opts = opts)
    producerDoneAtMs = System.currentTimeMillis()
    val target = upstream.read().count()
    println(f"PROBE producer done: upstream rows=$target deadWindow=${r.deadMs / 1000.0}%.1f s")

    // convergence: downstream reaches the upstream's final state row count
    val deadline = System.nanoTime() + 1200L * 1000000000L
    var converged = false
    while (!converged && System.nanoTime() < deadline) {
      q.exception.foreach(throw _)
      converged = downstream.read().count() == target
      if (!converged) Thread.sleep(1000)
    }
    val convergedAtMs = System.currentTimeMillis()
    q.stop(); q.awaitTermination()
    stopSampler = true
    val sec = math.max(0.001, (System.nanoTime() - t0) / 1e9 - r.deadMs / 1000.0)

    import scala.jdk.CollectionConverters._
    val ss = samples.asScala.toSeq
    val maxLag = if (ss.isEmpty) -1L else ss.map(s => s._2 - s._3).max
    val lagAtProducerEnd = ss.filter(_._1 >= producerDoneAtMs).headOption
      .map(s => s._2 - s._3).getOrElse(-1L)
    // snowball check: lag across the producer phase should be bounded and
    // the tail (post-producer) strictly draining
    val lagSeries = ss.map(s => s._2 - s._3)
    println(s"PROBE lag series (versions): ${lagSeries.mkString(",")}")
    val line = f"""{"bench":"live_loop_probe","events":$numEvents,"mft":$mft,"sec":$sec%.1f,"events_per_sec":${numEvents / sec}%.0f,"upstream_rows":$target,"max_version_lag":$maxLag,"lag_at_producer_end":$lagAtProducerEnd,"drain_after_producer_s":${(convergedAtMs - producerDoneAtMs) / 1000.0}%.1f,"converged":$converged}"""
    println(line)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("target/liveloop_probe.json"),
      line + "\n", java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    catch { case _: Throwable => }
    Bench.deleteRec(upDir); Bench.deleteRec(downDir)
    Bench.deleteRec(ckUp); Bench.deleteRec(ckDown)
    if (!converged) sys.error("live loop did not converge")
    spark.stop()
  }
}
