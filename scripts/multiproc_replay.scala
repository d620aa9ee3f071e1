// replay one shard (env SHARD_LOG) into a fresh table; print wall + rows
import graft.cdc.CdcApply
import graft.lake.LakeTable
import graft.model.Model
import scala.jdk.CollectionConverters._
val logDir = sys.env("SHARD_LOG")
val segments = java.nio.file.Files.list(java.nio.file.Paths.get(logDir)).iterator().asScala
  .map(_.toString).filter(_.contains("segment-")).toSeq.sorted
val opts = CdcApply.Options(mergeOnRead = true, compactEvery = 100, pipelineDepth = 4)
val warm = new LakeTable(spark, java.nio.file.Files.createTempDirectory("shard-w").toString, numBuckets = 8)
warm.create(Model.transcriptSchema)
CdcApply.replay(spark, warm, segments.take(1), opts)
val t2 = new LakeTable(spark, java.nio.file.Files.createTempDirectory("shard-t").toString, numBuckets = 8)
t2.create(Model.transcriptSchema)
val t0 = System.nanoTime
CdcApply.replay(spark, t2, segments, opts)
val sec = (System.nanoTime - t0) / 1e9
println(f"SHARD_RESULT dir=$logDir sec=$sec%.2f rows=${t2.readFull().count()}")
System.exit(0)
