// replay one shard (env SHARD_LOG) into a fresh table; print wall + rows
// NOTE: spark-shell -I interprets LINE BY LINE — every statement must be a
// single line or wrapped in braces, or a continuation silently becomes a
// separate (failing) statement and the val binds to the wrong type.
import graft.cdc.{CdcApply, CdcStream}
import graft.lake.LakeTable
import graft.model.Model
import scala.jdk.CollectionConverters._
val logDir = sys.env("SHARD_LOG")
val segments = { val st = java.nio.file.Files.list(java.nio.file.Paths.get(logDir)); try st.iterator().asScala.map(_.toString).filter(_.contains("segment-")).toSeq.sorted finally st.close() }
val opts = CdcApply.Options(mergeOnRead = true, compactEvery = 100, pipelineDepth = 4)
// SHARD_MODE=stream replays through the full Structured Streaming entry
// point (CdcStream + CdcPipeline, fresh checkpoint) instead of batch replay
val streamMode = sys.env.getOrElse("SHARD_MODE", "batch") == "stream"
def applyAll(t: LakeTable): Unit = { if (streamMode) CdcStream.runOnce(spark, logDir, t, java.nio.file.Files.createTempDirectory("shard-ck").toString, 32, opts) else CdcApply.replay(spark, t, segments, opts) } // always the FULL shard log — stream mode has no segment-subset form, so no param to silently ignore
val warm = new LakeTable(spark, java.nio.file.Files.createTempDirectory("shard-w").toString, numBuckets = 8)
warm.create(Model.transcriptSchema)
CdcApply.replay(spark, warm, segments.take(1), opts) // JVM/codegen warm-up (batch in both modes — streaming runOnce has no segment subset)
val t2 = new LakeTable(spark, java.nio.file.Files.createTempDirectory("shard-t").toString, numBuckets = 8)
t2.create(Model.transcriptSchema)
val t0 = System.nanoTime
applyAll(t2)
val sec = (System.nanoTime - t0) / 1e9
val rows = t2.readFull().count()
// a thrown assert would NOT abort a -I run (the REPL continues past
// exceptions) — gate the result line itself so a failed replay can never
// be grepped as a measurement
if (rows > 0) println(f"SHARD_RESULT dir=$logDir sec=$sec%.2f rows=$rows") else println(s"SHARD_FAILED dir=$logDir rows=0")
System.exit(if (rows > 0) 0 else 1)
