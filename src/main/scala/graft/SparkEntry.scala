package graft

import graft.cdc.CdcApply
import graft.gen.ChangeLogGen
import graft.lake.LakeTable
import graft.model.Model
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: full CDC replay — generate a deterministic 20k-event change
    * log, stream it batch-wise through the rule/validate/LWW/MERGE pipeline
    * into a lake table, return the final transcripts state
    * (north_rule's core loop at smoke scale). */
  def entry(spark: SparkSession): DataFrame = {
    val work = java.nio.file.Files.createTempDirectory("graft-entry").toString
    val cfg = ChangeLogGen.Config(numEvents = 20000, numConversations = 100, maxTurns = 24)
    val segments = ChangeLogGen.writeLog(spark, s"$work/log", cfg, numSegments = 4)
    val table = new LakeTable(spark, s"$work/table", numBuckets = 8)
    table.create(Model.transcriptSchema)
    CdcApply.replay(spark, table, segments)
    table.read()
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * training-data pipeline ops). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** DuckDB-equivalent SQL for every SQL-expressible query (same column
    * names + types both sides). */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
