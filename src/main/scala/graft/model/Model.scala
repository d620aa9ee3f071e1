package graft.model

import org.apache.spark.sql.types._

/**
 * Core data model of the CDC/ingest engine.
 *
 * The input is a binlog/WAL-style feed of conversation-turn change events
 * (insert/update/delete), applied into a transcripts lake table of shape
 * `(conv_id, turn_idx, role, text, tool, ts)` per BASELINE.json `input_hint`.
 *
 * The reference engine (wintechis/flex-rml) models every relation as a
 * headered CSV whose values are all strings
 * (reference: src/flexrml/backend/executor/simple_executor.cpp:380-422);
 * this engine is typed end-to-end instead — see SURVEY.md §1.2.
 */
object Model {

  /** One change event in the log. `lsn` is the global total order of the
    * feed and the last-writer-wins key; `op` is I (insert), U (update),
    * D (delete). `tool` is nullable and only present in later log segments
    * (additive schema evolution). */
  final case class ChangeEvent(
      lsn: Long,
      op: String,
      ts: java.sql.Timestamp,
      conv_id: String,
      turn_idx: Int,
      role: String,
      text: String,
      tool: Option[String])

  /** One row of the target transcripts table (public schema). */
  final case class TurnRow(
      conv_id: String,
      turn_idx: Int,
      role: String,
      text: String,
      tool: Option[String],
      ts: java.sql.Timestamp)

  /** Change-event schema WITHOUT the evolved `tool` column — the shape of
    * early log segments, before the additive schema-evolution point. */
  val changeEventSchemaV1: StructType = StructType(Seq(
    StructField("lsn", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = true),
    StructField("text", StringType, nullable = true)))

  /** Full change-event schema (post-evolution, with `tool`). */
  val changeEventSchema: StructType =
    StructType(changeEventSchemaV1.fields :+ StructField("tool", StringType, nullable = true))

  /** Public schema of the transcripts table (BASELINE.json input_hint). */
  val transcriptSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("tool", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = true)))

  /** Primary key of the transcripts table. */
  val keyCols: Seq[String] = Seq("conv_id", "turn_idx")

  /** Internal metadata columns the lake table keeps alongside the public
    * schema: `_lsn` for cross-batch last-writer-wins, `_op` so deletes are
    * retained as tombstones (a late event with a smaller lsn arriving in a
    * later micro-batch must NOT resurrect a deleted row). */
  val metaCols: Seq[StructField] = Seq(
    StructField("_lsn", LongType, nullable = false),
    StructField("_op", StringType, nullable = false))
}
