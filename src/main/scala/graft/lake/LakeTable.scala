package graft.lake

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._

/**
 * Minimal Iceberg-style lake table: parquet data files + JSON snapshot
 * manifests + atomic pointer commit + additive schema evolution + MERGE
 * upsert. SURVEY.md §7.0: no Iceberg jar ships in this sandbox, so the
 * north rule's "Iceberg MERGE" lands as this in-repo format behind a small
 * API (`merge`/`read`/`evolveSchema`) that a real
 * `iceberg-spark-runtime` (`MERGE INTO … WHEN MATCHED`) replaces 1:1.
 *
 * Scale design (100 TB posture):
 *  - data is hash-bucketed by `conv_id` into `numBuckets` buckets; a MERGE
 *    reads and rewrites ONLY the buckets present in the incoming batch
 *    (at cluster scale: thousands of buckets, so a micro-batch touches a
 *    small fraction of the table);
 *  - last-writer-wins is resolved by the `_lsn` metadata column, so
 *    late-arriving events in later micro-batches cannot regress state;
 *  - deletes are retained as `_op='D'` tombstones so a late pre-delete
 *    event cannot resurrect a deleted row (compaction can GC tombstones
 *    below a replay watermark);
 *  - exactly-once: every snapshot records the set of applied
 *    `batchId`s; re-merging an already-applied batch is a no-op, which
 *    together with Structured Streaming's checkpointed offsets gives
 *    end-to-end exactly-once (SURVEY.md §7.4 risk 1);
 *  - commit is write-new-snapshot-file + atomic rename of the `_latest`
 *    pointer — kill-during-commit leaves the old snapshot current and the
 *    orphan files unreachable.
 */
class LakeTable(val spark: SparkSession, val root: String, val numBuckets: Int = 16,
    val keyCols: Seq[String] = graft.model.Model.keyCols) {
  import LakeTable._

  private val rootPath: Path = Paths.get(root)
  private val snapsDir: Path = rootPath.resolve("snapshots")
  private val latestPtr: Path = rootPath.resolve("_latest")

  /** Stable bucket assignment — must never change across snapshots. */
  def bucketOf(convId: Column): Column = pmod(xxhash64(convId, lit(42)), lit(numBuckets)).cast("int")

  /** Previous batch's per-bucket weights — the steady-state skew signal
    * feeding targeted salting in the one-job MoR path (heuristic only;
    * metrics, not correctness). */
  @volatile var lastBucketWeights: Map[Int, Long] = Map.empty

  // ---- snapshot state ----------------------------------------------------

  final case class Snapshot(
      version: Long,
      schema: StructType,
      files: Map[Int, Seq[String]], // bucket -> base data files (relative to root)
      appliedBatchIds: Set[Long],
      // merge-on-read delta files per bucket: rows here OVERRIDE base rows
      // by max _lsn; folded into base by compact()
      deltas: Map[Int, Seq[String]] = Map.empty)

  def exists: Boolean = Files.exists(latestPtr)

  def create(schema: StructType): Unit = {
    Files.createDirectories(snapsDir)
    Files.createDirectories(rootPath.resolve("data"))
    Files.createDirectories(rootPath.resolve("lineage"))
    commit(Snapshot(0L, withMeta(schema), Map.empty, Set.empty))
  }

  def currentSnapshot: Snapshot = {
    val name = Files.readString(latestPtr).trim
    readSnapshot(snapsDir.resolve(name))
  }

  private def readFileMap(node: JsonNode, field: String): Map[Int, Seq[String]] =
    Option(node.get(field)).map(_.asInstanceOf[ObjectNode].properties().asScala.map { e =>
      e.getKey.toInt -> e.getValue.asInstanceOf[ArrayNode].asScala.map(_.asText).toSeq
    }.toMap).getOrElse(Map.empty)

  private def readSnapshot(p: Path): Snapshot = {
    val node = mapper.readTree(Files.readString(p))
    val schema = DataType.fromJson(node.get("schema").asText).asInstanceOf[StructType]
    val applied = node.get("appliedBatchIds").asInstanceOf[ArrayNode].asScala.map(_.asLong).toSet
    Snapshot(node.get("version").asLong, schema, readFileMap(node, "files"), applied,
      readFileMap(node, "deltas"))
  }

  private def commit(s: Snapshot): Unit = {
    val node = mapper.createObjectNode()
    node.put("version", s.version)
    node.put("schema", s.schema.json)
    def putFiles(field: String, m: Map[Int, Seq[String]]): Unit = {
      val fn = node.putObject(field)
      m.foreach { case (b, fs) =>
        val arr = fn.putArray(b.toString)
        fs.foreach(arr.add)
      }
    }
    putFiles("files", s.files)
    putFiles("deltas", s.deltas)
    val applied = node.putArray("appliedBatchIds")
    s.appliedBatchIds.toSeq.sorted.foreach(applied.add)
    val name = f"v${s.version}%08d-${UUID.randomUUID().toString.take(8)}.json"
    Files.writeString(snapsDir.resolve(name), mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node))
    // atomic pointer flip: tmp + ATOMIC_MOVE (SURVEY.md §7.4 risk 1)
    val tmp = rootPath.resolve(s"_latest.tmp.${UUID.randomUUID().toString.take(8)}")
    Files.writeString(tmp, name)
    Files.move(tmp, latestPtr, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  // ---- reads -------------------------------------------------------------

  /** Full table state incl. metadata columns and delete tombstones, with
    * merge-on-read delta resolution (max-_lsn row per key wins). */
  def readFull(): DataFrame = resolved(currentSnapshot, None)

  /** Public view: tombstones dropped, metadata columns hidden. */
  def read(): DataFrame = {
    val s = currentSnapshot
    val publicCols = s.schema.fields.map(_.name).filterNot(metaColNames.contains)
    resolved(s, None).filter(col("_op") =!= "D")
      .select(publicCols.map(col).toSeq: _*)
  }

  /** base ∪ deltas with read-side LWW when deltas exist (merge-on-read). */
  private def resolved(s: Snapshot, buckets: Option[Set[Int]]): DataFrame = {
    val base = readFileMapDf(s, s.files, buckets)
    val deltaPresent = s.deltas.exists { case (b, fs) =>
      fs.nonEmpty && buckets.forall(_.contains(b)) }
    if (!deltaPresent) base
    else graft.cdc.CdcApply.lwwDedup(
      base.unionByName(readFileMapDf(s, s.deltas, buckets)), keyCols, 1)
  }

  private def readFileMapDf(s: Snapshot, m: Map[Int, Seq[String]],
      buckets: Option[Set[Int]]): DataFrame = {
    val paths = m
      .filter { case (b, _) => buckets.forall(_.contains(b)) }
      .values.flatten.map(f => rootPath.resolve(f).toString).toSeq
    if (paths.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s.schema)
    // explicit schema: older files simply lack evolved columns and read as
    // null — additive schema evolution without rewriting history
    else spark.read.schema(s.schema).parquet(paths: _*)
  }

  // ---- schema evolution --------------------------------------------------

  /** Additive-only evolution; existing files are NOT rewritten. */
  def evolveSchema(newFields: Seq[StructField]): Unit = {
    val s = currentSnapshot
    val existing = s.schema.fieldNames.toSet
    val add = newFields.filterNot(f => existing.contains(f.name))
    if (add.nonEmpty)
      commit(s.copy(version = s.version + 1,
        schema = StructType(s.schema.fields ++ add)))
  }

  // ---- MERGE -------------------------------------------------------------

  /** MERGE a prepared batch into the table.
    *
    * `batch` must contain the key columns, `_lsn` (long) and `_op`
    * ('I'|'U'|'D'), one row per key (pre-deduplicated last-writer-wins by
    * the caller — [[graft.cdc.CdcApply]]). Unknown public columns in the
    * batch trigger additive schema evolution first.
    *
    * Semantics = Iceberg `MERGE INTO t USING b ON keys WHEN MATCHED AND
    * b._lsn >= t._lsn THEN UPDATE/DELETE WHEN NOT MATCHED THEN INSERT`,
    * implemented as: read affected buckets → union old+new → keep max-_lsn
    * row per key → rewrite those buckets only.
    *
    * Returns false if `batchId` was already applied (idempotent replay). */
  def merge(batch: DataFrame, keyCols: Seq[String], batchId: Long,
      saltPartitions: Int = 0, affectedHint: Option[Set[Int]] = None,
      saltBuckets: Int = 1, sortedDedup: Boolean = true,
      bucketWeights: Map[Int, Long] = Map.empty): Boolean = {
    val s0 = currentSnapshot
    if (s0.appliedBatchIds.contains(batchId)) return false

    val (s, aligned) = evolveAndAlign(batch)
    // the caller usually already knows the touched buckets (lineage stats
    // pass) — avoid an extra full pass over the batch
    val affected: Set[Int] = affectedHint.getOrElse(
      aligned.select("_bucket").distinct().collect().map(_.getInt(0)).toSet)
    // cur = base ∪ any outstanding merge-on-read deltas of those buckets
    // (folded into the rewrite, so the merge also acts as a compaction)
    val cur = readFileMapDf(s, s.files ++ s.deltas.map { case (b, fs) =>
        b -> (s.files.getOrElse(b, Nil) ++ fs) }, Some(affected))
      .withColumn("_bucket", bucketOf(col(keyCols.head)))

    val all = cur.unionByName(aligned)
    val newFiles = rewriteBuckets(all, affected, keyCols, saltPartitions,
      bucketWeights, sortedDedup, saltBuckets)
    val files2 = (s.files -- affected) ++ newFiles.filter(_._2.nonEmpty)
    commit(Snapshot(s.version + 1, s.schema, files2, s.appliedBatchIds + batchId,
      s.deltas -- affected))
    true
  }

  /** Merge-on-read fast path: append the batch as delta files (one
    * exchange, no base rewrite). Read-side LWW resolves deltas against the
    * base; [[compact]] folds them in. This is the high-throughput apply
    * mode for the 10^10-event replay — write amplification drops from
    * O(table) per batch to O(batch), at the cost of read-time resolution
    * (SURVEY.md §7.4 risk 2 mitigation, the Iceberg MoR analog). */
  def appendDelta(batch: DataFrame, keyCols: Seq[String], batchId: Long,
      saltPartitions: Int = 0, affectedHint: Option[Set[Int]] = None,
      bucketWeights: Map[Int, Long] = Map.empty,
      statsAcc: Option[org.apache.spark.util.CollectionAccumulator[(Int, Long, Long, Long)]] = None)
      : Boolean = {
    val s0 = currentSnapshot
    if (s0.appliedBatchIds.contains(batchId)) return false
    val (s, aligned) = evolveAndAlign(batch)
    // unlike the CoW merge, the append needs no affected-bucket set up
    // front (it reads nothing): plan the write for every bucket and learn
    // the actual set from the written files — a one-job micro-batch
    val planned: Set[Int] = affectedHint.getOrElse((0 until numBuckets).toSet)
    // in-batch LWW only (shrinks the delta); cross-batch resolution is
    // read-side / compaction-side
    val newFiles = rewriteBuckets(aligned, planned, keyCols, saltPartitions,
      bucketWeights, sortedDedup = true, saltBuckets = 1, statsAcc = statsAcc)
    val affected = newFiles.filter(_._2.nonEmpty).keySet
    val deltas2 = affected.foldLeft(s.deltas) { (m, b) =>
      m.updated(b, m.getOrElse(b, Nil) ++ newFiles.getOrElse(b, Nil))
    }
    commit(Snapshot(s.version + 1, s.schema, s.files, s.appliedBatchIds + batchId, deltas2))
    true
  }

  /** Fold all outstanding deltas into the base (Iceberg-compaction analog).
    * `dropTombstonesBelowLsn`: GC delete tombstones whose lsn is below the
    * replay watermark (no event older than it can still arrive). */
  def compact(saltPartitions: Int = 4,
      dropTombstonesBelowLsn: Option[Long] = None): Unit = {
    val s = currentSnapshot
    // normal compaction touches only delta-bearing buckets; a tombstone-GC
    // pass is a maintenance rewrite of every bucket that has data
    val affected =
      if (dropTombstonesBelowLsn.isDefined)
        s.deltas.filter(_._2.nonEmpty).keySet ++ s.files.filter(_._2.nonEmpty).keySet
      else s.deltas.filter(_._2.nonEmpty).keySet
    if (affected.isEmpty) return
    val all = readFileMapDf(s, (s.files.view.filterKeys(affected).toMap ++
        s.deltas.map { case (b, fs) => b -> (s.files.getOrElse(b, Nil) ++ fs) }),
        Some(affected))
      .withColumn("_bucket", bucketOf(col(keyCols.head)))
    val newFiles = rewriteBuckets(all, affected, keyCols, saltPartitions,
      Map.empty, sortedDedup = true, saltBuckets = 1,
      dropTombstonesBelowLsn = dropTombstonesBelowLsn)
    val files2 = (s.files -- affected) ++ newFiles.filter(_._2.nonEmpty)
    commit(Snapshot(s.version + 1, s.schema, files2, s.appliedBatchIds,
      s.deltas -- affected))
  }

  /** Number of delta files outstanding for the most delta-laden bucket —
    * the auto-compaction trigger signal. */
  def maxDeltaFiles: Int =
    currentSnapshot.deltas.values.map(_.size).maxOption.getOrElse(0)

  /** Schema-evolve from the batch shape, align columns, add `_bucket`. */
  private def evolveAndAlign(batch: DataFrame): (Snapshot, DataFrame) = {
    val s0 = currentSnapshot
    val newPublic = batch.schema.fields
      .filterNot(f => metaColNames.contains(f.name))
      .filterNot(f => s0.schema.fieldNames.contains(f.name))
    if (newPublic.nonEmpty) evolveSchema(newPublic.toSeq)
    val s = currentSnapshot
    val tableCols = s.schema.fields.map(_.name)
    val aligned = s.schema.fields.foldLeft(batch) { (df, f) =>
      if (df.columns.contains(f.name)) df
      else df.withColumn(f.name, lit(null).cast(f.dataType))
    }.select(tableCols.map(col).toSeq: _*)
      .withColumn("_bucket", bucketOf(col(keyCols.head)))
    (s, aligned)
  }

  /** LWW-dedup `all` and write it bucket-partitioned; returns new files per
    * bucket. Salt plan: at least one task per core when few buckets are
    * hit; buckets holding k× the average batch weight get ~k salt slices
    * (targeted hot-conversation mitigation, north_star) — each slice costs
    * one parquet file, so only skewed buckets pay. */
  private def rewriteBuckets(all: DataFrame, affected: Set[Int],
      keyCols: Seq[String], saltPartitions: Int,
      bucketWeights: Map[Int, Long], sortedDedup: Boolean, saltBuckets: Int,
      dropTombstonesBelowLsn: Option[Long] = None,
      statsAcc: Option[org.apache.spark.util.CollectionAccumulator[(Int, Long, Long, Long)]] = None)
      : Map[Int, Seq[String]] = {
    val commitId = UUID.randomUUID().toString.take(12)
    val outDir = rootPath.resolve(s"data/commit-$commitId")
    val nAffected = math.max(affected.size, 1)
    val cores = spark.sparkContext.defaultParallelism
    val baseFactor = math.max(1, math.min(math.max(saltPartitions, 1),
      math.ceil(cores.toDouble / nAffected).toInt))
    val saltOf: Map[Int, Int] = if (bucketWeights.nonEmpty && saltPartitions > 0) {
      val avg = math.max(1L, bucketWeights.values.sum / math.max(1, bucketWeights.size))
      affected.map { b =>
        val skew = math.ceil(bucketWeights.getOrElse(b, 0L).toDouble / avg).toInt
        b -> math.max(baseFactor, math.min(saltPartitions, skew))
      }.toMap
    } else affected.map(_ -> baseFactor).toMap
    val totalParts = math.max(1, saltOf.values.sum)
    val anySalt = saltOf.values.exists(_ > 1)
    val saltDivisor = element_at(typedLit(saltOf), col("_bucket"))
    val saltExpr = pmod(xxhash64(keyCols.map(col): _*), saltDivisor)

    // LWW in ONE pass. Default: single exchange by (bucket, salted key) +
    // sort-within-partitions + streaming keep-first. Fallback: two-exchange
    // groupBy max_by.
    val deduped =
      if (sortedDedup) {
        val pexprs = if (anySalt) Seq(col("_bucket"), saltExpr) else Seq(col("_bucket"))
        graft.cdc.CdcApply.lwwDedupSorted(all, keyCols, pexprs, totalParts, statsAcc)
      } else {
        val merged = graft.cdc.CdcApply.lwwDedup(all, keyCols, saltBuckets)
        if (anySalt) merged.repartition(totalParts, col("_bucket"), saltExpr)
        else merged.repartition(nAffected, col("_bucket"))
      }
    val writeDf = dropTombstonesBelowLsn match {
      case Some(w) => deduped.filter(!(col("_op") === "D" && col("_lsn") < w))
      case None => deduped
    }
    writeDf.write.partitionBy("_bucket").mode("overwrite").parquet(outDir.toString)

    affected.map { b =>
      val d = outDir.resolve(s"_bucket=$b")
      val fs = if (Files.exists(d))
        Files.list(d).iterator().asScala
          .filter(p => p.getFileName.toString.endsWith(".parquet"))
          .map(p => rootPath.relativize(p).toString).toSeq
      else Seq.empty[String]
      b -> fs
    }.toMap
  }

  // ---- lineage / metrics -------------------------------------------------

  /** Append one lineage line per (batch, bucket): event counts + lsn range
    * + duration (north_star: "per-partition lineage rows and ingest
    * metrics emitted each micro-batch"). */
  def appendLineage(batchId: Long, perBucket: Seq[(Int, Long, Long, Long)], durationMs: Long): Unit = {
    val sb = new StringBuilder
    perBucket.foreach { case (bucket, n, lsnMin, lsnMax) =>
      sb.append(s"""{"batch_id":$batchId,"partition_id":$bucket,"events":$n,"lsn_min":$lsnMin,"lsn_max":$lsnMax,"duration_ms":$durationMs}""").append('\n')
    }
    val f = rootPath.resolve(s"lineage/batch-$batchId-${UUID.randomUUID().toString.take(8)}.jsonl")
    Files.writeString(f, sb.toString)
  }

  def lineage(): DataFrame = spark.read.json(rootPath.resolve("lineage").toString + "/*.jsonl")
}

object LakeTable {
  private val mapper = new ObjectMapper()
  val metaColNames: Set[String] = Set("_lsn", "_op", "_bucket")

  def withMeta(publicSchema: StructType): StructType =
    StructType(publicSchema.fields.filterNot(f => metaColNames.contains(f.name)) ++
      graft.model.Model.metaCols)
}
