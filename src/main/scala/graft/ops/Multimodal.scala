package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video ride through the engine as
 * opaque `binary` columns with typed metadata, and decode / feature-extract
 * / resize / frame-sample run as *partition-batched* functions — the Scala
 * analog of `mapInPandas` (vectorized, one call per batch of rows, not per
 * row). The decode step itself is STUBBED with a deterministic fake
 * (`fakeDecode*` below): the image/audio codecs aren't in this container
 * (see the build brief), but the Spark-side contract — schema, batch
 * iterator shape, partitioning, null passthrough — is real and tested, so
 * a real codec drops into `decodeBatch` unchanged.
 */
object Multimodal {

  /** Typed metadata carried next to every blob. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Deterministic synthetic media table derived from any id column —
    * stands in for a real multimodal source in tests/benchmarks. */
  def syntheticMedia(df: DataFrame, idCol: String): DataFrame = {
    val kinds = array(lit("image"), lit("audio"), lit("video"))
    df.select(col(idCol).cast("long").as("media_id"))
      // id mod 3, not a hash: keeps the fixture SQL-mirrorable for the
      // driver oracle while staying deterministic and balanced
      .withColumn("kind", element_at(kinds, (pmod(col("media_id"), lit(3)) + 1).cast("int")))
      // opaque payload: deterministic pseudo-bytes from the id
      .withColumn("bytes", unhex(sha2(concat(lit("blob-"), col("media_id")), 256)))
      .withColumn("width", when(col("kind") === "image", (pmod(xxhash64(col("media_id"), lit(2)), lit(1920)) + 16).cast("int")))
      .withColumn("height", when(col("kind") === "image", (pmod(xxhash64(col("media_id"), lit(3)), lit(1080)) + 16).cast("int")))
      .withColumn("sample_rate", when(col("kind") === "audio", lit(16000)))
      .withColumn("duration_ms", when(col("kind") =!= "image", pmod(xxhash64(col("media_id"), lit(4)), lit(600000))))
  }

  /** Output schema of feature extraction: fixed-size float feature vector
    * plus passthrough metadata. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = true)))

  val featureDim = 16

  /** STUB decode+featurize for one batch of blobs. Deterministic fake: the
    * "feature" is derived from the payload bytes (a real implementation
    * calls the codec here — same signature, one call per partition batch).
    * Null bytes pass through as null features (dead-letter friendly). */
  def decodeBatch(rows: Iterator[Row]): Iterator[Row] = {
    rows.map { r =>
      val id = r.getLong(r.fieldIndex("media_id"))
      val kind = r.getString(r.fieldIndex("kind"))
      val bytes = if (r.isNullAt(r.fieldIndex("bytes"))) null
        else r.getAs[Array[Byte]]("bytes")
      val feature: Array[Float] =
        if (bytes == null) null
        else {
          // ??? real codec goes here; deterministic fake feature:
          val out = new Array[Float](featureDim)
          var i = 0
          while (i < featureDim) {
            val b = bytes(i % bytes.length) & 0xff
            out(i) = ((b * 31 + i * 7) % 255).toFloat / 255f
            i += 1
          }
          out
        }
      Row(id, kind, feature)
    }
  }

  /** Feature extraction over the media table: partition-batched decode with
    * the blobs repartitioned first so decode parallelism is independent of
    * the source file layout (decode is CPU-bound, scans are IO-bound). */
  def extractFeatures(media: DataFrame, parallelism: Int = 0): DataFrame = {
    val in = if (parallelism > 0) media.repartition(parallelism) else media
    val enc = Encoders.row(featureSchema)
    in.select("media_id", "kind", "bytes").mapPartitions(decodeBatch)(enc)
  }

  /** STUB resize: recomputes metadata (real implementation transforms
    * pixels); keeps bytes opaque. Demonstrates metadata-only fast path —
    * no shuffle, narrow map. */
  def resize(media: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim) / greatest(col("width"), col("height")).cast("double"))
    media.withColumn("width",
        when(col("kind") === "image", floor(col("width") * scale).cast("int")).otherwise(col("width")))
      .withColumn("height",
        when(col("kind") === "image", floor(col("height") * scale).cast("int")).otherwise(col("height")))
  }

  /** STUB frame sampling for video rows: one output row per sampled frame
    * timestamp (every `everyMs`), bytes passed through opaquely. The
    * explode IS the real plumbing; the frame decode would replace the
    * passthrough. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("frame_ts",
        explode(sequence(lit(0L), coalesce(col("duration_ms"), lit(0L)), lit(everyMs))))
      .select(col("media_id"), col("frame_ts"), col("bytes"))
}
