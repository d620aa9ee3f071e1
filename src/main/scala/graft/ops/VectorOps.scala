package graft.ops

import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`) — the ANN
 * component of the training-data pipeline.
 *
 * Brute-force cosine top-k is the exact baseline (one narrow map + a
 * driver-side top-k via `orderBy.limit`, which Spark executes as
 * TakeOrderedAndProject — per-partition heaps, no full sort, no shuffle of
 * the losers). The scale path is sign-LSH bucketing: at 10^10 vectors the
 * bucketed variant probes only matching buckets.
 */
object VectorOps {

  /** Exact top-k most-similar vectors to `query` by cosine similarity.
    * Output: (vec_id, rank) — ids only, ordering ties broken by id so the
    * result is deterministic and float-representation-independent. */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int): DataFrame = {
    val scored = df.select(col(idCol).as("vec_id"),
      cosine_to_query(col(vecCol), query).as("cos"))
    scored.orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cos").desc, col("vec_id").asc)))
      .select("vec_id", "rank")
  }

  /** LSH-bucketed approximate top-k: probe only vectors whose sign-LSH
    * bucket matches the query's (optionally within hamming `probes` of
    * it). Recall/latency knob = bits. */
  def cosineTopKLsh(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, bits: Int = 12, seed: Long = 42L,
      maxBucketHamming: Int = 1): DataFrame = {
    // bucket of the query vector, computed once on the driver
    val qBucket = {
      val qd = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        query.map(_.toFloat))
      graft.functions.VectorMath.signLshBucket(qd, bits, seed)
    }
    val bucketed = df.select(col(idCol).as("vec_id"), col(vecCol).as("v"),
      sign_lsh_bucket(col(vecCol), bits, seed).as("bucket"))
    val candidates = bucketed.filter(
      hamming64(col("bucket"), lit(qBucket)) <= maxBucketHamming)
    candidates
      .select(col("vec_id"), cosine_to_query(col("v"), query).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cos").desc, col("vec_id").asc)).as("rank"))
  }

  /** Embedding-cosine near-duplicate pairs via shared LSH bucket +
    * exact cosine ≥ threshold verification — no O(n²) cross join. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, bits: Int = 12, seed: Long = 42L): DataFrame = {
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      sign_lsh_bucket(col(vecCol), bits, seed).as("bucket"))
    val a = bucketed.as("a"); val b = bucketed.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        // codegen'd static call — one invocation per candidate pair, no
        // per-element HOF lambda frames on the verify path
        cosine_pair(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
