package graft

import graft.ops.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Optimization-round probe: phase split of the curation funnel + near-dup
  * verify (guide §1). NOT part of the frozen driver bench. */
object ProbeCuration {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Queries.withPerturbedCopies(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    (1 to 3).foreach { r =>
      t(s"$r scan only") { noop(docs) }
      t(s"$r quality+lang gates") {
        noop(TextOps.qualitySignals(docs, col("text"))
          .withColumn("_lang", TextOps.langId(col("text"))))
      }
      t(s"$r exactDedup") { noop(TextOps.exactDedup(docs, "doc_id", "text")) }
      t(s"$r minhash_bands explode") {
        noop(docs.select(col("doc_id"), posexplode(
          graft.functions.TextFunctions.minhash_bands(col("text"), 5, 64, 5, 42L))))
      }
      t(s"$r candidates (bucketPairs+distinct)") {
        noop(TextOps.minhashCandidates(docs, "doc_id", "text", 5, 64, 5, 42L, 0))
      }
      t(s"$r shingle_hashes") {
        noop(docs.select(col("doc_id"),
          graft.functions.TextFunctions.shingle_hashes(col("text"), 5, 42L)))
      }
      t(s"$r full nearDupPairs") {
        noop(TextOps.nearDupPairs(docs, "doc_id", "text", 0.7, 5, 64, 5, 42L, 0))
      }
    }
    spark.stop()
  }
}
