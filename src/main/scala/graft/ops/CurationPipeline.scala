package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * End-to-end corpus curation — the composed form of the document operators,
 * in the order a web-scale training-data pipeline runs them (cheap narrow
 * filters first, the near-dup shuffle last, over the smallest survivor set):
 *
 *   1. quality gate   — narrow map (length/token/stopword heuristics)
 *   2. language gate  — narrow map (n-gram stopword argmax)
 *   3. exact dedup    — one shuffle on a 128-bit content hash
 *   4. near dedup     — MinHash-LSH candidates + exact-jaccard verify;
 *                       of each near-dup cluster the smallest id survives
 *
 * Everything stays a DataFrame plan until the caller acts; the report is
 * a tiny aggregate, not a collect of data.
 */
object CurationPipeline {

  final case class Config(
      langs: Set[String] = Set("en"),
      jaccardThreshold: Double = 0.8,
      shingleK: Int = 5,
      bands: Int = 64,
      rowsPerBand: Int = 5,
      maxBucketSize: Int = 2000)

  final case class Report(input: Long, afterQuality: Long, afterLang: Long,
      afterExact: Long, kept: Long) {
    def dropped: Long = input - kept
  }

  /** Returns (curated docs, funnel report). Input needs (idCol, textCol). */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): (DataFrame, Report) = {
    val input = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))

    val quality = TextOps.qualitySignals(input, col("text"))
      .filter(col("quality_ok")).select("doc_id", "text")
    val lang = quality
      .withColumn("_lang", TextOps.langId(col("text")))
      .filter(col("_lang").isin(cfg.langs.toSeq.map(lit): _*))
      .drop("_lang")
    val exact = TextOps.exactDedup(lang, "doc_id", "text")

    // near-dup clusters → survivor = min id of each connected pair set.
    // One LSH pass gives pairs (a < b); dropping every id that appears as
    // the GREATER side keeps exactly one doc per clique (the smallest id)
    // for cliques, and for general chains keeps minimal elements — the
    // standard LSH-dedup approximation (union-find exactness would need a
    // driver-side pass; chains beyond cliques are rare at high thresholds).
    val pairs = TextOps.nearDupPairs(exact, "doc_id", "text",
      cfg.jaccardThreshold, cfg.shingleK, cfg.bands, cfg.rowsPerBand,
      maxBucketSize = cfg.maxBucketSize)
    val losers = pairs.select(col("id_b").as("doc_id")).distinct()
    val kept = exact.join(losers, Seq("doc_id"), "left_anti")

    val report = Report(
      input = input.count(),
      afterQuality = quality.count(),
      afterLang = lang.count(),
      afterExact = exact.count(),
      kept = kept.count())
    (kept, report)
  }
}
