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

  /** Returns (curated docs, funnel report). Input needs (idCol, textCol).
    *
    * Cost contract: the whole funnel (report included) runs in exactly TWO
    * jobs, and the LSH near-dup pass executes ONCE. Round-2 shape ran five
    * `count()` actions, each re-executing its upstream lineage — at 100 TB
    * the report quintupled the pipeline. Now: the input→quality→lang chain
    * carries `observe()` metrics (collected for free by whichever action
    * evaluates the chain), the exact-dedup survivor set is cached — job 1
    * materializes it and yields the first four funnel numbers — and job 2
    * counts the LSH survivors over the cache. The returned `kept` plan also
    * reads the cache, so the caller's action re-runs only the anti-join,
    * not the upstream funnel; call `unpersistFunnelCache()` (or let LRU
    * eviction handle it) once done. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): (DataFrame, Report) = {
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
    val losers = pairs.select(col("id_b").as("doc_id")).distinct()
    val kept = exact.join(losers, Seq("doc_id"), "left_anti")
    val keptN = kept.count() // job 2: the LSH pass (its only execution)

    val m = obs.get
    val report = Report(
      input = m("n_input").asInstanceOf[Long],
      afterQuality = m("n_quality").asInstanceOf[Long],
      afterLang = m("n_lang").asInstanceOf[Long],
      afterExact = afterExact,
      kept = keptN)
    // release the PREVIOUS call's cache before taking over the slot —
    // repeated curate() calls must not pin one survivor set per corpus
    unpersistFunnelCache()
    lastFunnelCache = exact
    (kept, report)
  }

  /** The cached exact-dedup survivor set of the most recent [[curate]] —
    * kept so the caller's action on the returned `kept` is cheap; release
    * when done. */
  @volatile private var lastFunnelCache: DataFrame = null
  def unpersistFunnelCache(): Unit = {
    val c = lastFunnelCache
    if (c != null) { c.unpersist(false); lastFunnelCache = null }
  }
}
