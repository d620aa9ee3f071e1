package graft.ops

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Training-data curation operators over a `documents(doc_id, text, ...)`
 * table — the large-scale text-pipeline extension of the engine
 * (deduplication, quality scoring, language id, fingerprinting).
 *
 * Scale posture: every operator below is a narrow map or a single
 * well-keyed shuffle. Near-dup detection never does an O(n²) cross join —
 * candidates come from LSH band buckets (MinHash) or simhash chunks
 * (bit-sampling), then exact verification runs only within buckets.
 */
object TextOps {

  // ---- text analysis (SQL-mirrorable: integer/boolean outputs only, so
  // the DuckDB oracle compares exactly — no float-rounding hazards) ------

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => t =!= ""))

  /** A BPE-ish subword proxy: count of character 4-grams per token summed,
    * i.e. ceil(len/4) per token — integer arithmetic only. */
  def bpeishTokenCount(text: Column): Column =
    aggregate(
      filter(split(text, "\\s+"), t => t =!= ""),
      lit(0),
      (acc, t) => acc + ceil(length(t).cast("double") / 4.0).cast("int"))

  /** Stopword hit count for a language's stopword list (exact token
    * matches). */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(filter(split(text, "\\s+"), t => t.isin(stopwords.map(lit): _*)))

  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "et", "est", "un", "une"),
    "es" -> Seq("el", "la", "y", "es", "un", "una"))

  /** N-gram-heuristic language id: argmax of per-language stopword hits,
    * ties broken by list order, "und" (undetermined) when all zero. */
  def langId(text: Column): Column = {
    val toks = filter(split(text, "\\s+"), t => t =!= "")
    val counts: Seq[(String, Column)] = langStopwords.map { case (lang, sw) =>
      lang -> size(filter(toks, t => t.isin(sw.map(lit): _*)))
    }
    val init: (Column, Column) = (lit(counts.head._1), counts.head._2)
    val best = counts.tail.foldLeft(init) { case ((bl, bc), (lang, c)) =>
      (when(c > bc, lit(lang)).otherwise(bl), when(c > bc, c).otherwise(bc))
    }
    when(best._2 > 0, best._1).otherwise(lit("und"))
  }

  /** Quality signals, all integers/booleans: char count, token count,
    * max token length, stopword hits; `quality_ok` = document passes the
    * cheap heuristics used in web-scale corpus filtering. */
  def qualitySignals(df: DataFrame, text: Column): DataFrame = {
    val toks = tokenCount(text)
    df.withColumn("n_chars_m", length(text))
      .withColumn("n_tokens", toks)
      .withColumn("n_stopwords", stopwordCount(text, langStopwords.flatMap(_._2)))
      .withColumn("quality_ok",
        length(text).between(20, 100000) &&
          toks.between(5, 20000) &&
          stopwordCount(text, langStopwords.flatMap(_._2)) >= 1)
  }

  // ---- deduplication ---------------------------------------------------

  /** Exact dedup: keep the smallest id per identical text. One shuffle on
    * a 64-bit hash of the text (not the full text — narrow shuffle keys at
    * 100 TB), with a residual equality check inside each hash group. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(xxhash64(col(textCol)).as("_h"), col(textCol))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col(textCol))

  /** MinHash-LSH near-dup candidate pairs: signature → `bands` bands of
    * `rows` hashes → explode → self-join per (band, bucket) → distinct
    * pairs. Returns (id_a, id_b) with id_a < id_b. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, bands: Int = 16, rowsPerBand: Int = 8,
      seed: Long = 42L): DataFrame = {
    val n = bands * rowsPerBand
    val sig = df.select(col(idCol).as("id"),
      minhash_sig(col(textCol), shingleK, n, seed).as("sig"))
    val banded = sig.select(col("id"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .toDF("id", "band", "bucket")
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Near-dup pairs with exact n-gram Jaccard verification of the LSH
    * candidates (shingle-hash set intersection / union). */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, shingleK: Int = 5,
      bands: Int = 16, rowsPerBand: Int = 8, seed: Long = 42L): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, shingleK, bands, rowsPerBand, seed)
    val sh = df.select(col(idCol).as("id"),
      shingle_hashes(col(textCol), shingleK, seed).as("sh"))
    cands
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-dup candidates: 64-bit simhash split into 4×16-bit
    * chunks; docs sharing any chunk are candidates (catches hamming ≤ 3
    * guaranteed); verified by full hamming distance ≤ maxDist. */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, seed: Long = 42L): DataFrame = {
    val sh = df.select(col(idCol).as("id"), simhash64(col(textCol), seed).as("sh"))
    val chunkCols = (0 until 4).map(i =>
      shiftrightunsigned(col("sh"), i * 16).bitwiseAND(lit(0xffffL)))
    val chunked = sh.select(col("id"), col("sh"), posexplode(array(chunkCols: _*)))
      .toDF("id", "sh", "chunk", "chunkVal")
    val a = chunked.as("a"); val b = chunked.as("b")
    a.join(b, col("a.chunk") === col("b.chunk") &&
        col("a.chunkVal") === col("b.chunkVal") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .distinct()
      .withColumn("dist", graft.functions.TextFunctions.hamming64(col("sh_a"), col("sh_b")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }
}
