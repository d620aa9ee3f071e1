package graft.ops

import graft.SparkSpec
import graft.functions.{TextHashes, VectorMath}
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs away fast"),
    (2L, "quick brown fox jumps over the lazy dog and runs away fast"), // near-dup of 1
    (3L, "der hund und die katze und das pferd ist ein tier"),
    (4L, "completely different content about spark query engines here"),
    (5L, "the quick brown fox jumps over the lazy dog and runs away fast") // exact dup of 1
  ).toDF("doc_id", "text")

  test("exactDedup keeps min id per text") {
    val out = TextOps.exactDedup(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L, 3L, 4L))
  }

  test("minhash near-dup finds the near pair, not the unrelated one") {
    val pairs = TextOps.nearDupPairs(docs, "doc_id", "text", threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((1L, 5L)))
    assert(pairs.contains((1L, 5L)), "exact dup must be jaccard 1.0")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "doc 4 is unrelated")
  }

  test("minhash signature approximates true jaccard (property)") {
    val a = "the quick brown fox jumps over the lazy dog and runs away fast"
    val b = "quick brown fox jumps over the lazy dog and runs away fast"
    val sigA = TextHashes.minHashSig(a, 5, 256, 42L).toLongArray()
    val sigB = TextHashes.minHashSig(b, 5, 256, 42L).toLongArray()
    val est = sigA.zip(sigB).count { case (x, y) => x == y }.toDouble / 256
    // true char-5-gram jaccard
    val shA = (0 to a.length - 5).map(i => a.substring(i, i + 5)).toSet
    val shB = (0 to b.length - 5).map(i => b.substring(i, i + 5)).toSet
    val truth = shA.intersect(shB).size.toDouble / shA.union(shB).size
    assert(math.abs(est - truth) < 0.15, s"est=$est truth=$truth")
  }

  test("simhash: identical → distance 0; near-dup small; unrelated large") {
    val h1 = TextHashes.simHash64(docs.filter($"doc_id" === 1).head.getString(1), 42L)
    val h5 = TextHashes.simHash64(docs.filter($"doc_id" === 5).head.getString(1), 42L)
    val h2 = TextHashes.simHash64(docs.filter($"doc_id" === 2).head.getString(1), 42L)
    val h4 = TextHashes.simHash64(docs.filter($"doc_id" === 4).head.getString(1), 42L)
    assert(TextHashes.hamming64(h1, h5) == 0)
    assert(TextHashes.hamming64(h1, h2) < TextHashes.hamming64(h1, h4))
  }

  test("simhashNearDups pipeline finds exact dup pair") {
    val pairs = TextOps.simhashNearDups(docs, "doc_id", "text", maxDist = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 5L)))
  }

  test("simhashNearDups recall is EXACT at any maxDist (pigeonhole property)") {
    // 120 pseudo-random texts; brute-force hamming pairs are the truth
    val rnd = new scala.util.Random(11)
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val rows = (0L until 120L).map { i =>
      (i, Seq.fill(6 + rnd.nextInt(6))(words(rnd.nextInt(words.size))).mkString(" "))
    }
    val df = rows.toDF("doc_id", "text")
    for (maxDist <- Seq(2, 4, 7)) {
      val truth = (for {
        (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
        d = TextHashes.hamming64(TextHashes.simHash64(ta, 42L), TextHashes.simHash64(tb, 42L))
        if d <= maxDist
      } yield (ia, ib)).toSet
      val got = TextOps.simhashNearDups(df, "doc_id", "text", maxDist = maxDist)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == truth, s"maxDist=$maxDist: got ${got.size}, truth ${truth.size}")
    }
  }

  test("LSH mega-bucket guard: planted giant duplicate cluster stays bounded") {
    // 5000 identical docs would otherwise create ~12.5M candidate pairs
    val giant = spark.range(1000, 6000)
      .select($"id".as("doc_id"), lit("identical giant cluster payload text").as("text"))
    val planted = docs.unionByName(giant)
    val t0 = System.nanoTime()
    val pairs = TextOps.nearDupPairs(planted, "doc_id", "text",
        threshold = 0.6, maxBucketSize = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sec = (System.nanoTime() - t0) / 1e9
    assert(pairs.contains((1L, 5L)), "small-bucket pairs still found")
    assert(!pairs.exists(p => p._1 >= 1000L && p._2 >= 1000L),
      "giant cluster skipped (exactDedup territory)")
    assert(sec < 60, s"mega-bucket guard must bound runtime, took $sec s")
  }

  test("curation pipeline: funnel filters compose; near-dups keep min id") {
    val extra = Seq(
      (10L, "x"), // fails quality (too short)
      (11L, "der hund und die katze und das pferd ist ein tier wirklich"), // non-en
      (12L, "a red panda sleeps in the tall tree and dreams of warm snow")) // clean keeper
    val input = docs.unionByName(extra.toDF("doc_id", "text"))
    val (kept, report) = CurationPipeline.curate(input, "doc_id", "text",
      CurationPipeline.Config(langs = Set("en"), jaccardThreshold = 0.6))
    val ids = kept.select("doc_id").as[Long].collect().toSet
    assert(report.input == 8 && report.kept == ids.size)
    assert(!ids.contains(10L), "quality gate (length)")
    assert(!ids.contains(4L), "quality gate (no stopword hits)")
    assert(!ids.contains(3L) && !ids.contains(11L), "language gate")
    assert(!ids.contains(5L), "exact dup of 1 dropped")
    assert(ids.contains(1L) && !ids.contains(2L), "near-dup cluster keeps min id")
    assert(ids.contains(12L), "unrelated clean doc kept")
  }

  test("rolling fingerprint: equal for dups, stable under prefix-append") {
    val fp1 = TextHashes.rollingFingerprint("abcdefghijklmnopqrstuvwxyz 0123", 8)
    val fp2 = TextHashes.rollingFingerprint("PREFIX abcdefghijklmnopqrstuvwxyz 0123", 8)
    // min-window fingerprint usually survives a prefix append (winnowing property)
    // — deterministic given fixed inputs; pin the behavior:
    assert(fp1 == TextHashes.rollingFingerprint("abcdefghijklmnopqrstuvwxyz 0123", 8))
    assert(TextHashes.rollingFingerprint("", 8) == 0L)
    val colVals = docs.select(rolling_fingerprint($"text", 16).as("fp"))
      .as[Long].collect()
    assert(colVals(0) == colVals(4), "exact dup docs share fingerprint")
  }

  test("tokenCount/langId columns match scala reference") {
    val got = docs.select($"doc_id", TextOps.tokenCount($"text").as("n"),
      TextOps.langId($"text").as("lang")).as[(Long, Int, String)].collect()
      .map { case (id, n, lang) => id -> ((n, lang)) }.toMap
    val exp = docs.as[(Long, String)].collect().map { case (id, t) =>
      val toks = t.split("\\s+").filter(_.nonEmpty)
      val counts = TextOps.langStopwords.map { case (l, sw) => l -> toks.count(sw.contains) }
      val best = counts.foldLeft(("und", 0)) { case ((bl, bc), (l, c)) =>
        if (c > bc) (l, c) else (bl, bc) }
      id -> ((toks.length, if (best._2 > 0) best._1 else "und"))
    }.toMap
    got.foreach { case (id, (n, lang)) =>
      assert((n, lang) == exp(id), s"doc $id") }
    assert(got(3L)._2 == "de")
    assert(got(1L)._2 == "en")
  }
}

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = {
    val rnd = new scala.util.Random(7)
    (0L until 200L).map { i =>
      val v = Array.fill(16)(rnd.nextGaussian().toFloat)
      (i, v)
    }.toDF("vec_id", "embedding")
  }

  test("cosineTopK matches brute-force scala oracle") {
    val data = vecs.as[(Long, Array[Float])].collect()
    val q = data.head._2.map(_.toDouble)
    def cos(v: Array[Float]): Double = {
      val dot = v.zip(q).map { case (a, b) => a * b }.sum
      val na = math.sqrt(v.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(q.map(x => x * x).sum)
      dot / (na * nb)
    }
    val expect = data.map { case (id, v) => (id, cos(v)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSeq
    val got = VectorOps.cosineTopK(vecs, "vec_id", "embedding", q, 10)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(got == expect)
  }

  test("LSH ANN: query's own vector is rank 1; results ⊆ exact ordering") {
    val data = vecs.as[(Long, Array[Float])].collect()
    val q = data.head._2.map(_.toDouble)
    val got = VectorOps.cosineTopKLsh(vecs, "vec_id", "embedding", q, 5, bits = 8)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(got.nonEmpty)
    assert(got.head == 0L, "query vector itself must be top result")
  }

  test("embeddingNearDups finds planted duplicate vector") {
    val planted = vecs.unionByName(
      vecs.filter($"vec_id" === 3).select(lit(9999L).as("vec_id"), $"embedding"))
    val pairs = VectorOps.embeddingNearDups(planted, "vec_id", "embedding",
      threshold = 0.999, bits = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((3L, 9999L)))
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("synthetic media + feature extraction plumbing (batch shape, nulls)") {
    val ids = spark.range(100).toDF("id")
    val media = Multimodal.syntheticMedia(ids, "id")
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "bytes", "width", "height", "sample_rate", "duration_ms"))
    val feats = Multimodal.extractFeatures(media, parallelism = 4)
    assert(feats.count() == 100)
    val row = feats.filter($"feature".isNotNull).head()
    assert(row.getSeq[Float](2).size == Multimodal.featureDim)
    // determinism across parallelism
    val a = Multimodal.extractFeatures(media, 1).orderBy("media_id").collect().map(_.toString)
    val b = Multimodal.extractFeatures(media, 7).orderBy("media_id").collect().map(_.toString)
    assert(a.toSeq == b.toSeq)
    // null bytes pass through as null feature
    val withNull = media.withColumn("bytes",
      when($"media_id" === 0, lit(null).cast("binary")).otherwise($"bytes"))
    val f0 = Multimodal.extractFeatures(withNull, 2).filter($"media_id" === 0).head()
    assert(f0.isNullAt(2))
  }

  test("resize + frame sampling stubs keep schema and explode correctly") {
    val media = Multimodal.syntheticMedia(spark.range(50).toDF("id"), "id")
    val resized = Multimodal.resize(media, 256)
    val img = resized.filter($"kind" === "image")
    assert(img.filter($"width" > 256 || $"height" > 256).count() == 0)
    val frames = Multimodal.sampleFrames(media, 60000)
    val vids = media.filter($"kind" === "video").count()
    assert(frames.count() >= vids, "at least one frame per video")
    assert(frames.schema.fieldNames.toSeq == Seq("media_id", "frame_ts", "bytes"))
  }
}
