package graft

/**
 * DuckDB oracle-SQL generators for the sketch/hash queries whose semantics
 * are not expressible with off-the-shelf SQL functions. The engine's hash
 * primitives ([[graft.functions.TextHashes]]) are deliberately defined from
 * arithmetic DuckDB can reproduce exactly — splitmix64 finalization and
 * FNV-1a char folds — so every operator, including simhash/fingerprint/
 * sign-LSH, gets a bit-exact independent oracle instead of a rows-only
 * check. All 64-bit arithmetic runs on UBIGINT with wrapping emulated via
 * a 32×32 split multiply (HUGEINT intermediates), validated bit-for-bit
 * against the Scala implementations on the sf0.01 test tables.
 */
object OracleSql {

  private val M32 = "4294967295"
  private val MOD64 = "18446744073709551616"

  /** splitmix64 seed init value — mix64(seed), computed Scala-side so the
    * SQL starts from a plain literal. */
  private def h0(seed: Long): BigInt =
    BigInt(graft.functions.TextHashes.mix64(seed)) & ((BigInt(1) << 64) - 1)

  /** (a * c) mod 2^64 over UBIGINT expressions. */
  private def wmul(a: String, c: String): String =
    s"CAST((CAST((($a) & $M32) * (($c) & $M32) AS HUGEINT) + " +
      s"CAST((((((($a) >> 32) * (($c) & $M32)) & $M32) + " +
      s"(((($a) & $M32) * (($c) >> 32)) & $M32)) & $M32) AS HUGEINT) * 4294967296) " +
      s"% $MOD64 AS UBIGINT)"

  /** Staged splitmix64 of column `col` — returned as (selectStages, outCol);
    * staging through SELECT layers avoids exponential textual blowup of the
    * three chained multiply-xor rounds. */
  private def mix64Staged(col: String, p: String): (Seq[(String, String)], String) = {
    val s0 = s"CAST((CAST($col AS HUGEINT) + 11400714819323198485) % $MOD64 AS UBIGINT)"
    (Seq(
      s"${p}_m0" -> s0,
      s"${p}_m1" -> wmul(s"xor(${p}_m0, ${p}_m0 >> 30)", "13787848793156543929::UBIGINT"),
      s"${p}_m2" -> wmul(s"xor(${p}_m1, ${p}_m1 >> 27)", "10723151780598845931::UBIGINT"),
      s"${p}_out" -> s"xor(${p}_m2, ${p}_m2 >> 31)"), s"${p}_out")
  }

  private def staged(baseSql: String, stages: Seq[(String, String)]): String =
    stages.foldLeft(baseSql) { case (sql, (name, expr)) =>
      s"SELECT *, $expr AS $name FROM ($sql)"
    }

  /** Seeded FNV-1a-64 fold over the characters of `strExpr` (ASCII/BMP:
    * DuckDB code points == Java chars for the synthetic corpora). */
  private def fnv1a(strExpr: String, seed: Long): String = {
    val chars = s"[unicode(x) FOR x IN string_split($strExpr, '')]"
    val step = wmul("xor(h, CAST(c AS UBIGINT))", "1099511628211::UBIGINT")
    s"list_reduce(list_prepend(${h0(seed)}::UBIGINT, " +
      s"list_transform($chars, c -> CAST(c AS UBIGINT))), (h, c) -> $step)"
  }

  private def toSigned(x: String): String =
    s"CAST(CAST($x AS HUGEINT) - CASE WHEN $x >= 9223372036854775808::UBIGINT " +
      s"THEN CAST($MOD64 AS HUGEINT) ELSE 0 END AS BIGINT)"

  /** (doc_id, sh UBIGINT) — simhash64 per doc: whitespace tokens, token
    * hash = mix64(fnv1a(token)), per-bit vote sums, >0 → bit set; token-less
    * docs get 0; NULL text rows are dropped. */
  private def simhashTable(docsSql: String, seed: Long): String = {
    val toks = s"SELECT doc_id, u.t AS tok FROM ($docsSql) d, " +
      raw"UNNEST(list_filter(string_split_regex(d.text, '[ \t\n\r]+'), x -> x <> '')) AS u(t) " +
      "WHERE d.text IS NOT NULL"
    val th = s"SELECT doc_id, ${fnv1a("tok", seed)} AS f FROM ($toks)"
    val (stages, last) = mix64Staged("f", "t")
    val thFinal = s"SELECT doc_id, $last AS h FROM (${staged(th, stages)})"
    val votes = s"SELECT doc_id, b.b AS b, SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v " +
      s"FROM ($thFinal), (SELECT unnest(range(0, 64)) AS b) b GROUP BY doc_id, b.b"
    val shv = s"SELECT doc_id, CAST(COALESCE(SUM(CASE WHEN v > 0 THEN " +
      s"CAST(1::UBIGINT << CAST(b AS INT) AS HUGEINT) ELSE 0 END), 0) % $MOD64 AS UBIGINT) AS sh " +
      s"FROM ($votes) GROUP BY doc_id"
    s"SELECT d.doc_id AS doc_id, COALESCE(s.sh, 0::UBIGINT) AS sh " +
      s"FROM ($docsSql) d LEFT JOIN ($shv) s ON d.doc_id = s.doc_id " +
      s"WHERE d.text IS NOT NULL"
  }

  /** The perturbed-copies near-dup input (mirrors Queries.withPerturbedCopies). */
  private def perturbed(src: String): String =
    s"SELECT doc_id, text FROM ($src) " +
      s"UNION ALL SELECT doc_id + 1000000 AS doc_id, substring(text, 11) AS text FROM ($src)"

  private val docsSrc = "SELECT doc_id, text FROM documents"

  /** q_doc_neardup_simhash: ALL pairs with hamming(simhash) ≤ maxDist over
    * docs+perturbed copies — exact, because the Spark side's maxDist+1
    * chunking guarantees full recall (pigeonhole). */
  def neardupSimhash(maxDist: Int, seed: Long = 42L): String = {
    val sh = simhashTable(perturbed(docsSrc), seed)
    s"SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
      s"CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS dist " +
      s"FROM ($sh) a, ($sh) b " +
      s"WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sh, b.sh)) <= $maxDist"
  }

  /** q_doc_neardup_minhash: ALL pairs with exact char-shingle Jaccard ≥
    * threshold (inverted-index brute force) — the Spark side uses LSH
    * params with ~certain recall at the threshold (64 bands × 3 rows:
    * miss probability ≈ 2e-12 per true pair) and then exact verification,
    * so the sets coincide. */
  def neardupMinhash(threshold: Double, shingleK: Int = 5): String =
    jaccardPairs(perturbed(docsSrc), threshold, shingleK)

  /** ALL (id_a, id_b, jaccard) pairs of `src` with exact char-shingle
    * Jaccard ≥ threshold (inverted-index brute force). */
  def jaccardPairs(src: String, threshold: Double, shingleK: Int = 5): String = {
    val shingles =
      s"SELECT doc_id, list_distinct([substring(text, i, LEAST($shingleK, GREATEST(1, length(text)))) " +
        s"FOR i IN range(1, GREATEST(0, length(text) - LEAST($shingleK, GREATEST(1, length(text)))) + 2)]) AS sh " +
        s"FROM ($src) WHERE text IS NOT NULL"
    val ss = s"SELECT doc_id, sh, len(sh) AS ns FROM ($shingles)"
    s"SELECT id_a, id_b, jaccard FROM (" +
      s" SELECT e1.doc_id AS id_a, e2.doc_id AS id_b," +
      s" CAST(COUNT(*) AS DOUBLE) / (any_value(e1.ns) + any_value(e2.ns) - COUNT(*)) AS jaccard" +
      s" FROM (SELECT doc_id, ns, unnest(sh) AS g FROM ($ss)) e1" +
      s" JOIN (SELECT doc_id, ns, unnest(sh) AS g FROM ($ss)) e2" +
      s"   ON e1.g = e2.g AND e1.doc_id < e2.doc_id" +
      s" GROUP BY e1.doc_id, e2.doc_id" +
      s") WHERE jaccard >= $threshold"
  }

  /** (doc_id, fp BIGINT): min-over-windows rolling fingerprint (poly hash
    * base 1000003 mod 2^64 over char k-windows, splitmix64, SIGNED min). */
  private def rollingFpTable(src: String, k: Int): String = {
    val wins = s"SELECT doc_id, substring(text, p.p, LEAST($k, length(text))) AS w " +
      s"FROM ($src) d, (SELECT unnest(range(1, GREATEST(0, length(d.text) - LEAST($k, length(d.text))) + 2)) AS p) p " +
      s"WHERE d.text IS NOT NULL AND length(d.text) > 0"
    val chars = "list_transform([unicode(x) FOR x IN string_split(w, '')], c -> CAST(c AS UBIGINT))"
    val polyStep = s"CAST((CAST(${wmul("h", "1000003::UBIGINT")} AS HUGEINT) + c) % $MOD64 AS UBIGINT)"
    val wh = s"SELECT doc_id, list_reduce(list_prepend(0::UBIGINT, $chars), (h, c) -> $polyStep) AS f FROM ($wins)"
    val (stages, last) = mix64Staged("f", "t")
    val mins = s"SELECT doc_id, xor(MIN(xor($last, 9223372036854775808::UBIGINT)), " +
      s"9223372036854775808::UBIGINT) AS mh FROM (${staged(wh, stages)}) GROUP BY doc_id"
    s"SELECT d.doc_id, CASE WHEN d.text IS NULL THEN NULL " +
      s"WHEN length(d.text) = 0 THEN 0 ELSE ${toSigned("m.mh")} END AS fp " +
      s"FROM ($src) d LEFT JOIN ($mins) m ON d.doc_id = m.doc_id"
  }

  /** q_doc_fingerprint: (doc_id, fp, simhash) as signed BIGINTs. */
  def fingerprint(k: Int = 16, seed: Long = 42L): String = {
    val fp = rollingFpTable(docsSrc, k)
    val sh = simhashTable(docsSrc, seed)
    s"SELECT f.doc_id, f.fp, CASE WHEN d.text IS NULL THEN NULL ELSE ${toSigned("s.sh")} END AS simhash " +
      s"FROM ($fp) f JOIN ($docsSrc) d ON f.doc_id = d.doc_id " +
      s"LEFT JOIN ($sh) s ON f.doc_id = s.doc_id"
  }

  /** (b, planes LIST<DOUBLE>) — the sign-LSH hyperplanes, j-ordered. */
  private def planesSql(bits: Int, dim: Int, seed: Long): String = {
    val base = s"SELECT b.b AS b, j.j AS j, " +
      s"CAST((($seed::UBIGINT + CAST(b.b * 131071 + j.j AS UBIGINT))) AS UBIGINT) AS f " +
      s"FROM (SELECT unnest(range(0, $bits)) AS b) b, (SELECT unnest(range(0, $dim)) AS j) j"
    val (stages, last) = mix64Staged("f", "p")
    val vals = s"SELECT b, j, CAST(${toSigned(last)} AS DOUBLE) / 9223372036854775807.0 AS pl " +
      s"FROM (${staged(base, stages)})"
    s"SELECT b, list(pl ORDER BY j) AS planes FROM ($vals) GROUP BY b"
  }

  /** (vec_id, bucket UBIGINT): j-ordered left-fold dot products reproduce
    * the Scala accumulation order bit-for-bit (sign decisions at dot≈0). */
  private def lshBucketTable(embSrc: String, bits: Int, dim: Int, seed: Long): String = {
    val dot = "list_reduce(list_prepend(0.0, list_transform(range(1, len(v) + 1), " +
      "i -> v[i] * planes[i])), (a, x) -> a + x)"
    val dots = s"SELECT e.vec_id, p.b, $dot AS dot " +
      s"FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM ($embSrc)) e, " +
      s"(${planesSql(bits, dim, seed)}) p"
    s"SELECT vec_id, CAST(COALESCE(SUM(CASE WHEN dot >= 0 THEN " +
      s"CAST(1::UBIGINT << CAST(b AS INT) AS HUGEINT) ELSE 0 END), 0) % $MOD64 AS UBIGINT) AS bucket " +
      s"FROM ($dots) GROUP BY vec_id"
  }

  private val embSrc = "SELECT vec_id, embedding FROM embeddings"

  /** q_emb_ann_lsh: bucket-hamming ≤ maxHamming candidates of the
    * min-vec_id query vector, exact-cosine top-k with rank. */
  def annLsh(bits: Int = 8, dim: Int = 64, k: Int = 10, seed: Long = 42L,
      maxHamming: Int = 1): String = {
    val buckets = lshBucketTable(embSrc, bits, dim, seed)
    val qvec = s"SELECT CAST(embedding AS DOUBLE[]) AS q FROM ($embSrc) ORDER BY vec_id LIMIT 1"
    def fold(body: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, len(v) + 1), i -> $body)), (a, x) -> a + x)"
    val cos = s"CASE WHEN ${fold("v[i] * v[i]")} = 0.0 OR ${fold("q.q[i] * q.q[i]")} = 0.0 THEN 0.0 " +
      s"ELSE ${fold("v[i] * q.q[i]")} / (sqrt(${fold("v[i] * v[i]")}) * sqrt(${fold("q.q[i] * q.q[i]")})) END"
    val scored = s"SELECT e.vec_id, $cos AS cos " +
      s"FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM ($embSrc)) e " +
      s"JOIN ($buckets) b ON e.vec_id = b.vec_id, ($qvec) q, " +
      s"(SELECT bucket AS qb FROM ($buckets) " +
      s" WHERE vec_id = (SELECT MIN(vec_id) FROM ($embSrc))) qb " +
      s"WHERE bit_count(xor(b.bucket, qb.qb)) <= $maxHamming"
    s"SELECT vec_id, CAST(rank AS INT) AS rank FROM (" +
      s"SELECT vec_id, row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rank " +
      s"FROM ($scored)) WHERE rank <= $k"
  }

  /** q_emb_ann_ivf: the IVF index emulated end-to-end — SEEDS = the
    * `nlist` smallest-id vectors (rank-1 as cell id), refined by `iters`
    * Lloyd passes over the `sampleN` smallest-id vectors (each sample to
    * its max-cosine centroid, ties → lowest cell; per-dimension mean
    * accumulated in vec_id order — the exact sequential-double chain of
    * VectorOps.ivfCentroidsRefined; empty cells keep their PREVIOUS
    * centroid). Every vector is then assigned to its max-cosine refined
    * centroid, the min-vec_id query probes its `nprobe` nearest cells,
    * candidates ranked by exact cosine. All cosines are j-ordered left
    * folds (bit-identical to the engine's sequential double accumulation),
    * so every refinement iteration, assignment and ranking agree exactly. */
  def annIvf(nlist: Int = 16, nprobe: Int = 4, k: Int = 10,
      sampleN: Int = 256, iters: Int = 1): String = {
    def fold(lenExpr: String, body: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, $lenExpr + 1), i -> $body)), (x, y) -> x + y)"
    def cosOf(a: String, b: String) = {
      // ALL THREE accumulators run to min(len(a), len(b)) — exactly
      // VectorMath.cosineToQuery/cosinePair's loop bound, so the oracle is
      // dimension-safe (not coincidentally equal on same-dim fixtures)
      val n = s"least(len($a), len($b))"
      val na = fold(n, s"$a[i] * $a[i]"); val nb = fold(n, s"$b[i] * $b[i]")
      val dot = fold(n, s"$a[i] * $b[i]")
      s"CASE WHEN $na = 0.0 OR $nb = 0.0 THEN 0.0 ELSE $dot / (sqrt($na) * sqrt($nb)) END"
    }
    val seeds = s"SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS c, " +
      s"CAST(embedding AS DOUBLE[]) AS cv " +
      s"FROM (SELECT vec_id, embedding FROM ($embSrc) ORDER BY vec_id LIMIT $nlist)"
    // `iters` Lloyd passes over the id-ordered sample: assign → per-cell
    // ordered per-dimension mean (left fold over list(v ORDER BY vec_id),
    // the same addition chain as the Scala refinement); empty cells keep
    // the previous iteration's centroid. Each pass nests the previous
    // centroid SQL — textual growth is geometric, fine for small `iters`.
    val sample = s"SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v " +
      s"FROM ($embSrc) ORDER BY vec_id LIMIT $sampleN"
    var cents = seeds
    (1 to math.max(1, iters)).foreach { _ =>
      val sAssigned = s"SELECT vec_id, v, cell FROM (SELECT sm.vec_id, sm.v, ct.c AS cell, " +
        s"row_number() OVER (PARTITION BY sm.vec_id ORDER BY ${cosOf("sm.v", "ct.cv")} DESC, ct.c ASC) AS rn " +
        s"FROM ($sample) sm, ($cents) ct) WHERE rn = 1"
      val refined = s"SELECT cell, [list_reduce(list_prepend(0.0, " +
        s"list_transform(vs, x -> COALESCE(x[i], 0.0))), (a, b) -> a + b) / n " +
        s"FOR i IN range(1, len(vs[1]) + 1)] AS cv " +
        s"FROM (SELECT cell, list(v ORDER BY vec_id) AS vs, COUNT(*) AS n " +
        s"FROM ($sAssigned) GROUP BY cell)"
      cents = s"SELECT s.c, COALESCE(r.cv, s.cv) AS cv " +
        s"FROM ($cents) s LEFT JOIN ($refined) r ON s.c = r.cell"
    }
    val vecs = s"SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM ($embSrc)"
    val qv = s"SELECT CAST(embedding AS DOUBLE[]) AS qv FROM ($embSrc) ORDER BY vec_id LIMIT 1"
    val assigned = s"SELECT vec_id, cell FROM (SELECT e.vec_id, ct.c AS cell, " +
      s"row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cosOf("e.v", "ct.cv")} DESC, ct.c ASC) AS rn " +
      s"FROM ($vecs) e, ($cents) ct) WHERE rn = 1"
    val probes = s"SELECT c FROM (SELECT ct.c, " +
      s"row_number() OVER (ORDER BY ${cosOf("q.qv", "ct.cv")} DESC, ct.c ASC) AS rn " +
      s"FROM ($qv) q, ($cents) ct) WHERE rn <= $nprobe"
    val scored = s"SELECT e.vec_id, ${cosOf("e.v", "q.qv")} AS cos FROM ($vecs) e " +
      s"JOIN ($assigned) a ON e.vec_id = a.vec_id JOIN ($probes) p ON a.cell = p.c, ($qv) q"
    s"SELECT vec_id, CAST(rank AS INT) AS rank FROM (" +
      s"SELECT vec_id, row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rank " +
      s"FROM ($scored)) WHERE rank <= $k"
  }

  /** q_emb_neardup: pair set (id_a, id_b) with cosine ≥ threshold over
    * embeddings + PERTURBED copies (id + 10^6; component j scaled by
    * 1+((j%7)-3)·0.125, float-rounded — mirrors
    * Queries.withPerturbedEmbeddings bit-for-bit: exact binary constants,
    * FLOAT cast = IEEE round-to-nearest both sides). Brute force, so this
    * genuinely tests the detector's multi-band recall on non-identical
    * near-threshold pairs. Near-threshold decisions use the j-ordered
    * left-fold cosine (reproduces the Scala sequential double accumulation
    * bit-for-bit); list_cosine_similarity only PRE-FILTERS at a 1e-3
    * margin — the two agree to ~1e-15, so no pair's membership is decided
    * by the fast path. */
  def embNearDup(threshold: Double): String = {
    val pert = "[CAST(embedding[j+1] * (1.0 + ((j % 7) - 3) * 0.125) AS FLOAT) " +
      "FOR j IN range(0, len(embedding))]"
    val inp = s"SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM ($embSrc) " +
      s"UNION ALL SELECT vec_id + 1000000 AS vec_id, CAST($pert AS DOUBLE[]) AS v FROM ($embSrc)"
    def fold(body: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, len(a.v) + 1), i -> $body)), (x, y) -> x + y)"
    val cos = s"CASE WHEN ${fold("a.v[i] * a.v[i]")} = 0.0 OR ${fold("b.v[i] * b.v[i]")} = 0.0 THEN 0.0 " +
      s"ELSE ${fold("a.v[i] * b.v[i]")} / (sqrt(${fold("a.v[i] * a.v[i]")}) * sqrt(${fold("b.v[i] * b.v[i]")})) END"
    s"SELECT id_a, id_b FROM (" +
      s"SELECT a.vec_id AS id_a, b.vec_id AS id_b, $cos AS cos FROM ($inp) a, ($inp) b " +
      s"WHERE a.vec_id < b.vec_id AND list_cosine_similarity(a.v, b.v) >= ${threshold - 0.001}" +
      s") WHERE cos >= $threshold"
  }

  /** q_media_features: kind + feature length + integer feature checksum,
    * all derivable from sha256 of the deterministic payload. */
  def mediaFeatures(featureDim: Int = 16): String = {
    val hexv = "sha256('blob-' || CAST(doc_id AS VARCHAR))"
    val byteAt = (i: Int) =>
      s"(strpos('0123456789abcdef', substring(h, ${2 * (i % 32) + 1}, 1)) - 1) * 16 + " +
        s"(strpos('0123456789abcdef', substring(h, ${2 * (i % 32) + 2}, 1)) - 1)"
    val checksum = (0 until featureDim)
      .map(i => s"((${byteAt(i)}) * 31 + ${i * 7}) % 255").mkString(" + ")
    s"SELECT media_id, kind, $featureDim AS n_feature, CAST($checksum AS INT) AS feature_checksum " +
      s"FROM (SELECT doc_id AS media_id, " +
      s"CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind, " +
      s"$hexv AS h, doc_id FROM documents)"
  }
}
