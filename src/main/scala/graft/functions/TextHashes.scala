package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/**
 * Static one-pass implementations of the document-pipeline hash primitives
 * (deduplication / fingerprinting for large-scale training-data curation).
 * Called from both the interpreted eval and the generated Java of the
 * Catalyst expressions in [[TextExpressions]] — one static call per row
 * keeps the work inside whole-stage codegen and avoids per-row allocation
 * of higher-order-function closures.
 *
 * All hashing is seeded and self-contained (splitmix64 + FNV-style
 * accumulation) so results are identical at any parallelism.
 */
object TextHashes {

  /** splitmix64 — standard public-domain mix. */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** 64-bit hash of a char range [from, until) of s: seeded FNV-1a
    * (seed enters via a splitmix of the seed as the initial state; one
    * wrapping multiply per char). Chosen over a per-char splitmix chain
    * deliberately: identical dispersion for equality/sketch use, and
    * cheap enough to reproduce bit-for-bit in the DuckDB oracles
    * ([[graft.OracleSql]]) — every sketch operator gets an exact
    * independent oracle instead of a rows-only check. */
  def hashRange(s: String, from: Int, until: Int, seed: Long): Long = {
    var h = mix64(seed)
    var i = from
    while (i < until) { h = (h ^ s.charAt(i).toLong) * 0x100000001b3L; i += 1 }
    h
  }

  /** MinHash signature over character k-shingles: for each of `n` hash
    * families, the minimum over all shingles of mix(a_i*h + b_i).
    * Returns long[n]. Documents shorter than k get the signature of the
    * whole string (degenerate single shingle). */
  private val abCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int), (Array[Long], Array[Long])]()

  private def affineParams(seed: Long, n: Int): (Array[Long], Array[Long]) =
    abCache.computeIfAbsent((seed, n), { case (s, m) =>
      val a = Array.tabulate(m)(i => mix64(s + 2L * i + 1L) | 1L) // odd multiplier
      val b = Array.tabulate(m)(i => mix64(s + 2L * i + 2L))
      (a, b)
    })

  def minHashSig(text: String, k: Int, n: Int, seed: Long): ArrayData = {
    val mins = new Array[Long](n)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val len = text.length
    val effK = math.min(k, math.max(1, len))
    val last = math.max(0, len - effK)
    val (as, bs) = affineParams(seed, n)
    var i = 0
    var pos = 0
    while (pos <= last) {
      // min(pos+effK, len) clamps ONLY the empty-string case to the empty
      // shingle [0,0) — matching the oracle's substring('',1,1)='' — and is
      // a no-op for non-empty text (pos+effK ≤ len by construction)
      val h = hashRange(text, pos, math.min(pos + effK, len), seed)
      i = 0
      while (i < n) {
        val v = mix64(as(i) * h + bs(i))
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      pos += 1
    }
    new GenericArrayData(mins)
  }

  /** LSH band buckets in ONE pass: the minhash signature is banded into
    * `bands` groups of `rowsPerBand` values and each band is folded to a
    * single 64-bit bucket id (mixing in the band index so identical values
    * in different bands never collide). Equivalent candidate structure to
    * materializing the full signature and hashing slices, at a fraction of
    * the allocation (no n-long array per row, no HOF slice/transform). */
  def minHashBands(text: String, k: Int, bands: Int, rowsPerBand: Int,
      seed: Long): ArrayData = {
    val n = bands * rowsPerBand
    val mins = new Array[Long](n)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val len = text.length
    val effK = math.min(k, math.max(1, len))
    val last = math.max(0, len - effK)
    val (as, bs) = affineParams(seed, n)
    var pos = 0
    while (pos <= last) {
      // empty-string clamp — see minHashSig
      val h = hashRange(text, pos, math.min(pos + effK, len), seed)
      var i = 0
      while (i < n) {
        val v = mix64(as(i) * h + bs(i))
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      pos += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = mix64(seed ^ (b.toLong * 0x9e3779b97f4a7c15L))
      var r = 0
      while (r < rowsPerBand) {
        acc = mix64(acc ^ mins(b * rowsPerBand + r))
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over whitespace tokens: sum per-bit votes of each
    * token's hash, sign → bit. */
  def simHash64(text: String, seed: Long): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && isSpace(text.charAt(i))) i += 1
      val start = i
      while (i < n && !isSpace(text.charAt(i))) i += 1
      if (i > start) {
        // splitmix finalizer: FNV-1a alone avalanches poorly in the low
        // bits for short tokens, and simhash votes use every bit
        val h = mix64(hashRange(text, start, i, seed))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

  /** Rolling-hash document fingerprint (winnowing-lite): the minimum
    * polynomial rolling hash over all char k-windows — robust to
    * appending/prepending content, cheap single pass. */
  def rollingFingerprint(text: String, k: Int): Long = {
    val n = text.length
    if (n == 0) return 0L
    val effK = math.min(k, n)
    val B = 1000003L
    var pow = 1L // B^(effK-1)
    var i = 1
    while (i < effK) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < effK) { h = h * B + text.charAt(i).toLong; i += 1 }
    var minH = mix64(h)
    i = effK
    while (i < n) {
      h = (h - text.charAt(i - effK).toLong * pow) * B + text.charAt(i).toLong
      val m = mix64(h)
      if (m < minH) minH = m
      i += 1
    }
    minH
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** |a ∩ b| for two SORTED long arrays (as produced by [[shingleHashes]])
    * — single merge scan, no per-row hash-set allocation (the built-in
    * array_intersect builds a hash set per call; on the near-dup verify
    * join that allocation dominates). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  /** Character k-shingle set as sorted distinct hashes — used for exact
    * n-gram Jaccard verification of near-dup candidates. Primitive
    * buffer + sort + in-place dedupe: the former TreeSet[java.lang.Long]
    * boxed every shingle hash and paid a red-black rebalance per insert —
    * on the verify path that allocation ran once per corpus document per
    * join side. Output is identical (sorted distinct). */
  def shingleHashes(text: String, k: Int, seed: Long): ArrayData = {
    val len = text.length
    val effK = math.min(k, math.max(1, len))
    val last = math.max(0, len - effK)
    val buf = new Array[Long](last + 1)
    var pos = 0
    while (pos <= last) {
      // empty-string clamp — see minHashSig
      buf(pos) = hashRange(text, pos, math.min(pos + effK, len), seed)
      pos += 1
    }
    java.util.Arrays.sort(buf)
    var n = 0
    var i = 0
    while (i < buf.length) {
      if (n == 0 || buf(i) != buf(n - 1)) { buf(n) = buf(i); n += 1 }
      i += 1
    }
    val out = if (n == buf.length) buf else java.util.Arrays.copyOf(buf, n)
    new GenericArrayData(out)
  }
}

/** Static vector math for embedding similarity — double-precision
  * sequential accumulation (deterministic, order-fixed). */
object VectorMath {
  /** Cosine similarity of a float-array column value against a fixed
    * query vector. */
  def cosineToQuery(v: ArrayData, q: Array[Double]): Double = {
    val n = math.min(v.numElements(), q.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val a = v.getFloat(i).toDouble
      val b = q(i)
      dot += a * b; na += a * a; nb += b * b
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Hyperplane components are constants per (seed, bits, dim) — computed
    * once and reused across every row (recomputing bits×dim mix64 calls
    * per vector would be a ~10× constant-factor tax on the ANN scan).
    * Flat layout: planes(b*dim + j) = mix64(seed + b*131071 + j) / 2^63. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Double]]()

  private def planesFor(seed: Long, bits: Int, dim: Int): Array[Double] =
    planeCache.computeIfAbsent((seed, bits, dim), { case (s, nb, d) =>
      val out = new Array[Double](nb * d)
      var b = 0
      while (b < nb) {
        var j = 0
        while (j < d) {
          out(b * d + j) =
            TextHashes.mix64(s + b.toLong * 131071L + j.toLong).toDouble /
              Long.MaxValue.toDouble // [-1,1]
          j += 1
        }
        b += 1
      }
      out
    })

  /** Cosine similarity of two float-array columns — double-precision
    * sequential accumulation, one static call per row (the HOF
    * zip_with+aggregate equivalent allocates lambda frames per element). */
  def cosinePair(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Index of the nearest (max-cosine) coarse centroid — the IVF
    * assignment step. First-wins argmax (strict `>`), so ties keep the
    * lowest centroid index — mirrors the oracle's ORDER BY cos DESC, c ASC.
    * Per-centroid cosine uses the same sequential double accumulation as
    * [[cosineToQuery]] (bit-for-bit SQL-emulable). */
  def nearestCentroid(v: ArrayData, cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val q = cents(c)
      val n = math.min(v.numElements(), q.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val a = v.getFloat(i).toDouble
        dot += a * q(i); na += a * a; nb += q(i) * q(i)
        i += 1
      }
      val cos = if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
      if (cos > bestCos) { bestCos = cos; best = c }
      c += 1
    }
    best
  }

  /** Multi-band sign-LSH buckets in ONE pass: `bands` independent bands of
    * `bitsPerBand` hyperplane sign bits each — out(b) = the b-th band's
    * bit pattern. Bands share the plane pool of [[signLshBucket]] (global
    * plane index p = b*bitsPerBand + r), so the oracle emulation is one
    * formula. Recall engineering for near-dup detection at cosine t:
    * p = 1 - acos(t)/π per bit, P(candidate) = 1 - (1 - p^r)^b — e.g.
    * 32 bands × 10 bits at t=0.95 gives miss ≈ 1.3e-6 per true pair while
    * unrelated pairs (cos≈0, p=0.5) collide with P ≈ 3% (the single-band
    * predecessor missed ~57% of true pairs at 0.95 — VERDICT r2). */
  def signLshBands(v: ArrayData, bands: Int, bitsPerBand: Int, seed: Long): ArrayData = {
    val n = v.numElements()
    val planes = planesFor(seed, bands * bitsPerBand, n)
    val out = new Array[Long](bands)
    var band = 0
    while (band < bands) {
      var pattern = 0L
      var r = 0
      while (r < bitsPerBand) {
        val off = (band * bitsPerBand + r) * n
        var dot = 0.0
        var j = 0
        while (j < n) { dot += v.getFloat(j).toDouble * planes(off + j); j += 1 }
        if (dot >= 0) pattern |= (1L << r)
        r += 1
      }
      out(band) = pattern
      band += 1
    }
    new GenericArrayData(out)
  }

  /** Sign-bit LSH bucket of a vector under `bits` pseudo-random
    * hyperplanes derived from the seed (component j of plane b =
    * mix64(seed, b, j) scaled to [-1,1]). */
  def signLshBucket(v: ArrayData, bits: Int, seed: Long): Long = {
    val n = v.numElements()
    val planes = planesFor(seed, bits, n)
    var out = 0L
    var b = 0
    while (b < bits) {
      var dot = 0.0
      val off = b * n
      var j = 0
      while (j < n) {
        dot += v.getFloat(j).toDouble * planes(off + j)
        j += 1
      }
      if (dot >= 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
