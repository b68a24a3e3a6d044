package graft.functions

/** Deterministic hashing primitives for near-duplicate detection at scale:
  * MinHash signatures (→ LSH band join), 64-bit SimHash (→ hamming-banded
  * join), and a Karp-Rabin rolling hash fingerprint.
  *
  * All hashes are seed-fixed and engine-independent so results are stable
  * across runs and cluster sizes.
  */
object TextHashing {
  val MinhashSize = 64
  val LshBands = 16 // 16 bands x 4 rows: ~Jaccard 0.5+ pairs become candidates
  val LshRows: Int = MinhashSize / LshBands

  private val Mersenne61 = (1L << 61) - 1

  /** splitmix64 finalizer — a cheap, well-mixed 64-bit bijection.
    * Package-private: CmSketch reuses it so its buckets replay through the
    * same OracleSql.mix64Nested SQL stages.
    */
  @inline private[graft] def mix64(v: Long): Long = {
    var z = v + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // Fixed per-component seeds; component i's "permutation" is
  // x → mix64(x ^ seed_i), a far cheaper family than affine-mod-Mersenne
  // with equivalent min-hash behavior.
  private val seeds: Array[Long] =
    Array.tabulate(MinhashSize)(i => mix64(0x5851f42d4c957f2dL * (i + 1)))

  /** The fixed permutation seeds, exposed so the q29 oracle can inline them
    * as SQL literals (the q34-hyperplane technique).
    */
  private[graft] def permutationSeeds: Array[Long] = seeds.clone()

  /** Base 64-bit hash of a string: FNV-1a-64 folded over Unicode CODEPOINTS,
    * finalized with [[mix64]]. Chosen over murmur3 deliberately: the fold is a
    * plain integer recurrence (`h = (h ^ cp) * 0x100000001b3` mod 2^64), so the
    * q29/q2a DuckDB oracles replay it exactly via `list_reduce` over HUGEINT —
    * murmur3's 32-bit rotate/pair semantics are not practically expressible in
    * SQL. FNV-1a's weak low-bit avalanche is repaired by the splitmix64
    * finalizer; minhash/simhash quality is gated empirically in RecallSpec.
    */
  def hash64(s: String): Long = {
    var h = Fnv64Offset
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h ^ cp) * Fnv64Prime
      i += Character.charCount(cp)
    }
    mix64(h)
  }

  private[graft] val Fnv64Offset = 0xcbf29ce484222325L // 14695981039346656037
  private[graft] val Fnv64Prime = 0x100000001b3L // 1099511628211

  private def mulmod61(a: Long, b: Long): Long = {
    // (a*b) mod 2^61-1 without overflow, via 128-bit split
    val aHi = a >>> 32
    val aLo = a & 0xffffffffL
    val bHi = b >>> 32
    val bLo = b & 0xffffffffL
    // a*b = aHi*bHi*2^64 + (aHi*bLo + aLo*bHi)*2^32 + aLo*bLo
    var res = modPow2(aHi * bHi, 64) // contribution of 2^64 term
    // the two cross terms are reduced separately: their SUM can exceed 2^64
    // and wrap (aHi,bHi < 2^29; aHi*bLo < 2^61 each, but 2^61+2^61 ≥ 2^62 is
    // fine — yet with full 61-bit operands the sum can reach 2^65)
    res = (res + modPow2(aHi * bLo, 32)) % Mersenne61
    res = (res + modPow2(aLo * bHi, 32)) % Mersenne61
    // aLo*bLo < 2^64 may wrap the signed long; unsigned remainder is exact
    res = (res + java.lang.Long.remainderUnsigned(aLo * bLo, Mersenne61)) % Mersenne61
    res
  }

  // (x * 2^k) mod 2^61-1 where x < 2^64; uses 2^61 ≡ 1
  private def modPow2(x: Long, k: Int): Long = {
    var v = java.lang.Long.remainderUnsigned(x, Mersenne61)
    var shift = k
    while (shift >= 61) { v = (v << 61 - 61); shift -= 61 } // 2^61 ≡ 1: no-op on v
    // v * 2^shift mod M, shift < 61
    val hi = v >>> (61 - shift)
    val lo = (v << shift) & Mersenne61
    (hi + lo) % Mersenne61
  }

  /** MinHash signature over a set of shingles. Empty input → all-max sig. */
  def minhashSignature(shingles: Iterable[String]): Array[Long] = {
    val sig = Array.fill(MinhashSize)(Long.MaxValue)
    val it = shingles.iterator
    while (it.hasNext) { updateSignature(sig, hash64(it.next())) }
    sig
  }

  @inline private def updateSignature(sig: Array[Long], x: Long): Unit = {
    var i = 0
    while (i < MinhashSize) {
      val h = mix64(x ^ seeds(i))
      if (h < sig(i)) sig(i) = h
      i += 1
    }
  }

  /** Sorted, distinct 64-bit hashes of a text's word n-gram shingles — one
    * pass, no shingle strings materialized. The set representation for exact
    * Jaccard via [[graft.functions.SortedIntersectCount]]: Jaccard over these
    * hash sets equals Jaccard over the string shingle sets (collisions
    * ~|union|²/2^64 per pair are negligible).
    */
  def shingleHashes(text: String, n: Int = 3): Array[Long] = {
    val t = wsTrim(text)
    if (t.isEmpty) return Array.empty
    val toks = t.split(WsClass)
    if (toks.length < n) return Array(hash64(t))
    val tokHash = toks.map(hash64)
    val seen = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i + n <= toks.length) {
      var acc = 0x100000001b3L
      var j = 0
      while (j < n) { acc = mix64(acc ^ tokHash(i + j)); j += 1 }
      seen.add(acc)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  /** One-pass MinHash straight from text: tokenize, roll word n-gram hashes
    * (no shingle strings materialized), dedupe base hashes, update the
    * signature. This is the pipeline hot path — avoids building an
    * ARRAY<STRING> column and its ser/de entirely.
    */
  def minhashSignatureFromText(text: String, n: Int = 3): Array[Long] = {
    val sig = Array.fill(MinhashSize)(Long.MaxValue)
    val t = wsTrim(text)
    if (t.isEmpty) return sig
    val toks = t.split(WsClass)
    val seen = new java.util.HashSet[java.lang.Long]()
    if (toks.length < n) {
      updateSignature(sig, hash64(t))
      return sig
    }
    val tokHash = toks.map(hash64)
    var i = 0
    while (i + n <= toks.length) {
      var acc = 0x100000001b3L
      var j = 0
      while (j < n) { acc = mix64(acc ^ tokHash(i + j)); j += 1 }
      if (seen.add(acc)) updateSignature(sig, acc)
      i += 1
    }
    sig
  }

  /** LSH band keys: hash of each band's rows. Equal band key → candidate pair. */
  def lshBands(sig: Array[Long]): Array[Long] = {
    val bands = new Array[Long](LshBands)
    var b = 0
    while (b < LshBands) {
      var acc = 1125899906842597L
      var r = 0
      while (r < LshRows) {
        acc = acc * 31 + sig(b * LshRows + r)
        r += 1
      }
      bands(b) = acc
      b += 1
    }
    bands
  }

  /** Estimated Jaccard from two signatures: fraction of agreeing components. */
  def minhashJaccard(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0
    var i = 0
    while (i < MinhashSize) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / MinhashSize
  }

  /** 64-bit SimHash over tokens (unit weights). */
  def simhash64(toks: Iterable[String]): Long = {
    val acc = new Array[Int](64)
    val it = toks.iterator
    while (it.hasNext) {
      val h = hash64(it.next())
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  /** SimHash 16-bit chunk keys: hamming distance ≤3 pairs share ≥1 of 4 keys
    * (pigeonhole), making near-dup search a 4-way equality join, not O(n²).
    */
  def simhashChunks(h: Long): Array[Long] = {
    Array.tabulate(4)(i => (i.toLong << 32) | ((h >>> (i * 16)) & 0xffffL))
  }

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Document fingerprint: Karp-Rabin polynomial rolling hash of the entire
    * whitespace-normalized lowercase text, mod 2^61-1. One pass, content-
    * sensitive, whitespace/case-insensitive.
    *
    * Folds Unicode CODEPOINTS, not UTF-16 units — encoding-representation
    * independent, and exactly what the q2c DuckDB oracle's
    * `unicode(char)` fold computes (surrogate pairs would otherwise
    * diverge on any non-BMP character).
    */
  def rollingFingerprint(text: String): Long = {
    val s = normalize(text)
    if (s.isEmpty) return 0L
    val base = 1000003L
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (mulmod61(h, base) + cp) % Mersenne61
      i += Character.charCount(cp)
    }
    h
  }

  /** Winnowing fingerprints (Schleimer et al.): the minimum character-k-gram
    * rolling hash of each window of w consecutive k-grams, deduplicated and
    * sorted. Two documents sharing a run of ≥ w+k-1 chars share a
    * fingerprint — the classic plagiarism/near-dup selection set.
    *
    * Operates on CODEPOINTS (like [[rollingFingerprint]]); texts of ≤ k
    * codepoints fall back to the whole-text Karp-Rabin fold — both choices
    * keep every branch expressible in the q2f DuckDB oracle (a murmur
    * fallback would not be).
    */
  def winnowingFingerprints(text: String, k: Int = 8, w: Int = 16): Array[Long] = {
    val s = normalize(text)
    if (s.isEmpty) return Array.empty
    val cps = s.codePoints().toArray
    val base = 1000003L
    if (cps.length <= k) {
      var h = 0L
      var i = 0
      while (i < cps.length) { h = (mulmod61(h, base) + cps(i)) % Mersenne61; i += 1 }
      return Array(h)
    }
    var powK = 1L
    var i = 0
    while (i < k) { powK = mulmod61(powK, base); i += 1 } // base^k
    // rolling k-gram hashes
    val nGrams = cps.length - k + 1
    val grams = new Array[Long](nGrams)
    var h = 0L
    i = 0
    while (i < cps.length) {
      h = (mulmod61(h, base) + cps(i)) % Mersenne61
      if (i >= k)
        h = (h - mulmod61(cps(i - k).toLong, powK) % Mersenne61 + Mersenne61) % Mersenne61
      if (i >= k - 1) grams(i - k + 1) = h
      i += 1
    }
    // standard winnowing: only FULL windows of w grams (a clamped tail
    // window would always select the doc's final k-gram and inflate the
    // candidate set); docs with fewer than w grams contribute their single
    // overall minimum
    val out = new java.util.TreeSet[java.lang.Long]()
    if (nGrams < w) {
      var minH = Long.MaxValue
      var j = 0
      while (j < nGrams) { if (grams(j) < minH) minH = grams(j); j += 1 }
      out.add(minH)
    } else {
      var start = 0
      while (start <= nGrams - w) {
        var minH = Long.MaxValue
        var j = start
        while (j < start + w) { if (grams(j) < minH) minH = grams(j); j += 1 }
        out.add(minH)
        start += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    arr
  }

  /** Whitespace-collapse + lowercase + space-trim, using exactly the RE2
    * `\s` class ([\t\n\f\r ]) and space-only trim the DuckDB oracles use
    * (Java's `\s` adds U+000B and String.trim strips all controls ≤ 0x20 —
    * either would silently diverge).
    */
  /** RE2's `\s` class, exactly: [ \t\n\f\r]. The shingle tokenizer splits on
    * THIS (not Java's `\s`, which adds \x0B, and not String.trim, which strips
    * every control ≤ 0x20) so the q29 oracle's `regexp_replace('^\s+|\s+$')` +
    * `string_split_regex('\s+')` produce the identical token sequence.
    */
  private val WsClass = "[ \t\n\f\r]+"

  private def wsTrim(text: String): String =
    if (text == null) ""
    else text.replaceAll("^[ \t\n\f\r]+|[ \t\n\f\r]+$", "")

  private def normalize(text: String): String =
    if (text == null) ""
    // Locale.ROOT: default-locale lowercasing (tr_TR dotless-ı etc.) would
    // diverge from DuckDB's locale-independent lower() in the q2c/q2f oracles
    else text.toLowerCase(java.util.Locale.ROOT).replaceAll("[ \t\n\f\r]+", " ")
      .replaceAll("^ +| +$", "")
}
